"""Generate MULTI-FILE / MULTI-ROW-GROUP variants of the driver fixtures.

The driver's parquet fixtures are one file with one row group per table, so
every scan starts at parallelism 1 — which is what made
``functions.ensure_parallelism`` necessary and hides scan-parallel behavior
(a 100 TB table is thousands of files/row-groups and the scan itself feeds
every core). This tool rewrites each table as a directory of ``--files``
parquet files with small row groups, producing fixtures whose scans behave
like real-scale scans. Timestamp physical types are normalized through
``sources.load_table`` (the supported read path), so the split fixtures are
readable with a plain ``spark.read.parquet`` as well.

Usage::

    python tools/gen_split_fixtures.py [--src /root/testdata/sf0.1] \
        [--dst .fixtures/sf0.1-split] [--files 32]

Then point the bench at them::

    SPARK_GRAFT_SF_DIR=.fixtures/sf0.1-split python bench.py
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arc_cassandra_pipeline_plugin_spark.sources import TABLES, get_spark, load_table, table_path

#: tables small enough that splitting is pure overhead (dimension tables)
SINGLE_FILE_TABLES = {"region", "nation", "supplier", "part"}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default=".fixtures/sf0.1-split")
    ap.add_argument("--files", type=int, default=32)
    args = ap.parse_args()

    spark = get_spark("gen-split-fixtures")
    # ~1 MiB row groups → several row groups per split file even at sf0.1
    spark.conf.set("spark.hadoop.parquet.block.size", str(1 << 20))
    os.makedirs(args.dst, exist_ok=True)
    for t in TABLES:
        src = table_path(args.src, t)
        if not os.path.exists(src):
            print(f"skip {t}: no source at {src}")
            continue
        df = load_table(spark, args.src, t)
        n = 1 if t in SINGLE_FILE_TABLES else args.files
        out = os.path.join(args.dst, f"{t}.parquet")
        df.repartition(n).write.mode("overwrite").parquet(out)
        files = [f for f in os.listdir(out) if f.endswith(".parquet")]
        print(f"{t}: {n} requested -> {len(files)} files at {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
