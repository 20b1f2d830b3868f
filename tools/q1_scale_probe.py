"""Scale probe above sf1 for the two-level exact-aggregation family
(VERDICT r10 task #8 / stretch): q1_pricing_summary and agg_decimal_exact
at sf3/sf5-equivalent lineitem volume (18M / 30M rows).

Why: the long-cents → decimal merge's int64-headroom argument is analytic
(`a group's cents partial fits int64 while partition partials stay under
~9.2e18`); this probe adds an EMPIRICAL point well above sf1 — the sums
grow ~5× while the row count grows 5×, so both the headroom and the
wall-time scaling curve get a measurement.

Fixture: lineitem-only replicas of the sf1 twin. Replica r offsets
l_orderkey by r·10⁹ (keeps the key space disjoint) and leaves measures
unchanged — q1 groups by (l_returnflag, l_linestatus), so each group's
row count and exact sums are exactly R× the sf1 values: the DuckDB oracle
re-derives them independently, making the cross-engine check at 30M rows
a real exactness certification, not a smoke test.

Usage: python tools/q1_scale_probe.py [--replicas 3 5]
Appends results to SCALING.md and prints one JSON line per scale.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from arc_cassandra_pipeline_plugin_spark.queries import load_all  # noqa: E402
from arc_cassandra_pipeline_plugin_spark.sources import get_spark, load_table  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(ROOT, ".fixtures", "sf1")
QUERIES = ["q1_pricing_summary", "agg_decimal_exact"]


def build_fixture(spark, replicas: int) -> str:
    dst = os.path.join(ROOT, ".fixtures", f"sf{replicas}-lineitem")
    marker = os.path.join(dst, "_done")
    if os.path.exists(marker):
        return dst
    shutil.rmtree(dst, ignore_errors=True)
    li = load_table(spark, SF1, "lineitem")
    rep = spark.range(replicas).select(F.col("id").alias("_r"))
    out = li.crossJoin(rep).withColumn(
        "l_orderkey", F.col("l_orderkey") + F.col("_r") * F.lit(1_000_000_000)
    ).drop("_r")
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(dst, "lineitem.parquet")
    )
    open(marker, "w").close()
    return dst


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, nargs="+", default=[3, 5])
    args = ap.parse_args()

    spark = get_spark("q1-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    lines = []
    for r in args.replicas:
        sf_dir = build_fixture(spark, r)
        rec = {"scale": f"sf{r} (lineitem {r}x sf1)", "queries": {}}
        for name in QUERIES:
            fn = registry[name].fn
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            rec["queries"][name] = {"spark_sec": round(time.time() - t0, 3)}
        # exactness certification vs DuckDB at this scale (selfcheck exact
        # multiset compare; the oracle recomputes sums independently)
        t0 = time.time()
        cp = subprocess.run(
            [sys.executable, os.path.join(ROOT, "tools", "selfcheck.py"), sf_dir]
            + QUERIES,
            capture_output=True, text=True, timeout=3600,
        )
        ok = "0 failures" in cp.stdout
        rec["oracle_exact_match"] = ok
        rec["selfcheck_sec"] = round(time.time() - t0, 1)
        if not ok:
            rec["selfcheck_tail"] = cp.stdout[-1500:]
        print(json.dumps(rec))
        lines.append(rec)

    with open(os.path.join(ROOT, "SCALING.md"), "a") as fh:
        fh.write("\n## q1 family above sf1 (lineitem-replica probe)\n\n")
        for rec in lines:
            fh.write(f"- {rec['scale']}: ")
            fh.write(", ".join(
                f"{n} {v['spark_sec']}s" for n, v in rec["queries"].items()
            ))
            fh.write(
                f"; oracle exact-match: {rec['oracle_exact_match']}"
                f" (selfcheck {rec['selfcheck_sec']}s)\n"
            )


if __name__ == "__main__":
    main()
