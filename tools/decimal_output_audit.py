"""Audit: find registry queries whose OUTPUT schema contains decimal columns.

Decimal-typed result columns are a driver-hash hazard: Spark's inferred
decimal precision (e.g. sum(decimal(15,2)) -> decimal(25,2)) differs from
DuckDB's (DECIMAL(38,2)), and the r10 driver gate proved the external
hasher does not normalize this even when values are multiset-identical.
Every certified query must therefore end decimal pipelines with an
explicit cast (same DECIMAL(p,s) mirrored on both sides, or decimal->
DOUBLE after on-grid rounding).

Usage: python tools/decimal_output_audit.py [sf_dir]
Prints one line per offending query: name, column, decimal type.
Exit code 1 if any found.
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import SparkSession
from pyspark.sql.types import DecimalType

from arc_cassandra_pipeline_plugin_spark.queries import load_all


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .appName("decimal-output-audit")
        .getOrCreate()
    )
    bad = []
    for name, spec in sorted(load_all().items()):
        try:
            df = spec.fn(spark, sf_dir)
        except Exception as exc:  # noqa: BLE001 - audit must survive one bad query
            print(f"ERROR {name}: {type(exc).__name__}: {exc}", file=sys.stderr)
            continue
        for field in df.schema.fields:
            if isinstance(field.dataType, DecimalType):
                bad.append((name, field.name, str(field.dataType)))
    for name, col, typ in bad:
        print(f"{name}\t{col}\t{typ}")
    print(f"-- {len(bad)} decimal output column(s) across registry", file=sys.stderr)
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
