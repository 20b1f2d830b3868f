"""Run one certified query by name: show the result sample, row count, and
the physical plan. Usage: python tools/run_query.py <name> [sf_dir] [--plan]"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arc_cassandra_pipeline_plugin_spark.plans import explain_str
from arc_cassandra_pipeline_plugin_spark.queries import load_all
from arc_cassandra_pipeline_plugin_spark.sources import get_spark


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not args:
        print("usage: run_query.py <name> [sf_dir] [--plan]")
        print("available:", ", ".join(sorted(load_all())))
        return 1
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"
    registry = load_all()
    if name not in registry:
        print(f"unknown query '{name}'; available:", ", ".join(sorted(registry)))
        return 1
    spark = get_spark("run_query")
    spark.sparkContext.setLogLevel("ERROR")
    df = registry[name].fn(spark, sf_dir)
    df.show(20, truncate=False)
    print("rows:", df.count())
    if "--plan" in sys.argv:
        print(explain_str(df, "formatted"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
