"""Driver contract for the spark-graft builder (PySpark target).

Backed by the certified query registry in
``arc_cassandra_pipeline_plugin_spark.queries`` — every entry pairs a
PySpark callable with (when SQL-expressible) the equivalent DuckDB oracle
SQL, with identical output column names/types on both sides.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from arc_cassandra_pipeline_plugin_spark.queries import load_all  # noqa: E402

_REGISTRY = load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    return _REGISTRY["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for approximate /
    non-SQL-expressible operators → driver records rows-only checks)."""
    return {name: q.oracle for name, q in _REGISTRY.items() if q.oracle is not None}
