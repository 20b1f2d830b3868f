"""Data-quality operators: the checks a 100 TB ingest pipeline runs before
training data ships — referential integrity, null profiling, domain checks.
All pure DataFrame compositions (anti joins + conditional aggregation), so
they certify exactly against SQL and cost one pass / one shuffle each."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fk_violations(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str
) -> DataFrame:
    """Rows of ``child`` whose foreign key has no match in ``parent``
    (left-anti join — the scalable FK check; at 100 TB run it on the
    bucketed form of both tables for a shuffle-free audit)."""
    return child.join(
        parent.select(parent_key), child[child_key] == parent[parent_key], "left_anti"
    )


def null_profile(df: DataFrame, *cols: str) -> DataFrame:
    """One-row null/total profile per column, unpivoted to
    (column_name, n_rows, n_null, null_fraction) — single pass, single
    tiny shuffle."""
    use = list(cols) if cols else df.columns
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in use:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_null_{c}"))
    row = df.agg(*aggs)
    stacked = row.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("column_name"),
                    F.col("_n").alias("n_rows"),
                    F.col(f"_null_{c}").alias("n_null"),
                )
                for c in use
            ])
        ).alias("s")
    )
    return stacked.select(
        "s.column_name",
        "s.n_rows",
        "s.n_null",
        # guard: integer division by zero raises under ANSI; empty table
        # profiles report null fractions as null
        F.when(F.col("s.n_rows") == 0, F.lit(None).cast("double")).otherwise(
            F.round(F.col("s.n_null").cast("double") / F.col("s.n_rows"), 6)
        ).alias("null_fraction"),
    )


def domain_violations(df: DataFrame, checks: dict[str, F.Column]) -> DataFrame:
    """Count rows violating each named predicate (predicates state what is
    VALID). Single conditional-aggregation pass."""
    aggs = [
        F.sum(F.when(~pred, 1).otherwise(0)).alias(name) for name, pred in checks.items()
    ]
    return df.agg(*aggs)
