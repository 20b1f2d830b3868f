"""Order-insensitive dataset equality / diff harness.

Port of the reference's ``datasetEquality`` (``TestUtils.scala:88-125``):
per-row ``sha2(to_json(struct(*sorted(columns))), 512)`` (``:94-95``),
full-outer join on the hashes (``:97-100``), and the two anti-side filters
reporting rows present on only one side (``:104-107``). This is the
blueprint the correctness harness is built on (SURVEY.md §2A row 18).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def row_hashes(df: DataFrame, num_bits: int = 512) -> DataFrame:
    """One sha2 hash per row over the json-encoded struct of all columns,
    column order normalized by sorting names (``TestUtils.scala:94-95``)."""
    cols = sorted(df.columns)
    return df.select(
        F.sha2(F.to_json(F.struct(*[F.col(c) for c in cols])), num_bits).alias("row_hash")
    )


@dataclass
class DatasetDiff:
    equal: bool
    left_only: list[str]
    right_only: list[str]
    left_count: int
    right_count: int


def dataset_diff(expected: DataFrame, actual: DataFrame) -> DatasetDiff:
    """Full-outer join the per-row hash sets; rows whose counterpart hash is
    null exist on only one side (``TestUtils.scala:97-107``). Duplicate rows
    are compared by multiplicity via a per-hash count."""
    left = row_hashes(expected).groupBy("row_hash").count().withColumnRenamed("count", "left_n")
    right = row_hashes(actual).groupBy("row_hash").count().withColumnRenamed("count", "right_n")
    joined = left.join(right, on="row_hash", how="full").cache()
    try:
        left_only = [
            r["row_hash"]
            for r in joined.filter(
                F.col("right_n").isNull() | (F.col("left_n") != F.col("right_n"))
            ).select("row_hash").collect()
        ]
        right_only = [
            r["row_hash"]
            for r in joined.filter(
                F.col("left_n").isNull() | (F.col("left_n") != F.col("right_n"))
            ).select("row_hash").collect()
        ]
        return DatasetDiff(
            equal=not left_only and not right_only,
            left_only=left_only,
            right_only=right_only,
            left_count=expected.count(),
            right_count=actual.count(),
        )
    finally:
        joined.unpersist()


def dataset_equality(expected: DataFrame, actual: DataFrame) -> bool:
    """Order-insensitive equality: both anti-sides of the hash join empty
    (``TestUtils.scala:88-125``)."""
    if set(expected.columns) != set(actual.columns):
        return False
    return dataset_diff(expected, actual).equal


def cast_all_to_string(df: DataFrame) -> DataFrame:
    """Project every column through ``cast(string)``
    (``TestUtils.scala:152-155``) — used to normalize frames before textual
    comparison."""
    return df.select([F.col(c).cast("string").alias(c) for c in df.columns])
