"""Skew-mitigation joins: salting for hot keys.

At 100 TB a single hot join key (one giant customer, one null-heavy column)
serializes an entire shuffle partition. AQE's skew-join splitting
(``spark.sql.adaptive.skewJoin.enabled``, on by default here) handles most
cases at runtime; explicit salting remains the deterministic tool when the
skew is known in advance or the join is not AQE-eligible.

``salted_join`` is result-identical to a plain inner/left equi-join — the
salt only spreads one hot key across ``salt_buckets`` reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Equi-join with the left (large/skewed) side salted.

    - left rows get a deterministic salt in [0, salt_buckets) derived from
      a hash of the whole row's join-irrelevant spread (here: a stable
      uniform spread via ``monotonically_increasing_id`` is NOT used —
      it's nondeterministic across runs; instead we hash the join key
      together with a per-row fingerprint column when provided, falling
      back to ``spark_partition_id``+offset-free ``rand``-free xxhash of
      all columns, which is deterministic for deterministic input).
    - right rows are replicated once per salt bucket (explode of a
      ``sequence`` literal — a cheap broadcast-side multiplication).

    The join key becomes (key, salt): the hot key's rows now land on
    ``salt_buckets`` distinct reducers.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salt = (F.xxhash64(*[F.col(c) for c in left.columns]) % salt_buckets + salt_buckets) % salt_buckets
    l = left.withColumn("_salt_l", salt.cast("int"))
    r = right.withColumn(
        "_salt_r", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("_salt_r", F.col("_salt_r").cast("int"))
    out = l.join(
        r,
        on=[l[left_on] == r[right_on], l["_salt_l"] == r["_salt_r"]],
        how=how,
    )
    return out.drop("_salt_l", "_salt_r")
