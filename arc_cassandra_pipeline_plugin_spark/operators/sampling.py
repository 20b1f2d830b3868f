"""Deterministic sampling & splitting for training-data pipelines.

``df.sample()`` is seed-dependent but partitioning-dependent too — rerun
after a repartition and you get a different subset. Training pipelines need
*content-deterministic* sampling: whether a row is sampled depends only on
the row's key, so the same corpus always yields the same sample on any
cluster layout, and samples are consistent across tables sharing the key.

Implementation: md5-prefix hash of the key → uniform bucket in [0, 1M);
select by threshold. Portable to the oracle (`('0x'||substr(md5(k),1,8))
::BIGINT % 1000000` in DuckDB), so sampling is certified exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BUCKETS = 1_000_000


def _bucket(key: F.Column, salt: str) -> F.Column:
    h = F.conv(F.substring(F.md5(F.concat(F.lit(salt + ":"), key.cast("string"))), 1, 8), 16, 10)
    return h.cast("bigint") % BUCKETS


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Keep rows whose key hashes below ``fraction`` of the bucket space.
    Pure filter — pushes into the scan's residual, no shuffle, stable under
    any partitioning."""
    return df.filter(_bucket(F.col(key_col), salt) < int(fraction * BUCKETS))


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    val_fraction: float = 0.1,
    test_fraction: float = 0.1,
    salt: str = "split",
) -> DataFrame:
    """Append a ``split`` column ∈ {train, val, test} keyed on the row hash:
    disjoint, exhaustive, reproducible, and consistent for any other table
    keyed on the same id (join-free label propagation)."""
    b = _bucket(F.col(key_col), salt)
    val_hi = int(val_fraction * BUCKETS)
    test_hi = val_hi + int(test_fraction * BUCKETS)
    return df.withColumn(
        "split",
        F.when(b < val_hi, "val").when(b < test_hi, "test").otherwise("train"),
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "stratified",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample dominant
    languages, keep all of rare ones). Strata absent from ``fractions``
    use ``default_fraction``. Still a pure filter — no shuffle."""
    b = _bucket(F.col(key_col), salt)
    threshold = F.lit(int(default_fraction * BUCKETS))
    for stratum, frac in sorted(fractions.items()):
        threshold = F.when(
            F.col(stratum_col) == stratum, F.lit(int(frac * BUCKETS))
        ).otherwise(threshold)
    return df.filter(b < threshold)
