"""Data-layout optimization operators: Z-order (Morton) clustering and
range-clustered writes.

At 100 TB the dominant cost of most queries is the scan, and the dominant
lever on the scan is LAYOUT: files clustered so that min/max column
statistics prune most of them. A Z-order key interleaves the bits of
several columns so that rows close in the multi-dimensional key space land
in the same files — point/range predicates on ANY of the interleaved
columns then skip most files, where a plain sort only helps its leading
column.

Everything here is integer bit arithmetic in built-in expressions (codegen,
no shuffles beyond the final range partition), and the identical formula is
generated as portable SQL for the oracle harness.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton/Z-order key interleaving the low ``bits`` of two non-negative
    integer columns: bit i of x lands at position 2i, bit i of y at 2i+1.

    Pure projection — whole-stage codegen, zero shuffles. 2×16 bits fits a
    BIGINT with room to spare; callers quantize wider domains down first
    (e.g. ``(col - min) >> scale``)."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        # terms occupy disjoint bit positions, so + is exactly bitwise-or
        z = (
            z
            + F.shiftleft(F.shiftright(x.cast("long"), i) % 2, 2 * i)
            + F.shiftleft(F.shiftright(y.cast("long"), i) % 2, 2 * i + 1)
        )
    return z


def zorder_key_sql(x: str, y: str, bits: int = 16) -> str:
    """The identical Z-order formula as engine-portable SQL (DuckDB uses
    arithmetic %/>>/<<, same two's-complement semantics on BIGINT).
    Generated from the same constants as :func:`zorder_key` so the two
    cannot drift."""
    terms = []
    for i in range(bits):
        terms.append(f"(((CAST({x} AS BIGINT) >> {i}) % 2) << {2 * i})")
        terms.append(f"(((CAST({y} AS BIGINT) >> {i}) % 2) << {2 * i + 1})")
    return " + ".join(terms)


def cluster_by_zorder(
    df: DataFrame, x: str, y: str, bits: int = 16, num_partitions: int | None = None
) -> DataFrame:
    """Re-layout a frame for multi-dimensional data skipping: compute the
    Z-order key, range-partition on it (each output partition covers a
    contiguous Z range → tight per-file min/max on BOTH source columns),
    and sort within partitions.

    This is the write-side half of skipping: `repartitionByRange` samples
    the key distribution (one extra job over a sample, not a full pass),
    so partitions are balanced even when the key space is sparse."""
    keyed = df.withColumn("_z", zorder_key(F.col(x), F.col(y), bits))
    parted = (
        keyed.repartitionByRange(num_partitions, "_z")
        if num_partitions
        else keyed.repartitionByRange("_z")
    )
    return parted.sortWithinPartitions("_z").drop("_z")
