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


def compact_files(
    spark,
    src_dir: str,
    dst_dir: str,
    target_file_bytes: int = 128 << 20,
    zorder: tuple[str, str] | None = None,
):
    """Small-file compaction: rewrite a fragmented parquet directory into
    ~target-sized files, optionally Z-order-clustered on two columns.

    The input byte size comes from filesystem metadata (a driver-side
    listing — O(#files), no data read); the rewrite is one job:
    `repartitionByRange` on the cluster key (or round-robin `repartition`
    when unclustered) → parquet write. Returns (n_input_files,
    n_output_partitions).

    At 100 TB this is the nightly maintenance pass that keeps scan task
    counts and min/max pruning effective after many incremental appends —
    the reference delegates file layout to its sinks; here it is a
    first-class operator."""
    import math
    import os

    files = [
        os.path.join(r, f)
        for r, _, fs in os.walk(src_dir)
        for f in fs
        if f.endswith(".parquet")
    ]
    total = sum(os.path.getsize(f) for f in files)
    # parquet on disk is compressed ~3-4x vs in-flight rows; aim a bit low
    n_parts = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src_dir)
    if zorder is not None:
        x, y = zorder
        keyed = df.withColumn("_z", zorder_key(F.col(x), F.col(y)))
        out = keyed.repartitionByRange(n_parts, "_z").sortWithinPartitions("_z").drop("_z")
    else:
        out = df.repartition(n_parts)
    out.write.mode("overwrite").parquet(dst_dir)
    return len(files), n_parts
