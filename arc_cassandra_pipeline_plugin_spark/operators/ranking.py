"""Scale-safe global ranking: exact global row_number / ntile without a
single-partition window.

A plain ``Window.orderBy(...)`` with no partition spec moves every row to
ONE partition (Spark warns ``WindowExec: No Partition Defined``) — a
scale-killer at 100 TB. The classic distributed fix is two-phase ranking:

1. bucket rows by range on the leading sort key (boundaries from one
   ``percentile_approx`` aggregation — a GK sketch, one map-side-combined
   pass, O(buckets) result);
2. rank WITHIN each bucket with a partitioned window (parallel);
3. add each bucket's global offset (= rows in all lower buckets), a tiny
   O(buckets) table broadcast back onto the rows.

The result is the exact global ``row_number`` regardless of where the
approximate boundaries land: bucket assignment uses a strict comparison on
the leading key, so rows with equal leading keys always share a bucket and
the within-bucket tiebreak ordering resolves them — boundary quality only
affects balance, never correctness.

Scale notes: the corpus is scanned once for boundaries and once (after an
eager ``localCheckpoint`` lineage cut) for the ranked output; at cluster
scale you'd persist the input instead. The two driver-side collects are
O(num_buckets) scalars (like the IVF centroid collect — data-independent).
Heavily-duplicated leading keys bound the parallelism (all duplicates of
one value share a bucket); pick a higher-cardinality leading key or raise
``num_buckets`` when the key is coarse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _bucketed_row_number(
    df: DataFrame,
    order_key: str,
    tiebreaks: list[str],
    out_col: str,
    num_buckets: int,
    accuracy: int,
) -> tuple[DataFrame, int]:
    """Two-phase exact global row_number; returns (ranked_df, total_rows)."""
    spark = df.sparkSession
    qs = [i / num_buckets for i in range(1, num_buckets)]
    row = df.select(F.percentile_approx(order_key, qs, accuracy).alias("b")).first()
    bounds = sorted(set(row["b"] or []))

    if not bounds:  # empty/constant leading key: one bucket, still correct
        bucketed = df.withColumn("__bucket", F.lit(0))
    else:
        bounds_arr = F.array(*[F.lit(b) for b in bounds])
        bucketed = df.withColumn(
            "__bucket",
            F.size(F.filter(bounds_arr, lambda b: b < F.col(order_key))),
        )
    # lineage cut: bucket counts + the final ranked output both read this;
    # one materialization instead of two source scans
    bucketed = bucketed.localCheckpoint(eager=True)

    counts = sorted(
        (r["__bucket"], r["cnt"])
        for r in bucketed.groupBy("__bucket").agg(F.count("*").alias("cnt")).collect()
    )
    offsets, running = [], 0
    for bucket, cnt in counts:
        offsets.append((bucket, running))
        running += cnt
    offsets_df = spark.createDataFrame(offsets or [(0, 0)], "__bucket INT, __offset BIGINT")

    w = Window.partitionBy("__bucket").orderBy(order_key, *tiebreaks)
    ranked = (
        bucketed.join(F.broadcast(offsets_df), "__bucket")
        .withColumn(out_col, (F.row_number().over(w) + F.col("__offset")).cast("long"))
        .drop("__bucket", "__offset")
    )
    return ranked, running


def global_row_number(
    df: DataFrame,
    order_key: str,
    tiebreaks: list[str],
    out_col: str = "global_rn",
    num_buckets: int = 32,
    accuracy: int = 10_000,
) -> DataFrame:
    """Exact global ``row_number() OVER (ORDER BY order_key, *tiebreaks)``
    (all ascending) computed with partitioned windows only.

    ``(order_key, *tiebreaks)`` must be a total order (unique composite) —
    the same requirement every deterministic top-k in this repo has.
    """
    ranked, _ = _bucketed_row_number(
        df, order_key, tiebreaks, out_col, num_buckets, accuracy
    )
    return ranked


def global_ntile(
    df: DataFrame,
    order_key: str,
    tiebreaks: list[str],
    n: int,
    out_col: str = "tile",
    num_buckets: int = 32,
    accuracy: int = 10_000,
) -> DataFrame:
    """Exact global ``ntile(n) OVER (ORDER BY order_key, *tiebreaks)``
    derived arithmetically from the two-phase global row_number.

    SQL ntile semantics: with N total rows, the first ``N % n`` tiles get
    ``N // n + 1`` rows, the rest ``N // n`` — a pure function of the
    1-based global row number, so no extra shuffle beyond the rank itself.
    """
    ranked, n_rows = _bucketed_row_number(
        df, order_key, tiebreaks, "__rn", num_buckets, accuracy
    )
    base, rem = divmod(n_rows, n) if n_rows else (0, 0)
    rn = F.col("__rn")
    if base == 0:  # fewer rows than tiles: tile == row number
        tile = rn
    else:
        big_span = rem * (base + 1)
        tile = F.when(
            rn <= F.lit(big_span), F.floor((rn - 1) / (base + 1)) + 1
        ).otherwise(F.lit(rem) + F.floor((rn - F.lit(big_span) - 1) / base) + 1)
    return ranked.withColumn(out_col, tile.cast("int")).drop("__rn")


def global_prefix_sum(
    df: DataFrame,
    order_key: str,
    value_col: str,
    tiebreaks: list[str] | None = None,
    out_col: str = "prefix_sum",
    num_buckets: int = 32,
    accuracy: int = 10_000,
) -> DataFrame:
    """Exact EXCLUSIVE global prefix sum of ``value_col`` under
    ``ORDER BY order_key, *tiebreaks`` — the running-total twin of
    :func:`global_row_number`, same two-phase shape: range-bucket on the
    leading key (GK-sketch boundaries), running sum WITHIN each bucket
    under a partitioned window, plus each bucket's total-of-lower-buckets
    offset broadcast back as an O(buckets) table. No single-partition
    window anywhere.

    ``value_col`` must be integral — both the per-bucket totals and the
    window sums add exact longs, so the result is independent of partition
    order (float running sums would not be). ``(order_key, *tiebreaks)``
    must be a total order, as for every deterministic global rank here.
    Exclusive convention: a row's ``out_col`` is the sum of all STRICTLY
    preceding rows' values (the first row gets 0) — the natural "global
    offset of this row's first unit", which is what sequence packing
    consumes.
    """
    tiebreaks = tiebreaks or []
    spark = df.sparkSession
    qs = [i / num_buckets for i in range(1, num_buckets)]
    row = df.select(F.percentile_approx(order_key, qs, accuracy).alias("b")).first()
    bounds = sorted(set(row["b"] or []))
    if not bounds:
        bucketed = df.withColumn("__bucket", F.lit(0))
    else:
        bounds_arr = F.array(*[F.lit(b) for b in bounds])
        bucketed = df.withColumn(
            "__bucket",
            F.size(F.filter(bounds_arr, lambda b: b < F.col(order_key))),
        )
    bucketed = bucketed.localCheckpoint(eager=True)
    sums = sorted(
        (r["__bucket"], int(r["s"] or 0))
        for r in bucketed.groupBy("__bucket")
        .agg(F.sum(F.col(value_col).cast("long")).alias("s"))
        .collect()
    )
    offsets, running = [], 0
    for bucket, s in sums:
        offsets.append((bucket, running))
        running += s
    offsets_df = spark.createDataFrame(
        offsets or [(0, 0)], "__bucket INT, __offset BIGINT"
    )
    w = (
        Window.partitionBy("__bucket")
        .orderBy(order_key, *tiebreaks)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running_incl = F.sum(F.col(value_col).cast("long")).over(w)
    return (
        bucketed.join(F.broadcast(offsets_df), "__bucket")
        .withColumn(
            out_col,
            (running_incl + F.col("__offset") - F.col(value_col)).cast("long"),
        )
        .drop("__bucket", "__offset")
    )
