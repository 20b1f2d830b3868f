"""Time-series operators the reference lacks: as-of join, range join,
gap-based sessionization.

Each is a *composition of built-in DataFrame ops* (SURVEY.md §2B "Range /
as-of / interval joins — absent") — no Python in the data path, so the whole
thing stays in Catalyst's hands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the single right row with the same key
    and the greatest ``right_ts`` ≤ ``left_ts`` (``backward``; ``forward``
    is the least ``right_ts`` ≥ ``left_ts``).

    Implementation: union both sides tagged, one window sort per key carries
    the most recent right row forward, then filter to left rows. This is the
    classic single-shuffle formulation — shuffle volume is |L|+|R| on the
    join key, versus the naive range-join which explodes to |L|×|R| per key.
    Skewed keys can be salted upstream with the standard bucket trick.

    DuckDB's native ``ASOF JOIN`` certifies this operator in the oracle
    harness.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")

    lcols = [c for c in left.columns]
    rcols = [c for c in right.columns if c != on]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(
            f"asof_join output would have duplicate columns {sorted(overlap)}; "
            "rename one side first"
        )
    tagged_l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*lcols).alias("_l"),
        F.lit(None).cast(
            right.select(F.struct(*rcols).alias("s")).schema["s"].dataType.simpleString()
        ).alias("_r"),
    )
    tagged_r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(
            left.select(F.struct(*lcols).alias("s")).schema["s"].dataType.simpleString()
        ).alias("_l"),
        F.struct(*rcols).alias("_r"),
    )
    merged = tagged_l.unionByName(tagged_r)
    if direction == "backward":
        # right rows sort before left rows at equal ts so "at or before" includes ties
        w = (
            Window.partitionBy("_k")
            .orderBy(F.col("_ts").asc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    else:
        w = (
            Window.partitionBy("_k")
            .orderBy(F.col("_ts").desc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    carried = merged.withColumn("_match", F.last("_r", ignorenulls=True).over(w))
    out = carried.filter(F.col("_is_left") == 1).select(
        *[F.col("_l")[c].alias(c) for c in lcols],
        *[F.col("_match")[c].alias(c) for c in rcols],
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list,
) -> DataFrame:
    """Generic theta/range join — thin wrapper that exists to carry the scale
    guidance: always pair the range predicate with at least one equi-key so
    Catalyst plans a hash join with a post-filter instead of
    BroadcastNestedLoop/cartesian."""
    return left.join(right, on=on)


def proximity_pairs(
    df: DataFrame,
    ts_col: str = "ts",
    id_col: str = "event_id",
    tolerance_s: int = 300,
    payload_cols: tuple[str, ...] = (),
) -> DataFrame:
    """All (earlier, later) row pairs within ``tolerance_s`` seconds of
    each other — across the WHOLE table, no equi-key — without a cartesian
    product.

    A naive theta join on ``|tb - ta| <= tol`` has no equi-key, so Catalyst
    can only plan BroadcastNestedLoop/cartesian — a scale killer. The
    binned trick: bucket time at the tolerance width; for any qualifying
    pair ordered so ``tb >= ta``, the later row's bucket is the earlier
    row's bucket or the one after it. The earlier side therefore duplicates
    into (bucket, bucket+1), the join becomes a plain EQUI-join on the
    bucket, and the exact predicate is a residual filter. Each qualifying
    pair matches exactly once (the later bucket equals exactly one of the
    two probes), so no dedup pass is needed.

    Scale shape: shuffles 2|T| + |T| rows on the bucket key; the quadratic
    term is confined to rows sharing a bucket — and when a single
    tolerance window truly holds k rows, the OUTPUT is itself O(k²), so
    the work is output-bound, not an artifact. Pair ordering ties on equal
    timestamps break by id, keeping the pair list deterministic."""
    e = F.col(ts_col).cast("double")
    probe = df.select(
        F.col(id_col).alias("a_id"),
        F.col(ts_col).alias("a_ts"),
        *[F.col(c).alias(f"a_{c}") for c in payload_cols],
        F.explode(
            F.array(
                F.floor(e / tolerance_s).cast("long"),
                (F.floor(e / tolerance_s) + 1).cast("long"),
            )
        ).alias("__bucket"),
    )
    build = df.select(
        F.col(id_col).alias("b_id"),
        F.col(ts_col).alias("b_ts"),
        *[F.col(c).alias(f"b_{c}") for c in payload_cols],
        F.floor(e / tolerance_s).cast("long").alias("__bucket"),
    )
    later = (F.col("b_ts") > F.col("a_ts")) | (
        (F.col("b_ts") == F.col("a_ts")) & (F.col("b_id") > F.col("a_id"))
    )
    within = (
        F.col("b_ts").cast("double") - F.col("a_ts").cast("double")
    ) <= F.lit(float(tolerance_s))
    return probe.join(build, "__bucket").filter(later & within).drop("__bucket")


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    order_col: str = "event_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since the
    user's previous event exceeds ``gap_minutes``. lag → boundary flag →
    running sum = session index; one shuffle on the user key.

    Fully expressible in ANSI SQL (LAG + SUM OVER), so oracle-certified.
    The streaming twin is ``session_window`` in :mod:`..streaming`.
    ``order_col`` breaks timestamp ties so the running sum is total-order
    deterministic.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col(order_col).asc())
    gap = F.col(ts_col).cast("long") - F.lag(F.col(ts_col).cast("long")).over(w)
    new_session = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    return events.withColumn("is_new_session", new_session).withColumn(
        "session_id",
        F.sum("is_new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
