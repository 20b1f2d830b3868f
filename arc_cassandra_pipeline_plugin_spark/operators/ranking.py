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
from arc_cassandra_pipeline_plugin_spark.functions import small_df


def _bucket_expr(bounds: list, order_key: str) -> F.Column:
    """``#{b in bounds : b < order_key}`` as a descending codegen'd CASE
    chain (r12 — the previous ``size(filter(array_of_literals, ...))``
    higher-order form is evaluated INTERPRETED per row, measured ~10 s of
    CPU per 150k-row bucketing pass; a when-chain over ≤31 sorted bounds
    compiles into whole-stage codegen). Identical semantics including
    NULL keys (no bound compares true → bucket 0)."""
    c = None
    k = len(bounds)
    for i, b in enumerate(reversed(bounds)):
        cond = F.lit(b) < F.col(order_key)
        c = F.when(cond, F.lit(k - i)) if c is None else c.when(cond, F.lit(k - i))
    return c.otherwise(F.lit(0)) if c is not None else F.lit(0)


def _bucketed_row_number(
    df: DataFrame,
    order_key: str,
    tiebreaks: list[str],
    out_col: str,
    num_buckets: int,
    accuracy: int,
) -> tuple[DataFrame, int]:
    """Two-phase exact global row_number; returns (ranked_df, total_rows)."""
    from pyspark.sql import Observation

    spark = df.sparkSession
    qs = [i / num_buckets for i in range(1, num_buckets)]
    row = df.select(F.percentile_approx(order_key, qs, accuracy).alias("b")).first()
    bounds = sorted(set(row["b"] or []))

    bucketed = df.withColumn("__bucket", _bucket_expr(bounds, order_key))
    # lineage cut: the final ranked output reads this; the per-bucket
    # counts RIDE the materialization via Observation (≤ num_buckets
    # map-side-combinable conditional sums — one job instead of
    # checkpoint + a groupBy-count action, r12)
    obs = Observation()
    n_b = len(bounds) + 1
    bucketed = bucketed.observe(
        obs,
        *[
            F.sum((F.col("__bucket") == i).cast("long")).alias(f"n{i}")
            for i in range(n_b)
        ],
    ).localCheckpoint(eager=True)
    vals = obs.get
    offsets, running = [], 0
    for bucket in range(n_b):
        offsets.append((bucket, running))
        running += int(vals[f"n{bucket}"] or 0)
    offsets_df = small_df(spark, offsets or [(0, 0)], "__bucket INT, __offset BIGINT")

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
    bounds: list | None = None,
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
    if bounds is None:
        # the boundary pass evaluates df's full lineage just to sketch the
        # leading key; callers whose input is an expensive projection (e.g.
        # a tokenize) can pass ``bounds`` sketched from a CHEAPER frame —
        # boundary placement only affects bucket balance, never the exact
        # result (strict-comparison bucketing + within-bucket tiebreaks)
        qs = [i / num_buckets for i in range(1, num_buckets)]
        row = df.select(
            F.percentile_approx(order_key, qs, accuracy).alias("b")
        ).first()
        bounds = row["b"] or []
    bounds = sorted(set(bounds))
    bucketed = df.withColumn("__bucket", _bucket_expr(bounds, order_key))
    # per-bucket totals ride the checkpoint materialization (Observation,
    # ≤ num_buckets exact-long conditional sums) — one job instead of
    # checkpoint + a groupBy-sum action (r12); codegen'd CASE bucketing
    # replaces the interpreted higher-order filter, see _bucket_expr
    from pyspark.sql import Observation

    obs = Observation()
    n_b = len(bounds) + 1
    bucketed = bucketed.observe(
        obs,
        *[
            F.sum(
                F.when(F.col("__bucket") == i, F.col(value_col).cast("long"))
                .otherwise(F.lit(0))
            ).alias(f"s{i}")
            for i in range(n_b)
        ],
    ).localCheckpoint(eager=True)
    vals = obs.get
    offsets, running = [], 0
    for bucket in range(n_b):
        offsets.append((bucket, running))
        running += int(vals[f"s{bucket}"] or 0)
    offsets_df = small_df(spark,
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


def _np_inversions(a) -> int:
    """Exact inversion count of a sequence (pairs i<j with a[i] > a[j]) by
    vectorized merge-sort: O(m log^2 m), numpy throughout — the per-group
    kernel of :func:`count_inversions`. Values must be pairwise distinct
    within the places it is applied (permutation ranks)."""
    import numpy as np

    a = np.asarray(a, dtype=np.int64)

    def rec(x):
        if len(x) < 2:
            return 0, x
        mid = len(x) // 2
        li, ls = rec(x[:mid])
        ri, rs = rec(x[mid:])
        # pairs (i in left, j in right) with left_i > right_j
        cross = int((len(ls) - np.searchsorted(ls, rs, side="right")).sum())
        merged = np.empty(len(x), dtype=np.int64)
        merged[:] = np.sort(x, kind="mergesort")  # values only; order done
        return li + ri + cross, merged

    return rec(a)[0]


def count_inversions(
    df: DataFrame,
    rx_col: str,
    ry_col: str,
    num_buckets: int = 32,
) -> int:
    """Exact global inversion count: pairs with ``rx_i < rx_j`` and
    ``ry_i > ry_j``, where both columns are PERMUTATION ranks (1..n, each
    value unique — produce them with :func:`global_row_number`). The
    primitive behind Kendall's tau: tau_a = 1 - 4*inv / (n(n-1)).

    Never materializes pairs. Grid decomposition — bucket each rank axis
    into ``num_buckets`` fixed-width ranges, then:

    1. **Coarse term** (driver math): for cell pairs in different rx
       buckets AND different ry bands, order on both axes is certain, so
       the inversion count is a product fold over the O(B^2) cell
       histogram — computed from suffix sums in O(B^2) on the driver.
    2. **Same-rx-bucket term**: all pairs inside one rx bucket are
       resolved by a per-bucket merge-sort kernel (``applyInPandas``,
       ~n/B rows per group — bounded memory).
    3. **Same-ry-band, different-rx-bucket term**: per-band kernel counts
       the band's inversions under rx order, minus its within-rx-bucket
       inversions (those belong to term 2) — again ~n/B rows per group.

    Total: one histogram aggregation + two grouped kernels = three
    shuffles of (rank, rank) pairs only, O(B^2) driver state. At 10^12
    rows pick num_buckets ~ n/50M so kernels stay in executor memory."""
    import math as _math

    # lineage cut FIRST: the (rx, ry) input is typically a self-join of two
    # global_row_number branches over one source; checkpointing before any
    # action sidesteps Spark's self-join attribute rebinding (and the
    # kernels below re-read it anyway)
    d0 = df.select(
        F.col(rx_col).alias("rx"), F.col(ry_col).alias("ry")
    ).localCheckpoint(eager=True)
    n = d0.count()
    if n < 2:
        return 0
    bw = _math.ceil(n / num_buckets) or 1
    d = d0.select(
        "rx",
        "ry",
        ((F.col("rx") - 1) / bw).cast("int").alias("bx"),
        ((F.col("ry") - 1) / bw).cast("int").alias("by"),
    )

    # 1) coarse: cells H[bx][by]; pairs (cell1, cell2) with bx1 < bx2 and
    # by1 > by2 are all inversions. fold with suffix sums over by.
    cells = {(r["bx"], r["by"]): r["n"] for r in
             d.groupBy("bx", "by").agg(F.count(F.lit(1)).alias("n")).collect()}
    bxs = sorted({b for b, _ in cells})
    bys = sorted({b for _, b in cells})
    coarse = 0
    # running per-by totals of all buckets with smaller bx; per bx pass,
    # suffix sums make "seen rows with by strictly greater" an O(1) lookup
    # (O(B^2) total driver work)
    by_index = {b: i for i, b in enumerate(bys)}
    seen = [0] * len(bys)
    for bx in bxs:
        suffix = [0] * (len(bys) + 1)
        for i in range(len(bys) - 1, -1, -1):
            suffix[i] = suffix[i + 1] + seen[i]
        for by in bys:
            c = cells.get((bx, by), 0)
            if c:
                coarse += c * suffix[by_index[by] + 1]
        for by in bys:
            c = cells.get((bx, by), 0)
            if c:
                seen[by_index[by]] += c

    # 2) + 3) grouped kernels
    import pandas as pd  # noqa: F401 — applyInPandas dependency

    def bucket_kernel(pdf):
        import pandas as pd

        pdf = pdf.sort_values("rx")
        return pd.DataFrame({"inv": [_np_inversions(pdf["ry"].to_numpy())]})

    def band_kernel(pdf):
        import pandas as pd

        pdf = pdf.sort_values("rx")
        total = _np_inversions(pdf["ry"].to_numpy())
        within = sum(
            _np_inversions(g["ry"].to_numpy())
            for _, g in pdf.groupby("bx", sort=False)
        )
        return pd.DataFrame({"inv": [total - within]})

    bucket_inv = (
        d.groupBy("bx")
        .applyInPandas(bucket_kernel, "inv long")
        .agg(F.sum("inv"))
        .first()[0]
        or 0
    )
    band_inv = (
        d.groupBy("by")
        .applyInPandas(band_kernel, "inv long")
        .agg(F.sum("inv"))
        .first()[0]
        or 0
    )
    return int(coarse) + int(bucket_inv) + int(band_inv)


def global_rank_ties(
    df: DataFrame,
    key_col: str,
    num_buckets: int = 32,
) -> DataFrame:
    """Exact global ``rank()`` / ``dense_rank()`` / ``cume_dist()`` OVER
    (ORDER BY key) — the ties-respecting window family — computed without
    a single-partition window, as per-distinct-key results.

    Ties make these pure functions of the KEY HISTOGRAM: rank(key) =
    1 + rows with a strictly smaller key, dense_rank(key) = position of
    the key among distinct keys, cume_dist(key) = rows <= key / n. So one
    map-side-combinable groupBy collapses the corpus to its key domain,
    the exclusive :func:`global_prefix_sum` over counts gives rank and
    cume_dist, and :func:`global_row_number` over the (already tiny)
    distinct-key frame gives dense_rank. Join the result back on the key
    to decorate rows; the heavy input is scanned ONCE.

    Returns one row per distinct key: (key, n_rows, rank, dense_rank,
    cume_micro) with cume_dist in truncated integer micro-units."""
    from pyspark.sql import Observation

    g = df.groupBy(F.col(key_col).alias("__k")).agg(
        F.count(F.lit(1)).cast("long").alias("__cnt")
    )
    # materialize the key histogram ONCE, with the total row count riding
    # the same job (r12): previously the un-checkpointed groupBy recomputed
    # the corpus aggregation inside the prefix-sum's sketch pass, its
    # checkpoint, the row-number twin of both, AND a df.count() — five
    # corpus-sized passes for one histogram. n == sum of per-key counts
    # (NULL keys group and count like any other), so the count action
    # folds away exactly.
    obs = Observation()
    g = g.observe(obs, F.sum("__cnt").alias("n")).localCheckpoint(eager=True)
    ps = global_prefix_sum(
        g, "__k", "__cnt", out_col="__lt", num_buckets=num_buckets
    )
    dr = global_row_number(
        g.select("__k"), "__k", [], out_col="__dr", num_buckets=num_buckets
    )
    n = int(obs.get["n"] or 0)
    return (
        ps.join(dr, "__k")
        .select(
            F.col("__k").alias(key_col),
            F.col("__cnt").alias("n_rows"),
            (F.col("__lt") + 1).cast("long").alias("rank"),
            F.col("__dr").cast("long").alias("dense_rank"),
            F.expr(f"cast((__lt + __cnt) * 1000000 div {n} as bigint)").alias(
                "cume_micro"
            ),
        )
    )
