"""Distributed linear algebra over embedding columns: power iteration for
the top principal component.

The iteration never materializes the d×d Gram matrix: each round is two
matrix-vector products expressed as joins + aggregations over the long-form
(vec_id, j, x) view of the embedding column —

    s_i = x_i · v        (row scores:   join v on component, agg by vec_id)
    u   = Σ_i s_i x_i    (new direction: join s on vec_id, agg by component)
    v'  = u / ||u||      (normalize:    one O(d) aggregate, broadcast back)

so the shuffles carry (vec_id)- and (j)-keyed partial sums — map-side
combinable, d groups on the component side — and the only small state is
the d-vector itself. This is the 100 TB shape: no driver collect of data,
no O(d²) anything.

Cross-engine determinism follows the pagerank discipline
(operators/graph.py): every per-row product is rounded to a fixed scale
(row-deterministic double arithmetic), summed as exact DECIMAL
(order-free), and each round's direction vector is re-rounded after the
normalize — so the iterate is bit-identical regardless of partitioning, on
Spark and DuckDB alike. The oracle is generated from the SAME constants by
:func:`power_iteration_oracle_sql`, unrolling the rounds as CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from arc_cassandra_pipeline_plugin_spark.functions import checkpoint_sized, small_df

#: fixed-point scale for per-row products (dot-product and outer terms)
_SCALE = 12
#: scale of each round's normalized direction vector
_VSCALE = 9


def power_iteration_top_component(
    df: DataFrame,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top principal direction (un-centered: the top right-singular vector
    of the data matrix) after ``iters`` fixed power-iteration rounds from
    the deterministic start ``v0 = e_1``. Returns (j, loading) with
    1-based component index — d rows.

    Fixed rounds rather than convergence detection keep the plan static
    and the oracle unrollable; callers wanting convergence can compare
    successive outputs. Sign follows the e_1 start (flip externally if a
    convention is needed). For the covariance/PCA direction proper,
    mean-center the vectors first (a broadcast of the d-dim column means).
    """
    spark = df.sparkSession
    # long form (id, j, x): one explode, reused by both products per round.
    # NOT checkpoint_sized: the per-round decimal(30,12) aggregations are
    # CPU-dense relative to their bytes, so narrowing by the 64 MB byte
    # target serializes real compute (A/B'd: 2.9 s -> 7.5 s at sf0.01) —
    # the byte rule only fits frames whose downstream work is byte-shaped
    e = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.col(vec_col)).alias("_p", "_xf"),
    ).select(
        "_id", (F.col("_p") + 1).alias("j"), F.col("_xf").cast("double").alias("x")
    ).localCheckpoint(eager=True)

    v = small_df(spark, [(1, 1.0)], "j INT, val DOUBLE")
    dec = f"decimal(30,{_SCALE})"
    for _ in range(iters):
        s = (
            e.join(F.broadcast(v), "j")
            .groupBy("_id")
            .agg(
                F.sum(F.round(F.col("x") * F.col("val"), _SCALE).cast(dec))
                .cast("double")
                .alias("s")
            )
        )
        u = (
            e.join(s, "_id")
            .groupBy("j")
            .agg(
                F.sum(F.round(F.col("x") * F.col("s"), _SCALE).cast(dec))
                .cast("double")
                .alias("u")
            )
        )
        norm = u.agg(
            F.sqrt(
                F.sum(F.round(F.col("u") * F.col("u"), _SCALE).cast(dec)).cast("double")
            ).alias("_norm")
        )
        v = u.crossJoin(F.broadcast(norm)).select(
            "j", F.round(F.col("u") / F.col("_norm"), _VSCALE).alias("val")
        )
    return v.select("j", F.col("val").alias("loading"))


def power_iteration_oracle_sql(
    iters: int = 3,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """DuckDB oracle for :func:`power_iteration_top_component`: the same
    rounds unrolled as CTEs from the same rounding constants."""
    dec = f"DECIMAL(30,{_SCALE})"
    ctes = [
        f"""e AS (
  SELECT {id_col} AS id,
         unnest(range(1, len({vec_col}) + 1)) AS j,
         unnest({vec_col})::DOUBLE AS x
  FROM {table})""",
        "v0 AS (SELECT 1 AS j, 1.0 AS val)",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"""s{t} AS (
  SELECT id, CAST(SUM(CAST(round(e.x * v.val, {_SCALE}) AS {dec})) AS DOUBLE) AS s
  FROM e JOIN v{t - 1} v USING (j) GROUP BY id)"""
        )
        ctes.append(
            f"""u{t} AS (
  SELECT j, CAST(SUM(CAST(round(e.x * s{t}.s, {_SCALE}) AS {dec})) AS DOUBLE) AS u
  FROM e JOIN s{t} USING (id) GROUP BY j)"""
        )
        ctes.append(
            f"""n{t} AS (
  SELECT sqrt(CAST(SUM(CAST(round(u * u, {_SCALE}) AS {dec})) AS DOUBLE)) AS nrm
  FROM u{t})"""
        )
        ctes.append(
            f"""v{t} AS (
  SELECT j, round(u / nrm, {_VSCALE}) AS val FROM u{t}, n{t})"""
        )
    body = ",\n".join(ctes)
    return f"WITH {body}\nSELECT CAST(j AS INT) AS j, val AS loading FROM v{iters}"


def _round_vscale(c):
    """9-dp rounding as ``floor(q*1e9 + 0.5)/1e9`` — exactly-rounded IEEE
    ops only, so Spark and DuckDB agree bit-for-bit on ANY input (the SQL
    twin is ``floor(q * 1000000000.0 + 0.5) / 1000000000.0``). Plain
    ``round(q, 9)`` diverges between Spark (exact-binary HALF_UP) and
    DuckDB (scaled-float) when q sits within 1 ulp of a half boundary —
    observed once in 512 centroid coordinates at sf0.1 (r7)."""
    return (
        F.floor(c * F.lit(1000000000.0) + F.lit(0.5)).cast("double")
        / F.lit(1000000000.0)
    )


def kmeans_lloyd(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Distributed k-means (Lloyd's algorithm), ``iters`` synchronous
    rounds from the deterministic seed "centroid g = the vector with id g"
    — returns the final centroids in long form with member counts:
    (cluster_id, j, loading, n_members), k·d rows.

    Each round is the classic two-step, Spark-first:

      assign:  dist(i,g) = Σ_j (x_ij − v_gj)²  — the k·d centroid table
               BROADCASTS onto the long-form view (never a shuffle of the
               corpus), per-(i,g) sums are exact DECIMAL of fixed-scale
               rounded squares, and the argmin is a (dist, g)-ordered
               row_number window partitioned by vector id (k rows per
               key — bounded state, deterministic tiebreak on g);
      update:  new centroid = per-(g, j) mean — one map-side-combinable
               aggregate keyed by (g, j); empty clusters keep their
               previous centroid via the left-join coalesce.

    Cross-engine determinism follows the power-iteration discipline: every
    distance term and every summed coordinate is rounded to the shared
    fixed scale and summed as exact DECIMAL (order-free), distances
    compare AS DECIMAL (argmin flips are impossible), and each round's
    centroids re-round after the single float division. The oracle
    (:func:`kmeans_oracle_sql`) unrolls the same rounds from the same
    constants.

    The seed/mean 9-dp rounding is ``floor(q*1e9 + 0.5)/1e9``
    (:func:`_round_vscale`) rather than ``round(q, 9)``: the r7 sf0.1
    sweep caught a mean landing within 1 ulp of a half boundary where
    Spark's exact-BigDecimal HALF_UP and DuckDB's scaled-float rounding
    disagree by 1e-9. The floor form is composed ONLY of exactly-rounded
    IEEE ops (multiply, add, floor), so identical inputs give
    bit-identical outputs on any engine — boundary behavior becomes a
    defined convention (half-toward-+infinity) instead of an
    implementation detail.

    Physical plan: the centroid table is O(k·d) DRIVER state embedded as
    literals — the ANN-module convention (`_centroids_kmeans`), and what
    any real system broadcasts — so the assignment step is a pure per-row
    projection (a decimal `aggregate` over `zip_with` per centroid + an
    `array_min` argmin): ZERO shuffle. The only shuffle per round is the
    (g, j) centroid update, map-side combinable down to k·d groups. The
    first version instead broadcast-joined a centroid DataFrame onto the
    exploded view and shuffled n·k decimal distance rows per round —
    A/B-measured a WASH at sf0.1/local[32] (3.44 s vs 3.53 s: toy scale
    hides exchange cost behind the per-element decimal evaluation), but
    the n·k-row per-round exchange is exactly what degenerates on a
    multi-rack cluster, so the shuffle-free assignment is kept. All
    arithmetic (seed rounding, means) executes IN SPARK; the driver only
    ferries the rounded k·d values between rounds."""
    dec = f"decimal(30,{_SCALE})"
    base = df.select(
        F.col(id_col).alias("_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("xs"),
    ).localCheckpoint(eager=True)

    def to_cent(rows):
        by_g = {}
        for r in rows:
            by_g.setdefault(r["g"], {})[r["j"]] = r["v"]
        return {g: [m[j] for j in sorted(m)] for g, m in by_g.items()}

    seed = base.filter(F.col("_id") < k).select(
        F.col("_id").cast("int").alias("g"),
        F.posexplode(F.transform("xs", lambda x: _round_vscale(x))).alias(
            "_p", "v"
        ),
    ).select("g", (F.col("_p") + 1).alias("j"), "v")
    cent = to_cent(seed.collect())
    counts: dict[int, int] = {}
    upd = None
    for _ in range(iters):
        assigned = base.select(
            "_id", "xs", _decimal_argmin_expr(cent).alias("g")
        )
        upd = (
            assigned.select("g", F.posexplode("xs").alias("_p", "x"))
            .select("g", (F.col("_p") + 1).alias("j"), "x")
            .groupBy("g", "j")
            .agg(
                _round_vscale(
                    F.sum(F.round(F.col("x"), _SCALE).cast(dec)).cast("double")
                    / F.count(F.lit(1))
                ).alias("v"),
                F.count(F.lit(1)).alias("n"),
            )
        )
        rows = upd.collect()  # O(k·d) rows — centroid state, never data
        new_cent = to_cent(rows)
        counts = {g: 0 for g in range(k)}
        for r in rows:
            if r["j"] == 1:
                counts[r["g"]] = r["n"]
        # empty clusters carry their previous centroid forward
        cent = {g: new_cent.get(g, cent[g]) for g in range(k)}
    spark = df.sparkSession
    out = [
        (g, j + 1, cent[g][j], counts.get(g, 0))
        for g in range(k)
        for j in range(len(cent[g]))
    ]
    return small_df(spark, 
        out, "cluster_id int, j int, loading double, n_members bigint"
    )


def kmeans_oracle_sql(
    k: int = 8,
    iters: int = 3,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """DuckDB oracle for :func:`kmeans_lloyd`: the same rounds unrolled as
    CTEs from the same rounding constants."""
    dec = f"DECIMAL(30,{_SCALE})"
    ctes = [
        f"""e AS (
  SELECT {id_col} AS id,
         unnest(range(1, len({vec_col}) + 1)) AS j,
         unnest({vec_col})::DOUBLE AS x
  FROM {table})""",
        f"""c0 AS (
  SELECT CAST(id AS INT) AS g, j,
         floor(x * 1000000000.0 + 0.5) / 1000000000.0 AS v
  FROM e WHERE id < {k})""",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"""d{t} AS (
  SELECT e.id, c.g,
         SUM(CAST(round((e.x - c.v) * (e.x - c.v), {_SCALE}) AS {dec})) AS dist
  FROM e JOIN c{t - 1} c USING (j) GROUP BY e.id, c.g)"""
        )
        ctes.append(
            f"""a{t} AS (
  SELECT id, g FROM (
    SELECT id, g, row_number() OVER (PARTITION BY id ORDER BY dist, g) AS rn
    FROM d{t}) WHERE rn = 1)"""
        )
        ctes.append(
            f"""m{t} AS (
  SELECT a.g, e.j,
         floor(CAST(SUM(CAST(round(e.x, {_SCALE}) AS {dec})) AS DOUBLE)
               / COUNT(*) * 1000000000.0 + 0.5) / 1000000000.0 AS mv
  FROM e JOIN a{t} a USING (id) GROUP BY a.g, e.j)"""
        )
        ctes.append(
            f"""c{t} AS (
  SELECT p.g, p.j, coalesce(m.mv, p.v) AS v
  FROM c{t - 1} p LEFT JOIN m{t} m ON m.g = p.g AND m.j = p.j)"""
        )
    ctes.append(
        f"cnt AS (SELECT g, count(*) AS n FROM a{iters} GROUP BY g)"
    )
    body = ",\n".join(ctes)
    return f"""WITH {body}
SELECT CAST(c.g AS INT) AS cluster_id, CAST(c.j AS INT) AS j, c.v AS loading,
       CAST(coalesce(cnt.n, 0) AS BIGINT) AS n_members
FROM c{iters} c LEFT JOIN cnt ON cnt.g = c.g"""


def _decimal_argmin_expr(cent: dict):
    """The decimal-exact nearest-centroid expression over an ``xs``
    double-array column: per centroid a fixed-scale-rounded decimal fold
    of squared coordinate gaps, argmin via array_min over (dist, g)
    structs — ties break to the lowest g. Shared by :func:`kmeans_lloyd`
    and :func:`kmeans_assign_decimal` (the pytest surface that pins the
    float64 fast path's assignments to the decimal path's)."""
    dec = f"decimal(30,{_SCALE})"
    dist_structs = []
    for g in sorted(cent):
        lits = F.array(*[F.lit(v) for v in cent[g]])
        d_g = F.aggregate(
            F.zip_with(
                F.col("xs"),
                lits,
                lambda x, v: F.round((x - v) * (x - v), _SCALE).cast(dec),
            ),
            F.lit(0).cast(dec),
            lambda acc, y: (acc + y).cast(dec),
        )
        dist_structs.append(F.struct(d_g.alias("dist"), F.lit(g).alias("g")))
    return F.array_min(F.array(*dist_structs)).getField("g")


def kmeans_assign_decimal(
    df: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector decimal-exact assignment against a fixed centroid
    matrix (any (k, d) nested sequence) — returns (_id, g)."""
    cent = {g: list(map(float, row)) for g, row in enumerate(centroids)}
    base = df.select(
        F.col(id_col).cast("long").alias("_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("xs"),
    )
    return base.select("_id", _decimal_argmin_expr(cent).alias("g"))


def kmeans_lloyd_fast(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Float64 Lloyd's algorithm via ``mapInArrow`` — the THROUGHPUT twin
    of :func:`kmeans_lloyd` (same seeds, same per-round centroid rounding
    to ``_VSCALE``, same (dist, argmin-first) tiebreak, same empty-cluster
    carry-forward), trading the decimal-exact distance algebra for
    vectorized numpy batch kernels.

    Why both exist: the decimal path is the ORACLE-certified surface (its
    distance sums are order-free, so every engine/run agrees bit-for-bit
    on centroids); this path is what a production pipeline runs. Its
    centroids can drift from the decimal path in late decimals (float
    sums are partition-order-dependent), but the cluster ASSIGNMENTS
    coincide except on ~1e-9-level distance ties — the assignment-equality
    pytest and the integer-only certified query
    (``embeddings_kmeans_fast``: per-cluster counts + id checksums, both
    pure functions of the assignment) pin exactly the part that is stable.

    Scale shape per round — strictly better than the decimal path:
    assignment + partial aggregation happen INSIDE one Arrow kernel
    (per batch: argmin over k squared distances, then per-cluster
    (n, Σ id, Σ x) partials), so the shuffle carries O(batches × k)
    partial rows instead of n·d exploded coordinates; the final combine
    is one map-side-combinable (g, j) aggregation down to k·d rows of
    driver state. Centroids stay O(k·d) literals on the driver.
    """
    import numpy as np

    # measured-size checkpoint (functions.checkpoint_sized): every Lloyd
    # round re-reads this frame through an Arrow kernel, and per-task fixed
    # cost (scheduler + Arrow batch setup) dominates when a small corpus is
    # spread over every core — measured 0.44-0.81 s/round at bench scale
    # for ~40 KB/task of real work. At real scale the measured size keeps
    # the width, so kernel parallelism is unchanged where it matters.
    base = checkpoint_sized(
        df.select(
            F.col(id_col).cast("long").alias("_id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("xs"),
        )
    )
    seed_rows = (
        base.filter(F.col("_id") < k)
        .select("_id", F.transform("xs", lambda x: _round_vscale(x)).alias("v"))
        .collect()
    )
    d = len(seed_rows[0]["v"])
    cent = np.zeros((k, d), dtype=np.float64)
    for r in seed_rows:
        cent[int(r["_id"])] = r["v"]

    def make_kernel(C: "np.ndarray"):
        kk, dd = C.shape

        def kernel(batches):
            import numpy as np
            import pyarrow as pa

            for b in batches:
                if b.num_rows == 0:
                    continue
                ids = np.asarray(b.column(0), dtype=np.int64)
                X = np.asarray(b.column(1).flatten(), dtype=np.float64).reshape(
                    b.num_rows, dd
                )
                # per-pair Σ(x-c)² (not the expanded ‖x‖²-2xc+‖c‖² form):
                # closest ulp-parity with the decimal path's term-by-term
                # distances, so argmin agreement holds except true ties
                dist = np.empty((b.num_rows, kk), dtype=np.float64)
                for g in range(kk):
                    diff = X - C[g]
                    dist[:, g] = (diff * diff).sum(axis=1)
                assign = dist.argmin(axis=1)  # first minimum == lowest g
                gs, ns, id_sums, sums = [], [], [], []
                for g in np.unique(assign):
                    m = assign == g
                    gs.append(int(g))
                    ns.append(int(m.sum()))
                    id_sums.append(int(ids[m].sum()))
                    sums.append(X[m].sum(axis=0).tolist())
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(gs, pa.int32()),
                        pa.array(ns, pa.int64()),
                        pa.array(id_sums, pa.int64()),
                        pa.array(sums, pa.list_(pa.float64())),
                    ],
                    names=["g", "n", "id_sum", "s"],
                )

        return kernel

    last_stats = None
    for _ in range(iters):
        partials = base.mapInArrow(
            make_kernel(cent.copy()),
            "g int, n long, id_sum long, s array<double>",
        )
        per_gj = (
            partials.select("g", "n", "id_sum", F.posexplode("s").alias("_p", "sj"))
            .groupBy("g", (F.col("_p") + 1).alias("j"))
            .agg(
                # Σn per (g, j) re-sums each batch's n once per coordinate,
                # so it equals the cluster's member count; rounding happens
                # IN SPARK via the shared floor-form 9-dp convention
                # (never Python round() — banker's)
                _round_vscale(F.sum("sj") / F.sum("n")).alias("v"),
                F.sum("n").alias("n"),
                F.sum("id_sum").alias("id_sum"),
            )
        )
        rows = per_gj.collect()  # O(k·d) — centroid state, never data
        new_cent = cent.copy()
        stats: dict[int, tuple[int, int]] = {}
        for r in rows:
            new_cent[r["g"]][r["j"] - 1] = r["v"]
            if r["j"] == 1:
                stats[r["g"]] = (r["n"], r["id_sum"])
        cent = new_cent  # clusters absent from rows keep previous centroid
        last_stats = stats

    spark = df.sparkSession
    # only clusters that won members in the LAST round appear — mirroring
    # the oracle's GROUP BY over the final assignment
    out = [
        (g, int(n), int(id_sum))
        for g, (n, id_sum) in sorted((last_stats or {}).items())
    ]
    return small_df(spark, 
        out, "cluster_id int, n_members bigint, id_checksum bigint"
    )


def kmeans_assign_fast(df, centroids, id_col: str = "vec_id", vec_col: str = "embedding"):
    """Per-vector float64 assignment against a fixed centroid matrix
    (numpy (k, d)) — one Arrow kernel pass, returns (_id, g)."""
    import numpy as np
    import pyarrow as pa  # noqa: F401 — kernel dependency, fail fast here

    C = np.asarray(centroids, dtype=np.float64)
    kk, dd = C.shape
    base = df.select(
        F.col(id_col).cast("long").alias("_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("xs"),
    )

    def kernel(batches):
        import numpy as np
        import pyarrow as pa

        for b in batches:
            if b.num_rows == 0:
                continue
            ids = np.asarray(b.column(0), dtype=np.int64)
            X = np.asarray(b.column(1).flatten(), dtype=np.float64).reshape(
                b.num_rows, dd
            )
            dist = np.empty((b.num_rows, kk), dtype=np.float64)
            for g in range(kk):
                diff = X - C[g]
                dist[:, g] = (diff * diff).sum(axis=1)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()),
                 pa.array(dist.argmin(axis=1).astype("int32"))],
                names=["_id", "g"],
            )

    return base.mapInArrow(kernel, "_id long, g int")


def kmeans_fast_oracle_sql(
    k: int = 8,
    iters: int = 3,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """DuckDB oracle for the ``embeddings_kmeans_fast`` query: the DECIMAL
    rounds (provably engine-identical) reduced to the assignment-derived
    integers the float path certifies — per-cluster member count and
    member-id checksum of the LAST round's assignment. The float path
    matches because assignments agree with the decimal path except on
    exact distance ties (see :func:`kmeans_lloyd_fast`)."""
    full = kmeans_oracle_sql(k=k, iters=iters, table=table, vec_col=vec_col, id_col=id_col)
    # reuse the unrolled CTE chain, swap the final projection
    body = full[: full.rindex("\nSELECT ")]
    return f"""{body}
SELECT CAST(g AS INT) AS cluster_id,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(sum(id) AS BIGINT) AS id_checksum
FROM a{iters} GROUP BY g"""


def covariance_matrix(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact d×d covariance (upper triangle) of an embedding column — the
    PCA/whitening building block for the SMALL-d regime (d up to a few
    thousand), complementary to :func:`power_iteration_top_component`
    which exists precisely to avoid this materialization when d is huge.

    Shape: a chained double ``posexplode`` turns each row into its
    d(d+1)/2 upper-triangle outer-product terms with NO join (pure codegen
    projection), then one ``groupBy(i, j)`` whose map-side combine reduces
    shuffle volume to d²/2 rows PER PARTITION regardless of corpus size —
    the canonical distributed Gram-matrix shape. Per-dimension sums ride a
    second linear aggregate; the final covariance assembly joins three
    O(d²)-sized frames (AQE broadcasts them).

    Cross-engine determinism: every product is computed in double from the
    float32 inputs, rounded to 6 dp and summed as exact DECIMAL (order-
    free); the covariance ``E[xy] - E[x]E[y]`` assembly is then identical
    double arithmetic on both engines. Output dims are 1-based.
    """
    a = df.select(
        id_col,
        vec_col,
        F.posexplode(vec_col).alias("i0", "xi"),
    )
    pairs = a.select(
        id_col,
        "i0",
        "xi",
        F.posexplode(vec_col).alias("j0", "xj"),
    ).filter(F.col("j0") >= F.col("i0"))
    prod = (
        F.round(F.col("xi").cast("double") * F.col("xj").cast("double"), 6)
        .cast("decimal(18,6)")
        .alias("p")
    )
    sxy = pairs.select("i0", "j0", prod).groupBy("i0", "j0").agg(
        F.sum("p").alias("sxy")
    )
    dim_sums = a.select(
        "i0",
        F.round(F.col("xi").cast("double"), 6).cast("decimal(18,6)").alias("x"),
    ).groupBy("i0").agg(F.sum("x").alias("sx"), F.count(F.lit(1)).alias("n"))
    si = dim_sums.select("i0", F.col("sx").alias("sx_i"), "n")
    sj = dim_sums.select(F.col("i0").alias("j0"), F.col("sx").alias("sx_j"))
    nd = F.col("n").cast("double")
    return (
        sxy.join(F.broadcast(si), "i0")
        .join(F.broadcast(sj), "j0")
        .select(
            (F.col("i0") + 1).cast("int").alias("dim_i"),
            (F.col("j0") + 1).cast("int").alias("dim_j"),
            # + 0.0 normalizes IEEE negative zero: round() can yield -0.0
            # from tiny negative covariances, and -0.0 vs 0.0 hash-compare
            # differently even though they compare ==; both engines apply
            # the same normalization
            (
                F.round(
                    F.col("sxy").cast("double") / nd
                    - (F.col("sx_i").cast("double") / nd)
                    * (F.col("sx_j").cast("double") / nd),
                    6,
                )
                + F.lit(0.0)
            ).alias("cov"),
        )
    )


def perceptron_train(
    df: DataFrame,
    rounds: int = 3,
    vec_col: str = "embedding",
    y_col: str = "y",
    id_col: str = "vec_id",
) -> DataFrame:
    """Distributed batch-perceptron training: ``rounds`` synchronous
    full-batch updates of a linear classifier w·x + b over quantized
    embeddings, labels in {+1, −1}. Returns the learned weight vector in
    long form — (d, w, mis_after) with d=0 the bias and d=1..dim the
    feature weights, plus the misclassified count under the final weights
    riding every row.

    The classic screen for "is this embedding space linearly separable on
    my label" — and the simplest member of the iterative gradient family
    (same fixed-point discipline as pagerank/k-means/power iteration).

    EXACT by construction: features quantize to integer milli-units
    (round(x·1000) — the only float op, identical fixed shape on both
    engines), so margins, update sums, and weights are all BIGINT — no
    accumulation-order or libm drift is possible anywhere in the iterate.

    Physical plan per round (the k-means convention): the weight vector is
    O(dim) DRIVER state embedded as literals, so the margin
    y·(b + Σ w_d x_d) is a pure per-row projection (integer `aggregate`
    over `zip_with`) — ZERO shuffle for assignment; the misclassified-set
    gradient is one posexplode + map-side-combinable groupBy(d) collapsing
    to dim+1 rows per partition before the exchange. Driver ferries
    O(dim) integers per round, never data. The oracle
    (:func:`perceptron_oracle_sql`) unrolls the same rounds from the same
    constants."""
    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(y_col).cast("bigint").alias("y"),
        F.expr(
            f"transform({vec_col}, "
            "v -> CAST(round(CAST(v AS DOUBLE) * 1000, 0) AS BIGINT))"
        ).alias("xq"),
    ).localCheckpoint(eager=True)
    first = base.select(F.size("xq").alias("n")).first()
    dim = int(first["n"])
    w = [0] * (dim + 1)  # w[0] = bias (feature x_0 = 1)

    def margin_expr() -> str:
        wlits = ", ".join(f"CAST({v} AS BIGINT)" for v in w[1:])
        return (
            f"y * (CAST({w[0]} AS BIGINT) + aggregate("
            f"zip_with(xq, array({wlits}), (a, b) -> a * b), "
            "CAST(0 AS BIGINT), (acc, v) -> acc + v))"
        )

    for _ in range(rounds):
        mis = base.where(F.expr(f"({margin_expr()}) <= 0"))
        upd = (
            mis.select(
                "y",
                F.posexplode(
                    F.concat(F.array(F.lit(1).cast("bigint")), F.col("xq"))
                ).alias("d", "x"),
            )
            .groupBy("d")
            .agg(F.sum(F.col("y") * F.col("x")).alias("du"))
            .collect()
        )
        for r in upd:
            w[int(r["d"])] += int(r["du"])
    mis_after = base.where(F.expr(f"({margin_expr()}) <= 0")).count()
    spark = df.sparkSession
    return small_df(spark, 
        [(d, int(w[d]), int(mis_after)) for d in range(dim + 1)],
        "d INT, w BIGINT, mis_after BIGINT",
    )


def perceptron_oracle_sql(base_sql: str, rounds: int = 3, dim: int = 64) -> str:
    """DuckDB oracle for :func:`perceptron_train`: the same full-batch
    rounds unrolled as CTEs from the same constants. ``base_sql`` must
    yield (vec_id, y, embedding) with y in {+1, −1}."""
    ctes = [
        f"pb AS ({base_sql})",
        """pxl AS (
  SELECT vec_id, y, d,
         CAST(round(CAST(embedding[d] AS DOUBLE) * 1000, 0) AS BIGINT) AS x
  FROM (SELECT vec_id, y, embedding,
               unnest(range(1, len(embedding) + 1)) AS d FROM pb)
  UNION ALL
  SELECT vec_id, y, 0 AS d, CAST(1 AS BIGINT) AS x FROM pb)""",
        f"pw0 AS (SELECT unnest(range(0, {dim + 1})) AS d,"
        " CAST(0 AS BIGINT) AS w)",
    ]
    for r in range(1, rounds + 1):
        prev = f"pw{r - 1}"
        ctes.append(
            f"""pm{r} AS (
  SELECT l.vec_id, l.y, sum(w.w * l.x) AS dot
  FROM pxl l JOIN {prev} w USING (d) GROUP BY 1, 2)"""
        )
        ctes.append(
            f"pmis{r} AS (SELECT vec_id FROM pm{r} WHERE y * dot <= 0)"
        )
        ctes.append(
            f"""pu{r} AS (
  SELECT d, CAST(sum(y * x) AS BIGINT) AS du
  FROM pxl JOIN pmis{r} USING (vec_id) GROUP BY d)"""
        )
        ctes.append(
            f"""pw{r} AS (
  SELECT w.d, w.w + coalesce(u.du, 0) AS w
  FROM {prev} w LEFT JOIN pu{r} u USING (d))"""
        )
    ctes.append(
        f"""pmf AS (
  SELECT l.vec_id, l.y, sum(w.w * l.x) AS dot
  FROM pxl l JOIN pw{rounds} w USING (d) GROUP BY 1, 2)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT CAST(d AS INT) AS d, CAST(w AS BIGINT) AS w,
       (SELECT CAST(count(*) AS BIGINT) FROM pmf WHERE y * dot <= 0)
         AS mis_after
FROM pw{rounds}"""
    )
