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
    # long form (id, j, x): one explode, reused by both products per round
    e = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.col(vec_col)).alias("_p", "_xf"),
    ).select(
        "_id", (F.col("_p") + 1).alias("j"), F.col("_xf").cast("double").alias("x")
    ).localCheckpoint(eager=True)

    v = spark.createDataFrame([(1, 1.0)], "j INT, val DOUBLE")
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
        F.posexplode(F.transform("xs", lambda x: F.round(x, _VSCALE))).alias(
            "_p", "v"
        ),
    ).select("g", (F.col("_p") + 1).alias("j"), "v")
    cent = to_cent(seed.collect())
    counts: dict[int, int] = {}
    upd = None
    for _ in range(iters):
        dist_structs = []
        for g in range(k):
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
            dist_structs.append(
                F.struct(d_g.alias("dist"), F.lit(g).alias("g"))
            )
        assigned = base.select(
            "_id", "xs", F.array_min(F.array(*dist_structs)).getField("g").alias("g")
        )
        upd = (
            assigned.select("g", F.posexplode("xs").alias("_p", "x"))
            .select("g", (F.col("_p") + 1).alias("j"), "x")
            .groupBy("g", "j")
            .agg(
                F.round(
                    F.sum(F.round(F.col("x"), _SCALE).cast(dec)).cast("double")
                    / F.count(F.lit(1)),
                    _VSCALE,
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
    return spark.createDataFrame(
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
  SELECT CAST(id AS INT) AS g, j, round(x, {_VSCALE}) AS v
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
         round(CAST(SUM(CAST(round(e.x, {_SCALE}) AS {dec})) AS DOUBLE)
               / COUNT(*), {_VSCALE}) AS mv
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
