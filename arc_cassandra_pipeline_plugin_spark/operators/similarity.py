"""Similarity search over embedding columns (``array<float>``).

Two tiers, per the standard ANN playbook:

- :func:`brute_force_topk` — exact cosine top-k. At scale this is a
  broadcast of the (small) query set against a full scan of the corpus:
  no shuffle of the corpus, one narrow crossJoin stage, then a top-k
  window per query. Correctness baseline and the oracle-checked path.
- :func:`lsh_topk` — sign-random-projection LSH (a.k.a. SRP/SimHash for
  vectors): bucket by the sign-bit code of ``r`` random hyperplanes, probe
  only the query's bucket. Turns the corpus scan into a bucket-pruned scan;
  the hyperplanes are generated deterministically from a seed via md5 so
  runs are reproducible. Recall is tunable via code width / multi-probe.
- :func:`embedding_neardup_pairs` — all-pairs near-duplicate detection
  above a cosine threshold, blocked by LSH code to avoid the quadratic
  self-join at scale.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from arc_cassandra_pipeline_plugin_spark.functions import cosine_similarity, vec_double


def _unit(df: DataFrame, vec_col: str, out: str) -> DataFrame:
    v = vec_double(vec_col)
    return df.withColumn(out, v)


def _parallel_corpus(df: DataFrame) -> DataFrame:
    """Per-vector scoring/coding is the expensive projection — make sure it
    does not run in a single scan partition (see functions.ensure_parallelism)."""
    from arc_cassandra_pipeline_plugin_spark.functions import ensure_parallelism

    return ensure_parallelism(df)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k of ``corpus`` rows for each query row.

    ``queries`` is expected to be small (it is broadcast); the corpus is
    scanned once. Ranking uses the score rounded to 6 dp with the corpus id
    as tiebreak, making the result set fully deterministic across engines
    and float-summation orders. Self-matches are excluded.
    """
    q = _unit(queries, vec_col, "qv").select(
        F.col(id_col).alias("query_id"), "qv"
    )
    c = _unit(_parallel_corpus(corpus), vec_col, "cv").select(F.col(id_col).alias("match_id"), "cv")
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("match_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine_similarity(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "cosine", "rank")
    )


def range_search(
    corpus: DataFrame,
    queries: DataFrame,
    threshold: float = 0.2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """All corpus rows with cosine ≥ ``threshold`` of each query row — the
    radius-query twin of :func:`brute_force_topk` (top-k bounds the output
    count, range search bounds the similarity; retrieval pipelines need
    both). Same scale shape: broadcast query set, one corpus scan, no
    corpus shuffle. The threshold compares against the 6-dp-rounded score,
    so the boundary set is deterministic across engines and summation
    orders. Self-matches are excluded."""
    q = _unit(queries, vec_col, "qv").select(F.col(id_col).alias("query_id"), "qv")
    c = _unit(_parallel_corpus(corpus), vec_col, "cv").select(
        F.col(id_col).alias("match_id"), "cv"
    )
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("match_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine_similarity(F.col("qv"), F.col("cv")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("query_id", "match_id", "cosine")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes from md5(seed, plane, i)
    — reproducible across runs/machines with no RNG state."""
    planes = []
    for p in range(n_planes):
        vals = []
        for i in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{i}".encode()).hexdigest()[:8]
            # map hex to (-1, 1)
            vals.append(int(h, 16) / float(0xFFFFFFFF) * 2.0 - 1.0)
        norm = math.sqrt(sum(v * v for v in vals)) or 1.0
        planes.append([v / norm for v in vals])
    return planes


def srp_code(df: DataFrame, vec_col: str, dim: int, n_planes: int = 8, seed: int = 42) -> DataFrame:
    """Append an integer sign-random-projection code column ``srp_code``:
    bit ``p`` is the sign of <vec, plane_p>. Pure projection — no shuffle."""
    v = vec_double(vec_col)
    code = F.lit(0)
    for p, plane in enumerate(_hyperplanes(dim, n_planes, seed)):
        dot = F.aggregate(
            F.zip_with(v, F.array(*[F.lit(x) for x in plane]), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        code = code + F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return df.withColumn("srp_code", code)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors whose SRP code is within
    Hamming distance 1 of the query's code (multi-probe). The join key is
    the code bucket → shuffle volume is corpus-size, not corpus×queries.

    ``n_tables`` is the standard LSH OR-amplification recall lever (r7):
    candidates are the UNION over ``n_tables`` independent hash tables
    (md5-seeded hyperplanes per table), deduped before exact scoring. A
    neighbor missed by one table's buckets is caught by another — per-table
    miss rates multiply. Cost is linear in tables (each adds one
    corpus-sized code projection + bucket join); recall-vs-tables is
    measured on the sf1 twin in SCALING.md (planted-near-neighbor
    recall@1: 0.85 at L=1, 0.95 at L=2, 1.0 at L=4). n_tables=1 preserves
    the pre-r7 behavior bit-for-bit (the certified query's oracle)."""
    cands = None
    for t in range(n_tables):
        c = srp_code(
            _unit(_parallel_corpus(corpus), vec_col, "cv"), "cv", dim, n_planes,
            seed=seed + t,
        ).select(F.col(id_col).alias("match_id"), "cv", "srp_code")
        q = srp_code(
            _unit(queries, vec_col, "qv"), "qv", dim, n_planes, seed=seed + t
        ).select(F.col(id_col).alias("query_id"), "qv", F.col("srp_code").alias("q_code"))
        # multi-probe: the exact bucket plus each single-bit flip
        probes = q.select(
            "query_id",
            "qv",
            F.explode(
                F.array(
                    F.col("q_code"),
                    *[F.col("q_code").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)],
                )
            ).alias("srp_code"),
        )
        sc = (
            c.join(F.broadcast(probes), on="srp_code")
            .filter(F.col("match_id") != F.col("query_id"))
            .select("query_id", "match_id", "qv", "cv")
        )
        cands = sc if cands is None else cands.unionByName(sc)
    if n_tables > 1:
        # a pair found by several tables (or several probe buckets) must
        # score once — dedup on ids only; vectors ride along
        cands = cands.dropDuplicates(["query_id", "match_id"])
    scored = cands.withColumn(
        "cosine", F.round(cosine_similarity(F.col("qv"), F.col("cv")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "cosine", "rank")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    n_planes: int = 6,
    blocked: bool = True,
) -> DataFrame:
    """Near-duplicate vector pairs with cosine ≥ threshold.

    With ``blocked=True`` the self-join is restricted to equal SRP codes
    (near-dup vectors almost surely share all sign bits), which shards the
    quadratic join into per-bucket joins. ``blocked=False`` is the exact
    small-scale oracle path.
    """
    base = _unit(df, vec_col, "v").select(F.col(id_col).alias("id"), "v")
    if blocked:
        base = srp_code(base, "v", dim, n_planes)
        join_on = [F.col("a.srp_code") == F.col("b.srp_code"), F.col("a.id") < F.col("b.id")]
        left = base.alias("a")
        right = base.alias("b")
    else:
        join_on = [F.col("a.id") < F.col("b.id")]
        # exact path: parquet inputs often arrive in 1-2 splits, which
        # would run the O(n²) comparison on 2 tasks; spread the stream
        # side across the cluster and broadcast the build side (n·dim
        # doubles — megabytes at any scale this path is declared for)
        left = base.repartition(64, "id").alias("a")
        right = F.broadcast(base.alias("b"))
    pairs = (
        left
        .join(right, on=join_on)
        .withColumn("cosine", F.round(cosine_similarity(F.col("a.v"), F.col("b.v")), 6))
        .filter(F.col("cosine") >= threshold)
        .select(F.col("a.id").alias("vec_a"), F.col("b.id").alias("vec_b"), "cosine")
    )
    return pairs


def _centroids_kmeans(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_clusters: int,
    iterations: int = 2,
) -> list[tuple[int, list[float]]]:
    """Deterministic mini k-means for IVF coarse quantization: seeds are the
    ``n_clusters`` lowest-id vectors (reproducible, no RNG), then
    ``iterations`` Lloyd rounds computed distributively (assignment is a
    codegen'd argmin over broadcast centroids; update is one groupBy-mean
    shuffle). Centroid count is small (sqrt(N) at scale), so collecting
    centroids to the driver is O(n_clusters·dim) — not a data collect."""
    seeds = (
        df.orderBy(id_col).limit(n_clusters).select(vec_double(vec_col).alias("v")).collect()
    )
    centroids = [(i, list(r["v"])) for i, r in enumerate(seeds)]
    base = df.select(F.col(id_col).alias("_id"), vec_double(vec_col).alias("v"))
    dim = len(centroids[0][1])
    for _ in range(iterations):
        assigned = base.withColumn("cluster", _nearest_centroid_expr(centroids))
        new_rows = (
            assigned.select(
                "cluster", *[F.element_at("v", i + 1).alias(f"d{i}") for i in range(dim)]
            )
            .groupBy("cluster")
            .agg(*[F.avg(f"d{i}").alias(f"d{i}") for i in range(dim)])
            .collect()
        )
        # round to 6 dp: absorbs engine/partition-order ulp drift in the mean
        # so the whole quantizer is expressible exactly in the SQL oracle
        centroids = [
            (r["cluster"], [round(float(r[f"d{i}"]), 6) for i in range(dim)])
            for r in new_rows
        ]
        centroids.sort(key=lambda c: c[0])
    return centroids


def _vec_double_sql(vec_col: str) -> str:
    """SQL twin of :func:`vec_double` for text-generated expressions."""
    return f"transform({vec_col}, x -> CAST(x AS DOUBLE))"


def _sql_double(x: float) -> str:
    """Exact SQL double literal: repr round-trips the float and the
    string→double cast is correctly rounded, so the parsed constant is
    bit-identical to the Python value F.lit would have embedded."""
    return f"CAST('{x!r}' AS DOUBLE)"


def _centroid_scores_sql(
    centroids: list[tuple[int, list[float]]], vec_sql: str = "v"
) -> str:
    """SQL text for the array of per-centroid scores (dot(v,c) - ||c||²/2),
    rounded to 6 dp so argmax ties resolve identically across engines.

    Generated as ONE SQL string parsed JVM-side (r12): the previous
    Column-API construction issued thousands of py4j round-trips per
    codebook (one per literal/lambda node — measured 1.5-1.7 s of pure
    DRIVER Python per Lloyd round at k=8×4 subspaces, dominating the PQ
    training wall). Per-centroid float semantics are IDENTICAL: left-fold
    dot via zip_with/aggregate, subtract the half-norm, 6-dp round; the
    transform preserves codebook order so the first-max tiebreak
    downstream is unchanged."""
    cvs = ", ".join(
        "array(" + ", ".join(_sql_double(x) for x in cv) + ")" for _, cv in centroids
    )
    hns = ", ".join(_sql_double(sum(x * x for x in cv) / 2.0) for _, cv in centroids)
    return (
        f"transform(array({cvs}), (cv, i) -> round(aggregate("
        f"zip_with({vec_sql}, cv, (a, b) -> a * b), 0.0D, (acc, x) -> acc + x)"
        f" - element_at(array({hns}), i + 1), 6))"
    )


def _centroid_scores(
    centroids: list[tuple[int, list[float]]], vec: F.Column | None = None
) -> F.Column:
    if vec is not None:
        raise ValueError("Column vec no longer supported; use _centroid_scores_sql")
    return F.expr(_centroid_scores_sql(centroids, "v"))


def _nearest_centroid_sql(
    centroids: list[tuple[int, list[float]]], vec_sql: str = "v"
) -> str:
    """argmin_{c} ||v - c||² (≡ argmax of dot - ||c||²/2) as ONE SQL
    expression. Array-based argmax keeps the tree O(k·dim); a nested
    when-chain would be O(k²·dim) and blow up codegen. The scores text
    appears twice (position + max) exactly as the Column build duplicated
    the subtree."""
    ids = ", ".join(str(cid) for cid, _ in centroids)
    sc = _centroid_scores_sql(centroids, vec_sql)
    return f"element_at(array({ids}), CAST(array_position({sc}, array_max({sc})) AS INT))"


def _nearest_centroid_expr(
    centroids: list[tuple[int, list[float]]], vec: F.Column | None = None
) -> F.Column:
    if vec is not None:
        raise ValueError("Column vec no longer supported; use _nearest_centroid_sql")
    return F.expr(_nearest_centroid_sql(centroids, "v"))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_clusters: int = 16,
    n_probe: int = 3,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: coarse-quantize the corpus
    into ``n_clusters`` cells with deterministic k-means, then score each
    query only against its ``n_probe`` nearest cells.

    Scale shape: the cell assignment is a one-pass projection; the search
    join keys on ``cluster`` (corpus shuffled once by cell, queries
    broadcast), scanning ~n_probe/n_clusters of the corpus per query.
    Recall is tuned by ``n_probe``. Approximate ⇒ rows-only certification
    (recall measured against brute force in tests)."""
    cents = _centroids_kmeans(corpus, vec_col, id_col, n_clusters)
    c = corpus.select(F.col(id_col).alias("match_id"), vec_double(vec_col).alias("v"))
    c = c.withColumn("cluster", _nearest_centroid_expr(cents))

    q = queries.select(F.col(id_col).alias("query_id"), vec_double(vec_col).alias("v"))
    # n_probe nearest cells per query: zip (score, id), sort desc, take n
    ids_arr = F.array(*[F.lit(cid) for cid, _ in cents])
    zipped = F.zip_with(
        _centroid_scores(cents), ids_arr, lambda s, i: F.struct(s.alias("s"), i.alias("cid"))
    )
    probes = q.select(
        "query_id",
        F.col("v").alias("qv"),
        F.explode(F.slice(F.reverse(F.array_sort(zipped)), 1, n_probe)).alias("probe"),
    ).select("query_id", "qv", F.col("probe.cid").alias("cluster"))

    scored = (
        c.join(F.broadcast(probes), on="cluster")
        .filter(F.col("match_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine_similarity(F.col("qv"), F.col("v")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "cosine", "rank")
    )


def pq_codebooks(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_sub: int = 4,
    n_codes: int = 8,
    iterations: int = 2,
) -> list[list[tuple[int, list[float]]]]:
    """Product-quantization codebooks: split the vector into ``n_sub``
    contiguous subspaces and train an independent deterministic k-means
    (lowest-id seeds, ``iterations`` Lloyd rounds, 6-dp-rounded centroids —
    same discipline as :func:`_centroids_kmeans`) of ``n_codes`` centroids
    per subspace. Driver state is O(n_sub · n_codes · d_sub) floats — the
    codebook, never data.

    All subspaces train in the SAME jobs: one seed collect (the lowest-id
    vectors, sliced driver-side) and ONE corpus pass per Lloyd round — the
    per-row assignments for every subspace explode into (s, cluster, sub)
    rows and a single (s, cluster) mean aggregation updates every codebook
    (the sequential per-subspace loop re-scanned the corpus n_sub times
    per round: 13 jobs → 1 + iterations). Numerics are the certified
    per-boundary 6-dp rounding — the oracle re-derives the identical
    quantizer in SQL, where summation order already differs per engine, so
    the round is the bridge in both directions."""
    seed_rows = (
        corpus.orderBy(id_col)
        .limit(n_codes)
        .select(vec_double(vec_col).alias("v"))
        .collect()
    )
    dim = len(seed_rows[0]["v"])
    if dim % n_sub != 0:
        raise ValueError(f"dim ({dim}) must be divisible by n_sub ({n_sub})")
    d_sub = dim // n_sub
    books = [
        [
            (i, list(r["v"])[s * d_sub : (s + 1) * d_sub])
            for i, r in enumerate(seed_rows)
        ]
        for s in range(n_sub)
    ]
    base = corpus.select(vec_double(vec_col).alias("v"))
    for _ in range(iterations):
        per_sub = F.array(
            *[
                F.struct(
                    F.lit(s).alias("s"),
                    F.expr(
                        _nearest_centroid_sql(
                            books[s], f"slice(v, {s * d_sub + 1}, {d_sub})"
                        )
                    ).alias("cluster"),
                    F.slice("v", s * d_sub + 1, d_sub).alias("sub"),
                )
                for s in range(n_sub)
            ]
        )
        rows = (
            base.select(F.explode(per_sub).alias("x"))
            .select(
                F.col("x.s").alias("s"),
                F.col("x.cluster").alias("cluster"),
                *[F.element_at("x.sub", i + 1).alias(f"d{i}") for i in range(d_sub)],
            )
            .groupBy("s", "cluster")
            .agg(*[F.avg(f"d{i}").alias(f"d{i}") for i in range(d_sub)])
            .collect()
        )
        new_books: list[list[tuple[int, list[float]]]] = [[] for _ in range(n_sub)]
        for r in rows:
            new_books[r["s"]].append(
                (r["cluster"], [round(float(r[f"d{i}"]), 6) for i in range(d_sub)])
            )
        for b in new_books:
            b.sort(key=lambda c: c[0])
        books = new_books
    return books


def pq_encode(
    corpus: DataFrame,
    books: list[list[tuple[int, list[float]]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Compress each vector to ``n_sub`` small-int codes (nearest centroid
    per subspace, L2, deterministic 6-dp tiebreak) — one codegen'd
    projection. A 64-float vector becomes 4 ints: the compressed corpus is
    what a 100 TB ANN system scans, sized RAM-resident where the raw
    vectors never could be."""
    d_sub = len(books[0][0][1])
    v_sql = _vec_double_sql(vec_col)
    return _parallel_corpus(corpus).select(
        F.col(id_col),
        *[
            F.expr(
                _nearest_centroid_sql(cents, f"slice({v_sql}, {s * d_sub + 1}, {d_sub})")
            ).alias(f"code_{s}")
            for s, cents in enumerate(books)
        ],
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_sub: int = 4,
    n_codes: int = 8,
    rerank: int = 0,
) -> DataFrame:
    """Product-quantization approximate top-k by inner product, using
    asymmetric distance computation (ADC): the corpus is scanned in
    compressed form (``n_sub`` int codes per vector), while each query
    carries a precomputed lookup table — per subspace, the 6-dp-rounded
    inner product of the query subvector with each centroid. A
    corpus-vs-query pair then costs ``n_sub`` array lookups + adds instead
    of a ``dim``-wide dot product.

    Scale shape: codebooks are trained distributively (driver holds only
    O(n_sub·n_codes·d_sub) floats), encoding is one projection, and the
    search is a broadcast of the query set (with tables) against one scan
    of the compressed corpus — no corpus shuffle, no index build beyond
    the codebook. Deterministic throughout ⇒ certified against an oracle
    that unrolls the same per-subspace quantizers into SQL (see
    queries.extensions._pq_oracle).

    ``rerank`` > 0 adds the standard second stage: take the top-``rerank``
    ADC shortlist per query, fetch those candidates' EXACT vectors, and
    re-rank by true inner product. Quantization collapses same-cell
    candidates to one tied score, so within-cell order is unrecoverable
    from codes alone — the shortlist re-rank restores it while still
    scanning the corpus in compressed form (the exact fetch touches only
    ``rerank`` rows per query)."""
    books = pq_codebooks(corpus, vec_col, id_col, n_sub, n_codes)
    d_sub = len(books[0][0][1])
    codes = pq_encode(corpus, books, vec_col, id_col).withColumnRenamed(id_col, "match_id")

    qv = vec_double(vec_col)
    # per-subspace ADC lookup tables as ONE parsed SQL expression each —
    # same py4j-construction fix as _centroid_scores_sql; per-entry float
    # ops (left-fold dot, 6-dp round) and table order are unchanged
    qv_sql = _vec_double_sql(vec_col)

    def _qtab_sql(cents, s):
        cvs = ", ".join(
            "array(" + ", ".join(_sql_double(x) for x in cv) + ")" for _, cv in cents
        )
        return (
            f"transform(array({cvs}), cv -> round(aggregate(zip_with("
            f"slice({qv_sql}, {s * d_sub + 1}, {d_sub}), cv, (a, b) -> a * b),"
            f" 0.0D, (acc, x) -> acc + x), 6))"
        )

    q = queries.select(
        F.col(id_col).alias("query_id"),
        *[
            F.expr(_qtab_sql(cents, s)).alias(f"qtab_{s}")
            for s, cents in enumerate(books)
        ],
    )
    # ADC score: fixed left-assoc sum of per-subspace table lookups keeps
    # the float addition order identical in both engines
    score = None
    for s in range(n_sub):
        term = F.element_at(F.col(f"qtab_{s}"), F.col(f"code_{s}") + 1)
        score = term if score is None else score + term
    scored = (
        codes.join(F.broadcast(q), F.col("match_id") != F.col("query_id"))
        .withColumn("approx_ip", F.round(score, 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("approx_ip").desc(), F.col("match_id"))
    if not rerank:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "match_id", "approx_ip", "rank")
        )
    shortlist = (
        scored.withColumn("rank0", F.row_number().over(w))
        .filter(F.col("rank0") <= rerank)
        .select("query_id", "match_id")
    )
    qvec = queries.select(F.col(id_col).alias("query_id"), qv.alias("q_exact"))
    cvec = corpus.select(F.col(id_col).alias("match_id"), vec_double(vec_col).alias("c_exact"))
    exact = (
        cvec.join(F.broadcast(shortlist), "match_id")
        .join(F.broadcast(qvec), "query_id")
        .withColumn(
            "ip",
            F.round(
                F.aggregate(
                    F.zip_with("q_exact", "c_exact", lambda a, b: a * b),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("ip").desc(), F.col("match_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "ip", "rank")
    )


def group_centroids(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-group centroid of an embedding column: explode (vec_id, dim_idx,
    value), average per (group, dim_idx), re-assemble ordered arrays with
    array_agg over a sorted collect — one explode + one groupBy shuffle.

    The classic map-side-combinable mean: at 100 TB the shuffle carries
    (group, dim) partial sums, never vectors. Used for cluster profiling,
    label drift monitoring, and IVF seeding."""
    exploded = df.select(
        F.col(group_col), F.posexplode(vec_double(vec_col)).alias("dim_idx", "val")
    )
    # decimal-sum for exact associative arithmetic (float avg order flips
    # rounding boundaries between runs); +0.0 clears IEEE negative zero
    per_dim = exploded.groupBy(group_col, "dim_idx").agg(
        (
            F.round(
                F.sum(F.col("val").cast("decimal(24,12)")).cast("double")
                / F.count(F.lit(1)),
                4,
            )
            + F.lit(0.0)
        ).alias("dim_mean")
    )
    return (
        per_dim.groupBy(group_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("dim_idx"), F.col("dim_mean")))
            ).alias("__pairs")
        )
        .select(
            group_col,
            F.transform(F.col("__pairs"), lambda p: p.dim_mean).alias("centroid"),
        )
    )


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization (vector-store prep):
    ``q[i] = round(v[i] * 127 / max(|v|))``, scale kept for dequantization.
    Pure higher-order-function projection — no shuffle, 4× memory cut on
    the widest column a training corpus ships."""
    v = vec_double(vec_col)
    max_abs = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = F.when(max_abs == 0.0, F.lit(1.0)).otherwise(max_abs / 127.0)
    return df.select(
        F.col(id_col),
        F.round(scale, 6).alias("scale"),
        F.transform(v, lambda x: F.round(x / scale).cast("int")).alias("q_embedding"),
    )


def mips_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact maximum-inner-product top-k — the retrieval metric for
    dot-product-trained embedding models (recommendations, two-tower
    retrieval), where the UNNORMALIZED score matters and cosine's norm
    division would re-rank results. Same physical shape as
    :func:`brute_force_topk`: broadcast query set × one corpus scan,
    deterministic (rounded score, id tiebreak) ranking, self-matches
    excluded. MIPS does not admit a triangle-inequality metric-tree
    prune; the production scale path is the same bucketed/quantized ANN
    family, which is why the exact scan stays the certified baseline."""
    from arc_cassandra_pipeline_plugin_spark.functions import dot_product

    q = _unit(queries, vec_col, "qv").select(F.col(id_col).alias("query_id"), "qv")
    c = _unit(_parallel_corpus(corpus), vec_col, "cv").select(
        F.col(id_col).alias("match_id"), "cv"
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("match_id") != F.col("query_id"))
        .withColumn("dot", F.round(dot_product(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dot").desc(), F.col("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "dot", "rank")
    )
