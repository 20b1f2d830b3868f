"""Training-corpus curation queries (round-2, continuation batch).

Four operators a large-scale data pipeline runs between raw ingestion and
training-set emission, each Spark-first with an exact DuckDB oracle:

- ``dedup_setsim_prefix`` — prefix-filtering set-similarity self-join
  (the PPJoin family): all pairs with word-token Jaccard ≥ 0.7, found by
  equi-joining only the RAREST-token prefixes instead of all pairs. The
  oracle is the brute-force token join, which is feasible at oracle scale
  and is exactly what the prefix filter provably reproduces.
- ``quality_filter_cascade`` — reason-coded quality gate: each document
  gets a bitmask of failed filters (too short / low alpha / few tokens /
  absurd word length / low token diversity). All comparisons are exact
  integer cross-multiplications — no float thresholds to drift.
- ``sample_mixture_weighted`` — deterministic mixture resampling toward
  target language proportions: per-language keep-rates derived from the
  observed counts, membership by content hash (the sampling module's
  md5-bucket convention), certified per-language counts.
- ``split_leakage_safe`` — near-dup-aware train/val/test split: the split
  key is the document's dedup CLUSTER id (LSH connected components), not
  the document id, so near-duplicates can never straddle a split boundary
  (train/test contamination). Certified against the recursive-CTE closure
  reused from the cluster oracle.

Determinism rules follow the registry header (integer comparisons, single
float ops with identical expression shape on both engines, md5 bucketing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from arc_cassandra_pipeline_plugin_spark.functions import small_df

from arc_cassandra_pipeline_plugin_spark.operators import dedup as D
from arc_cassandra_pipeline_plugin_spark.operators.blocking import blocked_pair_join
from arc_cassandra_pipeline_plugin_spark.queries import register
from arc_cassandra_pipeline_plugin_spark.queries.extensions import (
    _BANDS,
    _NUM_PERM,
    _SHINGLE_K,
    _clusters_cte,
)
from arc_cassandra_pipeline_plugin_spark.sources import load_table

# ---------------------------------------------------------------------------
# prefix-filtering set-similarity join
# ---------------------------------------------------------------------------

_SETSIM_THRESHOLD_PCT = 70


@register(
    "dedup_setsim_prefix",
    category="dedup",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS token
  FROM documents),
sizes AS (SELECT doc_id, count(*) AS m FROM tok GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
  FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b, round(c / (sa.m + sb.m - c), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = inter.doc_a
JOIN sizes sb ON sb.doc_id = inter.doc_b
WHERE 100 * c >= {_SETSIM_THRESHOLD_PCT} * (sa.m + sb.m - c)
""",
)
def dedup_setsim_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPJoin-style prefix-filtered set-similarity self-join at Jaccard ≥ 0.7.

    The Spark side generates candidates only from rarest-token prefixes
    (provably complete under the prefix-filter guarantee); the oracle
    brute-forces the token join — identical result set by theorem, so a
    hash match certifies the filter's completeness, not just its precision.
    The threshold test is integer cross-multiplication on both engines;
    the reported Jaccard is one exactly-rounded IEEE division."""
    docs = load_table(spark, sf_dir, "documents")
    return D.setsim_join_prefix(docs, threshold_pct=_SETSIM_THRESHOLD_PCT)


# ---------------------------------------------------------------------------
# reason-coded quality filter cascade
# ---------------------------------------------------------------------------

# bit, name, DuckDB predicate, kept in one table so the Spark expressions
# and the oracle are generated from the same source of truth
_QF_BITS = (
    (1, "too_short", "n_chars < 200"),
    (2, "low_alpha", "2 * n_alpha < n_chars"),
    (4, "few_tokens", "n_tokens < 30"),
    (8, "long_word", "max_word > 40"),
    (16, "low_diversity", "4 * n_unique < n_tokens"),
)


def _qf_oracle() -> str:
    bit_sum = " + ".join(
        f"CASE WHEN {pred} THEN {bit} ELSE 0 END" for bit, _, pred in _QF_BITS
    )
    return f"""
WITH feat AS (
  SELECT doc_id,
         length(text) AS n_chars,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
         len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens,
         coalesce(list_max(list_transform(regexp_extract_all(lower(text), '[a-z0-9]+'),
                                          w -> length(w))), 0) AS max_word,
         len(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS n_unique
  FROM documents)
SELECT doc_id, CAST({bit_sum} AS INT) AS reasons, ({bit_sum}) = 0 AS keep
FROM feat
"""


@register("quality_filter_cascade", category="text", oracle=_qf_oracle())
def quality_filter_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reason-coded quality gate: bitmask of failed filters per document.

    A production filter cascade must explain WHY a document was dropped
    (for ablation and drift monitoring), so each filter sets one bit
    instead of short-circuiting. One codegen'd projection, no shuffle, no
    Python; every threshold is an exact integer comparison (ratios as
    cross-multiplications), so both engines agree on every boundary doc.
    The predicate table (:data:`_QF_BITS`) generates both sides."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0)
    feat = docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.length(F.regexp_replace(F.col("text"), "[^A-Za-z]", "")).alias("n_alpha"),
        F.size(words).alias("n_tokens"),
        F.coalesce(
            F.array_max(F.transform(words, lambda w: F.length(w))), F.lit(0)
        ).alias("max_word"),
        F.size(F.array_distinct(words)).alias("n_unique"),
    )
    reasons = None
    for bit, _, pred in _QF_BITS:
        term = F.when(F.expr(pred), F.lit(bit)).otherwise(F.lit(0))
        reasons = term if reasons is None else reasons + term
    return feat.select(
        "doc_id",
        reasons.cast("int").alias("reasons"),
        (reasons == 0).alias("keep"),
    )


# ---------------------------------------------------------------------------
# deterministic weighted mixture sampling
# ---------------------------------------------------------------------------

# target language mixture for the resampled corpus (weights sum to 1)
_MIX_WEIGHTS = {"en": 0.4, "zh": 0.2, "de": 0.15, "fr": 0.15, "es": 0.1}
_MIX_SALT = "mix"
_MIX_BUCKETS = 1_000_000  # operators.sampling.BUCKETS


def _mix_oracle() -> str:
    weight_case = " ".join(
        f"WHEN lang = '{lang}' THEN {w}" for lang, w in sorted(_MIX_WEIGHTS.items())
    )
    return f"""
WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
tot AS (SELECT CAST(sum(n) AS BIGINT) // 2 AS target FROM counts),
rates AS (
  SELECT lang, n,
         CAST(floor(least(1.0, (CASE {weight_case} ELSE 0.0 END) * target / n)
                    * {_MIX_BUCKETS}) AS BIGINT) AS keep_below
  FROM counts, tot),
tagged AS (
  SELECT d.lang,
         ('0x' || substr(md5('{_MIX_SALT}:' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
           % {_MIX_BUCKETS} AS b,
         r.keep_below
  FROM documents d JOIN rates r ON d.lang = r.lang)
SELECT lang, CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN b < keep_below THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM tagged GROUP BY lang
"""


@register("sample_mixture_weighted", category="sampling", oracle=_mix_oracle())
def sample_mixture_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture resampling toward target language weights.

    Per-language keep-rate = min(1, w_lang * target_size / n_lang), with
    target_size = N/2 — the standard recipe for hitting a prescribed data
    mixture without replacement. Membership is the content-hash bucket of
    the sampling module (layout-independent, certified exactly); the rate
    itself is two float ops in a fixed order on both engines, floored to
    an integer bucket threshold before any comparison.

    Scale shape: the per-language counts are a tiny aggregate broadcast
    back onto the corpus; the sample itself is a pure filter — no shuffle
    of the corpus at any point."""
    from arc_cassandra_pipeline_plugin_spark.operators.sampling import _bucket

    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    target = counts.agg(
        (F.sum("n").cast("bigint") / F.lit(2)).cast("bigint").alias("target")
    )
    weight = None
    for lang, w in sorted(_MIX_WEIGHTS.items()):
        term = F.when(F.col("lang") == lang, F.lit(w))
        weight = term if weight is None else weight.when(F.col("lang") == lang, F.lit(w))
    weight = weight.otherwise(F.lit(0.0))
    rates = counts.crossJoin(F.broadcast(target)).select(
        "lang",
        F.floor(
            F.least(F.lit(1.0), weight * F.col("target") / F.col("n"))
            * _MIX_BUCKETS
        ).alias("keep_below"),
    )
    tagged = docs.join(F.broadcast(rates), "lang").select(
        "lang",
        _bucket(F.col("doc_id"), _MIX_SALT).alias("b"),
        "keep_below",
    )
    return tagged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("b") < F.col("keep_below"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_kept"),
    )


# ---------------------------------------------------------------------------
# leakage-safe train/val/test split
# ---------------------------------------------------------------------------

_SPLIT_SALT = "clsplit"


def _leakage_split_oracle() -> str:
    return f"""
WITH RECURSIVE {_clusters_cte()},
assigned AS (
  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN comp c USING (doc_id)),
bucketed AS (
  SELECT doc_id, cluster_id,
         ('0x' || substr(md5('{_SPLIT_SALT}:' || CAST(cluster_id AS VARCHAR)), 1, 8))::BIGINT
           % 1000000 AS b
  FROM assigned)
SELECT CASE WHEN b < 100000 THEN 'val' WHEN b < 200000 THEN 'test' ELSE 'train' END AS split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters
FROM bucketed GROUP BY 1
"""


@register("split_leakage_safe", category="sampling", oracle=_leakage_split_oracle())
def split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-aware train/val/test split: hash the dedup CLUSTER id, not
    the document id.

    A plain per-document split leaks near-duplicates across the train/test
    boundary (the classic benchmark-contamination bug); assigning whole
    LSH connected components to one split makes leakage structurally
    impossible. Certified: per-split document AND cluster counts against
    the recursive-closure oracle reused from ``dedup_clusters`` — the same
    band constants generate both sides, so the clustering cannot drift
    from the certified one.

    Scale shape: components come from the banded-LSH pipeline (linear
    shuffles, see operators.dedup); the split itself is a hash filter on
    the cluster label — no extra shuffle beyond the final tiny aggregate."""
    from arc_cassandra_pipeline_plugin_spark.operators.sampling import _bucket

    docs = load_table(spark, sf_dir, "documents")
    sigs = D.minhash_signature(docs, num_perm=_NUM_PERM, shingle_k=_SHINGLE_K)
    pairs = D.lsh_candidate_pairs(sigs, num_perm=_NUM_PERM, bands=_BANDS)
    comp = D.connected_components(pairs)
    assigned = docs.join(comp, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
    )
    b = _bucket(F.col("cluster_id"), _SPLIT_SALT)
    bucketed = assigned.withColumn(
        "split",
        F.when(b < 100000, "val").when(b < 200000, "test").otherwise("train"),
    )
    return bucketed.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("cluster_id").alias("n_clusters"),
    )


# ---------------------------------------------------------------------------
# embedding-space classification & geometry
# ---------------------------------------------------------------------------

_KNN_PROBE_MAX_ID = 20  # vec_id < 20 → the "unlabeled" probe set
_KNN_K = 5


@register(
    "knn_label_predict",
    category="similarity",
    oracle=f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < {_KNN_PROBE_MAX_ID}),
c AS (SELECT vec_id AS match_id, label, embedding::DOUBLE[] AS cv
      FROM embeddings WHERE vec_id >= {_KNN_PROBE_MAX_ID}),
scored AS (
  SELECT query_id, match_id, label,
         round(list_dot_product(qv, cv)
               / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) AS cosine
  FROM q CROSS JOIN c),
topk AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, match_id) AS rn
    FROM scored) WHERE rn <= {_KNN_K}),
votes AS (SELECT query_id, label, count(*) AS n_votes FROM topk GROUP BY 1, 2)
SELECT query_id, label AS predicted_label, CAST(n_votes AS BIGINT) AS n_votes
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY n_votes DESC, label) AS r FROM votes)
WHERE r = 1
""",
)
def knn_label_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN majority-vote label prediction over the embedding column: for
    each unlabeled probe vector, the modal label among its 5 nearest
    labeled neighbors by cosine (votes desc, label asc tiebreak — fully
    deterministic).

    Reuses the brute-force top-k kernel (broadcast probes × one corpus
    scan — the corpus is never shuffled); the vote count and argmax are
    two tiny aggregates on k·|probes| rows. At 100 TB the probe set rides
    the same broadcast pattern; the scale path for large probe sets is the
    ANN bucket join (similarity_ann_lsh)."""
    from arc_cassandra_pipeline_plugin_spark.operators import similarity as S
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < _KNN_PROBE_MAX_ID)
    corpus = emb.filter(F.col("vec_id") >= _KNN_PROBE_MAX_ID)
    topk = S.brute_force_topk(corpus, probes, k=_KNN_K)
    labels = corpus.select(F.col("vec_id").alias("match_id"), "label")
    votes = (
        topk.join(labels, "match_id")
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("n_votes").desc(), F.col("label"))
    return (
        votes.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select(
            "query_id",
            F.col("label").alias("predicted_label"),
            F.col("n_votes").cast("bigint").alias("n_votes"),
        )
    )


@register(
    "centroid_pairwise_cosine",
    category="similarity",
    oracle="""
WITH e AS (
  SELECT label, generate_subscripts(embedding, 1) AS dim_idx, unnest(embedding) AS val
  FROM embeddings),
per AS (
  SELECT label, dim_idx,
         round(CAST(sum(CAST(val AS DECIMAL(24,12))) AS DOUBLE) / count(*), 4) + 0.0 AS dim_mean
  FROM e GROUP BY 1, 2),
cents AS (
  SELECT label, list(dim_mean ORDER BY dim_idx) AS centroid FROM per GROUP BY label)
SELECT a.label AS label_a, b.label AS label_b,
       round(list_dot_product(a.centroid, b.centroid)
             / (sqrt(list_dot_product(a.centroid, a.centroid))
                * sqrt(list_dot_product(b.centroid, b.centroid))), 6) AS cosine
FROM cents a JOIN cents b ON a.label < b.label
""",
)
def centroid_pairwise_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-drift geometry: pairwise cosine between per-label embedding
    centroids — the confusion-structure monitor for a labeled corpus
    (near-parallel centroids predict classifier confusion).

    Centroids come from the certified decimal-summed mean (identical
    4-dp doubles on both engines by the embeddings_group_centroids
    certification); the pairwise stage is a self-join of ONE ROW PER
    LABEL — trivially broadcast at any corpus size, since the quadratic
    term is label-count, not row-count."""
    from arc_cassandra_pipeline_plugin_spark.operators import similarity as S
    from arc_cassandra_pipeline_plugin_spark.functions import cosine_similarity

    cents = S.group_centroids(load_table(spark, sf_dir, "embeddings"), group_col="label")
    a = cents.select(F.col("label").alias("label_a"), F.col("centroid").alias("ca"))
    b = cents.select(F.col("label").alias("label_b"), F.col("centroid").alias("cb"))
    return (
        a.join(F.broadcast(b), F.col("label_a") < F.col("label_b"))
        .select(
            "label_a",
            "label_b",
            F.round(cosine_similarity(F.col("ca"), F.col("cb")), 6).alias("cosine"),
        )
    )


# ---------------------------------------------------------------------------
# exactly-k deterministic priority sampling
# ---------------------------------------------------------------------------

_PRIO_K = 20
_PRIO_SALT = "prio"


@register(
    "sample_priority_topk",
    category="sampling",
    oracle=f"""
SELECT lang, doc_id, CAST(rn AS INT) AS priority_rank FROM (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang ORDER BY b, doc_id) AS rn
  FROM (SELECT lang, doc_id,
               ('0x' || substr(md5('{_PRIO_SALT}:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                 % 1000000 AS b
        FROM documents))
WHERE rn <= {_PRIO_K}
""",
)
def sample_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-stratum deterministic sample (priority sampling): rank
    documents per language by content-hash priority and keep the first 20 —
    the fixed-budget complement to fraction-based sampling (a fraction
    cannot guarantee an exact per-stratum quota; a priority order can).

    Membership depends only on content hashes, so the same corpus yields
    the same sample on any layout, and adding documents only displaces the
    lowest-priority members. The rank filter compiles to Spark's
    WindowGroupLimit pushdown — each group keeps a k-row heap through the
    shuffle, so no group ever materializes fully sorted."""
    from arc_cassandra_pipeline_plugin_spark.operators.sampling import _bucket
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(_bucket(F.col("doc_id"), _PRIO_SALT), "doc_id")
    return (
        docs.withColumn("priority_rank", F.row_number().over(w))
        .filter(F.col("priority_rank") <= _PRIO_K)
        .select("lang", "doc_id", "priority_rank")
    )


# ---------------------------------------------------------------------------
# shared-passage detection (winnowing fingerprint pairs)
# ---------------------------------------------------------------------------

_PASSAGE_MIN_SHARED = 50


def _shared_passages_oracle() -> str:
    from arc_cassandra_pipeline_plugin_spark.queries.extensions import _WINNOW_CTE

    return f"""
WITH {_WINNOW_CTE},
shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
  FROM fps a JOIN fps b
    ON a.fingerprint_hash = b.fingerprint_hash AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b, CAST(n_shared AS BIGINT) AS n_shared
FROM shared WHERE n_shared >= {_PASSAGE_MIN_SHARED}
"""


@register("dedup_shared_passages", category="dedup", oracle=_shared_passages_oracle())
def dedup_shared_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level (substring) duplicate detection: document pairs
    sharing >= 50 winnowing fingerprints. By the winnowing guarantee, any
    shared substring of length >= w+k-1 chars produces a shared
    fingerprint, so this finds copied PASSAGES that whole-document Jaccard
    misses — the plagiarism/boilerplate primitive.

    Scale shape: the pair join is keyed on fingerprint hashes (16-bit-ish
    ints, never text); document pairs meet only if they actually share a
    fingerprint. Boilerplate fingerprints shared by thousands of docs are
    the known skew risk — at production scale, drop fingerprints above a
    document-frequency cap first (the same rare-first logic as the
    prefix-filter join). The CTE is shared with text_winnow_fingerprints
    so both certifications pin the same scheme."""
    from arc_cassandra_pipeline_plugin_spark.operators import text as TX

    docs = load_table(spark, sf_dir, "documents")
    fps = TX.winnow_fingerprints(docs, k=5, window=4)
    a = fps.select(F.col("doc_id").alias("doc_a"), "fingerprint_hash")
    b = fps.select(F.col("doc_id").alias("doc_b"), "fingerprint_hash")
    return (
        a.join(b, "fingerprint_hash")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= _PASSAGE_MIN_SHARED)
    )


# ---------------------------------------------------------------------------
# training-export shard manifest
# ---------------------------------------------------------------------------

_N_SHARDS = 16
_SHARD_SALT = "shard"


@register(
    "export_shard_manifest",
    category="sampling",
    oracle=f"""
WITH tagged AS (
  SELECT doc_id, text,
         ('0x' || substr(md5('{_SHARD_SALT}:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           % {_N_SHARDS} AS shard,
         ('0x' || substr(md5('ck:' || CAST(doc_id AS VARCHAR) || ':' || md5(text)), 1, 8))::BIGINT
           AS doc_ck
  FROM documents)
SELECT shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS total_chars,
       CAST(sum(len(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS BIGINT) AS total_tokens,
       CAST(sum(doc_ck) AS BIGINT) AS content_checksum
FROM tagged GROUP BY shard
""",
)
def export_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard manifest for a training-data export: documents assigned to 16
    output shards by content hash, with per-shard document / character /
    token counts and an order-insensitive CONTENT checksum (sum of per-doc
    md5-prefix ints over id+text) — the artifact a downstream trainer uses
    to verify an export landed complete and unaltered.

    Layout-independent by construction: hash sharding and an additive
    checksum mean any cluster, any partitioning, any row order produces
    the identical manifest. One scan, one 16-group aggregate."""
    from arc_cassandra_pipeline_plugin_spark.operators.sampling import _bucket

    docs = load_table(spark, sf_dir, "documents")
    doc_ck = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("ck:"),
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    F.md5(F.col("text")),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    tagged = docs.select(
        (_bucket(F.col("doc_id"), _SHARD_SALT) % _N_SHARDS).alias("shard"),
        F.length("text").alias("n_chars"),
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0)
        ).alias("n_tokens"),
        doc_ck.alias("doc_ck"),
    )
    return tagged.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum("doc_ck").cast("bigint").alias("content_checksum"),
    )


# ---------------------------------------------------------------------------
# dedup cluster size distribution
# ---------------------------------------------------------------------------

def _cluster_hist_oracle() -> str:
    return f"""
WITH RECURSIVE {_clusters_cte()},
assigned AS (
  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN comp c USING (doc_id)),
sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM assigned GROUP BY 1)
SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
FROM sizes GROUP BY cluster_size
"""


@register("dedup_cluster_size_hist", category="dedup", oracle=_cluster_hist_oracle())
def dedup_cluster_size_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-size histogram of the dedup graph (singletons included):
    how much of the corpus is unique vs. templated — the one-look summary
    that decides dedup policy (a fat tail of giant clusters means
    boilerplate; mostly singletons means light-touch dedup suffices).
    Two tiny aggregates over the certified component labels."""
    docs = load_table(spark, sf_dir, "documents")
    sigs = D.minhash_signature(docs, num_perm=_NUM_PERM, shingle_k=_SHINGLE_K)
    pairs = D.lsh_candidate_pairs(sigs, num_perm=_NUM_PERM, bands=_BANDS)
    comp = D.connected_components(pairs)
    assigned = docs.join(comp, "doc_id", "left").select(
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id")
    )
    sizes = assigned.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters")
    )


# ---------------------------------------------------------------------------
# upsample plan (epoch-repetition planning for rare strata)
# ---------------------------------------------------------------------------

_UP_SALT = "upsample"


def _upsample_oracle() -> str:
    weight_case = " ".join(
        f"WHEN lang = '{lang}' THEN {w}" for lang, w in sorted(_MIX_WEIGHTS.items())
    )
    return f"""
WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS target FROM counts),
rates AS (
  SELECT lang, n,
         (CASE {weight_case} ELSE 0.0 END) * target / n AS rate
  FROM counts, tot),
plan AS (
  SELECT lang, n,
         CAST(floor(rate) AS BIGINT) AS repeat_factor,
         CAST(floor((rate - floor(rate)) * {_MIX_BUCKETS}) AS BIGINT) AS frac_units
  FROM rates),
extras AS (
  SELECT d.lang,
         sum(CASE WHEN ('0x' || substr(md5('{_UP_SALT}:' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
                        % {_MIX_BUCKETS} < p.frac_units
                  THEN 1 ELSE 0 END) AS n_extra
  FROM documents d JOIN plan p ON d.lang = p.lang GROUP BY d.lang)
SELECT p.lang, CAST(p.n AS BIGINT) AS n_docs, CAST(p.repeat_factor AS INT) AS repeat_factor,
       CAST(e.n_extra AS BIGINT) AS n_extra,
       CAST(p.n * p.repeat_factor + e.n_extra AS BIGINT) AS total_emitted
FROM plan p JOIN extras e ON e.lang = p.lang
"""


@register("sample_upsample_plan", category="sampling", oracle=_upsample_oracle())
def sample_upsample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-repetition plan for rebalancing toward the target mixture by
    UPSAMPLING: each language's documents repeat floor(rate) times, plus a
    deterministic hash-selected extra pass for the fractional remainder —
    how a training pipeline oversamples rare strata without replacement
    randomness (the emitted multiset is identical on any layout and
    auditable from this plan alone).

    rate = weight · corpus_size / n_lang is a fixed-order two-op float;
    the integer floor/remainder split and the md5-bucket extra selection
    are exact, so the plan certifies end-to-end. The actual emission is a
    join-free sequence-explode by repeat_factor — linear output volume,
    no shuffle."""
    from arc_cassandra_pipeline_plugin_spark.operators.sampling import _bucket

    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    target = counts.agg(F.sum("n").cast("bigint").alias("target"))
    weight = None
    for lang, w in sorted(_MIX_WEIGHTS.items()):
        term = F.when(F.col("lang") == lang, F.lit(w))
        weight = term if weight is None else weight.when(F.col("lang") == lang, F.lit(w))
    weight = weight.otherwise(F.lit(0.0))
    rate = weight * F.col("target") / F.col("n")
    plan = counts.crossJoin(F.broadcast(target)).select(
        "lang",
        "n",
        F.floor(rate).cast("bigint").alias("repeat_factor"),
        F.floor((rate - F.floor(rate)) * _MIX_BUCKETS).cast("bigint").alias("frac_units"),
    )
    extras = (
        docs.join(F.broadcast(plan), "lang")
        .groupBy("lang")
        .agg(
            F.sum(
                F.when(
                    _bucket(F.col("doc_id"), _UP_SALT) < F.col("frac_units"), 1
                ).otherwise(0)
            ).alias("n_extra")
        )
    )
    return plan.join(extras, "lang").select(
        "lang",
        F.col("n").cast("bigint").alias("n_docs"),
        F.col("repeat_factor").cast("int").alias("repeat_factor"),
        F.col("n_extra").cast("bigint").alias("n_extra"),
        (F.col("n") * F.col("repeat_factor") + F.col("n_extra"))
        .cast("bigint")
        .alias("total_emitted"),
    )


# ---------------------------------------------------------------------------
# exact-dedup survivors (the applied dedup step)
# ---------------------------------------------------------------------------

@register(
    "dedup_survivors",
    category="dedup",
    oracle=r"""
WITH h AS (
  SELECT doc_id, lang, source,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS content_hash
  FROM documents),
keep AS (
  SELECT content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
  FROM h GROUP BY content_hash)
SELECT h.doc_id, h.lang, h.source, CAST(k.n_copies AS BIGINT) AS n_copies
FROM h JOIN keep k ON k.content_hash = h.content_hash AND k.keep_id = h.doc_id
""",
)
def dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLIED exact-dedup step: the surviving document rows (smallest
    id per normalized-content hash) carrying their duplicate multiplicity
    — what actually flows downstream after dedup_exact decides the groups.

    Shuffle carries (16-byte hash, id) twice (group + survivor rejoin),
    never text; the rejoin is an equi-join on the hash so survivors pull
    their own full rows without a second content pass."""
    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id",
        "lang",
        "source",
        F.md5(D.normalize_text(F.col("text"))).alias("content_hash"),
    )
    keep = h.groupBy("content_hash").agg(
        F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies")
    )
    return (
        h.join(keep, "content_hash")
        .filter(F.col("doc_id") == F.col("keep_id"))
        .select("doc_id", "lang", "source", F.col("n_copies").cast("bigint").alias("n_copies"))
    )


# ---------------------------------------------------------------------------
# Heaps-law vocabulary growth curve
# ---------------------------------------------------------------------------

_VOCAB_BUCKET_DOCS = 100


@register(
    "text_vocab_growth",
    category="text",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS token
  FROM documents),
first_seen AS (
  SELECT token, min(doc_id) // {_VOCAB_BUCKET_DOCS} AS first_bucket FROM tok GROUP BY token),
per AS (SELECT first_bucket, count(*) AS new_tokens FROM first_seen GROUP BY 1)
SELECT CAST(first_bucket AS BIGINT) AS bucket,
       CAST(new_tokens AS BIGINT) AS new_tokens,
       CAST(sum(new_tokens) OVER (ORDER BY first_bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS vocab_size
FROM per
""",
)
def text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth: distinct tokens seen after each
    100-document prefix of the corpus — the curve that sizes tokenizer
    vocabularies and predicts how much new data still adds new words.

    Same first-seen decomposition as users_cumulative_distinct (each
    token counted once, at its first bucket), so the cumulative curve is
    a running sum over the BUCKET-sized aggregate — never a distinct-count
    per expanding prefix. The running sum here joins bucket×bucket
    (dimension-sized)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = D.word_token_sets(docs)
    first_seen = tok.groupBy("token").agg(
        (F.min("doc_id") / _VOCAB_BUCKET_DOCS).cast("bigint").alias("first_bucket")
    )
    per = first_seen.groupBy("first_bucket").agg(
        F.count(F.lit(1)).alias("new_tokens")
    )
    a = per.select(F.col("first_bucket").alias("bi"))
    b = per.select(F.col("first_bucket").alias("bj"), "new_tokens")
    cum = (
        a.join(F.broadcast(b), F.col("bj") <= F.col("bi"))
        .groupBy("bi")
        .agg(F.sum("new_tokens").cast("bigint").alias("vocab_size"))
    )
    return per.join(F.broadcast(cum), per["first_bucket"] == cum["bi"]).select(
        F.col("first_bucket").cast("bigint").alias("bucket"),
        F.col("new_tokens").cast("bigint").alias("new_tokens"),
        "vocab_size",
    )


# ---------------------------------------------------------------------------
# embedding norm audit
# ---------------------------------------------------------------------------

@register(
    "dq_embedding_norms",
    category="quality",
    oracle="""
WITH n AS (
  SELECT label, sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings)
SELECT label, CAST(count(*) AS BIGINT) AS n_vectors,
       round(min(nrm), 6) AS min_norm,
       round(max(nrm), 6) AS max_norm,
       round(CAST(sum(CAST(round(nrm, 9) AS DECIMAL(20,9))) AS DOUBLE) / count(*), 6)
         AS mean_norm
FROM n GROUP BY label
""",
)
def dq_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-column health audit: L2 norm min/max/mean per label —
    catches the classic upstream failures (zero vectors, un-normalized
    batches, fp16 overflow spikes) before they poison similarity search.

    The norm is the sequential fold both engines share (certified by the
    near-dup queries); min/max are exact selections, and the mean rounds
    each norm to 9 dp then sums in DECIMAL so no float summation order
    exists. Pure projection + one group aggregate."""
    from arc_cassandra_pipeline_plugin_spark.functions import vec_double

    emb = load_table(spark, sf_dir, "embeddings")
    v = vec_double("embedding")
    dot = F.aggregate(
        F.zip_with(v, v, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    n = emb.select("label", F.sqrt(dot).alias("nrm"))
    return n.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.round(F.min("nrm"), 6).alias("min_norm"),
        F.round(F.max("nrm"), 6).alias("max_norm"),
        F.round(
            F.sum(F.round(F.col("nrm"), 9).cast("decimal(20,9)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_norm"),
    )


# ---------------------------------------------------------------------------
# LSH quality audit: precision/recall against exact shingle Jaccard
# ---------------------------------------------------------------------------

_LSH_TRUTH_PCT = 50  # exact-Jaccard truth threshold (percent)


def _lsh_quality_oracle() -> str:
    return f"""
WITH RECURSIVE {_clusters_cte()},
sizes AS (SELECT doc_id, count(*) AS m FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
truth AS (
  SELECT doc_a, doc_b FROM inter
  JOIN sizes sa ON sa.doc_id = inter.doc_a
  JOIN sizes sb ON sb.doc_id = inter.doc_b
  WHERE 100 * c >= {_LSH_TRUTH_PCT} * (sa.m + sb.m - c)),
hit AS (SELECT count(*) AS n_hit FROM pairs JOIN truth USING (doc_a, doc_b)),
cnts AS (
  SELECT (SELECT count(*) FROM pairs) AS n_candidates,
         (SELECT count(*) FROM truth) AS n_true,
         (SELECT n_hit FROM hit) AS n_hit)
SELECT CAST(n_candidates AS BIGINT) AS n_candidates,
       CAST(n_true AS BIGINT) AS n_true,
       CAST(n_hit AS BIGINT) AS n_hit,
       round(CAST(n_hit AS DOUBLE) / n_candidates, 6) AS precision_at_t,
       round(CAST(n_hit AS DOUBLE) / n_true, 6) AS recall_at_t
FROM cnts
"""


@register("dedup_lsh_quality_audit", category="dedup", oracle=_lsh_quality_oracle())
def dedup_lsh_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximation-quality audit for the MinHash-LSH pipeline: precision
    and recall of the banded candidate pairs against the EXACT shingle-
    Jaccard truth at 0.5 — the metric that tells an operator whether the
    band layout (16 perms × 4 bands) matches their dedup threshold before
    they spend a 100 TB pass on it.

    Truth comes from the brute-force shingle equi-join (feasible at audit
    scale — production audits run it on a deterministic sample via
    sample_deterministic); candidates are the certified LSH pairs; both
    threshold tests are integer cross-multiplications, and the two
    ratios are single IEEE divisions. The audit shares the band/shingle
    constants with every other dedup certification."""
    docs = load_table(spark, sf_dir, "documents")
    sigs = D.minhash_signature(docs, num_perm=_NUM_PERM, shingle_k=_SHINGLE_K)
    pairs = D.lsh_candidate_pairs(sigs, num_perm=_NUM_PERM, bands=_BANDS).select(
        "doc_a", "doc_b"
    ).localCheckpoint()
    sh = D.shingle_rows(
        docs, text_col="text", id_col="doc_id", k=_SHINGLE_K, distinct=True
    ).localCheckpoint()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("m"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    truth = (
        inter.join(
            sizes.withColumnsRenamed({"doc_id": "doc_a", "m": "ma"}), "doc_a"
        )
        .join(sizes.withColumnsRenamed({"doc_id": "doc_b", "m": "mb"}), "doc_b")
        .filter(
            F.lit(100) * F.col("c")
            >= F.lit(_LSH_TRUTH_PCT) * (F.col("ma") + F.col("mb") - F.col("c"))
        )
        .select("doc_a", "doc_b")
    )
    n_cand = pairs.agg(F.count(F.lit(1)).alias("n_candidates"))
    n_true = truth.agg(F.count(F.lit(1)).alias("n_true"))
    n_hit = pairs.join(truth, ["doc_a", "doc_b"]).agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    return (
        n_cand.crossJoin(n_true)
        .crossJoin(n_hit)
        .select(
            F.col("n_candidates").cast("bigint").alias("n_candidates"),
            F.col("n_true").cast("bigint").alias("n_true"),
            F.col("n_hit").cast("bigint").alias("n_hit"),
            F.round(
                F.col("n_hit").cast("double") / F.col("n_candidates"), 6
            ).alias("precision_at_t"),
            F.round(F.col("n_hit").cast("double") / F.col("n_true"), 6).alias(
                "recall_at_t"
            ),
        )
    )


# ---------------------------------------------------------------------------
# boilerplate n-gram detection
# ---------------------------------------------------------------------------

_BOILER_N = 8
_BOILER_MIN_DOCS = 2


@register(
    "text_boilerplate_ngrams",
    category="text",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk FROM documents),
grams AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, greatest(len(tk) - {_BOILER_N - 1}, 0)),
                               i -> array_to_string(tk[i:i+{_BOILER_N - 1}], ' '))) AS gram
  FROM toks)
SELECT gram, CAST(count(*) AS BIGINT) AS n_docs
FROM grams GROUP BY gram
HAVING count(*) >= {_BOILER_MIN_DOCS}
ORDER BY n_docs DESC, gram LIMIT 20
""",
)
def text_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate phrase detection: the 20 exact 8-token phrases repeated
    across the most documents — headers, disclaimers and template text
    that document-level dedup never catches because the surrounding page
    differs (the CCNet-style repeated-segment signal, here at n-gram
    granularity since the corpus has no line structure).

    Per-document phrase dedup happens before the corpus count; the
    frequency shuffle is keyed on the phrase text; top-20 compiles to
    TakeOrderedAndProject under a total order. Production removes the
    survivors with a broadcast anti-join of this output. At 100 TB the
    phrase key would be hashed (16 bytes) rather than carried verbatim —
    verbatim here keeps the certified output human-auditable."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0).alias("tk"),
    )
    grams = (
        toks.filter(F.size("tk") >= _BOILER_N)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("tk") - (_BOILER_N - 1)),
                    lambda i: F.array_join(F.slice("tk", i, _BOILER_N), " "),
                )
            ).alias("gram"),
        )
        .distinct()
    )
    return (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .filter(F.col("n_docs") >= _BOILER_MIN_DOCS)
        .orderBy(F.col("n_docs").desc(), "gram")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# per-source language-mixture drift (total-variation distance)
# ---------------------------------------------------------------------------

@register(
    "dq_source_lang_tvd",
    category="quality",
    oracle="""
WITH cell AS (SELECT source, lang, count(*) AS n FROM documents GROUP BY 1, 2),
src AS (SELECT source, sum(n) AS ns FROM cell GROUP BY source),
corpus AS (SELECT lang, sum(n) AS nl FROM cell GROUP BY lang),
tot AS (SELECT sum(n) AS t FROM cell),
langs AS (SELECT DISTINCT lang FROM cell),
grid AS (SELECT s.source, l.lang, s.ns FROM src s CROSS JOIN langs l),
terms AS (
  SELECT g.source,
         CAST(round(abs(CAST(coalesce(c.n, 0) AS DOUBLE) / g.ns
                        - CAST(co.nl AS DOUBLE) / tot.t), 9) AS DECIMAL(12,9)) AS d
  FROM grid g
  LEFT JOIN cell c ON c.source = g.source AND c.lang = g.lang
  JOIN corpus co ON co.lang = g.lang
  CROSS JOIN tot)
SELECT source,
       CAST((CAST(sum(d) * 1000000000 AS BIGINT) + 1000) // 2000 AS DOUBLE)
         / 1000000.0 AS tv_distance
FROM terms GROUP BY source
""",
)
def dq_source_lang_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-mixing audit: each source's language mixture compared to the
    corpus-wide mixture by total-variation distance (½·Σ|p−q|, in [0,1])
    — the log-free drift metric (unlike KL/JS divergence there is no
    transcendental, so it certifies exactly). A source with high TVD is
    skewing the blend and gets reweighted by the mixture sampler.

    Per-cell probability gaps are two fixed-order divisions, rounded to
    9 dp and summed in exact DECIMAL over the |sources|x|langs| grid —
    dimension-sized work after one corpus-wide count aggregate. The grid
    is built explicitly so languages ABSENT from a source still
    contribute their corpus mass (the classic TVD-underestimate bug when
    missing cells are silently dropped)."""
    docs = load_table(spark, sf_dir, "documents")
    cell = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    src = cell.groupBy("source").agg(F.sum("n").alias("ns"))
    corpus = cell.groupBy("lang").agg(F.sum("n").alias("nl"))
    tot = cell.agg(F.sum("n").alias("t"))
    langs = cell.select("lang").distinct()
    grid = src.crossJoin(F.broadcast(langs))
    terms = (
        grid.join(cell, ["source", "lang"], "left")
        .join(F.broadcast(corpus), "lang")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.round(
                F.abs(
                    F.coalesce(F.col("n"), F.lit(0)).cast("double") / F.col("ns")
                    - F.col("nl").cast("double") / F.col("t")
                ),
                9,
            )
            .cast("decimal(12,9)")
            .alias("d"),
        )
    )
    return terms.groupBy("source").agg(
        # sum(d) is on the 1e-9 grid; /2 puts halves exactly on 6-dp
        # boundaries with P~1e-3 per row, where double-round diverges
        # across engines — so the 6-dp half-up happens in exact integer
        # nano-units: (units + 1000) div 2000, then one exact double div
        F.expr(
            "cast((cast(sum(d) * 1000000000 as bigint) + 1000) div 2000"
            " as double) / 1000000.0"
        ).alias("tv_distance")
    )


# ---------------------------------------------------------------------------
# MinHash estimator calibration
# ---------------------------------------------------------------------------

def _minhash_calibration_oracle() -> str:
    match_sum = " + ".join(
        f"CASE WHEN x.mh_{p} = y.mh_{p} THEN 1 ELSE 0 END" for p in range(_NUM_PERM)
    )
    return f"""
WITH RECURSIVE {_clusters_cte()},
sizes AS (SELECT doc_id, count(*) AS m FROM sh GROUP BY doc_id),
inter AS (
  SELECT p.doc_a, p.doc_b, count(*) AS c
  FROM pairs p
  JOIN sh a ON a.doc_id = p.doc_a
  JOIN sh b ON b.doc_id = p.doc_b AND b.shingle = a.shingle
  GROUP BY 1, 2),
est AS (
  SELECT p.doc_a, p.doc_b, ({match_sum}) AS est_matches
  FROM pairs p JOIN sig x ON x.doc_id = p.doc_a JOIN sig y ON y.doc_id = p.doc_b),
scored AS (
  SELECT e.est_matches,
         CAST(round(coalesce(i.c, 0)
                    / CAST(sa.m + sb.m - coalesce(i.c, 0) AS DOUBLE), 6)
              AS DECIMAL(10,6)) AS j
  FROM est e
  LEFT JOIN inter i ON i.doc_a = e.doc_a AND i.doc_b = e.doc_b
  JOIN sizes sa ON sa.doc_id = e.doc_a
  JOIN sizes sb ON sb.doc_id = e.doc_b)
SELECT CAST(est_matches AS INT) AS est_matches,
       CAST(count(*) AS BIGINT) AS n_pairs,
       round(CAST(sum(j) AS DOUBLE) / count(*), 6) AS avg_exact_jaccard
FROM scored GROUP BY 1
"""


@register(
    "dedup_minhash_calibration_curve",
    category="dedup",
    oracle=_minhash_calibration_oracle(),
)
def dedup_minhash_calibration_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimator calibration for MinHash: over the LSH candidate pairs,
    bucket by the signature-agreement count (the Jaccard ESTIMATE is
    matches/num_perm) and report the mean EXACT shingle Jaccard per
    bucket — the curve that tells an operator how trustworthy the
    16-permutation estimate is before sizing num_perm for a 100 TB run
    (E[matches/k] = J; the per-bucket means expose the variance).

    Zero-overlap candidates (band hash collisions) are kept via the left
    join — dropping them is the classic calibration-inflation bug. Exact
    Jaccards round to 6 dp and average through a DECIMAL sum; the
    signature agreement count is pure integer equality."""
    docs = load_table(spark, sf_dir, "documents")
    sigs = D.minhash_signature(docs, num_perm=_NUM_PERM, shingle_k=_SHINGLE_K)
    sigs = sigs.localCheckpoint()
    pairs = D.lsh_candidate_pairs(sigs, num_perm=_NUM_PERM, bands=_BANDS).select(
        "doc_a", "doc_b"
    )
    x = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh_{p}").alias(f"xa_{p}") for p in range(_NUM_PERM)],
    )
    y = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh_{p}").alias(f"yb_{p}") for p in range(_NUM_PERM)],
    )
    match_sum = None
    for p in range(_NUM_PERM):
        term = F.when(F.col(f"xa_{p}") == F.col(f"yb_{p}"), 1).otherwise(0)
        match_sum = term if match_sum is None else match_sum + term
    est = pairs.join(x, "doc_a").join(y, "doc_b").select(
        "doc_a", "doc_b", match_sum.alias("est_matches")
    )
    sh = D.shingle_rows(
        docs, text_col="text", id_col="doc_id", k=_SHINGLE_K, distinct=True
    ).localCheckpoint()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("m"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        pairs.join(a, "doc_a")
        .join(b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    scored = (
        est.join(inter, ["doc_a", "doc_b"], "left")
        .join(sizes.withColumnsRenamed({"doc_id": "doc_a", "m": "ma"}), "doc_a")
        .join(sizes.withColumnsRenamed({"doc_id": "doc_b", "m": "mb"}), "doc_b")
        .select(
            "est_matches",
            F.round(
                F.coalesce(F.col("c"), F.lit(0))
                / (F.col("ma") + F.col("mb") - F.coalesce(F.col("c"), F.lit(0))).cast(
                    "double"
                ),
                6,
            )
            .cast("decimal(10,6)")
            .alias("j"),
        )
    )
    return scored.groupBy("est_matches").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.round(F.sum("j").cast("double") / F.count(F.lit(1)), 6).alias(
            "avg_exact_jaccard"
        ),
    ).select(
        F.col("est_matches").cast("int").alias("est_matches"),
        "n_pairs",
        "avg_exact_jaccard",
    )


# ---------------------------------------------------------------------------
# power-of-two length histogram (integer-exact log2)
# ---------------------------------------------------------------------------

@register(
    "text_length_histogram",
    category="text",
    oracle="""
SELECT CAST(length(bin(length(text))) - 1 AS INT) AS log2_bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(length(text)) AS BIGINT) AS min_chars,
       CAST(max(length(text)) AS BIGINT) AS max_chars
FROM documents WHERE length(text) > 0
GROUP BY 1
""",
)
def text_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two document-length histogram — the standard corpus shape
    summary (lengths are log-distributed, so linear buckets waste the
    range). floor(log2(n)) is computed EXACTLY as the binary-string
    length minus one (length(bin(n)) - 1) — integer string machinery on
    both engines, no floating log whose last-ulp could flip a boundary
    doc between buckets. One projection, bucket-count output."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    n = F.length("text")
    return docs.groupBy(
        (F.length(F.bin(n)) - 1).cast("int").alias("log2_bucket")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.min(n).cast("bigint").alias("min_chars"),
        F.max(n).cast("bigint").alias("max_chars"),
    )


# ---------------------------------------------------------------------------
# per-language length deciles (grouped exact discrete percentiles)
# ---------------------------------------------------------------------------

_DECILE_FRACS = [0.1, 0.25, 0.5, 0.75, 0.9]


@register(
    "text_length_deciles",
    category="text",
    oracle=f"""
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       {", ".join(
           f"CAST(quantile_disc(length(text), {f}) AS BIGINT) AS p{int(f * 100)}"
           for f in _DECILE_FRACS
       )}
FROM documents GROUP BY lang
""",
)
def text_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language document-length quantile profile (p10/p25/p50/p75/p90)
    — the curation dashboard's first cut for choosing per-language length
    filters (a p10 of 40 chars in one language and 400 in another means
    one shared cutoff silently biases the mix).

    Built on ``functions.lossless_pctl`` — the shared exact-discrete-
    percentile helper (``approx_percentile`` at ``LOSSLESS_PCTL_ACC`` ≡
    DuckDB ``quantile_disc`` while per-group rows ≤ accuracy; lengths are
    stored integers, so the order statistics compare bit-identically).

    Scale: one groupBy(lang) with 5 mergeable GK sketches per group —
    map-side partials, no second pass, no sort. At true corpus scale drop
    the accuracy to a real sketch budget (the helper's documented
    contract)."""
    from arc_cassandra_pipeline_plugin_spark import functions as FN

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "_len", F.length("text")
    )
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        *[
            FN.lossless_pctl("_len", f).cast("bigint").alias(f"p{int(f * 100)}")
            for f in _DECILE_FRACS
        ],
    )


# ---------------------------------------------------------------------------
# content-defined chunking (rolling-hash boundaries)
# ---------------------------------------------------------------------------

_CDC_K = 5
_CDC_MOD = 64


@register(
    "text_content_defined_chunks",
    category="text",
    oracle=f"""
WITH norm AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
              FROM documents),
pos AS (
  SELECT doc_id, length(t) AS n,
         unnest(generate_series(1, greatest(length(t) - {_CDC_K - 1}, 1))) AS i, t
  FROM norm),
marks AS (
  SELECT doc_id, n,
         CASE WHEN ('0x' || substr(md5(substr(t, i, {_CDC_K})), 1, 8))::BIGINT
                   % {_CDC_MOD} = 0 THEN 1 ELSE 0 END AS is_boundary
  FROM pos)
SELECT doc_id,
       CAST(1 + sum(is_boundary) AS BIGINT) AS n_chunks,
       round(CAST(any_value(n) AS DOUBLE) / (1 + sum(is_boundary)), 6) AS avg_chunk_len
FROM marks GROUP BY doc_id
""",
)
def text_content_defined_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (the rsync/dedup-storage primitive):
    chunk boundaries fall where the rolling k-gram hash ≡ 0 mod 64, so
    INSERTING text shifts only the chunks it touches — byte-offset
    chunking would re-chunk everything downstream. Expected chunk size is
    the modulus (~64 chars); the certified output is per-doc chunk count
    and mean chunk length.

    Same md5-prefix rolling hash as the winnowing scheme (portable to the
    oracle); one shingle explode + one doc-keyed aggregate — linear, and
    the fan-out rides the pre-amplification parallelism guard upstream."""
    docs = load_table(spark, sf_dir, "documents")
    from arc_cassandra_pipeline_plugin_spark.functions import ensure_parallelism

    normed = ensure_parallelism(
        docs.select(
            "doc_id",
            F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ").alias("t"),
        )
    )
    pos = normed.select(
        "doc_id",
        F.length("t").alias("n"),
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.length("t") - (_CDC_K - 1), F.lit(1)))
        ).alias("i"),
        "t",
    )
    h = F.conv(
        F.substring(F.md5(F.expr(f"substring(t, i, {_CDC_K})")), 1, 8), 16, 10
    ).cast("bigint")
    marks = pos.select(
        "doc_id",
        "n",
        F.when(h % _CDC_MOD == 0, 1).otherwise(0).alias("is_boundary"),
    )
    return marks.groupBy("doc_id").agg(
        (F.lit(1) + F.sum("is_boundary")).cast("bigint").alias("n_chunks"),
        F.round(
            F.any_value("n").cast("double") / (F.lit(1) + F.sum("is_boundary")), 6
        ).alias("avg_chunk_len"),
    )


# ---------------------------------------------------------------------------
# moving-average type-token ratio (MATTR lexical diversity)
# ---------------------------------------------------------------------------

_MATTR_W = 50


@register(
    "text_mattr_diversity",
    category="text",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk FROM documents),
wins AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(tk) - {_MATTR_W - 1}),
                i -> CAST(round(len(list_distinct(tk[i:i+{_MATTR_W - 1}]))
                                / CAST({_MATTR_W} AS DOUBLE), 6) AS DECIMAL(8,6)))) AS r
  FROM toks WHERE len(tk) >= {_MATTR_W})
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_windows,
       round(CAST(sum(r) AS DOUBLE) / count(*), 6) AS mattr
FROM wins GROUP BY doc_id
""",
)
def text_mattr_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATTR lexical diversity: the mean type-token ratio over sliding
    50-token windows — the length-unbiased richness metric (raw TTR
    shrinks with document length, so it cannot compare docs; MATTR can).
    Low MATTR flags templated/repetitive text for the quality cascade.

    Window work is width-bounded (each window counts distinct over a
    CONSTANT 50 tokens), so the total cost is tokens × 50 — linear, not
    quadratic. Per-window ratios round to 6 dp and average through a
    DECIMAL sum; docs shorter than one window are excluded identically on
    both engines."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0).alias("tk"),
    ).filter(F.size("tk") >= _MATTR_W)
    wins = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("tk") - (_MATTR_W - 1)),
                lambda i: F.round(
                    F.size(F.array_distinct(F.slice("tk", i, _MATTR_W)))
                    / F.lit(float(_MATTR_W)),
                    6,
                ).cast("decimal(8,6)"),
            )
        ).alias("r"),
    )
    return wins.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_windows"),
        F.round(F.sum("r").cast("double") / F.count(F.lit(1)), 6).alias("mattr"),
    )


# ---------------------------------------------------------------------------
# asymmetric containment (excerpt / subset detection)
# ---------------------------------------------------------------------------

_CONTAIN_PCT = 90


def _containment_oracle() -> str:
    return f"""
WITH RECURSIVE {_clusters_cte()},
sizes AS (SELECT doc_id, count(*) AS m FROM sh GROUP BY doc_id),
inter AS (
  SELECT p.doc_a, p.doc_b, count(*) AS c
  FROM pairs p
  JOIN sh a ON a.doc_id = p.doc_a
  JOIN sh b ON b.doc_id = p.doc_b AND b.shingle = a.shingle
  GROUP BY 1, 2)
SELECT i.doc_a, i.doc_b,
       round(i.c / CAST(sa.m AS DOUBLE), 6) AS contain_a_in_b,
       round(i.c / CAST(sb.m AS DOUBLE), 6) AS contain_b_in_a
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE 100 * i.c >= {_CONTAIN_PCT} * sa.m OR 100 * i.c >= {_CONTAIN_PCT} * sb.m
"""


@register("dedup_containment_pairs", category="dedup", oracle=_containment_oracle())
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC containment |A∩B|/|A| over LSH candidates: finds
    documents mostly CONTAINED in another (quotes, excerpts, page-plus-
    boilerplate wrappers) — pairs symmetric Jaccard scores low precisely
    because the containing document is much larger. The curation action
    differs too: containment drops the fragment, Jaccard dedup picks a
    canonical.

    Shares the band/shingle constants with the whole dedup family;
    thresholds are integer cross-multiplications per side, the two ratios
    single IEEE divisions. Verification work is candidate-bounded."""
    docs = load_table(spark, sf_dir, "documents")
    sigs = D.minhash_signature(docs, num_perm=_NUM_PERM, shingle_k=_SHINGLE_K)
    pairs = D.lsh_candidate_pairs(sigs, num_perm=_NUM_PERM, bands=_BANDS).select(
        "doc_a", "doc_b"
    )
    sh = D.shingle_rows(
        docs, text_col="text", id_col="doc_id", k=_SHINGLE_K, distinct=True
    ).localCheckpoint()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("m"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        pairs.join(a, "doc_a")
        .join(b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"doc_id": "doc_a", "m": "ma"}), "doc_a")
        .join(sizes.withColumnsRenamed({"doc_id": "doc_b", "m": "mb"}), "doc_b")
        .filter(
            (F.lit(100) * F.col("c") >= F.lit(_CONTAIN_PCT) * F.col("ma"))
            | (F.lit(100) * F.col("c") >= F.lit(_CONTAIN_PCT) * F.col("mb"))
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("c") / F.col("ma").cast("double"), 6).alias("contain_a_in_b"),
            F.round(F.col("c") / F.col("mb").cast("double"), 6).alias("contain_b_in_a"),
        )
    )


# ---------------------------------------------------------------------------
# per-dimension embedding variance profile
# ---------------------------------------------------------------------------

@register(
    "dq_embedding_dim_variance",
    category="quality",
    oracle="""
WITH e AS (
  SELECT generate_subscripts(embedding, 1) AS dim_idx,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings),
m AS (
  SELECT dim_idx, count(*) AS n,
         sum(CAST(round(x, 9) AS DECIMAL(20,9))) AS sx,
         sum(CAST(round(x * x, 9) AS DECIMAL(24,9))) AS sx2
  FROM e GROUP BY dim_idx)
SELECT CAST(dim_idx AS INT) AS dim_idx,
       round(CAST(sx AS DOUBLE) / n, 6) AS dim_mean,
       round(CAST(sx2 AS DOUBLE) / n
             - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n), 6) AS dim_variance
FROM m
""",
)
def dq_embedding_dim_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding variance profile: dead dimensions
    (variance ≈ 0) waste index space and dominant ones distort distances
    — the feature-health scan run before building an ANN index or
    quantizer. Values and their squares round to 9 dp and sum in DECIMAL
    (no float order), the two moments divide once each, and the shuffle
    carries (dim, partial-sum) pairs — never vectors. 64 output rows at
    any corpus size."""
    from arc_cassandra_pipeline_plugin_spark.functions import vec_double

    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        F.posexplode(vec_double("embedding")).alias("dim_idx0", "x")
    ).select((F.col("dim_idx0") + 1).alias("dim_idx"), "x")
    m = e.groupBy("dim_idx").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("x"), 9).cast("decimal(20,9)")).alias("sx"),
        F.sum(F.round(F.col("x") * F.col("x"), 9).cast("decimal(24,9)")).alias("sx2"),
    )
    mean = F.col("sx").cast("double") / F.col("n")
    return m.select(
        F.col("dim_idx").cast("int").alias("dim_idx"),
        F.round(mean, 6).alias("dim_mean"),
        F.round(F.col("sx2").cast("double") / F.col("n") - mean * mean, 6).alias(
            "dim_variance"
        ),
    )


# ---------------------------------------------------------------------------
# Zipf rank-frequency profile
# ---------------------------------------------------------------------------

@register(
    "text_zipf_profile",
    category="text",
    oracle="""
WITH tok AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token FROM documents),
freq AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
ranked AS (
  SELECT token, n, row_number() OVER (ORDER BY n DESC, token) AS rnk FROM freq),
top1 AS (SELECT n AS n1 FROM ranked WHERE rnk = 1)
SELECT CAST(rnk AS INT) AS rnk, token, CAST(n AS BIGINT) AS n_occurrences,
       round(CAST(n AS DOUBLE) / n1, 6) AS freq_ratio,
       round(CAST(n * rnk AS DOUBLE) / n1, 6) AS zipf_product
FROM ranked CROSS JOIN top1
WHERE rnk <= 50
""",
)
def text_zipf_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency profile for the top-50 tokens: frequency ratio
    to the rank-1 token and the rank×ratio product — for Zipfian text the
    product hovers near constant, and large deviations flag synthetic or
    templated corpora (a log-free goodness check; fitting the exponent
    needs logs and belongs offline).

    The top-50 rank is a TakeOrderedAndProject-style selection over the
    token aggregate (the full ranking never materializes past the heap);
    the rank-1 count broadcasts as one row. All counts integer, two
    rounded divisions."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0)
        ).alias("token")
    )
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    top = freq.orderBy(F.col("n").desc(), "token").limit(50)
    w = Window.orderBy(F.col("n").desc(), "token")
    ranked = top.withColumn("rnk", F.row_number().over(w))
    top1 = ranked.filter(F.col("rnk") == 1).select(F.col("n").alias("n1"))
    return ranked.crossJoin(F.broadcast(top1)).select(
        F.col("rnk").cast("int").alias("rnk"),
        "token",
        F.col("n").cast("bigint").alias("n_occurrences"),
        F.round(F.col("n").cast("double") / F.col("n1"), 6).alias("freq_ratio"),
        F.round((F.col("n") * F.col("rnk")).cast("double") / F.col("n1"), 6).alias(
            "zipf_product"
        ),
    )


# ---------------------------------------------------------------------------
# HOCON-driven curation pipeline, certified end-to-end
# ---------------------------------------------------------------------------

@register(
    "pipeline_hocon_curation",
    category="pipeline",
    oracle="""
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS total_chars
FROM documents
WHERE length(text) >= 200 GROUP BY lang
""",
)
def pipeline_hocon_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's full composition path under the correctness gate:
    HOCON text (comments, unquoted keys — Typesafe Config parity) →
    error-accumulating parse → Extract stage → SQLTransform with Arc-style
    ${} sqlParams injection → result view, certified against the plain-SQL
    oracle. The sibling
    pipeline_declarative certifies the dict-config path; this one
    certifies the CONFIG SYNTAX the reference's users actually write."""
    from arc_cassandra_pipeline_plugin_spark.config import parse_config
    from arc_cassandra_pipeline_plugin_spark.context import PipelineContext

    conf_text = f"""
    // corpus curation: length gate + per-language stats (HOCON syntax)
    stages = [
      {{
        type = ParquetExtract
        name = "extract documents"
        environments = [production, test]
        inputURI = "{sf_dir}/documents.parquet"
        outputView = docs_v
      }}
      {{
        type = SQLTransform
        name = "per-language stats over the length gate"
        environments = [production, test]
        sql = \"\"\"
          SELECT lang,
                 CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(length(text)) AS BIGINT) AS total_chars
          FROM docs_v WHERE length(text) >= ${{min_chars}} GROUP BY lang
        \"\"\"
        sqlParams = {{ min_chars = "200" }}
        outputView = lang_stats
      }}
    ]
    """
    ctx = PipelineContext(environment="test")
    pipeline = parse_config(conf_text, ctx)
    result = pipeline.run(spark, ctx)
    assert result is not None
    return result


# ---------------------------------------------------------------------------
# n-gram novelty scoring (pairless near-dup signal)
# ---------------------------------------------------------------------------

@register(
    "text_ngram_novelty",
    category="text",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk FROM documents),
grams AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, len(tk) - 7),
                               i -> array_to_string(tk[i:i+7], ' '))) AS gram
  FROM toks WHERE len(tk) >= 8),
firsts AS (SELECT gram, min(doc_id) AS first_doc FROM grams GROUP BY gram),
per AS (
  SELECT g.doc_id,
         count(*) AS n_grams,
         sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS n_novel
  FROM grams g JOIN firsts f ON f.gram = g.gram
  GROUP BY g.doc_id)
SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
       CAST(n_novel AS BIGINT) AS n_novel,
       round(CAST(n_novel AS DOUBLE) / n_grams, 6) AS novelty_ratio
FROM per
""",
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAIRLESS near-duplicate signal: each document's fraction of 8-gram
    phrases not seen in any earlier document (by ingestion order) — the
    streaming-corpus novelty score. A near-copy of an earlier doc scores
    ≈0 without ever materializing a candidate pair, which makes this the
    cheap pre-filter BEFORE pairwise dedup at 100 TB.

    First-seen decomposition again: one distinct-gram explode, one
    min-per-gram aggregate, one rejoin keyed on the gram — all linear; no
    pair join exists anywhere. Counts integer, one rounded division."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0).alias("tk"),
    ).filter(F.size("tk") >= 8)
    grams = (
        toks.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("tk") - 7),
                    lambda i: F.array_join(F.slice("tk", i, 8), " "),
                )
            ).alias("gram"),
        )
        .distinct()
    )
    firsts = grams.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    per = (
        grams.join(firsts, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
    )
    return per.select(
        "doc_id",
        F.col("n_grams").cast("bigint").alias("n_grams"),
        F.col("n_novel").cast("bigint").alias("n_novel"),
        F.round(F.col("n_novel").cast("double") / F.col("n_grams"), 6).alias(
            "novelty_ratio"
        ),
    )


# ---------------------------------------------------------------------------
# normalization gain audit
# ---------------------------------------------------------------------------

@register(
    "dedup_normalization_gain",
    category="dedup",
    oracle=r"""
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT md5(text)) AS BIGINT) AS distinct_raw,
       CAST(count(DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')))
            AS BIGINT) AS distinct_normalized,
       CAST(count(DISTINCT md5(text))
            - count(DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')))
            AS BIGINT) AS extra_dups_found
FROM documents
""",
)
def dedup_normalization_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization payoff audit: how many duplicate groups exist only
    AFTER case/whitespace canonicalization — the number that justifies
    (or kills) a normalization pass before exact dedup. Two fingerprint
    distinct-counts in one aggregate; hashes shuffle, text never does."""
    docs = load_table(spark, sf_dir, "documents")
    raw = F.md5(F.col("text"))
    norm = F.md5(D.normalize_text(F.col("text")))
    return docs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct(raw).cast("bigint").alias("distinct_raw"),
        F.countDistinct(norm).cast("bigint").alias("distinct_normalized"),
        (F.countDistinct(raw) - F.countDistinct(norm))
        .cast("bigint")
        .alias("extra_dups_found"),
    )


# ---------------------------------------------------------------------------
# hapax legomena ratio
# ---------------------------------------------------------------------------

@register(
    "text_hapax_ratio",
    category="text",
    oracle="""
WITH tok AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token FROM documents),
freq AS (SELECT token, count(*) AS n FROM tok GROUP BY token)
SELECT CAST(count(*) AS BIGINT) AS vocab_size,
       CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       round(CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
         AS hapax_ratio
FROM freq
""",
)
def text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax legomena ratio: the fraction of vocabulary occurring exactly
    once — healthy natural text sits near 0.4-0.6; far above flags OCR
    noise or random identifiers, far below flags templated text. The
    one-number vocabulary-health gate next to the Zipf profile. One token
    aggregate, integer counts, one division."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0)
        ).alias("token")
    )
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    return freq.agg(
        F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
        F.sum(F.when(F.col("n") == 1, 1).otherwise(0)).cast("bigint").alias("n_hapax"),
        F.round(
            F.sum(F.when(F.col("n") == 1, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("hapax_ratio"),
    )


# ---------------------------------------------------------------------------
# source-pair vocabulary overlap (redundancy map)
# ---------------------------------------------------------------------------

@register(
    "corpus_source_vocab_overlap",
    category="text",
    oracle="""
WITH st AS (
  SELECT DISTINCT source, unnest(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS token
  FROM documents),
sizes AS (SELECT source, count(*) AS m FROM st GROUP BY source),
inter AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*) AS c
  FROM st a JOIN st b ON a.token = b.token AND a.source < b.source
  GROUP BY 1, 2)
SELECT source_a, source_b,
       round(c / CAST(sa.m + sb.m - c AS DOUBLE), 6) AS vocab_jaccard
FROM inter
JOIN sizes sa ON sa.source = inter.source_a
JOIN sizes sb ON sb.source = inter.source_b
""",
)
def corpus_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-redundancy map: vocabulary Jaccard between every source
    pair — near-identical vocabularies flag mirrored or re-crawled
    sources BEFORE document-level dedup spends a pass on them.

    The pair stage is the inverted-index join keyed on token (sources
    meet only where vocabularies intersect); output and the size join are
    sources² — dimension-bounded. Exact integer set math, one rounded
    division per pair."""
    docs = load_table(spark, sf_dir, "documents")
    st = docs.select(
        "source",
        F.explode(
            F.array_distinct(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0)
            )
        ).alias("token"),
    ).distinct()
    sizes = st.groupBy("source").agg(F.count(F.lit(1)).alias("m"))
    a = st.select(F.col("source").alias("source_a"), "token")
    b = st.select(F.col("source").alias("source_b"), "token")
    inter = (
        a.join(b, "token")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        inter.join(
            sizes.withColumnsRenamed({"source": "source_a", "m": "ma"}), "source_a"
        )
        .join(sizes.withColumnsRenamed({"source": "source_b", "m": "mb"}), "source_b")
        .select(
            "source_a",
            "source_b",
            F.round(
                F.col("c") / (F.col("ma") + F.col("mb") - F.col("c")).cast("double"),
                6,
            ).alias("vocab_jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# exact duplicate vectors
# ---------------------------------------------------------------------------

@register(
    "dedup_exact_vectors",
    category="dedup",
    oracle="""
WITH h AS (
  SELECT vec_id, label,
         md5(array_to_string(list_transform(embedding, x -> printf('%.6f', CAST(x AS DOUBLE))), ',')) AS vh
  FROM embeddings),
g AS (SELECT vh, min(vec_id) AS keep_id, count(*) AS n_copies FROM h GROUP BY vh)
SELECT CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(n_copies) AS BIGINT) AS n_vectors,
       CAST(sum(CASE WHEN n_copies > 1 THEN n_copies - 1 ELSE 0 END) AS BIGINT)
         AS n_redundant
FROM g
""",
)
def dedup_exact_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate VECTOR detection: embeddings fingerprinted by the
    md5 of their fixed-precision rendering — repeated vectors mean
    repeated inputs upstream (or a collapsed encoder), and they bias
    nearest-neighbor training if left in. The %.6f rendering makes the
    fingerprint engine-portable (raw float-to-string is not); shuffles
    carry 16-byte hashes, never vectors. One aggregate, 1-row audit."""
    from arc_cassandra_pipeline_plugin_spark.functions import vec_double

    emb = load_table(spark, sf_dir, "embeddings")
    vh = F.md5(
        F.array_join(
            F.transform(vec_double("embedding"), lambda x: F.format_string("%.6f", x)),
            ",",
        )
    )
    g = emb.select(vh.alias("vh")).groupBy("vh").agg(
        F.count(F.lit(1)).alias("n_copies")
    )
    return g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum("n_copies").cast("bigint").alias("n_vectors"),
        F.sum(
            F.when(F.col("n_copies") > 1, F.col("n_copies") - 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_redundant"),
    )


# ---------------------------------------------------------------------------
# numeric-token density
# ---------------------------------------------------------------------------

@register(
    "text_numeric_density",
    category="text",
    oracle="""
WITH t AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens,
         len(regexp_extract_all(lower(text), '\\b[0-9]+\\b')) AS n_numeric
  FROM documents)
SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens, CAST(n_numeric AS INT) AS n_numeric,
       CASE WHEN n_tokens = 0 THEN 0.0
            ELSE round(CAST(n_numeric AS DOUBLE) / n_tokens, 6) END AS numeric_density,
       5 * n_numeric > n_tokens AS numeric_heavy
FROM t
""",
)
def text_numeric_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric-token density per document: tables, logs and scraped
    numeric noise read as prose to length filters but train poorly — the
    >20% flag (integer cross-multiplied) is the cheap screen. One
    codegen'd projection; the density is a single guarded division."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0)
    )
    n_numeric = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"\b[0-9]+\b"), 0)
    )
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_numeric.alias("n_numeric"),
        F.when(n_tokens == 0, F.lit(0.0))
        .otherwise(F.round(n_numeric.cast("double") / n_tokens, 6))
        .alias("numeric_density"),
        (F.lit(5) * n_numeric > n_tokens).alias("numeric_heavy"),
    )


# ---------------------------------------------------------------------------
# intra-document repetition (Gopher-style repetition quality signal)
# ---------------------------------------------------------------------------

@register(
    "text_repetition_ratio",
    category="text",
    oracle="""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk FROM documents),
b AS (
  SELECT doc_id,
         list_transform(generate_series(1, len(tk) - 1),
                        i -> tk[i] || ' ' || tk[i + 1]) AS bg
  FROM t WHERE len(tk) >= 2)
SELECT doc_id,
       CAST(len(bg) AS BIGINT) AS n_bigrams,
       CAST(len(list_distinct(bg)) AS BIGINT) AS n_distinct,
       round(1 - len(list_distinct(bg)) / CAST(len(bg) AS DOUBLE), 6)
         AS dup_bigram_ratio
FROM b
""",
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition: the fraction of word bigrams that are
    duplicates of an earlier bigram in the SAME document — the classic
    'repetition' quality signal (boilerplate loops, keyword stuffing, and
    decoding loops all spike it) used to gate training corpora.

    Pure projection: tokens → adjacent-bigram array (higher-order
    ``transform`` over an index ``sequence``) → two array sizes and one
    exactly-rounded division. No shuffle at all — the plan is scan +
    project, embarrassingly parallel at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    tk = F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
    bg = F.expr(
        "transform(sequence(1, size(t) - 1),"
        " i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
    )
    return (
        docs.select("doc_id", tk.alias("t"))
        .filter(F.size("t") >= 2)
        .select("doc_id", bg.alias("bg"))
        .select(
            "doc_id",
            F.size("bg").cast("bigint").alias("n_bigrams"),
            F.size(F.array_distinct("bg")).cast("bigint").alias("n_distinct"),
            F.round(
                F.lit(1)
                - F.size(F.array_distinct("bg"))
                / F.size("bg").cast("double"),
                6,
            ).alias("dup_bigram_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# cross-document repeated spans (exact substring-dedup family)
# ---------------------------------------------------------------------------

_SPAN_K = 8


def _span_oracle() -> str:
    return f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk FROM documents),
sp AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(tk) - {_SPAN_K - 1}),
                               i -> array_to_string(list_slice(tk, i, i + {_SPAN_K - 1}), ' ')))
           AS span
  FROM t WHERE len(tk) >= {_SPAN_K})
SELECT md5(span) AS span_hash,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_occurrences
FROM sp GROUP BY span HAVING count(DISTINCT doc_id) >= 2
"""


@register("dedup_repeated_spans", category="dedup", oracle=_span_oracle())
def dedup_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated token spans: every {k}-token window that
    occurs in two or more documents, with its document and occurrence
    counts — the detection half of exact substring deduplication (the
    'dedupe repeated 50-grams' treatment applied to web-scale training
    sets; k shrunk to the fixture's doc lengths).

    Scale shape: one explode (docs × spans, linear in corpus tokens), one
    groupBy on the span with map-side partial aggregation; the span text
    never leaves the executor — the output carries its md5. Count-distinct
    over doc_id is exact (per-span doc lists are tiny); the >= 2 filter
    makes the result the duplicated-span inventory, not the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    tk = F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
    spans = F.expr(
        f"transform(sequence(1, size(t) - {_SPAN_K - 1}),"
        f" i -> concat_ws(' ', slice(t, i, {_SPAN_K})))"
    )
    return (
        docs.select("doc_id", tk.alias("t"))
        .filter(F.size("t") >= _SPAN_K)
        .select("doc_id", F.explode(spans).alias("span"))
        .groupBy("span")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= 2)
        .select(F.md5("span").alias("span_hash"), "n_docs", "n_occurrences")
    )


# ---------------------------------------------------------------------------
# per-source n-gram novelty (dataset-mixing signal)
# ---------------------------------------------------------------------------

@register(
    "text_source_novelty",
    category="text",
    oracle=f"""
WITH t AS (
  SELECT doc_id, source, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
  FROM documents),
sp AS (
  SELECT source,
         unnest(list_transform(generate_series(1, len(tk) - {_SPAN_K - 1}),
                               i -> array_to_string(list_slice(tk, i, i + {_SPAN_K - 1}), ' ')))
           AS span
  FROM t WHERE len(tk) >= {_SPAN_K})
SELECT source,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(count(DISTINCT span) AS BIGINT) AS n_distinct_spans,
       round(count(DISTINCT span) / CAST(count(*) AS DOUBLE), 6) AS novelty
FROM sp GROUP BY source
""",
)
def text_source_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source n-gram novelty: distinct {k}-token spans over total spans
    per source — the dataset-mixing diagnostic for 'how much of this
    source is template re-emission vs new text' (a source whose novelty
    collapses is mostly duplicating itself and should be downweighted).

    One explode + one two-level aggregate; the exact distinct count
    shuffles (source, span-hash)-grouped partials, never raw text twice.
    Sources are few, so the final agg is trivially small."""
    docs = load_table(spark, sf_dir, "documents")
    tk = F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
    spans = F.expr(
        f"transform(sequence(1, size(t) - {_SPAN_K - 1}),"
        f" i -> concat_ws(' ', slice(t, i, {_SPAN_K})))"
    )
    return (
        docs.select("source", tk.alias("t"))
        .filter(F.size("t") >= _SPAN_K)
        .select("source", F.explode(spans).alias("span"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_spans"),
            F.countDistinct("span").cast("bigint").alias("n_distinct_spans"),
            F.round(
                F.countDistinct("span") / F.count(F.lit(1)).cast("double"), 6
            ).alias("novelty"),
        )
    )


_EPOCH_SEED = "epoch1:"
_EPOCH_SHARDS = 8


@register(
    "sample_epoch_shuffle",
    category="sampling",
    oracle=f"""
WITH k AS (
  SELECT doc_id,
         ('0x' || substr(md5('{_EPOCH_SEED}' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS key
  FROM documents)
SELECT doc_id,
       row_number() OVER (ORDER BY key, doc_id) AS pos,
       CAST((row_number() OVER (ORDER BY key, doc_id) - 1) % {_EPOCH_SHARDS} AS INT) AS shard
FROM k
""",
)
def sample_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-epoch shuffle: every document gets an exact
    global position in a pseudo-random permutation (order by
    md5(seed || doc_id) — reproducible across runs, re-keyable per epoch
    by changing the seed) plus a round-robin shard id, so each emitted
    shard is a uniform sample of the corpus. The permutation rank comes
    from the two-phase bucketed global row_number
    (operators/ranking.global_row_number) — no single-partition window
    anywhere, so the shuffle holds at 100 TB where a plain
    Window.orderBy would serialize the corpus through one task."""
    from arc_cassandra_pipeline_plugin_spark.operators.ranking import global_row_number

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(_EPOCH_SEED), F.col("doc_id").cast("string"))),
                1, 15,
            ),
            16, 10,
        ).cast("bigint").alias("key"),
    )
    ranked = global_row_number(docs, "key", ["doc_id"], out_col="pos")
    return ranked.select(
        "doc_id",
        "pos",
        ((F.col("pos") - 1) % _EPOCH_SHARDS).cast("int").alias("shard"),
    )


# ---------------------------------------------------------------------------
# sequence packing: concat-and-chunk context windows
# ---------------------------------------------------------------------------

_PACK_BUDGET = 512


@register(
    "pack_context_windows",
    category="sampling",
    oracle=f"""
WITH d AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens
  FROM documents),
p AS (
  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS s
  FROM d WHERE n_tokens > 0),
e AS (
  SELECT doc_id, n_tokens, s,
         unnest(range(s // {_PACK_BUDGET},
                      (s + n_tokens - 1) // {_PACK_BUDGET} + 1)) AS chunk_id
  FROM p)
SELECT doc_id,
       CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(greatest(0, chunk_id * {_PACK_BUDGET} - s) AS BIGINT) AS doc_from,
       CAST(least(n_tokens, (chunk_id + 1) * {_PACK_BUDGET} - s) AS BIGINT)
         AS doc_to,
       CAST(greatest(0, s - chunk_id * {_PACK_BUDGET}) AS BIGINT) AS chunk_from,
       CAST(least(n_tokens, (chunk_id + 1) * {_PACK_BUDGET} - s)
            - greatest(0, chunk_id * {_PACK_BUDGET} - s) AS BIGINT) AS n_slice
FROM e
""",
)
def pack_context_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing (operators/packing.pack_sequences):
    documents in doc_id order are laid out on one global token stream and
    split at 512-token window boundaries; each output row is the span of a
    document inside one window. The global offsets come from the two-phase
    exclusive prefix sum (operators/ranking.global_prefix_sum) — no
    single-partition window — and every boundary is exact long arithmetic,
    so the DuckDB window-sum oracle replays it bit-for-bit."""
    from arc_cassandra_pipeline_plugin_spark.operators.packing import pack_sequences

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0)
        ).alias("n_tokens"),
    )
    return pack_sequences(docs, budget=_PACK_BUDGET).drop("n_tokens")


# ---------------------------------------------------------------------------
# BM25 retrieval scoring
# ---------------------------------------------------------------------------

_BM25_TERMS = ["vector", "hash", "window", "spark", "columnar"]


@register(
    "text_bm25_ranking",
    category="text",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
  FROM documents),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, sum(dl) AS corpus_tokens FROM dl),
q AS (SELECT unnest({_BM25_TERMS!r}) AS token),
tf AS (
  SELECT t.doc_id, t.token, count(*) AS tf
  FROM tok t JOIN q USING (token) GROUP BY t.doc_id, t.token),
dfr AS (SELECT token, count(*) AS dfreq FROM tf GROUP BY token),
contrib AS (
  SELECT tf.doc_id,
         CAST(round(
           (round(ln((s.n_docs - d.dfreq + 0.5) / (d.dfreq + 0.5) + 1.0), 6)
            * (tf.tf * (1.2 + 1.0)))
           / (tf.tf + 1.2 * ((1.0 - 0.75)
              + 0.75 * (dl.dl / (s.corpus_tokens / s.n_docs)))),
           6) AS DECIMAL(18,6)) AS c
  FROM tf
  JOIN dl USING (doc_id)
  JOIN dfr d USING (token)
  CROSS JOIN stats s)
SELECT doc_id,
       CAST(count(*) AS INT) AS n_hit,
       CAST(round(sum(c), 4) AS DOUBLE) AS bm25
FROM contrib GROUP BY doc_id
""",
)
def text_bm25_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance of every document against a 5-term query
    (operators/text.bm25_scores): k1=1.2, b=0.75, idf = ln(1+(N-df+0.5)/
    (df+0.5)). Doc lengths and corpus stats are linear aggregates, the term
    list and per-term document frequencies ride broadcast joins, and every
    constant is folded ENGINE-side with identical literal shape on both
    engines (1.2+1.0 is not the double 2.2 — see the operator docstring)."""
    from arc_cassandra_pipeline_plugin_spark.operators.text import bm25_scores

    return bm25_scores(load_table(spark, sf_dir, "documents"), _BM25_TERMS)


# ---------------------------------------------------------------------------
# Ed-Join: prefix-filtered edit-distance similarity join
# ---------------------------------------------------------------------------


@register(
    "dedup_editdist_join",
    category="dedup",
    oracle="""
WITH s AS (SELECT c_custkey AS id, c_name AS s FROM customer)
SELECT a.id AS id_a, b.id AS id_b,
       CAST(levenshtein(a.s, b.s) AS INT) AS edit_dist
FROM s a JOIN s b
  ON a.id < b.id AND abs(length(a.s) - length(b.s)) <= 1
WHERE levenshtein(a.s, b.s) <= 1
""",
)
def dedup_editdist_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All customer-name pairs within Levenshtein distance 1, via the
    prefix-filtered q-gram Ed-Join (operators/dedup.editdist_join_prefix):
    candidates only from rarest-(d*q+1) gram prefixes under a global
    frequency order (provably complete), length filter inside the join,
    banded-DP levenshtein verification. The oracle is the brute-force
    length-banded all-pairs — feasible at oracle scale, exactly what the
    filter chain provably reproduces."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("s")
    )
    return D.editdist_join_prefix(cust, max_dist=1)


@register(
    "text_chunk_overlap",
    category="text",
    oracle="""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+', 0) AS t
  FROM documents),
starts AS (
  SELECT doc_id, t, len(t) AS n, unnest(range(0, greatest(len(t), 1), 48)) AS s
  FROM toks WHERE len(t) >= 1),
chunks AS (
  SELECT doc_id, CAST(s // 48 AS INT) AS chunk_idx,
         t[s + 1 : least(s + 64, n)] AS c
  FROM starts)
SELECT doc_id, chunk_idx,
       CAST(len(c) AS INT) AS n_tokens,
       c[1] AS first_tok, c[len(c)] AS last_tok,
       substr(md5(array_to_string(c, ' ')), 1, 16) AS chunk_fp
FROM chunks
""",
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping context-window chunking (window 64 tokens, stride 48 —
    16-token overlap): the RAG / embedding-index preprocessing step that
    turns documents into retrievable units, certified chunk-for-chunk
    (count, boundary tokens, md5 fingerprint of the joined text).

    Chunk boundaries are pure integer arithmetic over the token array
    (sequence of starts, slice per start) — computed ENGINE-SIDE with no
    window function and no Python; the explode fans out ~n/48 rows per
    doc, and everything downstream keys on doc_id. At 100 TB this is one
    tokenize pass, shuffle-free until a consumer groups the chunks."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id",
        F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)").alias("t"),
    ).filter(F.size("t") >= 1)
    chunks = toks.select(
        "doc_id",
        F.size("t").alias("n"),
        "t",
        F.explode(
            F.expr("sequence(0, greatest(size(t) - 1, 0), 48)")
        ).alias("s"),
    ).select(
        "doc_id",
        (F.col("s") / 48).cast("int").alias("chunk_idx"),
        F.expr("slice(t, s + 1, 64)").alias("c"),
    )
    return chunks.select(
        "doc_id",
        "chunk_idx",
        F.size("c").cast("int").alias("n_tokens"),
        F.element_at("c", 1).alias("first_tok"),
        F.element_at("c", -1).alias("last_tok"),
        F.substring(F.md5(F.array_join("c", " ")), 1, 16).alias("chunk_fp"),
    )


@register(
    "dedup_blocked_entity_resolution",
    category="dedup",
    oracle="""
WITH o AS (
  SELECT o_orderkey AS k, o_custkey AS cust, o_orderdate AS d,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders),
pairs AS (
  SELECT a.cust,
         abs(a.cents - b.cents) AS cents_diff,
         abs(date_diff('day', a.d, b.d)) AS day_diff
  FROM o a JOIN o b
    ON a.cust = b.cust AND a.k < b.k
   AND abs(date_diff('day', a.d, b.d)) <= 90)
SELECT cust, CAST(count(*) AS BIGINT) AS n_candidate_pairs,
       CAST(sum(CASE WHEN cents_diff <= 100000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_suspect_pairs,
       CAST(min(cents_diff) AS BIGINT) AS min_cents_diff,
       CAST(min(day_diff) AS BIGINT) AS min_day_diff
FROM pairs GROUP BY 1
""",
)
def dedup_blocked_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked entity resolution, candidate-generation + scoring: order
    pairs from the SAME customer within a 90-day window are the candidate
    set (the blocking-key pattern every ER pipeline uses — compare only
    within blocks, never across the corpus); candidates within $1000 are
    scored suspect, and per-customer minima report how close the nearest
    pair gets (the match-threshold tuning table).

    Scale shape: pair generation is a self-equi-join keyed by the BLOCK
    (customer), so per-block work is orders-per-customer², bounded by
    entity activity, not corpus size; amount/date predicates are exact
    integer comparisons evaluated inside the join. A runaway block (one
    customer with millions of orders) is handled by
    :func:`~..operators.blocking.blocked_pair_join`'s hot-block salting
    (detected from exact per-block counts, result-identical).
    Aggregation is map-side combinable."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_custkey").alias("cust"),
        F.col("o_orderdate").alias("d"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    a = o.select("cust", F.col("k").alias("k_a"), F.col("d").alias("d_a"),
                 F.col("cents").alias("cents_a"))
    b = o.select("cust", F.col("k").alias("k_b"), F.col("d").alias("d_b"),
                 F.col("cents").alias("cents_b"))
    cents_diff = F.abs(F.col("cents_a") - F.col("cents_b"))
    day_diff = F.abs(F.datediff(F.col("d_a"), F.col("d_b")))
    pairs = (
        blocked_pair_join(a, b, ["cust"], left_salt_col="k_a")
        .filter((F.col("k_a") < F.col("k_b")) & (day_diff <= 90))
        .select("cust", cents_diff.alias("cd"), day_diff.alias("dd"))
    )
    return pairs.groupBy("cust").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidate_pairs"),
        F.sum(F.when(F.col("cd") <= 100000, 1).otherwise(0))
        .cast("bigint")
        .alias("n_suspect_pairs"),
        F.min("cd").cast("bigint").alias("min_cents_diff"),
        F.min("dd").cast("bigint").alias("min_day_diff"),
    )


@register(
    "text_inverted_index_search",
    category="text",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct(regexp_extract_all(lower(text), '[a-z]+', 0)))
           AS token
  FROM documents),
q AS (SELECT unnest(['spark', 'join', 'window']) AS token),
hits AS (
  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_matched
  FROM toks t JOIN q ON q.token = t.token
  GROUP BY 1)
SELECT CAST(n_matched AS BIGINT) AS n_terms_matched,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS example_doc
FROM hits GROUP BY 1
""",
)
def text_inverted_index_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index conjunctive retrieval: the posting-list build
    (distinct (token, doc) pairs) probed by a 3-term query, with documents
    grouped by how many query terms they match — count == 3 is the AND
    result, lower counts the OR tail a ranker would score. This is the
    keyword leg of every hybrid (BM25 + vector) retrieval stack.

    Scale shape: the posting build is one explode + distinct (token-keyed
    shuffle — the index build); the probe joins a 3-row broadcast query
    against it and aggregates doc match counts map-side. At 100 TB the
    posting list is the thing you persist bucketed by token; the probe
    never rescans text."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))
        ).alias("token"),
    )
    q = small_df(spark, [("spark",), ("join",), ("window",)], "token string")
    hits = toks.join(F.broadcast(q), "token").groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matched")
    )
    return hits.groupBy(F.col("n_matched").alias("n_terms_matched")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.min("doc_id").cast("bigint").alias("example_doc"),
    )


# ---------------------------------------------------------------------------
# Fellegi-Sunter record-linkage scoring
# ---------------------------------------------------------------------------

def _fs_milli_weights() -> dict[str, int]:
    """Integer milli-bit log-odds weights for the three comparison fields,
    derived from declared (m, u) priors: w_agree = 1000*log2(m/u),
    w_disagree = 1000*log2((1-m)/(1-u)). Python-computed ONCE and embedded
    as identical literals in both engines (the char-entropy LUT rule — no
    runtime transcendental ever crosses the engine boundary). In a real
    pipeline m/u come from EM over the blocked pairs; the declared priors
    keep the certified surface deterministic while exercising the exact
    same engine mechanics (blocked join + integer log-odds sum + banding).

    ``band`` is also the second component of the BLOCKING key (linkage
    practice: a blocked field contributes its constant agreement weight to
    every candidate; ``band_d`` is the weight of the pairs the blocking
    pass excludes — computed for documentation, never summed)."""
    import math

    priors = {
        "band": (0.90, 1 / 11),   # $1000 acctbal band agreement (blocked)
        "penny": (0.90, 0.01),    # cents-within-dollar agreement (mod 100)
        "cong": (0.98, 0.10),     # key check-digit congruence (mod 10)
    }
    out = {}
    for f, (m, u) in priors.items():
        out[f"{f}_a"] = round(1000 * math.log2(m / u))
        out[f"{f}_d"] = round(1000 * math.log2((1 - m) / (1 - u)))
    return out


_FS_W = _fs_milli_weights()


@register(
    "er_fellegi_sunter",
    category="dedup",
    oracle=f"""
WITH c AS (SELECT c_custkey AS ck, c_nationkey AS nk,
                  CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents FROM customer),
s AS (SELECT s_suppkey AS sk, s_nationkey AS nk,
             CAST(round(s_acctbal * 100, 0) AS BIGINT) AS cents FROM supplier),
pairs AS (
  SELECT {_FS_W["band_a"]}
       + CASE WHEN ((c.cents + 100000) % 100) = ((s.cents + 100000) % 100)
              THEN {_FS_W["penny_a"]} ELSE {_FS_W["penny_d"]} END
       + CASE WHEN (c.ck % 10) = (s.sk % 10)
              THEN {_FS_W["cong_a"]} ELSE {_FS_W["cong_d"]} END AS score
  FROM c JOIN s ON c.nk = s.nk
   AND ((c.cents + 100000) // 100000) = ((s.cents + 100000) // 100000))
SELECT CASE WHEN score >= 8000 THEN 'match'
            WHEN score <= -2000 THEN 'non_match'
            ELSE 'possible' END AS band,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(min(score) AS BIGINT) AS min_score,
       CAST(max(score) AS BIGINT) AS max_score
FROM pairs GROUP BY 1
""",
)
def er_fellegi_sunter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage over blocked customer x
    supplier candidate pairs: each pair scores the sum of per-field integer
    log-odds weights (agree => log2(m/u), disagree => log2((1-m)/(1-u)),
    milli-bit literals from :func:`_fs_milli_weights`) over three
    comparison fields — $1000 balance band (the blocking pass, so its
    agreement weight is a constant on every candidate), cents-within-dollar
    agreement, and key check-digit congruence — then lands in the classic
    match / possible / non_match decision bands. The output is the band
    summary a linkage pipeline tunes its thresholds on.

    Scale shape: candidate generation is an equi-join keyed by the
    COMPOSITE block (nation x $1000 balance band) — both components are
    fields the scorer already compares, the standard way to refine a
    blocking pass without new data. Unlike a nation-only block (fixed 25
    keys => within-block pair volume grows quadratically with data), the
    composite key splits every nation by balance band, and the join goes
    through :func:`~..operators.blocking.blocked_pair_join`: no broadcast
    hint (a supplier side at corpus scale outgrows any threshold; AQE may
    still elect a runtime broadcast while the side is actually small), and
    a runaway block is detected from exact per-block counts and salted
    across reducers (result-identical — adversarial pytest). Field
    comparisons are exact integer expressions inside the join; banding
    aggregates map-side to <= 3 rows. The band/penny arithmetic shifts
    cents by +100000 so integer division and modulo stay in positive range
    (Spark ``div`` truncates toward zero, floor/trunc agreement guaranteed
    only for non-negative operands)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ck"),
        F.col("c_nationkey").alias("nk"),
        F.round(F.col("c_acctbal") * 100, 0).cast("bigint").alias("c_cents"),
    ).withColumn("band_key", F.expr("(c_cents + 100000) div 100000"))
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("sk"),
        F.col("s_nationkey").alias("nk"),
        F.round(F.col("s_acctbal") * 100, 0).cast("bigint").alias("s_cents"),
    ).withColumn("band_key", F.expr("(s_cents + 100000) div 100000"))
    w = _FS_W
    penny_eq = F.expr("(c_cents + 100000) % 100") == F.expr("(s_cents + 100000) % 100")
    cong_eq = (F.col("ck") % 10) == (F.col("sk") % 10)
    score = (
        F.lit(w["band_a"])
        + F.when(penny_eq, w["penny_a"]).otherwise(w["penny_d"])
        + F.when(cong_eq, w["cong_a"]).otherwise(w["cong_d"])
    )
    pairs = blocked_pair_join(c, s, ["nk", "band_key"], left_salt_col="ck").select(
        score.alias("score")
    )
    band = (
        F.when(F.col("score") >= 8000, "match")
        .when(F.col("score") <= -2000, "non_match")
        .otherwise("possible")
    )
    return pairs.select(band.alias("band"), "score").groupBy("band").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.min("score").cast("bigint").alias("min_score"),
        F.max("score").cast("bigint").alias("max_score"),
    )


# ---------------------------------------------------------------------------
# Fellegi-Sunter EM weight estimation (round 7)
# ---------------------------------------------------------------------------

_FS_EM_ITERS = 30
_FS_EM_SEED = {"lam": 0.1, "mp": 0.8, "up": 0.1, "mc": 0.8, "uc": 0.1}


def fs_em_python(n00: float, n01: float, n10: float, n11: float,
                 iters: int = _FS_EM_ITERS) -> dict[str, float]:
    """Reference EM fixed point over the 2x2 comparison-pattern histogram
    (penny-agree x congruence-agree counts of blocked candidate pairs).
    Every operation is IEEE-double +,-,*,/ in a FIXED order — all four are
    exactly rounded, so any IEEE engine replaying the same expression
    shapes produces bit-identical iterates. The generated DuckDB oracle
    (:func:`_fs_em_oracle_iters`) mirrors each line below 1:1; the
    hypothesis property test pins the two bit-equal on random histograms.

    E-step: per-pattern match posterior w_ij from current params.
    M-step: lam / per-field m,u re-estimated from posterior-weighted
    pattern counts. Fixed ``iters`` (not a tolerance) so both engines run
    the identical op sequence regardless of convergence speed.

    Counts get +0.5 additive smoothing, and the M-step itself is MAP
    under a Beta(1.5, 1.5) prior per parameter — each estimate is
    (weighted count + 0.5) / (weighted total + 1.0), the standard
    regularized linkage EM. The MAP form is what makes the interior
    guarantee hold IN FLOATING POINT, not just exact arithmetic: every
    iterate is pinned to [0.5/(ntot+1), 1 - 0.5/(ntot+1)], so no
    estimate can saturate to exactly 0.0/1.0 and no E-step denominator
    can reach 0/0 on ANY histogram (an adversarial single-cell histogram
    drove the pre-r8 count-smoothing-only form to u_penny == 1.0 after
    ~30 float iterations — caught by the hypothesis invariant test).
    Smoothing constants are exact in IEEE doubles, so the MAP form costs
    no determinism."""
    n00, n01, n10, n11 = (
        float(n00) + 0.5, float(n01) + 0.5, float(n10) + 0.5, float(n11) + 0.5,
    )
    ntot = ((n00 + n01) + n10) + n11
    lam, mp, up, mc, uc = (_FS_EM_SEED[k] for k in ("lam", "mp", "up", "mc", "uc"))
    for _ in range(iters):
        # E-step: posterior w_ij = P(match | pattern ij); i = penny agree,
        # j = congruence agree. Shapes mirror the SQL verbatim.
        w11 = ((lam * mp) * mc) / (((lam * mp) * mc) + (((1.0 - lam) * up) * uc))
        w10 = ((lam * mp) * (1.0 - mc)) / (
            ((lam * mp) * (1.0 - mc)) + (((1.0 - lam) * up) * (1.0 - uc))
        )
        w01 = ((lam * (1.0 - mp)) * mc) / (
            ((lam * (1.0 - mp)) * mc) + (((1.0 - lam) * (1.0 - up)) * uc)
        )
        w00 = ((lam * (1.0 - mp)) * (1.0 - mc)) / (
            ((lam * (1.0 - mp)) * (1.0 - mc))
            + (((1.0 - lam) * (1.0 - up)) * (1.0 - uc))
        )
        # M-step
        t00 = n00 * w00
        t01 = n01 * w01
        t10 = n10 * w10
        t11 = n11 * w11
        tt = ((t00 + t01) + t10) + t11
        lam = (tt + 0.5) / (ntot + 1.0)
        mp = ((t10 + t11) + 0.5) / (tt + 1.0)
        up = (((n10 - t10) + (n11 - t11)) + 0.5) / ((ntot - tt) + 1.0)
        mc = ((t01 + t11) + 0.5) / (tt + 1.0)
        uc = (((n01 - t01) + (n11 - t11)) + 0.5) / ((ntot - tt) + 1.0)
    return {"lambda": lam, "m_penny": mp, "u_penny": up, "m_cong": mc, "u_cong": uc}


def _fs_em_oracle_iters(iters: int = _FS_EM_ITERS) -> str:
    """The EM loop unrolled as DuckDB CTEs, generated to mirror
    :func:`fs_em_python` expression-for-expression (same parenthesization
    => same exactly-rounded IEEE op order => bit-identical iterates).
    Counts/params are cast to DOUBLE up front — bare SQL numeric literals
    would otherwise parse as DECIMAL and change the arithmetic."""
    s = _FS_EM_SEED
    ctes = [
        f"""it0 AS (
  SELECT n00, n01, n10, n11, (((n00 + n01) + n10) + n11) AS ntot,
         CAST({s['lam']} AS DOUBLE) AS lam,
         CAST({s['mp']} AS DOUBLE) AS mp, CAST({s['up']} AS DOUBLE) AS up,
         CAST({s['mc']} AS DOUBLE) AS mc, CAST({s['uc']} AS DOUBLE) AS uc
  FROM cnts)"""
    ]
    for k in range(1, iters + 1):
        p = f"it{k - 1}"
        ctes.append(
            f"""e{k} AS (
  SELECT *,
    ((lam * mp) * mc) / (((lam * mp) * mc) + (((1.0 - lam) * up) * uc)) AS w11,
    ((lam * mp) * (1.0 - mc)) / (((lam * mp) * (1.0 - mc)) + (((1.0 - lam) * up) * (1.0 - uc))) AS w10,
    ((lam * (1.0 - mp)) * mc) / (((lam * (1.0 - mp)) * mc) + (((1.0 - lam) * (1.0 - up)) * uc)) AS w01,
    ((lam * (1.0 - mp)) * (1.0 - mc)) / (((lam * (1.0 - mp)) * (1.0 - mc)) + (((1.0 - lam) * (1.0 - up)) * (1.0 - uc))) AS w00
  FROM {p}),
t{k} AS (
  SELECT *, n00 * w00 AS t00, n01 * w01 AS t01, n10 * w10 AS t10, n11 * w11 AS t11 FROM e{k}),
it{k} AS (
  SELECT n00, n01, n10, n11, ntot,
    ((((t00 + t01) + t10) + t11) + 0.5) / (ntot + 1.0) AS lam,
    ((t10 + t11) + 0.5) / ((((t00 + t01) + t10) + t11) + 1.0) AS mp,
    (((n10 - t10) + (n11 - t11)) + 0.5)
      / ((ntot - (((t00 + t01) + t10) + t11)) + 1.0) AS up,
    ((t01 + t11) + 0.5) / ((((t00 + t01) + t10) + t11) + 1.0) AS mc,
    (((n01 - t01) + (n11 - t11)) + 0.5)
      / ((ntot - (((t00 + t01) + t10) + t11)) + 1.0) AS uc
  FROM t{k})"""
        )
    return ",\n".join(ctes)


_FS_EM_PAIRS_SQL = """
c AS (SELECT c_custkey AS ck, c_nationkey AS nk,
             CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents FROM customer),
s AS (SELECT s_suppkey AS sk, s_nationkey AS nk,
             CAST(round(s_acctbal * 100, 0) AS BIGINT) AS cents FROM supplier),
pairs AS (
  SELECT CASE WHEN ((c.cents + 100000) % 100) = ((s.cents + 100000) % 100)
              THEN 1 ELSE 0 END AS pa,
         CASE WHEN (c.ck % 10) = (s.sk % 10) THEN 1 ELSE 0 END AS ca
  FROM c JOIN s ON c.nk = s.nk
   AND ((c.cents + 100000) // 100000) = ((s.cents + 100000) // 100000)),
cnts AS (
  SELECT
    CAST(coalesce(sum(CASE WHEN pa = 0 AND ca = 0 THEN 1 ELSE 0 END), 0) AS DOUBLE) + 0.5 AS n00,
    CAST(coalesce(sum(CASE WHEN pa = 0 AND ca = 1 THEN 1 ELSE 0 END), 0) AS DOUBLE) + 0.5 AS n01,
    CAST(coalesce(sum(CASE WHEN pa = 1 AND ca = 0 THEN 1 ELSE 0 END), 0) AS DOUBLE) + 0.5 AS n10,
    CAST(coalesce(sum(CASE WHEN pa = 1 AND ca = 1 THEN 1 ELSE 0 END), 0) AS DOUBLE) + 0.5 AS n11
  FROM pairs)"""


@register(
    "er_fellegi_sunter_em",
    category="dedup",
    oracle=f"""
WITH {_FS_EM_PAIRS_SQL},
{_fs_em_oracle_iters()}
SELECT param, CAST(round(value * 1000000000.0) AS BIGINT) AS nano
FROM (
  SELECT 'lambda' AS param, lam AS value FROM it{_FS_EM_ITERS}
  UNION ALL SELECT 'm_penny', mp FROM it{_FS_EM_ITERS}
  UNION ALL SELECT 'u_penny', up FROM it{_FS_EM_ITERS}
  UNION ALL SELECT 'm_cong', mc FROM it{_FS_EM_ITERS}
  UNION ALL SELECT 'u_cong', uc FROM it{_FS_EM_ITERS}
)
""",
)
def er_fellegi_sunter_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter EM weight *estimation* — the loop that produces the
    m/u parameters :func:`er_fellegi_sunter` declares as priors (r6 verdict
    item 4). Expectation = per-pair match posterior under the current
    params; maximization = per-field m/u re-estimates — but because the
    comparison vector is binary per field, the posterior is constant on
    each of the 2^k patterns, so EM never needs the pairs twice: ONE
    distributed aggregation folds the blocked candidate pairs (same
    composite nation x $1000-band block as the scorer, via
    :func:`~..operators.blocking.blocked_pair_join`) into the 2x2 pattern
    histogram, and the fixed-point iterates on that O(2^k) state — the
    same driver-state discipline as k-means centroids (O(k*d)). This is
    how production linkage engines (e.g. Splink) run EM at scale.

    Determinism: both engines execute 30 identical-op-order IEEE-double
    iterations (+,-,*,/ only — each exactly rounded; no transcendental
    crosses the engine boundary) seeded from the same literals; outputs
    are compared in nano-unit integers. The hypothesis property test pins
    Python-vs-DuckDB bit-equality on random histograms and EM's
    monotone-likelihood invariant.

    Scale shape: the only O(pairs) work is the blocked equi-join + one
    map-side-combinable groupBy to 4 rows; EM itself touches 4 numbers.
    At 100 TB the histogram fold is the same shuffle the scorer already
    pays, and re-estimating weights costs nothing extra per iteration."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ck"),
        F.col("c_nationkey").alias("nk"),
        F.round(F.col("c_acctbal") * 100, 0).cast("bigint").alias("c_cents"),
    ).withColumn("band_key", F.expr("(c_cents + 100000) div 100000"))
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("sk"),
        F.col("s_nationkey").alias("nk"),
        F.round(F.col("s_acctbal") * 100, 0).cast("bigint").alias("s_cents"),
    ).withColumn("band_key", F.expr("(s_cents + 100000) div 100000"))
    pa = (
        F.expr("(c_cents + 100000) % 100") == F.expr("(s_cents + 100000) % 100")
    ).cast("int")
    ca = ((F.col("ck") % 10) == (F.col("sk") % 10)).cast("int")
    hist = (
        blocked_pair_join(c, s, ["nk", "band_key"], left_salt_col="ck")
        .select(pa.alias("pa"), ca.alias("ca"))
        .groupBy("pa", "ca")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()  # O(2^k) pattern histogram — the EM's entire state
    )
    counts = {(r["pa"], r["ca"]): r["n"] for r in hist}
    est = fs_em_python(
        counts.get((0, 0), 0), counts.get((0, 1), 0),
        counts.get((1, 0), 0), counts.get((1, 1), 0),
    )
    out = small_df(spark, 
        [(k, float(v)) for k, v in est.items()], "param string, value double"
    )
    # nano-unit integers: engine-side rounding (never Python round()),
    # robust to value-hash float-repr differences
    return out.select(
        "param", F.round(F.col("value") * 1000000000.0).cast("bigint").alias("nano")
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination by containment ratio (round 6)
# ---------------------------------------------------------------------------

@register(
    "dedup_benchmark_contamination",
    category="dedup",
    oracle="""
WITH dt AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+', 0) AS ts
  FROM documents),
dsh0 AS (SELECT doc_id, ts, unnest(range(1, len(ts) - 1)) AS i FROM dt),
dsh AS (
  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2] AS sh
  FROM dsh0),
bt AS (
  SELECT doc_id AS bench_id,
         regexp_extract_all(lower(substring(text, 30, 150)), '[a-z]+', 0) AS ts
  FROM documents WHERE doc_id < 5),
bsh0 AS (SELECT bench_id, ts, unnest(range(1, len(ts) - 1)) AS i FROM bt),
bsh AS (
  SELECT DISTINCT bench_id, ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2] AS sh
  FROM bsh0),
nb AS (SELECT bench_id, CAST(count(*) AS BIGINT) AS nb FROM bsh GROUP BY 1),
inter AS (
  SELECT d.doc_id, b.bench_id, CAST(count(*) AS BIGINT) AS i
  FROM dsh d JOIN bsh b ON b.sh = d.sh
  GROUP BY 1, 2)
SELECT i.bench_id, nb.nb AS bench_shingles,
       CAST(count(*) AS BIGINT) AS n_docs_with_overlap,
       CAST(sum(CASE WHEN i.i * 10 >= 8 * nb.nb THEN 1 ELSE 0 END) AS BIGINT)
         AS n_contaminated,
       CAST(max(i.i * 1000000 // nb.nb) AS BIGINT) AS max_containment_micro
FROM inter i JOIN nb ON nb.bench_id = i.bench_id
GROUP BY 1, 2
""",
)
def dedup_benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination by CONTAINMENT RATIO — the graded
    companion to ``text_contamination`` (which flags any single shared
    8-char shingle): word-trigram shingles of each document are scored for
    coverage of each benchmark item's shingle set (items synthesized
    as mid-document snippets of the first five docs, so true contamination
    exists by construction at every scale); a doc covering >= 80% of an
    item's shingles (cross-multiplied integers, no division) counts as
    contaminated. Output: per-item overlap census, contaminated-doc count,
    and max containment in exact micro-units (floor division).

    Scale shape: the corpus side is an explode + DISTINCT (shingle-keyed
    shuffle); the benchmark side is tiny and BROADCASTS into the
    intersection join — at 100 TB the benchmark suite stays a broadcast
    dimension and the corpus is touched once. Aggregations are map-side
    combinable."""
    docs = load_table(spark, sf_dir, "documents")
    tri = (
        "CASE WHEN size(ts) >= 3 THEN transform(sequence(1, size(ts) - 2),"
        " i -> concat(ts[i-1], ' ', ts[i], ' ', ts[i+1])) ELSE"
        " array() END"
    )
    dsh = (
        docs.select(
            "doc_id",
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)").alias("ts"),
        )
        .select("doc_id", F.explode(F.expr(tri)).alias("sh"))
        .distinct()
    )
    bsh = (
        docs.filter(F.col("doc_id") < 5)
        .select(
            F.col("doc_id").alias("bench_id"),
            F.expr(
                "regexp_extract_all(lower(substring(text, 30, 150)), '[a-z]+', 0)"
            ).alias("ts"),
        )
        .select("bench_id", F.explode(F.expr(tri)).alias("sh"))
        .distinct()
    )
    nb = bsh.groupBy("bench_id").agg(F.count(F.lit(1)).cast("bigint").alias("nb"))
    inter = (
        dsh.join(F.broadcast(bsh), "sh")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("i"))
    )
    return (
        inter.join(F.broadcast(nb), "bench_id")
        .groupBy("bench_id", F.col("nb").alias("bench_shingles"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs_with_overlap"),
            F.sum(F.when(F.col("i") * 10 >= 8 * F.col("nb"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_contaminated"),
            F.expr("cast(max(i * 1000000 div nb) as bigint)").alias(
                "max_containment_micro"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Gopher-style repetition filters + temperature-scaled mixture (round 7)
# ---------------------------------------------------------------------------

@register(
    "text_repetition_filter",
    category="text",
    oracle="""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ws)),
                               i -> ws[i] || ' ' || ws[i + 1])) AS b
  FROM w WHERE len(ws) >= 2),
cnt AS (
  SELECT doc_id, b, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY 1, 2),
per AS (
  SELECT doc_id,
         CAST(sum(c) AS BIGINT) AS total,
         CAST(count(*) AS BIGINT) AS n_distinct,
         CAST(max(c) AS BIGINT) AS top
  FROM cnt GROUP BY 1)
SELECT CASE WHEN (total - n_distinct) * 5 > total THEN 1 ELSE 0 END AS dup_flag,
       CASE WHEN top * 20 > total THEN 1 ELSE 0 END AS top_flag,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS example_doc,
       CAST(sum(total - n_distinct) * 1000000 // sum(total) AS BIGINT)
         AS dup_frac_micro,
       CAST(sum(top) * 1000000 // sum(total) AS BIGINT) AS top_frac_micro
FROM per GROUP BY 1, 2
""",
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality filters (the Gopher/MassiveText rules,
    adapted to word bigrams): per document, the duplicate-bigram fraction
    (occurrences beyond each bigram's first) and the top-bigram fraction —
    the signals that catch boilerplate and degenerate generation loops in
    a pretraining corpus. Docs are flagged by exact cross-multiplied
    integer thresholds (dup > 20%%, top > 5%%) and summarized per flag
    combination with micro-averaged fractions (ratio of exact sums — the
    registry's no-mean-of-ratios rule).

    Relationship to siblings: ``text_repetition_ratio`` reports the raw
    per-doc dup-bigram ratio and ``text_repetition_signals`` the unigram
    dup/top ratios; THIS query is the gate itself — top-bigram dominance
    (which neither sibling measures) plus the integer-threshold decision
    and the corpus-level flag summary a filter pipeline actually acts on.

    Scale shape: one explode to (doc, bigram) rows, one map-side-
    combinable groupBy to per-doc-distinct-bigram counts, one per-doc
    fold, one <=4-row summary. Bigram construction stays inside JVM array
    expressions (transform over sequence) — no Python in the hot path."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("ws")
    ).filter(F.size("ws") >= 2)
    bg = docs.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, size(ws) - 1), i -> concat(ws[i-1], ' ', ws[i]))")
        ).alias("b"),
    )
    cnt = bg.groupBy("doc_id", "b").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    per = cnt.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.max("c").cast("bigint").alias("top"),
    )
    dup_flag = F.when((F.col("total") - F.col("n_distinct")) * 5 > F.col("total"), 1).otherwise(0)
    top_flag = F.when(F.col("top") * 20 > F.col("total"), 1).otherwise(0)
    return per.groupBy(
        dup_flag.alias("dup_flag"), top_flag.alias("top_flag")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.min("doc_id").cast("bigint").alias("example_doc"),
        F.expr(
            "cast(sum(total - n_distinct) * 1000000 div sum(total) as bigint)"
        ).alias("dup_frac_micro"),
        F.expr("cast(sum(top) * 1000000 div sum(total) as bigint)").alias(
            "top_frac_micro"
        ),
    )


@register(
    "sample_temperature_mixture",
    category="sampling",
    plan_shape="scalar_broadcast",
    plan_reason="normalization total is a broadcast 1-row frame crossed "
    "onto the |sources|-row weight table — O(sources) rows, never data",
    oracle="""
WITH c AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1),
w AS (
  SELECT source, n,
         CAST(floor(sqrt(CAST(n * 1000000 AS DOUBLE))) AS BIGINT) AS w
  FROM c),
t AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM w)
SELECT source, n, w,
       CAST(w * 1000000 // (SELECT tw FROM t) AS BIGINT) AS share_micro
FROM w
""",
)
def sample_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture weights (alpha = 0.5, the multilingual /
    multi-source resampling rule): each source's sampling share is
    proportional to sqrt(count), flattening the source distribution so
    small sources are up-weighted — the standard knob for balancing a
    pretraining mixture. w = floor(sqrt(n * 1e6)) keeps 3 decimal digits
    of sqrt precision; shares land as truncated integer micro-units.

    Determinism: int -> double conversion (exact below 2^53) and sqrt are
    both correctly rounded IEEE ops, floor is exact — identical in any
    engine; everything after is integer arithmetic.

    Scale shape: one map-side-combinable groupBy to |sources| rows; the
    normalization total is a scalar subquery / O(1) fold."""
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = c.select(
        "source", "n",
        F.floor(F.sqrt((F.col("n") * 1000000).cast("double"))).cast("bigint").alias("w"),
    )
    tw = w.agg(F.sum("w").cast("bigint").alias("tw"))
    return w.crossJoin(F.broadcast(tw)).selectExpr(
        "source", "n", "w",
        "cast(w * 1000000 div tw as bigint) AS share_micro",
    )



@register(
    "er_sorted_neighborhood",
    category="dedup",
    oracle="""
WITH c AS (
  SELECT c_custkey AS ck, c_nationkey AS nk,
         CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents
  FROM customer),
r AS (
  SELECT ck, nk, cents,
         row_number() OVER (ORDER BY cents ASC, ck ASC) AS rn
  FROM c),
pairs AS (
  SELECT a.ck AS ck_a, b.ck AS ck_b,
         CASE WHEN a.nk = b.nk THEN 1 ELSE 0 END AS same_nation,
         abs(a.cents - b.cents) AS gap_cents
  FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 5)
SELECT same_nation,
       CASE WHEN gap_cents <= 100 THEN 1 ELSE 0 END AS close_balance,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(min(ck_a) AS BIGINT) AS example_a,
       CAST(max(gap_cents) AS BIGINT) AS max_gap_cents
FROM pairs GROUP BY 1, 2
""",
)
def er_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood blocking — the classic ER candidate generator
    that hash blocking (er_fellegi_sunter's composite key) cannot
    replicate: sort records by a fuzzy key (balance cents), compare each
    record only with its w = 5 successors in the sort order, so
    near-misses that straddle any hash-block boundary still meet. Pairs
    are banded by nation agreement and balance gap — the comparison
    vector a scorer would consume.

    Scale shape: the sort order comes from the two-phase bucketed global
    row_number (never a single-partition window); the neighborhood join
    is rank-keyed — each record explodes to w probe ranks and equi-joins
    the rank column, so shuffle volume is w*n rows, not a range join. At
    100 TB w*n stays linear and the rank join partitions evenly by
    construction (ranks are uniform).

    Determinism: ranks are exact; all comparisons integer."""
    from arc_cassandra_pipeline_plugin_spark.operators.ranking import (
        global_row_number,
    )

    W = 5
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ck"),
        F.col("c_nationkey").alias("nk"),
        F.round(F.col("c_acctbal") * 100, 0).cast("bigint").alias("cents"),
    )
    r = global_row_number(c, "cents", ["ck"], out_col="rn")
    right = r.select(
        F.col("rn").alias("rn2"), F.col("ck").alias("ck_b"),
        F.col("nk").alias("nk_b"), F.col("cents").alias("cents_b"),
    )
    probes = r.select(
        "ck", "nk", "cents",
        F.explode(F.expr(f"sequence(rn + 1, rn + {W})")).alias("rn2"),
    )
    pairs = probes.join(right, "rn2").select(
        F.when(F.col("nk") == F.col("nk_b"), 1).otherwise(0).alias("same_nation"),
        F.abs(F.col("cents") - F.col("cents_b")).alias("gap_cents"),
        F.col("ck").alias("ck_a"),
    )
    return pairs.groupBy(
        "same_nation",
        F.when(F.col("gap_cents") <= 100, 1).otherwise(0).alias("close_balance"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.min("ck_a").cast("bigint").alias("example_a"),
        F.max("gap_cents").cast("bigint").alias("max_gap_cents"),
    )


@register(
    "feature_quantile_normalize",
    category="analytics",
    oracle="""
WITH v AS (
  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS x FROM documents),
s AS (
  SELECT doc_id, source, x,
         row_number() OVER (PARTITION BY source ORDER BY x ASC, doc_id ASC) AS rs,
         count(*) OVER (PARTITION BY source) AS ns
  FROM v),
g AS (
  SELECT x AS gx, row_number() OVER (ORDER BY x ASC, doc_id ASC) AS gr FROM v),
n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM v),
m AS (
  SELECT s.doc_id, s.source, s.x,
         1 + CAST((CAST(rs AS HUGEINT) - 1) * ((SELECT nn FROM n) - 1)
                  // greatest(ns - 1, 1) AS BIGINT) AS gi
  FROM s),
j AS (
  SELECT m.source, m.x, g.gx AS nx
  FROM m JOIN g ON g.gr = m.gi)
SELECT source,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(nx) AS BIGINT) AS sum_normalized,
       CAST(min(nx) AS BIGINT) AS min_normalized,
       CAST(max(nx) AS BIGINT) AS max_normalized,
       CAST(sum(abs(nx - x)) AS BIGINT) AS total_shift
FROM j GROUP BY 1
""",
)
def feature_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source quantile normalization — the batch-effect correction a
    multi-vendor corpus needs before score thresholds mean the same thing
    everywhere: each document's value is replaced by the GLOBAL value at
    the same relative rank its value holds within its source. Per-source
    summary (count, normalized sum/min/max, total shift) certifies the
    full mapping through exact integers.

    Scale shape: within-source ranks are a PARTITIONED window (source is
    the partition key — no global sort); the global value ladder comes
    from the two-phase bucketed global row_number; the mapping is one
    equi-join on the computed global index (uniform by construction).
    Relative positions and index arithmetic are truncating integer ops —
    no float anywhere."""
    from arc_cassandra_pipeline_plugin_spark.operators.ranking import (
        global_row_number,
    )
    from pyspark.sql.window import Window

    v = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("bigint").alias("x")
    )
    ws = Window.partitionBy("source").orderBy(F.col("x").asc(), F.col("doc_id").asc())
    s = v.select(
        "doc_id", "source", "x",
        F.row_number().over(ws).alias("rs"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("ns"),
    )
    g = global_row_number(v, "x", ["doc_id"], out_col="gr").select(
        F.col("x").alias("nx"), F.col("gr").alias("gi")
    )
    nn = v.count()
    # rank arithmetic in DECIMAL(38,0) (oracle: HUGEINT): the int64 form
    # (rs-1)*(nn-1) wraps silently under non-ANSI Spark once per-source
    # rank times corpus size passes 2^63 (~3e9 rows squared), while DuckDB
    # promotes — wide types keep both engines exact at any corpus size;
    # div truncates identically on both (operands are nonnegative)
    m = s.select(
        "source", "x",
        F.expr(
            "1 + CAST((CAST(rs AS DECIMAL(38,0)) - 1) * "
            f"({nn} - 1) div greatest(ns - 1, 1) AS BIGINT)"
        ).alias("gi"),
    )
    j = m.join(g, "gi")
    return j.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("nx").cast("bigint").alias("sum_normalized"),
        F.min("nx").cast("bigint").alias("min_normalized"),
        F.max("nx").cast("bigint").alias("max_normalized"),
        F.sum(F.abs(F.col("nx") - F.col("x"))).cast("bigint").alias("total_shift"),
    )


# ---------------------------------------------------------------------------
# Gopher repetition completeness: n-gram char-coverage signals (round 8)
# ---------------------------------------------------------------------------

def _rep_ngram_sql(n: int) -> str:
    """DuckDB CTE chain computing per-doc char-mass repetition stats for
    word ``n``-grams (mirrors the Spark expressions in
    :func:`text_repetition_ngrams`)."""
    gram = " || ' ' || ".join(f"ws[i + {j}]" for j in range(n))
    return f"""
w{n} AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g{n} AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ws) - {n - 2}), i -> {gram})) AS gram
  FROM w{n} WHERE len(ws) >= {n}),
c{n} AS (
  SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS c,
         CAST(length(gram) AS BIGINT) AS glen
  FROM g{n} GROUP BY 1, 2),
p{n} AS (
  SELECT CAST({n} AS BIGINT) AS n, doc_id,
         CAST(sum(c * glen) AS BIGINT) AS mass,
         CAST(sum((c - 1) * glen) AS BIGINT) AS dup_chars,
         CAST(max(c * glen) AS BIGINT) AS top_chars
  FROM c{n} GROUP BY 1, 2)"""


@register(
    "text_repetition_ngrams",
    category="text",
    oracle=f"""
WITH {_rep_ngram_sql(3)},
{_rep_ngram_sql(4)},
per AS (SELECT * FROM p3 UNION ALL SELECT * FROM p4)
SELECT n,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN dup_chars * 10 > mass THEN 1 ELSE 0 END) AS BIGINT)
         AS n_flagged_dup,
       CAST(sum(CASE WHEN top_chars * 20 > mass * 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_flagged_top,
       CAST(CAST(sum(dup_chars) AS HUGEINT) * 1000000
            // CAST(sum(mass) AS HUGEINT) AS BIGINT) AS dup_chars_micro,
       CAST(CAST(sum(top_chars) AS HUGEINT) * 1000000
            // CAST(sum(mass) AS HUGEINT) AS BIGINT) AS top_cover_micro
FROM per GROUP BY 1
""",
)
def text_repetition_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining Gopher/MassiveText repetition signals, by CHARACTER
    coverage: for word 3-grams and 4-grams, the fraction of n-gram
    character mass inside DUPLICATE occurrences (occurrences beyond each
    gram's first, weighted by gram length) and inside the single most
    dominant gram — char weighting is what distinguishes a looped 40-char
    slogan from a looped stopword pair, which the count-based
    ``text_repetition_filter`` cannot tell apart.

    Per doc and n: ``mass = sum(c*len)``, ``dup = sum((c-1)*len)``,
    ``top = max(c*len)`` over the (gram, count c) table; docs are flagged
    by exact cross-multiplication (dup > 10% of mass, top > 15%), and the
    corpus roll-up micro-averages with DECIMAL(38,0)/HUGEINT products (an
    int64 ``sum*1e6`` wraps once total gram mass passes ~9.2 TB of text —
    exactly the corpus size this engine targets).

    Scale shape: one explode per n to (doc, gram) rows, one map-side-
    combinable (doc, gram) count, one per-doc fold, a 2-row summary; gram
    construction stays inside JVM array expressions."""
    per_frames = []
    for n in (3, 4):
        gram_expr = F.expr(
            f"transform(sequence(1, size(ws) - {n - 1}), "
            f"i -> concat_ws(' ', slice(ws, i, {n})))"
        )
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", F.split("text", " ").alias("ws")
        ).filter(F.size("ws") >= n)
        cnt = (
            docs.select("doc_id", F.explode(gram_expr).alias("gram"))
            .groupBy("doc_id", "gram")
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
            .select(
                "doc_id", "c",
                F.length("gram").cast("bigint").alias("glen"),
            )
        )
        per_frames.append(
            cnt.groupBy("doc_id").agg(
                F.sum(F.col("c") * F.col("glen")).cast("bigint").alias("mass"),
                F.sum((F.col("c") - 1) * F.col("glen")).cast("bigint").alias("dup_chars"),
                F.max(F.col("c") * F.col("glen")).cast("bigint").alias("top_chars"),
            ).select(F.lit(n).cast("bigint").alias("n"), "mass", "dup_chars", "top_chars")
        )
    per = per_frames[0].unionByName(per_frames[1])
    return per.groupBy("n").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(
            F.when(F.col("dup_chars") * 10 > F.col("mass"), 1).otherwise(0)
        ).cast("bigint").alias("n_flagged_dup"),
        F.sum(
            F.when(F.col("top_chars") * 20 > F.col("mass") * 3, 1).otherwise(0)
        ).cast("bigint").alias("n_flagged_top"),
        F.expr(
            "cast(cast(sum(dup_chars) as decimal(38,0)) * 1000000"
            " div cast(sum(mass) as decimal(38,0)) as bigint)"
        ).alias("dup_chars_micro"),
        F.expr(
            "cast(cast(sum(top_chars) as decimal(38,0)) * 1000000"
            " div cast(sum(mass) as decimal(38,0)) as bigint)"
        ).alias("top_cover_micro"),
    )


# ---------------------------------------------------------------------------
# ER candidate-generator quality audit (round 8)
# ---------------------------------------------------------------------------

_SN_AUDIT_W = 8  # sorted-neighborhood window width in the audit


@register(
    "er_candidate_generator_audit",
    category="dedup",
    plan_shape="scalar_broadcast",
    plan_reason="the 1-row truth count crosses onto the 4-row generator "
    "summary — a broadcast scalar, O(generators) rows, never data",
    oracle=f"""
WITH c AS (
  SELECT c_custkey AS ck, c_nationkey AS nk,
         CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents
  FROM customer),
s AS (
  SELECT s_suppkey AS sk, s_nationkey AS nk,
         CAST(round(s_acctbal * 100, 0) AS BIGINT) AS cents
  FROM supplier),
truth AS (
  SELECT c.ck, s.sk FROM c JOIN s ON c.nk = s.nk
  WHERE abs(c.cents - s.cents) <= 100),
nt AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM truth),
gh AS (
  SELECT 'hash_block' AS gen, c.ck, s.sk FROM c JOIN s ON c.nk = s.nk
   AND ((c.cents + 100000) // 100000) = ((s.cents + 100000) // 100000)),
gp AS (
  SELECT 'penny_block' AS gen, c.ck, s.sk FROM c JOIN s ON c.nk = s.nk
   AND ((c.cents + 100000) % 100) = ((s.cents + 100000) % 100)),
gc AS (
  SELECT 'congruence_block' AS gen, c.ck, s.sk FROM c JOIN s ON c.nk = s.nk
   AND (c.ck % 10) = (s.sk % 10)),
comb AS (
  SELECT ck AS k, CAST(0 AS BIGINT) AS typ, cents FROM c
  UNION ALL SELECT sk AS k, CAST(1 AS BIGINT) AS typ, cents FROM s),
r AS (
  SELECT k, typ, row_number() OVER (ORDER BY cents ASC, typ ASC, k ASC) AS rn
  FROM comb),
gs AS (
  SELECT 'sorted_neighborhood' AS gen,
         CASE WHEN a.typ = 0 THEN a.k ELSE b.k END AS ck,
         CASE WHEN a.typ = 0 THEN b.k ELSE a.k END AS sk
  FROM r a JOIN r b
    ON b.rn > a.rn AND b.rn <= a.rn + {_SN_AUDIT_W} AND a.typ <> b.typ),
cand AS (
  SELECT * FROM gh UNION ALL SELECT * FROM gp
  UNION ALL SELECT * FROM gc UNION ALL SELECT * FROM gs),
j AS (
  SELECT cand.gen,
         CASE WHEN t.ck IS NOT NULL THEN 1 ELSE 0 END AS hit
  FROM cand LEFT JOIN truth t ON t.ck = cand.ck AND t.sk = cand.sk)
SELECT gen,
       CAST(count(*) AS BIGINT) AS n_candidates,
       CAST(sum(hit) AS BIGINT) AS n_hit,
       (SELECT n_true FROM nt) AS n_true,
       CAST(CAST(sum(hit) AS HUGEINT) * 1000000 // count(*) AS BIGINT)
         AS precision_micro,
       CASE WHEN (SELECT n_true FROM nt) = 0 THEN NULL
            ELSE CAST(CAST(sum(hit) AS HUGEINT) * 1000000
                      // (SELECT n_true FROM nt) AS BIGINT) END AS recall_micro
FROM j GROUP BY 1
""",
)
def er_candidate_generator_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality readout for the repo's FOUR ER candidate generators against
    one labeled truth — the audit that closes the ER family: generating
    candidates (er_fellegi_sunter's hash block, er_sorted_neighborhood's
    rank window, penny- and congruence-blocks) is cheap; knowing each
    generator's precision/recall BEFORE spending a 100 TB scoring pass is
    what the audit buys. Truth: customer-supplier pairs in the same
    nation within $1 of balance (the fixture's planted-match criterion).

    Per generator: candidate count, hits, micro-precision/recall as exact
    HUGEINT/DECIMAL(38,0) integer ratios (int64 ``hits*1e6`` wraps at
    corpus scale), recall NULL-guarded when the truth set is empty (tiny
    SFs) — identically on both engines.

    Scale shape: each block generator is one equi-join on its composite
    key; sorted-neighborhood reuses the two-phase bucketed global
    row_number + rank-keyed window join (w*n rows, never a range join);
    truth is nation-blocked (audit-scale — production audits run it on a
    deterministic sample, the dedup_lsh_quality_audit discipline); the
    hit check is one equi-join of candidates onto truth; summary is a
    4-row aggregate crossed with the 1-row truth count."""
    from arc_cassandra_pipeline_plugin_spark.operators.ranking import (
        global_row_number,
    )

    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ck"),
        F.col("c_nationkey").alias("nk"),
        F.round(F.col("c_acctbal") * 100, 0).cast("bigint").alias("c_cents"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("sk"),
        F.col("s_nationkey").alias("nk"),
        F.round(F.col("s_acctbal") * 100, 0).cast("bigint").alias("s_cents"),
    )
    truth = (
        c.join(s, "nk")
        .filter(F.abs(F.col("c_cents") - F.col("s_cents")) <= 100)
        .select("ck", "sk")
        .localCheckpoint(eager=False)
    )

    def block(gen: str, key_c, key_s) -> DataFrame:
        return (
            c.withColumn("bk", key_c)
            .join(s.withColumn("bk", key_s), ["nk", "bk"])
            .select(F.lit(gen).alias("gen"), "ck", "sk")
        )

    gh = block(
        "hash_block",
        F.expr("(c_cents + 100000) div 100000"),
        F.expr("(s_cents + 100000) div 100000"),
    )
    gp = block(
        "penny_block",
        F.expr("(c_cents + 100000) % 100"),
        F.expr("(s_cents + 100000) % 100"),
    )
    gc = block("congruence_block", F.col("ck") % 10, F.col("sk") % 10)

    comb = c.select(
        F.col("ck").alias("k"), F.lit(0).cast("bigint").alias("typ"),
        F.col("c_cents").alias("cents"),
    ).unionByName(
        s.select(
            F.col("sk").alias("k"), F.lit(1).cast("bigint").alias("typ"),
            F.col("s_cents").alias("cents"),
        )
    )
    r = global_row_number(comb, "cents", ["typ", "k"], out_col="rn")
    right = r.select(
        F.col("rn").alias("rn2"), F.col("k").alias("k_b"), F.col("typ").alias("typ_b")
    )
    gs = (
        r.select(
            "k", "typ",
            F.explode(F.expr(f"sequence(rn + 1, rn + {_SN_AUDIT_W})")).alias("rn2"),
        )
        .join(right, "rn2")
        .filter(F.col("typ") != F.col("typ_b"))
        .select(
            F.lit("sorted_neighborhood").alias("gen"),
            F.when(F.col("typ") == 0, F.col("k")).otherwise(F.col("k_b")).alias("ck"),
            F.when(F.col("typ") == 0, F.col("k_b")).otherwise(F.col("k")).alias("sk"),
        )
    )
    cand = gh.unionByName(gp).unionByName(gc).unionByName(gs)
    j = cand.join(
        truth.withColumn("hit", F.lit(1)), ["ck", "sk"], "left"
    ).select("gen", F.coalesce(F.col("hit"), F.lit(0)).alias("hit"))
    per = j.groupBy("gen").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
        F.sum("hit").cast("bigint").alias("n_hit"),
    )
    nt = truth.agg(F.count(F.lit(1)).cast("bigint").alias("n_true"))
    return per.crossJoin(F.broadcast(nt)).select(
        "gen", "n_candidates", "n_hit", "n_true",
        F.expr(
            "cast(cast(n_hit as decimal(38,0)) * 1000000"
            " div n_candidates as bigint)"
        ).alias("precision_micro"),
        F.when(F.col("n_true") == 0, F.lit(None).cast("bigint")).otherwise(
            F.expr(
                "cast(cast(n_hit as decimal(38,0)) * 1000000 div n_true as bigint)"
            )
        ).alias("recall_micro"),
    )
