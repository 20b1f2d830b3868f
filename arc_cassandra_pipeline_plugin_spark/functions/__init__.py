"""Column-level helper functions.

All helpers return Spark ``Column`` expressions built from
``pyspark.sql.functions`` — JVM-side, whole-stage-codegen'd, no Python UDFs
in any hot path. Where a function participates in oracle-checked queries,
its semantics are chosen to be expressible identically in ANSI SQL
(cross-engine-deterministic: md5-hex prefixes for hashing, sequential
left-to-right folds for vector math).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# vector math (embedding array<float> columns → double)
# --------------------------------------------------------------------------

def vec_double(col: Column | str) -> Column:
    """Cast an ``array<float>`` embedding to ``array<double>`` so all math
    runs in double precision (matches the oracle's ``::DOUBLE[]`` cast)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot_product(a: Column, b: Column) -> Column:
    """Sequential left-to-right dot product via ``zip_with`` + ``aggregate``
    — a deterministic fold, not a shuffle-order-dependent sum."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two double-array columns."""
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


# --------------------------------------------------------------------------
# text metrics (documents.text) — engine-portable building blocks
# --------------------------------------------------------------------------

def token_count(text: Column | str) -> Column:
    """Whitespace-token count; empty/blank text counts 0. Matches
    ``len(string_split_regex(trim(text), '\\s+'))`` modulo the blank guard."""
    c = F.col(text) if isinstance(text, str) else text
    t = F.trim(c)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def occurrence_count(text: Column, needle: str) -> Column:
    """Occurrences of a literal substring via the replace-length trick —
    ``replace``/``length`` have identical semantics in every SQL engine, so
    the language-ID heuristic built on this is oracle-portable."""
    return (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit("")))) / len(needle)


def non_alnum_ratio(text: Column) -> Column:
    """Share of characters that are not [a-z0-9 ] after lowercasing."""
    lower = F.lower(text)
    stripped = F.regexp_replace(lower, "[a-z0-9 ]", "")
    return F.when(F.length(lower) == 0, F.lit(0.0)).otherwise(
        F.length(stripped).cast("double") / F.length(lower)
    )


def hex_hash64(col: Column, length: int = 16) -> Column:
    """Deterministic engine-portable fingerprint: leading hex chars of the
    md5 digest. Fixed-width hex compares identically as string or number."""
    return F.substring(F.md5(col), 1, length)


# Accuracy for the certified lossless-sketch equivalence
# ``approx_percentile(x, p, LOSSLESS_PCTL_ACC)`` ≡ DuckDB ``quantile_disc``:
# the equivalence holds ONLY while the per-group (or, for global
# percentiles, per-table) row count stays ≤ the accuracy — beyond that the
# GK sketch's rank-error budget (n/acc) exceeds one rank and the returned
# order statistic can silently fork from the oracle's (the r10
# feature_winsorize drift class). 1e7 gives ≥10× headroom over every
# certified fixture (largest certified input: lineitem sf1 = 6M rows;
# largest percentile input: orders sf1 = 1.5M). If a fixture decade ever
# pushes a percentile input past 1e6 rows/group × 10, bump this and
# re-certify. At true 100 TB scale the exact-percentile contract is
# intentionally dropped: use a real approximate accuracy (1e4-ish) and
# accept sketch semantics — the oracle equivalence is a TEST-SCALE pin.
LOSSLESS_PCTL_ACC = 10_000_000


def lossless_pctl(col: str, frac, acc: int = LOSSLESS_PCTL_ACC) -> Column:
    """Exact discrete percentile(s) via the lossless-sketch equivalence
    (see ``LOSSLESS_PCTL_ACC``). ``frac`` is a float or list of floats;
    the DuckDB oracle twin is ``quantile_disc(col, frac)``."""
    if isinstance(frac, (list, tuple)):
        fr = "array(" + ",".join(repr(f) for f in frac) + ")"
    else:
        fr = repr(frac)
    return F.expr(f"approx_percentile({col}, {fr}, {acc})")


def hash_bucket(col: Column, buckets: int) -> Column:
    """Uniform bucket id in [0, buckets) from an md5 prefix — portable
    (``('0x' || substr(md5(x),1,8))::bigint % buckets`` in DuckDB)."""
    return (F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint") % buckets).cast("int")


def hash_bucket_wide(col: Column, buckets: int) -> Column:
    """48-bit variant of :func:`hash_bucket` — portable
    (``('0x' || substr(md5(x),1,12))::bigint % buckets`` in DuckDB).

    For a modulus like 1e6 that does not divide any power-of-two hash
    space, the 32-bit prefix leaves a ~0.02% over-weight on the low
    residues (2^32 % 1e6 = 967296); 48 bits shrink that to ~4e-9 —
    below any statistical resolution the certified queries report."""
    return (
        F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("bigint") % buckets
    ).cast("int")


def small_df(spark, rows, schema) -> DataFrame:
    """Driver-built control-plane DataFrame (LUTs, offsets, centroids,
    query-term lists) materialized in ONE partition.

    ``spark.createDataFrame(list)`` parallelizes the rows over
    ``defaultParallelism`` slices, so a handful of literal rows schedules
    32 Python-worker tasks at ``local[32]`` (measured ~2x the wall of a
    single-slice parallelize per call, and multiple seconds of pure
    worker-spawn CPU). These frames are O(k)/O(buckets) literals that ride
    broadcast joins anyway — one partition is the right shape at any
    scale, cluster or local."""
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)


def checkpoint_sized(df: DataFrame, target_bytes: int = 64 << 20) -> DataFrame:
    """Eager ``localCheckpoint`` whose downstream width is re-derived from
    the MEASURED materialized size — the rule AQE applies after a shuffle
    (advisory partition size), applied to a checkpoint.

    A frame fanned out for an expensive projection (``ensure_parallelism``
    before a tokenize) keeps that fan-out past the checkpoint, so every
    later control-plane stage over it schedules one task per core for
    kilobytes of work (~6-10 ms/task of scheduler overhead per stage,
    measured +26% on dedup_setsim_prefix end to end). The old shuffle-based
    builds got right-sizing for free from AQE's post-shuffle coalescing;
    with the shuffle removed this re-derives it: checkpoint, read the
    materialized bytes from the block manager (no job), and ``coalesce``
    (narrow, no exchange) to ``ceil(bytes / target)``. At real scale the
    measured size keeps the width unchanged; only small-relative-to-target
    frames narrow. Falls back to the plain checkpoint if storage info is
    unavailable."""
    sc = df.sparkSession.sparkContext
    try:
        before = {i.id() for i in sc._jsc.sc().getRDDStorageInfo()}
    except Exception:
        return df.localCheckpoint(eager=True)
    ck = df.localCheckpoint(eager=True)
    try:
        sizes = [
            i.memSize() + i.diskSize()
            for i in sc._jsc.sc().getRDDStorageInfo()
            if i.id() not in before
        ]
        size = max(sizes) if sizes else None
    except Exception:
        return ck
    if size is None:
        return ck
    want = max(1, -(-size // target_bytes))
    if want < ck.rdd.getNumPartitions():
        ck = ck.coalesce(want)
    return ck


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Repartition up to the cluster's default parallelism when the input
    has fewer partitions.

    Row-amplifying projections (shingle/token explodes, per-vector scoring)
    otherwise run in however few partitions the scan produced — measured at
    sf0.1: the whole MinHash chain ran as ONE task (3.2 s on one core vs
    ~0.5 s on 32) because the corpus was a single small parquet file. The
    shuffle moved is the pre-amplification input (cheap); at real scale the
    scan already yields >= parallelism partitions and this is a no-op."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df
