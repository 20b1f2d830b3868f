"""Text-analysis operators over document tables.

Designed for LLM training-data pipelines at 100 TB: every operator is a pure
column-expression projection (no shuffle, no Python UDF), so it fuses into a
single whole-stage-codegen scan stage and parallelizes embarrassingly.
Semantics are deliberately engine-portable (see
:mod:`arc_cassandra_pipeline_plugin_spark.functions`) so each operator is
certified against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from arc_cassandra_pipeline_plugin_spark.functions import small_df

from arc_cassandra_pipeline_plugin_spark.functions import (
    hex_hash64,
    non_alnum_ratio,
    occurrence_count,
    token_count,
)

#: per-language marker words for the n-gram/stopword language-ID heuristic.
#: Counting uses the replace-length trick on ' word ' (space-delimited), which
#: is portable SQL — see functions.occurrence_count.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "les"],
    "es": ["el", "y", "los"],
    "zh": ["的", "是", "了"],
}


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token count, char count, avg token length, non-alphanumeric ratio —
    the quality-scoring raw features. Single projection, zero shuffles."""
    t = F.col(text_col)
    n_tokens = token_count(t)
    return df.withColumns(
        {
            "n_tokens": n_tokens,
            "n_chars_measured": F.length(t),
            "avg_token_len": F.when(n_tokens == 0, F.lit(0.0)).otherwise(
                F.length(F.regexp_replace(F.trim(t), r"\s+", "")).cast("double") / n_tokens
            ),
            "non_alnum_ratio": non_alnum_ratio(t),
        }
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality in [0,1]: rewards mid-length documents and
    clean character distributions. The exact formula is arbitrary (the
    reference has no text ops — this is a north-star extension); what
    matters is that it is deterministic, portable, and cheap."""
    d = with_token_stats(df, text_col)
    length_component = F.least(F.col("n_tokens").cast("double") / F.lit(100.0), F.lit(1.0))
    clean_component = F.lit(1.0) - F.least(F.col("non_alnum_ratio") * 2.0, F.lit(1.0))
    return d.withColumn(
        "quality_score", F.round(0.5 * length_component + 0.5 * clean_component, 6)
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: count per-language stopword hits in the
    lowercased text, pick the argmax (deterministic tiebreak: language code
    ascending, 'und' when no marker hits at all)."""
    lower = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    scored = df
    for lang, words in LANG_MARKERS.items():
        score = None
        for w in words:
            c = occurrence_count(lower, f" {w} ")
            score = c if score is None else score + c
        scored = scored.withColumn(f"score_{lang}", score)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):  # ascending priority → first max wins
        pred = F.when(F.col(f"score_{lang}") == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best <= 0, F.lit("und")).otherwise(pred)
    return scored.withColumn("lang_pred", pred).drop(*[f"score_{lang}" for lang in langs])


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5-prefix over the whitespace-normalized,
    lowercased text. Identical normalization is expressible in the oracle
    (``substr(md5(regexp_replace(lower(trim(text)),'\\s+',' ','g')),1,16)``)."""
    normalized = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.withColumn("fingerprint", hex_hash64(normalized, 16))


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (the MOSS rolling-hash scheme):
    hash every k-gram, slide a window of ``window`` consecutive k-grams,
    keep the minimum hash per window, emit the distinct survivors per doc.

    Guarantees: any shared substring of length >= w+k-1 between two docs
    yields at least one shared fingerprint — the local-dedup/plagiarism
    primitive. Distributed shape: shingle rows → per-doc window min (one
    shuffle on doc_id, window is partition-local) → distinct.

    Hashes are md5-prefix ints, so the whole scheme replays in SQL
    (min OVER rolling window) for oracle certification.
    """
    from pyspark.sql.window import Window as W

    from arc_cassandra_pipeline_plugin_spark.functions import ensure_parallelism

    normed = ensure_parallelism(
        df.select(
            F.col(id_col),
            F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ").alias("t"),
        )
    )
    # positions of all k-grams; n_shingles kept for the complete-window cut
    pos = normed.select(
        id_col,
        "t",
        F.greatest(F.length("t") - F.lit(k - 1), F.lit(1)).alias("n_shingles"),
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.length("t") - F.lit(k - 1), F.lit(1)))
        ).alias("i"),
    ).select(
        id_col, "i", "n_shingles", F.expr(f"substring(t, i, {k})").alias("shingle")
    )
    hashed = pos.select(
        id_col,
        "i",
        "n_shingles",
        F.conv(F.substring(F.md5(F.col("shingle")), 1, 8), 16, 10).cast("bigint").alias("h"),
    )
    w = W.partitionBy(id_col).orderBy("i").rowsBetween(0, window - 1)
    return (
        hashed.withColumn("win_min", F.min("h").over(w))
        # only complete windows (textbook winnowing); docs shorter than one
        # window keep their single partial window at i=1
        .filter(
            (F.col("i") <= F.col("n_shingles") - F.lit(window - 1)) | (F.col("i") == 1)
        )
        .select(F.col(id_col), F.col("win_min").alias("fingerprint_hash"))
        .distinct()
    )


def tokens(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, token) rows over whitespace tokens of the normalized text.
    The pre-amplification parallelism guard applies (explode fans out
    ~50× on prose)."""
    from arc_cassandra_pipeline_plugin_spark.functions import ensure_parallelism

    normed = ensure_parallelism(
        df.select(
            F.col(id_col),
            F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ").alias("t"),
        )
    )
    return normed.select(
        id_col, F.explode(F.split(F.col("t"), " ")).alias("token")
    ).filter(F.length("token") > 0)


def token_frequencies(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", top_n: int = 50
) -> DataFrame:
    """Global top-N tokens by corpus frequency (deterministic: count desc,
    token asc). One explode + one groupBy(token) shuffle with map-side
    combine; the top-N compiles to TakeOrderedAndProject — no global sort
    materializes."""
    return (
        tokens(df, text_col, id_col)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"), F.countDistinct(id_col).alias("n_docs"))
        .orderBy(F.col("n_occurrences").desc(), F.col("token"))
        .limit(top_n)
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 5,
) -> DataFrame:
    """Top-N terms per document by smoothed TF-IDF:
    ``tfidf = tf * (ln((N + 1) / (df + 1)) + 1)``.

    Distributed shape: one token explode; tf = groupBy(doc, token); df =
    groupBy(token); N arrives via a broadcast 1-row aggregate (never a
    driver collect); per-doc top-N is a window PARTITIONED by doc. Ranking
    orders by the 6-dp ROUNDED score with the token as tiebreak, so the
    result is exact across engines and float-summation orders."""
    from pyspark.sql.window import Window

    tok = tokens(df, text_col, id_col)
    # ONE tokenize pass: dfreq and n_docs derive from the materialized
    # (doc, token, tf) table — tf has one row per (doc, token), so a plain
    # count per token IS the document frequency (A/B-measured 1.77 s ->
    # 1.15 s at sf0.1, identical output; the un-checkpointed shape ran the
    # explode three times)
    tf = (
        tok.groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("dfreq"))
    n_docs = tf.select(F.countDistinct(id_col).alias("n_docs"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1.0) / (F.col("dfreq") + 1.0)) + 1.0),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("token"))
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= top_n)
        .select(id_col, "token", "tfidf", "term_rank")
    )


def contamination(
    corpus: DataFrame,
    probes: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 8,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any
    character ``shingle_k``-gram with the probe (benchmark/eval) set.

    Distributed shape: distinct shingles on both sides, equi-join on the
    shingle string (probe side broadcast when small — benchmark suites are
    tiny next to a training corpus), per-doc overlap counts and ratio. No
    pairwise document comparison ever happens; shuffle volume is the
    corpus's distinct-shingle set.
    """
    from arc_cassandra_pipeline_plugin_spark.operators.dedup import shingle_rows

    corpus_sh = shingle_rows(corpus, text_col, id_col, shingle_k, distinct=True)
    probe_sh = (
        shingle_rows(probes, text_col, id_col, shingle_k, distinct=True)
        .select("shingle")
        .distinct()
    )
    sizes = corpus_sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    hits = (
        corpus_sh.join(F.broadcast(probe_sh), "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    return (
        sizes.join(hits, id_col)
        .withColumn(
            "contamination_ratio",
            F.round(F.col("n_contaminated") / F.col("n_shingles").cast("double"), 6),
        )
        .select(id_col, "n_contaminated", "n_shingles", "contamination_ratio")
    )


#: PII patterns, ordered: emails first (so their digits don't half-match the
#: phone pattern), then phone-like sequences, then long digit runs (ids,
#: card-ish numbers). Kept engine-portable: no lookarounds, POSIX classes.
PII_PATTERNS: "list[tuple[str, str, str]]" = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?[0-9][0-9()\-. ]{7,}[0-9]", "<PHONE>"),
    ("digits", r"[0-9]{6,}", "<NUM>"),
]


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Training-corpus PII scrub: replace emails, phone-like sequences and
    long digit runs with typed placeholders, and count replacements per
    category (the audit trail a compliance pass needs). Pure codegen'd
    regexp projection — no shuffle, no Python; patterns are portable so the
    whole scrub replays in the SQL oracle."""
    cols: dict[str, F.Column] = {}
    stage = F.col(text_col)
    for name, pat, token in PII_PATTERNS:
        # count against the text as of THIS stage (each pattern sees the
        # previous patterns' placeholders, never their raw matches)
        cols[f"n_{name}"] = F.size(F.regexp_extract_all(stage, F.lit(pat), 0))
        stage = F.regexp_replace(stage, pat, token)
    return df.withColumns({**cols, "text_redacted": stage})


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Context-window chunking: split each document into token chunks of
    ``chunk_tokens`` whitespace tokens with ``overlap`` tokens of overlap —
    the standard pre-training/embedding preparation step.

    stride = chunk_tokens - overlap; chunk i covers tokens
    [i*stride, i*stride + chunk_tokens). The last chunk may be short; a
    document shorter than one chunk yields exactly one chunk. All array
    ops (split/slice/join) are codegen'd built-ins; the explode fans out
    ~len/stride×, so the pre-amplification parallelism guard applies."""
    if overlap >= chunk_tokens:
        raise ValueError(f"overlap ({overlap}) must be < chunk_tokens ({chunk_tokens})")
    stride = chunk_tokens - overlap
    from arc_cassandra_pipeline_plugin_spark.functions import ensure_parallelism

    toks = ensure_parallelism(
        df.select(
            F.col(id_col),
            F.split(F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " ").alias(
                "__toks"
            ),
        )
    ).withColumn("__n", F.size("__toks"))
    # number of chunks: ceil(max(n - overlap, 1) / stride)
    n_chunks = F.greatest(
        F.ceil((F.col("__n") - F.lit(overlap)).cast("double") / stride), F.lit(1)
    ).cast("int")
    return (
        toks.withColumn("chunk_idx", F.explode(F.sequence(F.lit(0), n_chunks - 1)))
        .select(
            id_col,
            "chunk_idx",
            F.array_join(
                F.slice(F.col("__toks"), F.col("chunk_idx") * stride + 1, chunk_tokens), " "
            ).alias("chunk_text"),
            F.least(
                F.lit(chunk_tokens), F.col("__n") - F.col("chunk_idx") * stride
            ).alias("n_chunk_tokens"),
        )
    )


def repetition_signals(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition quality signals per document:

    - ``dup_token_ratio``: 1 - distinct/total whitespace tokens
    - ``top_token_ratio``: occurrences of the most frequent token / total

    High values flag boilerplate/spam for the quality filter. One explode +
    one groupBy(doc, token) + one groupBy(doc) — hash/count shuffles only."""
    toks = tokens(df, text_col, id_col)
    per_tok = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("c"))
    return (
        per_tok.groupBy(id_col)
        .agg(
            F.sum("c").alias("__total"),
            F.count(F.lit(1)).alias("__distinct"),
            F.max("c").alias("__maxc"),
        )
        .select(
            id_col,
            F.round(1.0 - F.col("__distinct") / F.col("__total").cast("double"), 6).alias(
                "dup_token_ratio"
            ),
            F.round(F.col("__maxc") / F.col("__total").cast("double"), 6).alias(
                "top_token_ratio"
            ),
        )
    )


def unigram_lm_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Unigram language-model fluency score per document: the mean log-prob
    of the document's tokens under the corpus's own unigram distribution
    (a CCNet/KenLM-style quality signal — boilerplate and rare-token salad
    both score low).

    Distributed shape: one token explode; the vocabulary (token → count) is
    a groupBy(token); the corpus total arrives as a broadcast 1-row
    aggregate; tokens rejoin the vocabulary on the token key (shuffle join —
    the vocabulary is NOT broadcast: at web scale it has hundreds of
    millions of entries); final groupBy(doc). Cross-engine determinism:
    each token's log-prob is rounded to 6 dp and summed as an exact
    DECIMAL, so the per-doc mean is independent of partition order.
    """
    tok = tokens(df, text_col, id_col)
    # ONE tokenize pass: the (doc, token, count) table is materialized and
    # both the vocabulary AND the scoring join derive from it — the
    # occurrence-level join used to re-run the explode on each side
    # (A/B-measured 1.34 s -> 1.08 s at sf0.1, identical output; weighting
    # the rounded logp by the occurrence count is exactly the sum of
    # per-occurrence rounded logps, so the decimal arithmetic is unchanged)
    tc = (
        tok.groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    vocab = tc.groupBy("token").agg(F.sum("cnt").alias("tok_cnt"))
    total = vocab.select(F.sum("tok_cnt").alias("corpus_total"))
    logp = F.round(
        F.log(F.col("tok_cnt").cast("double") / F.col("corpus_total").cast("double")),
        6,
    ).cast("decimal(18,6)")
    scored = (
        tc.join(vocab, "token")
        .crossJoin(F.broadcast(total))
        .select(id_col, "cnt", (logp * F.col("cnt")).alias("logp_w"))
    )
    return (
        scored.groupBy(id_col)
        .agg(F.sum("cnt").alias("n_tokens"), F.sum("logp_w").alias("__s"))
        .select(
            id_col,
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.round(F.col("__s").cast("double") / F.col("n_tokens"), 4).alias(
                "avg_logprob"
            ),
        )
    )


def bigram_lm_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Bigram language-model fluency score per document: the mean log-prob
    of each token given its predecessor under the corpus's own add-one-
    smoothed bigram distribution — logp(w_i | w_{i-1}) =
    ln((c(w_{i-1}, w_i) + 1) / (c(w_{i-1}) + V)). The order-sensitive
    upgrade of :func:`unigram_lm_score`: shuffled or template-stitched text
    scores low even when its unigram profile looks fluent.

    Distributed shape, ONE tokenize pass: the positioned token table
    (doc, pos, token) is materialized once (localCheckpoint) and every
    consumer derives from it — the vocabulary size V (one countDistinct),
    the bigram stream (a lag window partitioned per document, state bounded
    by document length), the bigram/context count tables (groupBy with
    map-side combine on the bigram key), and the scoring join (bigram-key
    shuffle join — the bigram table is NOT broadcast: at web scale it has
    billions of entries; V and the corpus totals ride a broadcast 1-row
    aggregate). Cross-engine determinism: per-bigram log-probs are rounded
    to 6 dp and summed as exact DECIMAL weighted by the doc-level bigram
    count, so the per-doc mean is independent of partition order (weighting
    the rounded logp by the count is exactly the sum of per-occurrence
    rounded logps)."""
    from pyspark.sql.window import Window

    from arc_cassandra_pipeline_plugin_spark.functions import ensure_parallelism

    normed = ensure_parallelism(
        df.select(
            F.col(id_col),
            F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ").alias("t"),
        )
    )
    tokp = (
        normed.select(
            id_col, F.posexplode(F.split(F.col("t"), " ")).alias("pos", "token")
        )
        .filter(F.length("token") > 0)
        .localCheckpoint(eager=True)
    )
    vocab_size = tokp.agg(F.countDistinct("token").alias("v"))
    w = Window.partitionBy(id_col).orderBy("pos")
    big = tokp.select(
        id_col, F.lag("token").over(w).alias("prev"), F.col("token").alias("cur")
    ).filter(F.col("prev").isNotNull())
    # doc-level bigram counts: everything downstream (global counts AND the
    # scoring join) derives from this one table — no second corpus pass
    bc = big.groupBy(id_col, "prev", "cur").agg(F.count(F.lit(1)).alias("cnt"))
    c2 = bc.groupBy("prev", "cur").agg(F.sum("cnt").alias("c2"))
    c1 = c2.groupBy("prev").agg(F.sum("c2").alias("c1"))
    logp = F.round(
        F.log(
            (F.col("c2") + F.lit(1).cast("double"))
            / (F.col("c1") + F.col("v")).cast("double")
        ),
        6,
    ).cast("decimal(18,6)")
    scored = (
        bc.join(c2, ["prev", "cur"])
        .join(c1, "prev")
        .crossJoin(F.broadcast(vocab_size))
        .select(id_col, "cnt", (logp * F.col("cnt")).alias("logp_w"))
    )
    return (
        scored.groupBy(id_col)
        .agg(F.sum("cnt").alias("n_bigrams"), F.sum("logp_w").alias("__s"))
        .select(
            id_col,
            F.col("n_bigrams").cast("long").alias("n_bigrams"),
            F.round(F.col("__s").cast("double") / F.col("n_bigrams"), 4).alias(
                "avg_logprob"
            ),
        )
    )


#: BPE symbol separator — a control char absent from the tokenized corpus
#: (tokens are [a-z0-9]+, so \x1f can never appear inside a symbol)
BPE_SEP = "\x1f"


def bpe_train(
    docs: DataFrame,
    rounds: int = 3,
    text_col: str = "text",
    return_seqs: bool = False,
    lookahead: int = 8,
) -> DataFrame:
    """Byte-pair-encoding merge training as distributed rounds: learn the
    top ``rounds`` merges over the corpus word-frequency table. Returns
    (round, p1, p2, cnt) — the merged symbol pair per round with its
    weighted frequency.

    The classic tokenizer-training loop, Spark-first: words aggregate once
    to (word, freq) — pair statistics then scale with DISTINCT words, not
    corpus size. Each round is (a) adjacent-pair counting over the symbol
    sequences weighted by word frequency — one explode + one
    map-side-combined groupBy; (b) a global argmax (ordered limit 1 — a
    driver scalar, like the IVF centroid collect, O(1) per round); (c) the
    merge applied as one literal string replace per word. Greedy
    left-to-right non-overlap is exactly replace-all semantics, verified
    identical on Spark/DuckDB/Python ("a a a" + merge(a,a) -> "aa a").
    Ties break lexicographically so the learned merge table is fully
    deterministic.

    The sequence representation is a separator-delimited string
    (SEP c1 SEP c2 SEP ...), so a merge is replace(SEP p1 SEP p2 SEP ->
    SEP p1p2 SEP) — consecutive matches share the middle separator and
    replace-all's restart-after-replacement gives the standard BPE greedy
    scan.

    **Merge batching** (``lookahead``): a real tokenizer trains tens of
    thousands of merges; one Spark job per merge means tens of thousands
    of sequential driver round-trips. Each iteration here collects the
    top ``4×lookahead`` pairs once and applies the longest PREFIX of that
    ranking that is *provably* order-equivalent to one-at-a-time greedy:
    accept pair ``p_j`` after ``p_1..p_{j-1}`` iff (a) its symbols are
    disjoint from every earlier accepted pair — applying a merge only
    changes counts of pairs mentioning its symbols, so p_j's count is
    invariant — and (b) ``cnt(p_j)`` strictly exceeds every pair adjacent
    to an earlier accepted pair (any pair a merge CREATES inherits a count
    bounded by an adjacent pair of that merge, inductively through chains
    of created symbols), with pairs outside the collected top bounded by
    the last collected count. The learned merge table is bit-identical to
    the unbatched loop (pinned against the unrolled per-merge oracle and
    a pure-Python reference in pytest) with ~lookahead× fewer jobs on
    Zipf-shaped corpora."""
    spark = docs.sparkSession
    words = (
        docs.select(
            F.explode(
                F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    seqs = words.select(
        "w",
        "freq",
        F.concat(
            F.lit(BPE_SEP), F.regexp_replace("w", "(.)", "$1" + BPE_SEP)
        ).alias("seq"),
    ).localCheckpoint(eager=True)

    merges: list[tuple[int, str, str, int]] = []
    bpe_train.last_iterations = 0  # driver round-trips, exposed for tests
    while len(merges) < rounds:
        bpe_train.last_iterations += 1
        toks = F.expr(f"filter(split(seq, '{BPE_SEP}'), x -> x <> '')")
        pairs = (
            seqs.select("freq", toks.alias("t"))
            .filter(F.size("t") >= 2)
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(t) - 1), "
                        "i -> struct(element_at(t, i) AS p1, element_at(t, i + 1) AS p2))"
                    )
                ).alias("pr"),
            )
            .groupBy(F.col("pr.p1").alias("p1"), F.col("pr.p2").alias("p2"))
            .agg(F.sum("freq").alias("cnt"))
        )
        # lookahead <= 1 degenerates to the classic one-merge-per-job loop
        # (the baseline the batched path is benchmarked against in pytest)
        top_m = 1 if lookahead <= 1 else max(4 * lookahead, 16)
        top = pairs.orderBy(F.col("cnt").desc(), "p1", "p2").limit(top_m).collect()
        if not top:
            break
        # counts of pairs NOT collected are bounded by the last collected
        # (if the collect got everything, nothing exists outside)
        outside_bound = -1 if len(top) < top_m else int(top[-1]["cnt"])
        accepted: list[tuple[str, str, int]] = []
        used_left: set[str] = set()   # first symbols of accepted merges
        used_right: set[str] = set()  # second symbols of accepted merges
        created_bound = -1  # max count any applied merge could hand a new pair
        for row in top:
            if len(merges) + len(accepted) >= rounds:
                break
            p1, p2, cnt = row["p1"], row["p2"], int(row["cnt"])
            if accepted:
                # merging (a1, a2) changes the counts of exactly the pairs
                # (x, a1), (a2, y) and itself — a candidate is invariant iff
                # its second symbol is no accepted first symbol and its
                # first symbol is no accepted second symbol
                if p2 in used_left or p1 in used_right:
                    break  # count no longer provably invariant — next round
                if cnt <= created_bound:
                    break  # a created pair could outrank this one
            accepted.append((p1, p2, cnt))
            used_left.add(p1)
            used_right.add(p2)
            # pairs adjacent to (p1, p2) bound everything its merge creates:
            # (x, p1) feeds (x, p1p2) and (p2, y) feeds (p1p2, y). Each
            # creation site is ALSO a merge site, so the created count is
            # additionally bounded by cnt itself — take the min.
            adj = max(
                (
                    int(r2["cnt"])
                    for r2 in top
                    if (r2["p2"] == p1 or r2["p1"] == p2)
                    and not (r2["p1"] == p1 and r2["p2"] == p2)
                ),
                default=-1,
            )
            created_bound = max(created_bound, min(max(adj, outside_bound), cnt))
        seq_col = F.col("seq")
        for p1, p2, cnt in accepted:
            merges.append((len(merges) + 1, p1, p2, cnt))
            seq_col = F.replace(
                seq_col,
                F.lit(BPE_SEP + p1 + BPE_SEP + p2 + BPE_SEP),
                F.lit(BPE_SEP + p1 + p2 + BPE_SEP),
            )
        seqs = seqs.select("w", "freq", seq_col.alias("seq"))
        # replace chains are cheap projections — let them accumulate and
        # snapshot every few iterations (each checkpoint is a full job;
        # per-iteration checkpoints dominated the batched loop's runtime)
        if bpe_train.last_iterations % 4 == 0:
            seqs = seqs.localCheckpoint(eager=True)
    merge_df = small_df(spark, 
        merges, "round INT, p1 STRING, p2 STRING, cnt BIGINT"
    )
    return (merge_df, seqs) if return_seqs else merge_df


def bpe_oracle_sql(rounds: int = 3, table: str = "documents", text_col: str = "text") -> str:
    """DuckDB oracle for :func:`bpe_train`: the same rounds unrolled as
    CTEs from the same constants — pair counting, lexicographic-tiebreak
    argmax, and the identical literal replace per round."""
    sep = "chr(31)"
    ctes = [
        f"""words AS MATERIALIZED (
  SELECT w, count(*) AS freq FROM (
    SELECT unnest(regexp_extract_all(lower({text_col}), '[a-z0-9]+')) AS w
    FROM {table}) GROUP BY w)""",
        f"""s0 AS MATERIALIZED (
  SELECT w, freq, {sep} || regexp_replace(w, '(.)', '\\1' || {sep}, 'g') AS seq
  FROM words)""",
    ]
    for r in range(1, rounds + 1):
        prev = f"s{r - 1}"
        ctes.append(
            f"""pairs{r} AS MATERIALIZED (
  SELECT pr[1] AS p1, pr[2] AS p2, sum(freq) AS cnt FROM (
    SELECT freq, unnest(list_zip(a[:-1], a[2:])) AS pr FROM (
      SELECT freq, list_filter(string_split(seq, {sep}), x -> x <> '') AS a
      FROM {prev}))
  WHERE pr[2] IS NOT NULL GROUP BY 1, 2)""",
        )
        ctes.append(
            f"""top{r} AS MATERIALIZED (
  SELECT p1, p2, CAST(cnt AS BIGINT) AS cnt FROM pairs{r}
  ORDER BY cnt DESC, p1, p2 LIMIT 1)""",
        )
        ctes.append(
            f"""s{r} AS MATERIALIZED (
  SELECT w, freq,
         replace(seq,
                 (SELECT {sep} || p1 || {sep} || p2 || {sep} FROM top{r}),
                 (SELECT {sep} || p1 || p2 || {sep} FROM top{r})) AS seq
  FROM {prev})""",
        )
    unions = "\nUNION ALL\n".join(
        f"SELECT {r} AS round, p1, p2, cnt FROM top{r}" for r in range(1, rounds + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + unions


def bpe_token_counts(
    docs: DataFrame, rounds: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """BPE ENCODE: apply the merges learned by :func:`bpe_train` back to
    the corpus and report per-document tokenizer fertility —
    (id, n_words, n_bpe_tokens). Encoding never re-walks documents: the
    trained word→subtoken-count map (distinct words only) equi-joins the
    document token stream, then one map-side-combined groupBy per doc. The
    standard pre-training question "how many tokens is this corpus under
    MY tokenizer" as one job."""
    _, seqs = bpe_train(docs, rounds=rounds, text_col=text_col, return_seqs=True)
    n_sub = F.size(F.expr(f"filter(split(seq, '{BPE_SEP}'), x -> x <> '')"))
    wmap = seqs.select("w", n_sub.alias("n_sub"))
    dtok = docs.select(
        F.col(id_col),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
        ).alias("w"),
    )
    return (
        dtok.join(wmap, "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sub").cast("bigint").alias("n_bpe_tokens"),
        )
    )


def bpe_encode_oracle_sql(
    rounds: int = 3, table: str = "documents", text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB oracle for :func:`bpe_token_counts`: the training CTEs plus
    the word-map join and per-document aggregation."""
    sep = "chr(31)"
    base = bpe_oracle_sql(rounds=rounds, table=table, text_col=text_col)
    ctes = base.split("\nSELECT 1 AS round", 1)[0]  # keep the WITH chain only
    return f"""{ctes},
wmap AS (
  SELECT w, len(list_filter(string_split(seq, {sep}), x -> x <> '')) AS n_sub
  FROM s{rounds}),
dtok AS (
  SELECT {id_col}, unnest(regexp_extract_all(lower({text_col}), '[a-z0-9]+')) AS w
  FROM {table})
SELECT {id_col}, count(*) AS n_words, CAST(sum(n_sub) AS BIGINT) AS n_bpe_tokens
FROM dtok JOIN wmap USING (w) GROUP BY {id_col}"""


def bm25_scores(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 relevance of every document against a small query-term list —
    the classic probabilistic retrieval score (Robertson/Sparck Jones):

        score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
        idf(t)   = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))

    Distributed shape: ONE tokenize pass into a materialized (doc, token)
    TF table — the classic IR index — from which doc lengths, corpus
    stats, and query-term tf all derive (A/B-measured 20% faster than
    re-exploding per aggregate branch, identical output). At cluster
    scale, persist/write the TF table instead of localCheckpoint and
    amortize it across term sets. Doc lengths are a linear groupBy;
    corpus stats (N, total tokens) a broadcast 1-row aggregate; the term
    list joins in as a broadcast table so only query-term occurrences
    survive into the (doc, term) tf aggregation; per-term document
    frequencies are an O(|terms|) aggregate joined back by broadcast. All
    expressions JVM-side. Documents containing none of the terms are
    absent from the output (their score is 0 by definition).

    Cross-engine determinism: the single ``ln`` is rounded to 6 dp (the
    repo's log convention — JVM vs libm differ by 1 ulp at boundaries),
    every other op is IEEE-deterministic given identical expression shape,
    each term's contribution is rounded to 6 dp and summed as an exact
    DECIMAL, and the final 4-dp round happens ON THE DECIMAL (exact
    half-away-from-zero on both engines, verified incl. negatives) BEFORE
    the double cast. Rounding after the cast was a real bug (caught by the
    r8 sf0.1 rotation): a 6-dp-grid sum lands exactly on a 4-dp half
    boundary with probability ~1e-2 per row, where Spark (shortest-decimal
    HALF_UP) and DuckDB (scaled-float) disagree by 1e-4.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0)
        ).alias("token"),
    )
    # ONE tokenize pass: the (doc, token) TF table is the pivot every
    # downstream aggregate derives from (doc lengths, corpus stats,
    # query-term tf) — materialized so the explode never re-runs. A/B vs
    # the two-branch re-explode shape: 1.57 s -> 1.26 s at sf0.1, same
    # output. At cluster scale, persist/write this TF index instead of
    # localCheckpoint (it IS the classic IR index; a pipeline scoring many
    # term sets amortizes it across queries).
    tc = (
        toks.groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    dl = tc.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("corpus_tokens")
    )
    # the term list is a literal — an isin filter is the same inner
    # semi-join (terms are distinct) without building/shipping a broadcast
    # relation for a handful of strings
    tf = tc.filter(F.col("token").isin(list(terms)))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("dfreq"))
    avgdl = F.col("corpus_tokens") / F.col("n_docs")
    idf = F.round(
        F.log(
            (F.col("n_docs") - F.col("dfreq") + F.lit(0.5))
            / (F.col("dfreq") + F.lit(0.5))
            + F.lit(1.0)
        ),
        6,
    )
    # (k1 + 1.0) and (1.0 - b) are computed ENGINE-side, not in Python:
    # e.g. the double sum 1.2 + 1.0 is NOT the double literal 2.2 (it
    # rounds to the neighbor below), so a Python-folded constant would
    # diverge from an oracle writing the same arithmetic. Both engines
    # parse identical literals and fold identically.
    den = F.col("tf") + F.lit(k1) * (
        (F.lit(1.0) - F.lit(b)) + F.lit(b) * (F.col("dl") / avgdl)
    )
    contrib = (
        F.round((idf * (F.col("tf") * (F.lit(k1) + F.lit(1.0)))) / den, 6)
        .cast("decimal(18,6)")
        .alias("c")
    )
    return (
        tf.join(dl, id_col)
        .join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(stats))
        .select(id_col, contrib)
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hit"), F.sum("c").alias("__s"))
        .select(
            id_col,
            F.col("n_hit").cast("int").alias("n_hit"),
            F.round(F.col("__s"), 4).cast("double").alias("bm25"),
        )
    )
