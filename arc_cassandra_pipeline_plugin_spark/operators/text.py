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
