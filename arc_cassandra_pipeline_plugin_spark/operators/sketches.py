"""Mergeable frequency sketches: Count-Min heavy hitters.

A Count-Min sketch is the fixed-size answer to "what are the frequent
tokens in 100 TB of text": ``depth × width`` counters regardless of corpus
size, built with ONE map-side-combined shuffle (each task emits at most
``depth·width`` partial rows), and mergeable by plain addition — the same
sketch works per-partition, per-day, or per-stream-window and unions by
summing counters. Estimates only ever over-count (collisions add, never
subtract), so ``est >= true`` always; the error bound is the classic
``ε ≈ e/width`` of the total mass with probability ``1 - exp(-depth)``.

Hashing is the repo-standard md5-prefix bucket (portable to the DuckDB
oracle verbatim), salted per sketch row — see ``functions.hash_bucket``.
Everything is deterministic: the certified query replays identically in
SQL (see queries.extensions ``cms_heavy_hitters``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from arc_cassandra_pipeline_plugin_spark.functions import hash_bucket


def cms_bucket(col: F.Column, sketch_row: int, width: int) -> F.Column:
    """Bucket of ``col`` in sketch row ``sketch_row``: md5-prefix bucket of
    the row-salted token (`` 'cms{r}:' || token ``)."""
    return hash_bucket(F.concat(F.lit(f"cms{sketch_row}:"), col), width)


def cms_build(
    token_rows: DataFrame, token_col: str = "token", depth: int = 4, width: int = 64
) -> DataFrame:
    """Build the sketch: (sketch_row, bucket, cnt) — ``depth·width`` rows
    total. One explode (×depth) and one groupBy; partial aggregation caps
    every task's shuffle output at the sketch size, so the shuffle volume
    is O(tasks · depth · width) no matter how many tokens flow in."""
    pairs = token_rows.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("sketch_row"),
                        cms_bucket(F.col(token_col), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("p")
    )
    return pairs.groupBy("p.sketch_row", "p.bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Union sketches built with identical (depth, width): counters add."""
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy("sketch_row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    candidates: DataFrame,
    sketch: DataFrame,
    token_col: str = "token",
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Point estimates for candidate tokens: min over rows of the token's
    bucket counter. The sketch (``depth·width`` rows) broadcasts; a
    candidate absent from the corpus coalesces to 0."""
    keyed = candidates.select(F.col(token_col).alias("token")).distinct().select(
        "token",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("sketch_row"),
                        cms_bucket(F.col("token"), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("p"),
    ).select("token", "p.sketch_row", "p.bucket")
    return (
        keyed.join(F.broadcast(sketch), ["sketch_row", "bucket"], "left")
        .groupBy("token")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 15,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Top-``k`` tokens by Count-Min estimate (est desc, token asc).

    The certified formulation estimates over the corpus's own distinct
    tokens as candidates; a production 100 TB deployment keeps a bounded
    candidate list (e.g. per-partition local heavy hitters) against the
    same sketch — the sketch itself never grows either way."""
    from arc_cassandra_pipeline_plugin_spark.operators.text import tokens

    tok = tokens(df, text_col, id_col)
    sketch = cms_build(tok, depth=depth, width=width).localCheckpoint(eager=True)
    est = cms_estimate(tok.select("token"), sketch, depth=depth, width=width)
    return est.orderBy(F.col("est_count").desc(), F.col("token")).limit(k)
