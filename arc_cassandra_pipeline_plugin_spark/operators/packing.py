"""Sequence packing for LLM pre-training: concatenate the corpus in a
deterministic document order and chunk the token stream into fixed-budget
context windows ("concat-and-chunk", the GPT-style packing scheme), emitting
one span row per (document, window) — enough to drive the actual tensor
assembly without ever materializing the concatenated stream.

Why concat-and-chunk rather than bin packing: first-fit-decreasing style
bin packing is inherently sequential (each placement depends on every
earlier one), while concat-and-chunk is a pure function of each document's
global token offset — embarrassingly parallel once that offset is known.
The offset is an exclusive global prefix sum of per-document token counts,
computed with the two-phase bucketed scheme in
:mod:`~arc_cassandra_pipeline_plugin_spark.operators.ranking` (no
single-partition window, O(buckets) driver state), so the whole operator is
two linear passes + one explode whose output is ``N_docs + total_tokens /
budget`` rows — linear in corpus size with a tiny constant.

Determinism: document order is the caller's ``order_key`` (unique id), the
prefix sum is exact long addition, and every span boundary is integer
arithmetic — an SQL oracle replays the result bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from arc_cassandra_pipeline_plugin_spark.operators.ranking import global_prefix_sum


def pack_sequences(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    num_buckets: int = 32,
) -> DataFrame:
    """Assign every document a contiguous slice of the concatenated token
    stream and split it at ``budget``-token window boundaries.

    Input: one row per document with an integral ``tokens_col``; rows with
    zero tokens are dropped (they occupy no stream positions). Output: one
    row per (document, window) the document overlaps —

    - ``chunk_id``    — 0-based window index (window k covers global token
      positions ``[k*budget, (k+1)*budget)``),
    - ``doc_from`` / ``doc_to`` — the half-open token span OF THE DOCUMENT
      that lands in this window,
    - ``chunk_from``  — where that span starts WITHIN the window,
    - ``n_slice``     — span length (= doc_to - doc_from).

    Invariants (pinned by tests): per document, spans tile
    ``[0, n_tokens)`` in chunk order; per window, slices tile
    ``[0, budget)`` exactly (the final window may end short); a document
    spans ``ceil`` of its share of windows, never more.

    Scale shape: prefix sum (two linear passes, partitioned windows only)
    + one ``sequence``/``explode`` bounded by ``n_tokens/budget + 1`` rows
    per document. No shuffle after the prefix sum's bucket join — window
    assembly downstream can ``repartition(chunk_id)`` as its first step.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    docs = df.filter(F.col(tokens_col) > 0)
    # sketch the range-bucket bounds on the UNFILTERED id column: the
    # ``> 0`` filter references tokens_col, which is typically an expensive
    # projection (a tokenize), so bounding over ``docs`` would evaluate
    # that projection twice — once for the sketch, once for the prefix
    # sum's materialization. Bounds over all ids are equally valid (they
    # only steer balance; the prefix sum is exact under any bounds) and
    # prune the projection away, leaving a bare id-column scan.
    qs = [i / num_buckets for i in range(1, num_buckets)]
    row = df.select(
        F.percentile_approx(id_col, qs, 10_000).alias("b")
    ).first()
    started = global_prefix_sum(
        docs,
        id_col,
        tokens_col,
        out_col="__start",
        num_buckets=num_buckets,
        bounds=list(row["b"] or []),
    )
    s = F.col("__start")
    n = F.col(tokens_col).cast("long")
    b = F.lit(budget).cast("long")
    first = F.floor(s / b).cast("long")
    last = F.floor((s + n - F.lit(1)) / b).cast("long")
    k = F.col("chunk_id")
    return (
        started.withColumn("chunk_id", F.explode(F.sequence(first, last)))
        .select(
            id_col,
            "chunk_id",
            F.greatest(F.lit(0).cast("long"), k * b - s).alias("doc_from"),
            F.least(n, (k + F.lit(1)) * b - s).alias("doc_to"),
            F.greatest(F.lit(0).cast("long"), s - k * b).alias("chunk_from"),
        )
        .withColumn("n_slice", F.col("doc_to") - F.col("doc_from"))
    )
