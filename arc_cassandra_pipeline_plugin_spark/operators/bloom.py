"""Bloom-filter semi-join reduction.

The classic distributed-join optimization: instead of shuffling a 100 TB
fact table into a join just to discard most of it, build a fixed-size bloom
filter over the (much smaller) key side with ONE distributed aggregate,
ship the filter's few longs to every task, and drop non-matching fact rows
AT THE SCAN — before any shuffle. Spark's optimizer injects this
automatically in some shapes (``spark.sql.optimizer.runtime.bloomFilter``);
this operator is the explicit, engine-portable form: deterministic
md5-derived bit positions, so the exact same filter (including its false
positives) replays in the DuckDB oracle.

Bit layout: ``n_words`` 63-bit words (the sign bit is never used, keeping
``1 << pos`` positive in every engine), ``n_hashes`` independent salted
hashes per key; a key "hits" iff every hash's bit is set. False positives
are possible (and deterministic); false negatives are not — the filtered
set always contains every true match, which is what semi-join reduction
requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: usable bits per 64-bit word — the sign bit stays clear so shifted values
#: are positive in both engines
_WORD_BITS = 63


def _bit_index(col: F.Column, h: int, n_words: int) -> F.Column:
    """Deterministic bit index of key ``col`` under hash ``h``: 32-bit
    md5-prefix of the salted key string, mod the filter's bit size."""
    salted = F.concat(F.lit(f"bf{h}:"), col.cast("string"))
    return F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("bigint") % (
        n_words * _WORD_BITS
    )


def bloom_build(
    keys: DataFrame, key_col: str, n_words: int = 8, n_hashes: int = 2
) -> list[int]:
    """Aggregate the key set into ``n_words`` longs (one distributed
    bit_or-agg job, result is O(n_words) on the driver — the filter, never
    the keys). Size for ~1% false positives at ``m/n ≈ 10`` bits per key
    with 2 hashes; at 63 bits/word that is ``n_keys/6`` words."""
    word_aggs = [F.expr(f"bit_or(w{w})").alias(f"w{w}") for w in range(n_words)]
    named = keys.select(
        *[
            _word_contrib(F.col(key_col), w, n_words, n_hashes).alias(f"w{w}")
            for w in range(n_words)
        ]
    )
    row = named.agg(*word_aggs).collect()[0]
    return [row[f"w{w}"] or 0 for w in range(n_words)]


def _word_contrib(col: F.Column, w: int, n_words: int, n_hashes: int) -> F.Column:
    """This key's bit contributions to word ``w`` (OR over hashes).
    Striped layout: bit ``idx`` lives in word ``idx % n_words`` at position
    ``idx div n_words`` — division/modulo stay portable SQL."""
    acc = None
    for h in range(n_hashes):
        idx = _bit_index(col, h, n_words)
        # pow(2, pos) is exact for pos <= 62 (powers of two are exact in
        # double) and sidesteps shiftleft's python-int-only shift amount
        c = F.when(
            idx % n_words == w,
            F.pow(F.lit(2.0), (idx / n_words).cast("int")).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint"))
        acc = c if acc is None else acc.bitwiseOR(c)
    return acc


def bloom_hit(col: F.Column, words: list[int], n_words: int, n_hashes: int) -> F.Column:
    """Membership test: every hash's bit is set in the shipped words. The
    filter travels as ``n_words`` literals inside the expression — no join,
    no broadcast variable, evaluated in whole-stage codegen at the scan."""
    arr = F.array(*[F.lit(int(w)).cast("bigint") for w in words])
    cond = None
    for h in range(n_hashes):
        idx = _bit_index(col, h, n_words)
        word = F.element_at(arr, (idx % n_words).cast("int") + 1)
        bit = F.pow(F.lit(2.0), (idx / n_words).cast("int")).cast("bigint")
        hit = word.bitwiseAND(bit) != 0
        cond = hit if cond is None else cond & hit
    return cond


def bloom_semi_filter(
    df: DataFrame,
    col: str,
    keys: DataFrame,
    key_col: str,
    n_words: int = 8,
    n_hashes: int = 2,
) -> DataFrame:
    """Semi-join reduction of ``df`` by the bloom filter of ``keys``:
    guaranteed to keep every row whose ``col`` appears in the key set, plus
    a deterministic, bounded set of false positives. Follow with the exact
    join for exact semantics — the point is that the join's shuffle now
    moves only the pruned rows."""
    words = bloom_build(keys, key_col, n_words, n_hashes)
    return df.filter(bloom_hit(F.col(col), words, n_words, n_hashes))
