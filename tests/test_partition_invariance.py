"""Partition-invariance property family (r8 verdict item 7).

The cross-engine determinism conventions promise that a certified query's
result is a pure function of the DATA — never of physical layout. This
asserts it directly: a rotating 20-query sample must produce the identical
value multiset when

- every fixture table is pre-shuffled through ``repartition(n)`` with a
  hostile n (1 = everything in one task, 7 = a prime that never aligns
  with any natural key grouping), and
- ``spark.sql.shuffle.partitions`` is pinned to the extremes (1 and 200)
  instead of the tuned cores-sized default.

Rotation: the sample is the md5-ordered head of the registry keyed on the
registry SIZE, so every round's new registrations reshuffle which 20
queries are sampled (same mechanism as the driver-gate rotation — over
rounds the sweep walks the registry instead of resampling).
"""

from __future__ import annotations

import hashlib
import sys
from collections import Counter

import pytest

from arc_cassandra_pipeline_plugin_spark.queries import load_all
from tests.conftest import SF_SMALL

REGISTRY = load_all()

#: (input repartition n, shuffle partitions) — one small, one oversized
PERTURBATIONS = [(1, "1"), (7, "200")]

SAMPLE_N = 20


def _sample() -> list[str]:
    names = sorted(
        REGISTRY,
        key=lambda n: hashlib.md5(f"pinv{len(REGISTRY)}:{n}".encode()).hexdigest(),
    )
    return names[:SAMPLE_N]


SAMPLE = _sample()

#: baseline multisets, computed once per query on the tuned session layout
_BASELINE: dict[str, Counter] = {}


def _norm_cell(v):
    import datetime
    import decimal
    import math

    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat()
    if isinstance(v, bytearray):
        return bytes(v)
    return v


def _multiset(df) -> Counter:
    cols = sorted(df.columns)
    return Counter(
        tuple(_norm_cell(r[c]) for c in cols) for r in df.select(*cols).collect()
    )


def _patch_load_table(monkeypatch, n: int):
    """Route every ``load_table`` call through ``repartition(n)``.

    Query modules bind ``load_table`` at import time, so patching the
    sources module alone is not enough — every already-imported module
    holding a reference to the original function is patched too."""
    from arc_cassandra_pipeline_plugin_spark import sources

    original = sources.load_table

    def shuffled(spark, sf_dir, name):
        return original(spark, sf_dir, name).repartition(n)

    for mod_name, mod in list(sys.modules.items()):
        if not mod_name.startswith("arc_cassandra_pipeline_plugin_spark"):
            continue
        if getattr(mod, "load_table", None) is original:
            monkeypatch.setattr(mod, "load_table", shuffled)


@pytest.mark.parametrize(
    "rep_n,shuffle_parts", PERTURBATIONS, ids=[f"rep{n}-sp{sp}" for n, sp in PERTURBATIONS]
)
@pytest.mark.parametrize("name", SAMPLE)
def test_partition_invariance(spark, monkeypatch, name, rep_n, shuffle_parts):
    q = REGISTRY[name]
    if name not in _BASELINE:
        _BASELINE[name] = _multiset(q.fn(spark, SF_SMALL))
    baseline_sp = spark.conf.get("spark.sql.shuffle.partitions")
    _patch_load_table(monkeypatch, rep_n)
    try:
        spark.conf.set("spark.sql.shuffle.partitions", shuffle_parts)
        perturbed = _multiset(q.fn(spark, SF_SMALL))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", baseline_sp)
    assert _BASELINE[name] == perturbed, (
        f"{name}: result depends on physical layout "
        f"(repartition({rep_n}), shuffle_partitions={shuffle_parts})"
    )
