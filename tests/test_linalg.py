"""Power-iteration top component: convergence toward the exact top
right-singular vector (numpy eigendecomposition of the Gram matrix), plus
determinism and shape invariants."""

from __future__ import annotations

import numpy as np
import pytest

from arc_cassandra_pipeline_plugin_spark.operators.linalg import (
    power_iteration_top_component,
)

from conftest import SF_SMALL


@pytest.fixture(scope="module")
def emb(spark):
    from arc_cassandra_pipeline_plugin_spark.sources import load_table

    return load_table(spark, SF_SMALL, "embeddings")


def _as_vector(df, dim=64):
    rows = {r["j"]: r["loading"] for r in df.collect()}
    assert sorted(rows) == list(range(1, dim + 1))
    return np.array([rows[j] for j in sorted(rows)])


def test_power_iteration_converges_to_top_eigenvector(spark):
    # spiked spectrum: a dominant direction + small isotropic noise, so the
    # eigengap is large and 5 rounds resolve the direction (the fixture
    # embeddings are near-isotropic — lambda2/lambda1 ~ 0.93 — where ANY
    # power method needs dozens of rounds; that is a property of the data,
    # not the operator)
    rng = np.random.default_rng(7)
    d, n = 16, 200
    direction = rng.normal(size=d)
    direction /= np.linalg.norm(direction)
    X = np.outer(rng.normal(size=n) * 3.0, direction) + 0.1 * rng.normal(size=(n, d))

    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id BIGINT, embedding ARRAY<FLOAT>",
    )
    v = _as_vector(power_iteration_top_component(df, iters=5), dim=d)

    Xf = np.array(
        [np.array(r["embedding"], dtype=np.float64) for r in df.collect()]
    )
    gram = Xf.T @ Xf
    w, vecs = np.linalg.eigh(gram)
    exact = vecs[:, np.argmax(w)]
    cos = abs(float(v @ exact) / (np.linalg.norm(v) * np.linalg.norm(exact)))
    assert cos > 0.999, f"|cos| to exact top eigenvector = {cos}"


def test_power_iteration_unit_norm_and_shape(spark, emb):
    v = _as_vector(power_iteration_top_component(emb, iters=3))
    assert v.shape == (64,)
    # each round re-normalizes; rounding to 9 dp keeps the norm at 1 ± 1e-6
    assert abs(np.linalg.norm(v) - 1.0) < 1e-6


def test_power_iteration_deterministic(spark, emb):
    a = _as_vector(power_iteration_top_component(emb, iters=2))
    b = _as_vector(power_iteration_top_component(emb, iters=2))
    assert np.array_equal(a, b)
