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


def test_kmeans_lloyd_recovers_planted_clusters(spark):
    """On a corpus of three well-separated planted clusters, three Lloyd
    rounds recover the planting exactly: member counts match the plant and
    every centroid sits within the cluster's jitter radius of its true
    center."""
    from arc_cassandra_pipeline_plugin_spark.operators.linalg import kmeans_lloyd

    centers = [(0.0, 0.0, 0.0, 0.0), (10.0, 10.0, 0.0, 0.0), (-10.0, 0.0, 10.0, 0.0)]
    sizes = [10, 20, 30]
    rows, vid = [], 0
    # seeds 0..2 must land in distinct planted clusters (deterministic
    # seeding picks vec_id 0, 1, 2): interleave the first three vectors
    order = [0, 1, 2] + [ci for ci, n in enumerate(sizes) for _ in range(n - 1)]
    used = {0: 0, 1: 0, 2: 0}
    for ci in order:
        cx = centers[ci]
        k = used[ci] = used.get(ci, 0) + 1
        jit = [((vid * 13 + d * 7 + k) % 11 - 5) / 10.0 for d in range(4)]
        rows.append((vid, [cx[d] + jit[d] for d in range(4)]))
        vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_lloyd(df, k=3, iters=3).collect()
    counts = {}
    cent = {}
    for r in out:
        counts[r["cluster_id"]] = r["n_members"]
        cent.setdefault(r["cluster_id"], {})[r["j"]] = r["loading"]
    assert sorted(counts.values()) == sorted(sizes)
    # each centroid must be within the +-0.5 jitter box of one true center
    matched = set()
    for g, c in cent.items():
        vec = [c[j] for j in sorted(c)]
        hits = [
            ci
            for ci, cx in enumerate(centers)
            if all(abs(vec[d] - cx[d]) <= 0.5 for d in range(4))
        ]
        assert hits, f"centroid {g}={vec} matches no planted center"
        matched.add(hits[0])
    assert matched == {0, 1, 2}


def test_kmeans_fast_assignments_equal_decimal_path(spark):
    """The float64 mapInArrow assignment must agree with the decimal-exact
    assignment vector-for-vector at fixed centroids, and the full fast
    Lloyd run must reproduce the decimal run's per-cluster member counts —
    the certification contract of embeddings_kmeans_fast."""
    from arc_cassandra_pipeline_plugin_spark.operators.linalg import (
        kmeans_assign_decimal,
        kmeans_assign_fast,
        kmeans_lloyd,
        kmeans_lloyd_fast,
    )

    # deterministic synthetic corpus: 240 vectors x 12 dims, values spread
    # well away from decimal rounding boundaries
    rows = [
        (i, [((i * 37 + j * 101) % 977) / 97.0 - 5.0 for j in range(12)])
        for i in range(240)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    cent = [[((g * 53 + j * 17) % 211) / 21.0 - 5.0 for j in range(12)] for g in range(5)]
    fast = {r["_id"]: r["g"] for r in kmeans_assign_fast(df, cent).collect()}
    slow = {r["_id"]: r["g"] for r in kmeans_assign_decimal(df, cent).collect()}
    assert fast == slow and len(fast) == 240

    # full runs: member counts per cluster must coincide round-for-round
    dec_out = kmeans_lloyd(df, k=5, iters=2)
    dec_counts = {
        r["cluster_id"]: r["n_members"]
        for r in dec_out.filter("j = 1").collect()
        if r["n_members"] > 0
    }
    fast_out = kmeans_lloyd_fast(df, k=5, iters=2)
    fast_counts = {r["cluster_id"]: r["n_members"] for r in fast_out.collect()}
    assert fast_counts == dec_counts
