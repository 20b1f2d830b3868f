"""ANN recall probes at sf1 (r6 verdict item 5).

Recall of the bucket-pruned ANN paths degrades with corpus density, so
small-SF assertions alone don't certify the scale path. This probe runs
two recall measurements on the 10×-sf0.1 twin (20k embeddings):

1. **Uniform recall@10** — ground truth is brute-force cosine top-10 for
   corpus-drawn queries. Synthetic embeddings are i.i.d. uniform, the
   known WORST case for ANN (no neighbor-vs-bulk similarity gap: the
   "top-10" of a random vector are barely closer than the bulk, so no
   sublinear index can find them without scanning — this is the curse of
   dimensionality, not an implementation defect). Reported honestly as a
   curve vs the scan-fraction lever (LSH tables / IVF probes), no floor.

2. **Planted-near-neighbor recall@1** — the production semantics of
   embedding near-dup retrieval: each query is a deterministic noisy mix
   q_i = v_i + 0.3·v_j (cosine(q_i, v_i) ≈ 0.96, verified: brute force
   ranks v_i first for all queries), and recall@1 asks whether the ANN
   path finds the genuinely-close neighbor. Floors asserted in
   tests/test_operators.py: LSH n_tables=2 ≥ 0.8, n_tables=4 ≥ 0.9,
   IVF(16 cells, 6 probes) ≥ 0.9.

Usage: python tools/ann_recall_probe.py   # appends/replaces the SCALING.md section
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_QUERIES = 20
_PLANT_OFFSET = 1_000_000
_SECTION = "## sf1 probe — ANN recall vs brute force"


def ensure_sf1_twin() -> str:
    """Generate (or reuse) the sf1 twin fixture; returns its path."""
    from tools.gen_sf1_twin import TWIN_VERSION

    sf1 = os.path.join(_ROOT, ".fixtures", "sf1-twin")
    marker = os.path.join(sf1, "_COMPLETE")
    stale = True
    if os.path.exists(marker):
        with open(marker) as fh:
            stale = not fh.read().startswith(TWIN_VERSION)
    if stale:
        r = subprocess.run(
            [sys.executable, os.path.join(_ROOT, "tools", "gen_sf1_twin.py")],
            capture_output=True, text=True,
        )
        if r.returncode != 0:
            raise RuntimeError(f"sf1 twin generation failed: {r.stderr[-400:]}")
    return sf1


def planted_queries(emb):
    """Deterministic near-duplicate queries: q_i = v_i + 0.3 * v_(i+101),
    i < N_QUERIES. cos(q_i, v_i) ~ 0.96 >> bulk, so v_i is the true
    nearest neighbor (sanity-checked against brute force by the caller)."""
    from pyspark.sql import functions as F

    base = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("v1")
    )
    mate = emb.filter(
        (F.col("vec_id") >= 101) & (F.col("vec_id") < 101 + N_QUERIES)
    ).select((F.col("vec_id") - 101).alias("qid"), F.col("embedding").alias("v2"))
    return base.join(mate, "qid").select(
        (F.col("qid") + _PLANT_OFFSET).alias("vec_id"),
        F.zip_with("v1", "v2", lambda a, b: a + F.lit(0.3) * b).alias("embedding"),
    )


def planted_recall_at_1(top1_rows) -> float:
    """Fraction of planted queries whose rank-1 match is the source vector."""
    rows = [r for r in top1_rows if r.rank == 1]
    hits = sum(1 for r in rows if r.match_id == r.query_id - _PLANT_OFFSET)
    return hits / N_QUERIES


def uniform_recall_at_k(ann_rows, exact_rows) -> float:
    got = {(r.query_id, r.match_id) for r in ann_rows}
    want = {(r.query_id, r.match_id) for r in exact_rows}
    return len(got & want) / len(want)


def run_probe(spark, sf_dir: str) -> dict[str, float]:
    """All recall measurements on one fixture; returns {label: recall}."""
    from pyspark.sql import functions as F

    from arc_cassandra_pipeline_plugin_spark.operators import similarity as S
    from arc_cassandra_pipeline_plugin_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    uq = emb.filter(F.col("vec_id") < N_QUERIES)
    out: dict[str, float] = {}

    exact10 = S.brute_force_topk(emb, uq, k=10).collect()
    for tables in (1, 4, 8):
        ann = S.lsh_topk(emb, uq, k=10, dim=64, n_planes=8, n_tables=tables).collect()
        out[f"uniform@10 lsh L={tables}"] = uniform_recall_at_k(ann, exact10)
    for probes in (3, 4, 6):
        ann = S.ivf_topk(emb, uq, k=10, n_clusters=16, n_probe=probes).collect()
        out[f"uniform@10 ivf 16c/{probes}p"] = uniform_recall_at_k(ann, exact10)

    pq = planted_queries(emb)
    bf1 = S.brute_force_topk(emb, pq, k=1).collect()
    out["planted@1 brute force (sanity)"] = planted_recall_at_1(bf1)
    for tables in (1, 2, 4):
        ann = S.lsh_topk(emb, pq, k=1, dim=64, n_planes=8, n_tables=tables).collect()
        out[f"planted@1 lsh L={tables}"] = planted_recall_at_1(ann)
    ann = S.ivf_topk(emb, pq, k=1, n_clusters=16, n_probe=6).collect()
    out["planted@1 ivf 16c/6p"] = planted_recall_at_1(ann)
    return out


def main() -> None:
    from arc_cassandra_pipeline_plugin_spark.sources import get_spark

    sf1 = ensure_sf1_twin()
    spark = get_spark("ann_recall_probe")
    spark.sparkContext.setLogLevel("ERROR")
    rec = run_probe(spark, sf1)

    lines = [
        _SECTION,
        "",
        "Generated by tools/ann_recall_probe.py on the sf1 twin (20k",
        "embeddings, 20 queries). Uniform = corpus-drawn queries vs exact",
        "cosine top-10: i.i.d. uniform vectors are the ANN worst case (no",
        "neighbor/bulk gap), so recall is reported as a curve vs the scan",
        "lever, no floor. Planted = deterministic near-dup queries",
        "(cos ~ 0.96 to their source vector) vs exact top-1 — the embedding",
        "near-dup retrieval semantics; floors asserted in",
        "tests/test_operators.py (lsh L=2 >= 0.8, L=4 >= 0.9, ivf >= 0.9).",
        "",
        "| probe | recall |",
        "|---|---|",
    ]
    for label, v in rec.items():
        lines.append(f"| {label} | {v:.3f} |")
    lines.append("")

    path = os.path.join(_ROOT, "SCALING.md")
    with open(path) as fh:
        text = fh.read()
    if _SECTION in text:
        head = text[: text.index(_SECTION)].rstrip() + "\n"
        tail = text[text.index(_SECTION):]
        nxt = tail.find("\n## ", 1)
        rest = tail[nxt + 1:] if nxt != -1 else ""
        text = head + "\n" + "\n".join(lines) + rest
    else:
        text = text.rstrip() + "\n\n" + "\n".join(lines)
    with open(path, "w") as fh:
        fh.write(text)
    for label, v in rec.items():
        print(f"{label}: {v:.3f}")


if __name__ == "__main__":
    main()
