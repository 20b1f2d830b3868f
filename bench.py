"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes end-to-end into the noop sink (full pipeline runs, no
driver collect bottleneck, no output I/O in the timing)."""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from arc_cassandra_pipeline_plugin_spark.queries import load_all
from arc_cassandra_pipeline_plugin_spark.sources import get_spark

#: representative mix: scan-agg, multi-join, window, cube, time-series,
#: dedup, similarity, text, multimodal
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "filter_project",
    "agg_cube",
    "window_topk_per_group",
    "events_windowed_agg",
    "sessionize_events",
    "dedup_minhash_lsh",
    "similarity_topk_bruteforce",
    "text_quality_score",
    "multimodal_checksums",
    # heavy extension surface (round 3): set-similarity join, iterative
    # graph, scalable two-phase global rank, multi-operator curation DAG
    "dedup_setsim_prefix",
    "graph_pagerank_trade",
    "window_rank_global_scalable",
    "corpus_curation_pipeline",
    # round 4: Ed-Join fuzzy matching, concat-and-chunk sequence packing,
    # BM25 retrieval scoring
    "dedup_editdist_join",
    "pack_context_windows",
    "text_bm25_ranking",
    # round 4 late wave: iterative distributed k-means, grid-bucketed
    # spatial self-join
    "embeddings_kmeans_lloyd",
    "spatial_proximity_join",
    # round 5: synchronous label propagation (iterative graph), RAG-style
    # overlapping context-window chunking
    "graph_label_propagation",
    "text_chunk_overlap",
]


def _split_fixture_dir(src: str) -> str:
    """Multi-file / multi-row-group twin of ``src`` (same rows), generated
    once into .fixtures/ by tools/gen_split_fixtures.py. The driver fixtures
    are ONE file with ONE row group per table, so every scan starts at
    parallelism 1 — a pathology no real-scale table has (a 100 TB table is
    thousands of splits and the scan itself feeds every core). The bench
    measures queries on the split twin so the numbers reflect scan-parallel
    behavior; generation happens outside the timed region and is cached."""
    name = os.path.basename(src.rstrip("/")) + "-split"
    dst = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".fixtures", name)
    marker = os.path.join(dst, "_COMPLETE")
    if not os.path.exists(marker):
        import subprocess

        r = subprocess.run(
            [
                sys.executable,
                os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools", "gen_split_fixtures.py"),
                "--src", src, "--dst", dst,
            ],
            capture_output=True,
            text=True,
        )
        if r.returncode != 0:
            print(f"split-fixture generation failed, using raw fixtures: {r.stderr[-400:]}", file=sys.stderr)
            return src
        with open(marker, "w") as fh:
            fh.write(src + "\n")
    return dst


def main() -> None:
    env_dir = os.environ.get("SPARK_GRAFT_SF_DIR")
    sf_dir = env_dir or "/root/testdata/sf0.1"
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    if env_dir is None:
        sf_dir = _split_fixture_dir(sf_dir)
    registry = load_all()
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup: one untimed pass of every headline query on the
    # TARGET fixture (standard JVM benchmarking practice — JMH warms up on
    # the real workload). Warming at a smaller SF is not enough: adaptive
    # operators pick statistics-dependent plan shapes (e.g. the setsim
    # bitmask width follows vocabulary size), so the small-SF pass compiles
    # different generated code and the first timed trial would still pay
    # JIT/classloading.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name in HEADLINE:
        registry[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    # three trials per query, report the min (standard practice: the min is
    # the least-noise estimate of the query's actual cost on a shared box)
    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = registry[name]
        trials = []
        for _ in range(3):
            t0 = time.time()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            trials.append(time.time() - t0)
        timings[name] = round(min(trials), 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "sf_dir": sf_dir,
                "trials": 3,
                "protocol": "min of 3 trials per query after one untimed "
                "warmup pass of each query on the target fixture; "
                "multi-file split fixtures (same rows as the raw sf dir) unless "
                "SPARK_GRAFT_SF_DIR overrides",
                "note": "r3+ measures on multi-file split fixtures (VERDICT r2 "
                "item 5) — absolute times are NOT comparable to BENCH_r1/r2, "
                "which scanned single-row-group files (1-task scans, no "
                "scheduling overhead at toy scale, pathological at real scale)",
            }
        )
    )


if __name__ == "__main__":
    main()
