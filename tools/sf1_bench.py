"""sf1 bench lane: all 24 headline queries (bench.py's set) timed at the
sf1 twin (.fixtures/sf1, 10× sf0.1) so COST regressions show up at the
scale where they matter — sf0.1 could not see the r9 decimal-agg cost
growing with row count (VERDICT r9 item 9), and the r10 lane's 13-query
subset missed the most expensive entries (iterative graph + dedup,
VERDICT r10 task #3). The r1-comparable subtotal is still reported
separately (``r1set_total``) so the cross-round trend line survives.

Protocol mirrors bench.py where it matters (untimed warmup pass of every
query, anchor calibration, interleaved round-robin trials, median
estimator) but with 3 trials — the lane is a scale-trend detector, not
the headline record. Writes BENCH_SF1_r{N}.json at the repo root and
prints one JSON line.

Usage: python tools/sf1_bench.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arc_cassandra_pipeline_plugin_spark.queries import load_all
from arc_cassandra_pipeline_plugin_spark.sources import get_spark

#: the r1-comparable headline set (BENCH_r01.json's queries, unchanged)
R1_SET = [
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
]

#: the rest of bench.py's 24-query headline set (VERDICT r10 task #3: the
#: iterative graph + dedup family — the most expensive headline entries —
#: must be measured at sf1 too, not just the r1-comparable 13)
EXTENDED_SET = [
    "dedup_setsim_prefix",
    "graph_pagerank_trade",
    "window_rank_global_scalable",
    "corpus_curation_pipeline",
    "dedup_editdist_join",
    "pack_context_windows",
    "text_bm25_ranking",
    "embeddings_kmeans_fast",
    "spatial_proximity_join",
    "graph_label_propagation",
    "text_chunk_overlap",
]

BENCH_SET = R1_SET + EXTENDED_SET


def _next_round_number() -> int:
    """Round for the artifact name. Prefer an explicit ``--round N`` CLI
    arg; otherwise take the max across BOTH name families (BENCH_r* and
    BENCH_SF1_r*) so running the lane after the round's main bench record
    exists doesn't mislabel the artifact as the NEXT round (r10 ADVICE:
    max(BENCH_r*)+1 alone produced BENCH_SF1_r{N+1})."""
    if "--round" in sys.argv:
        return int(sys.argv[sys.argv.index("--round") + 1])
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bench_rounds = [
        int(m.group(1))
        for f in os.listdir(root)
        for m in [re.match(r"BENCH_r(\d+)\.json", f)]
        if m
    ]
    sf1_rounds = [
        int(m.group(1))
        for f in os.listdir(root)
        for m in [re.match(r"BENCH_SF1_r(\d+)\.json", f)]
        if m
    ]
    # the SF1 lane runs DURING round N, whose main bench record appears
    # only at round close — so the current round is max(BENCH_r*) + 1
    # unless an SF1 record for that round (or later) already exists.
    n = (max(bench_rounds) + 1) if bench_rounds else 1
    if sf1_rounds and max(sf1_rounds) >= n:
        n = max(sf1_rounds)
    return n


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    positional = [
        a
        for i, a in enumerate(sys.argv[1:], 1)
        if not a.startswith("--") and sys.argv[i - 1] != "--round"
    ]
    sf_dir = positional[0] if positional else os.path.join(root, ".fixtures", "sf1")
    registry = load_all()
    spark = get_spark("sf1-bench")
    spark.sparkContext.setLogLevel("ERROR")

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name in BENCH_SET:  # untimed warmup on the target fixture
        registry[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    anchor_ts = []
    for _ in range(5):
        t0 = time.time()
        spark.range(1_000_000).selectExpr("sum(id)").collect()
        anchor_ts.append(time.time() - t0)
    anchor_sec = sorted(anchor_ts)[2]

    raw: dict[str, list[float]] = {name: [] for name in BENCH_SET}
    for _ in range(3):
        for name in BENCH_SET:
            t0 = time.time()
            registry[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            raw[name].append(time.time() - t0)

    timings = {n: round(sorted(ts)[1], 3) for n, ts in raw.items()}
    stats = {
        n: {"min": round(min(ts), 3), "median": round(sorted(ts)[1], 3),
            "max": round(max(ts), 3)}
        for n, ts in raw.items()
    }
    rec = {
        "metric": "sf1_headline_total_wall",
        "value": round(sum(timings.values()), 3),
        "r1set_total": round(sum(timings[n] for n in R1_SET), 3),
        "unit": "sec",
        "queries": timings,
        "stats": stats,
        "sf": 1.0,
        "sf_dir": sf_dir,
        "anchor_sec": round(anchor_sec, 4),
        "anchored": {n: round(v / anchor_sec, 2) for n, v in timings.items()},
    }
    out = os.path.join(root, f"BENCH_SF1_r{_next_round_number()}.json")
    with open(out, "w") as fh:
        json.dump(rec, fh, indent=1, sort_keys=True)
    print(json.dumps({k: rec[k] for k in ("metric", "value", "unit", "queries", "sf", "anchor_sec")}))


if __name__ == "__main__":
    main()
