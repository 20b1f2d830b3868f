"""sf1 bench lane: the 13 r1-comparable headline queries timed at the
sf1 twin (.fixtures/sf1, 10× sf0.1) so COST regressions show up at the
scale where they matter — sf0.1 could not see the r9 decimal-agg cost
growing with row count (VERDICT r9 item 9).

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


def _next_round_number() -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = [
        int(m.group(1))
        for f in os.listdir(root)
        for m in [re.match(r"BENCH_r(\d+)\.json", f)]
        if m
    ]
    return (max(rounds) + 1) if rounds else 1


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(root, ".fixtures", "sf1")
    registry = load_all()
    spark = get_spark("sf1-bench")
    spark.sparkContext.setLogLevel("ERROR")

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name in R1_SET:  # untimed warmup on the target fixture
        registry[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    anchor_ts = []
    for _ in range(5):
        t0 = time.time()
        spark.range(1_000_000).selectExpr("sum(id)").collect()
        anchor_ts.append(time.time() - t0)
    anchor_sec = sorted(anchor_ts)[2]

    raw: dict[str, list[float]] = {name: [] for name in R1_SET}
    for _ in range(3):
        for name in R1_SET:
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
        "metric": "sf1_r1set_total_wall",
        "value": round(sum(timings.values()), 3),
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
