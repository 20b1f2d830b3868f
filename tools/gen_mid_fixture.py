"""Build the sf0.5 midpoint fixture for the intrinsic-quadratic sf1
exclusion (VERDICT r10 task 6): half the sf1 twin's embeddings table
(replicas 0-4 → vec_id < 10000, key-contiguous because gen_sf1_twin
offsets vec_ids by replica·n0).

``dedup_semantic_clusters`` is all-pairs in BOTH engines by design
(docstring-declared test-scale path), so sf1 (20k vectors, 200M pairs
through a recursive closure) exceeds practical oracle time; 10k vectors is
the largest point where the DuckDB closure completes — a measured middle
certification instead of none.

Output: .fixtures/mid/embeddings.parquet (single file, via pyarrow).
Usage:  python tools/gen_mid_fixture.py
        python tools/selfcheck.py --json SELFCHECK_MID_r11.json \
            .fixtures/mid dedup_semantic_clusters
"""
from __future__ import annotations

import os

import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, ".fixtures", "sf1-twin", "embeddings.parquet")
DST_DIR = os.path.join(ROOT, ".fixtures", "mid")
HALF = 10_000


def main() -> None:
    t = pq.read_table(SRC)
    import pyarrow.compute as pc

    half = t.filter(pc.less(t["vec_id"], HALF))
    os.makedirs(DST_DIR, exist_ok=True)
    pq.write_table(half, os.path.join(DST_DIR, "embeddings.parquet"))
    print(f"mid fixture: {half.num_rows} vectors -> {DST_DIR}")


if __name__ == "__main__":
    main()
