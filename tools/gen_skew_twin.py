"""Adversarial hot-key twin of a driver fixture (r8 verdict item 3).

The uniform synthetic generator never stresses the skew machinery: every
user holds ~1/|users| of events and no two documents share a shingle
block. This twin rewrites a fixture so the hot paths MUST fire:

- ``events``: every 10th event is reassigned to one HOT USER (the minimum
  user_id) — one user holds ~10% of the corpus, the adversarial case for
  every per-user groupBy and for AQE skew handling.
- ``documents``: 30% of docs (doc_id % 10 < 3) get a shared 50-token
  synthetic paragraph plus one unique suffix token — pairwise Jaccard
  50/52 ≈ 0.96, so ONE shingle/LSH/prefix block holds 30% of the corpus
  and near-dup candidate generation hits a dense near-clique (the
  hot-bucket salting + cost-gate regime).
- ``lineitem``: every 10th line is reassigned to one HOT ORDER (the
  minimum o_orderkey) — the skewed equi-join key for salted_join.

Everything is generated through DuckDB so the parquet physical forms
(notably the events ``ts`` column) match the driver fixture class that
``sources.load_table`` and the oracles already handle; all other tables
are copied byte-identical in content.

Usage: python tools/gen_skew_twin.py [--sf 0.01]   # .fixtures/skew-{sf}/
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from arc_cassandra_pipeline_plugin_spark.sources import TABLES

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: bump when the recipe changes; stale twins are regenerated
TWIN_VERSION = "v1"

HOT_PARAGRAPH = " ".join(f"zqtok{j}" for j in range(50))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="0.01")
    args = ap.parse_args()
    src = f"/root/testdata/sf{args.sf}"
    dst = os.path.join(ROOT, ".fixtures", f"skew-{args.sf}")
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def copy(sql: str, table: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)"
        )

    ev = f"read_parquet('{src}/events.parquet')"
    copy(
        f"""
        SELECT event_id, ts,
               CASE WHEN event_id % 10 = 0
                    THEN (SELECT min(user_id) FROM {ev})
                    ELSE user_id END AS user_id,
               event_type, value, props
        FROM {ev}
        """,
        "events",
    )

    doc = f"read_parquet('{src}/documents.parquet')"
    copy(
        f"""
        SELECT doc_id,
               CASE WHEN doc_id % 10 < 3
                    THEN '{HOT_PARAGRAPH} uniq' || CAST(doc_id AS VARCHAR)
                    ELSE text END AS text,
               lang, source,
               CAST(length(CASE WHEN doc_id % 10 < 3
                    THEN '{HOT_PARAGRAPH} uniq' || CAST(doc_id AS VARCHAR)
                    ELSE text END) AS BIGINT) AS n_chars
        FROM {doc}
        """,
        "documents",
    )

    li = f"read_parquet('{src}/lineitem.parquet')"
    copy(
        f"""
        SELECT CASE WHEN (l_orderkey * 7 + l_linenumber) % 10 = 0
                    THEN (SELECT min(l_orderkey) FROM {li})
                    ELSE l_orderkey END AS l_orderkey,
               l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice,
               l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM {li}
        """,
        "lineitem",
    )

    for t in TABLES:
        if t in ("events", "documents", "lineitem"):
            continue
        copy(f"SELECT * FROM read_parquet('{src}/{t}.parquet')", t)

    with open(os.path.join(dst, "_COMPLETE"), "w") as fh:
        fh.write(f"{TWIN_VERSION} src={src}\n")
    print(f"skew twin written to {dst}")


if __name__ == "__main__":
    main()
