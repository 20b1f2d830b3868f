"""sf1 oracle certification for dedup_setsim_prefix (r8 verdict item 1).

At sf1 the query's output is ~51M pairs — too large for selfcheck's
driver-side multiset compare — so the certification aggregates an exact
FINGERPRINT inside each engine instead and compares the scalars:

- n_pairs            count(*)
- hash_sum           Σ 48-bit md5 prefix of 'doc_a|doc_b' (DECIMAL(38,0)
                     sum — order-free, collision-negligible set identity)
- sum_a / sum_b      Σ doc ids (DECIMAL(38,0))
- jacc_micro_sum     Σ round(jaccard·1e6) (the reported jaccard is
                     round(c/(ma+mb−c), 6) from identical integers on
                     both engines, so ×1e6 is an exact integer grid)

A match on all five is set-level equality of the full pair output up to
md5 collisions (~2^-48 per pair). The DuckDB side runs the same
brute-force token-join oracle the registry certifies at sf0.01/0.1
(~2.2e9 intermediate rows at sf1 — DuckDB grinds through out-of-core).

Usage: python tools/sf1_setsim_cert.py [sf_dir]   # default .fixtures/sf1
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from pyspark.sql import functions as F  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
THRESHOLD_PCT = 70


def spark_fingerprint(sf_dir: str) -> dict:
    from arc_cassandra_pipeline_plugin_spark.operators.dedup import setsim_join_prefix
    from arc_cassandra_pipeline_plugin_spark.sources import get_spark, load_table

    spark = get_spark("sf1_setsim_cert")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    pairs = setsim_join_prefix(docs, threshold_pct=THRESHOLD_PCT)
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_a").cast("string"),
                    F.lit("|"),
                    F.col("doc_b").cast("string"),
                )
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("bigint")
    row = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(h.cast("decimal(38,0)")).alias("hash_sum"),
        F.sum(F.col("doc_a").cast("decimal(38,0)")).alias("sum_a"),
        F.sum(F.col("doc_b").cast("decimal(38,0)")).alias("sum_b"),
        F.sum(
            F.round(F.col("jaccard") * 1e6).cast("bigint").cast("decimal(38,0)")
        ).alias("jacc_micro_sum"),
    ).collect()[0]
    return {k: str(row[k]) for k in row.asDict()}


def duckdb_fingerprint(sf_dir: str) -> dict:
    p = os.path.join(sf_dir, "documents.parquet")
    src = f"{p}/part*" if os.path.isdir(p) else p
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    row = con.sql(
        f"""
WITH tok AS (
  SELECT doc_id, unnest(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS token
  FROM read_parquet('{src}')),
sizes AS (SELECT doc_id, count(*) AS m FROM tok GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
  FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
pairs AS (
  SELECT doc_a, doc_b, round(c / (sa.m + sb.m - c), 6) AS jaccard
  FROM inter
  JOIN sizes sa ON sa.doc_id = inter.doc_a
  JOIN sizes sb ON sb.doc_id = inter.doc_b
  WHERE 100 * c >= {THRESHOLD_PCT} * (sa.m + sb.m - c))
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       sum(CAST(('0x' || substr(md5(doc_a || '|' || doc_b), 1, 12))::BIGINT
                AS DECIMAL(38,0))) AS hash_sum,
       sum(CAST(doc_a AS DECIMAL(38,0))) AS sum_a,
       sum(CAST(doc_b AS DECIMAL(38,0))) AS sum_b,
       sum(CAST(CAST(round(jaccard * 1e6) AS BIGINT) AS DECIMAL(38,0)))
         AS jacc_micro_sum
FROM pairs
"""
    ).fetchone()
    keys = ["n_pairs", "hash_sum", "sum_a", "sum_b", "jacc_micro_sum"]
    return {k: str(v) for k, v in zip(keys, row)}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, ".fixtures", "sf1")
    t0 = time.time()
    s = spark_fingerprint(sf_dir)
    t_spark = time.time() - t0
    print(f"spark fingerprint ({t_spark:.0f}s): {s}")
    t0 = time.time()
    d = duckdb_fingerprint(sf_dir)
    t_duck = time.time() - t0
    print(f"duckdb fingerprint ({t_duck:.0f}s): {d}")
    match = s == d
    out = {
        "query": "dedup_setsim_prefix",
        "sf_dir": sf_dir,
        "mode": "in-engine fingerprint (n, md5-48 hash sum, id sums, jaccard-micro sum)",
        "spark": s,
        "duckdb": d,
        "match": match,
        "spark_sec": round(t_spark, 1),
        "duckdb_sec": round(t_duck, 1),
    }
    with open(os.path.join(ROOT, "SELFCHECK_SF1_SETSIM_r9.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print("MATCH" if match else "MISMATCH")
    sys.exit(0 if match else 1)


if __name__ == "__main__":
    main()
