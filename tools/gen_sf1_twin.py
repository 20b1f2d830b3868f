"""Generate a synthetic sf1 twin (10× sf0.1) for the heavy-headliner scale
probe — disk-bounded, so only the tables those queries read are replicated.

Replication is NOT naive duplication: identical document copies would turn
the corpus into a 10-way near-clique and measure the adversarial-skew path
instead of ordinary 10× growth. Each replica r rotates the document text's
alphabet by r (translate with a shifted a-z — word lengths, whitespace and
Zipf shape preserved, shingle/token content disjoint across replicas) and
offsets the fact-table keys, so distinct-content volume really is ~10×.
Dimension tables copy as-is (a 10× corpus does not grow the nation list).

Output: .fixtures/sf1-twin/ with multi-file parquet per table.
Usage: python tools/gen_sf1_twin.py [--replicas 10]
"""

from __future__ import annotations

import argparse
import os
import string
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from arc_cassandra_pipeline_plugin_spark.sources import (  # noqa: E402
    get_spark,
    load_table,
)

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".fixtures", "sf1-twin")

#: tables copied verbatim (dimensions / not read by the probed queries)
COPY_TABLES = ["region", "nation", "customer", "supplier", "part", "events", "embeddings"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    args = ap.parse_args()
    R = args.replicas

    spark = get_spark("gen_sf1_twin")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(DST, exist_ok=True)

    rep = spark.range(R).select(F.col("id").cast("int").alias("_r"))
    alpha = string.ascii_lowercase

    docs = load_table(spark, SRC, "documents")
    n_docs = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    doc_cases = F.col("text")
    for r in range(1, R):
        rot = alpha[r:] + alpha[:r]
        doc_cases = F.when(
            F.col("_r") == r, F.translate(F.col("text"), alpha, rot)
        ).otherwise(doc_cases)
    (
        docs.crossJoin(rep)
        .select(
            (F.col("doc_id") + F.col("_r").cast("bigint") * n_docs).alias("doc_id"),
            doc_cases.alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(DST, "documents.parquet"))
    )

    li = load_table(spark, SRC, "lineitem")
    orders = load_table(spark, SRC, "orders")
    max_ok = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    (
        li.crossJoin(rep)
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("_r").cast("bigint") * max_ok)
        .drop("_r")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(DST, "lineitem.parquet"))
    )
    (
        orders.crossJoin(rep)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("_r").cast("bigint") * max_ok)
        .drop("_r")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(DST, "orders.parquet"))
    )

    for t in COPY_TABLES:
        load_table(spark, SRC, t).repartition(8).write.mode("overwrite").parquet(
            os.path.join(DST, f"{t}.parquet")
        )

    with open(os.path.join(DST, "_COMPLETE"), "w") as fh:
        fh.write(f"replicas={R} src={SRC}\n")
    print(f"sf1 twin written to {DST} (replicas={R})")


if __name__ == "__main__":
    main()
