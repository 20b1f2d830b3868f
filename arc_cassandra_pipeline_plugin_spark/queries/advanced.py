"""Advanced-surface certified queries: the Pandas-UDF path, exact
percentiles, array/regexp function batteries, and the skew-salted join
(certified result-identical to the plain join)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from arc_cassandra_pipeline_plugin_spark.operators.skew import salted_join
from arc_cassandra_pipeline_plugin_spark.queries import register
from arc_cassandra_pipeline_plugin_spark.sources import load_table


@register(
    "udf_weighted_avg",
    category="udf",
    oracle="""
SELECT l_returnflag,
       round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 2) AS weighted_avg_price
FROM lineitem GROUP BY l_returnflag
""",
)
def udf_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UDF surface (SURVEY.md §2B: the reference registers none but the
    Arc context carries a udfPlugins registry — TestUtils.scala:80): a
    grouped-aggregate Pandas UDF (Arrow-batched, the only acceptable Python
    path in a hot loop) computing quantity-weighted average price,
    certified against the pure-SQL formulation."""

    @pandas_udf("double")
    def weighted_avg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.round(weighted_avg("l_extendedprice", "l_quantity"), 2).alias("weighted_avg_price"))
    )


@register(
    "agg_percentiles",
    category="aggregation",
    oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
       round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
       round(quantile_cont(l_extendedprice, 0.75), 4) AS p75
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``, both (n-1)p linear interpolation). The approximate
    sketch variant for 100 TB is ``approx_percentile`` — same call shape,
    no sort, bounded memory (rows-only sibling: agg_approx_percentiles)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.25)"), 4).alias("p25"),
        F.round(F.expr("percentile(l_extendedprice, 0.50)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.75)"), 4).alias("p75"),
    )


@register("agg_approx_percentiles", category="aggregation")  # sketch → rows-only
def agg_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL/GK-sketch percentiles — the scale path (single pass, bounded
    memory, mergeable partials). Approximate ⇒ no SQL oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("approx_percentile(l_extendedprice, array(0.25, 0.5, 0.75), 1000)").alias(
            "approx_pcts"
        )
    )


@register(
    "array_funcs",
    category="scalar",
    oracle="""
SELECT l_returnflag,
       list_sort(list(DISTINCT l_linestatus)) AS statuses,
       CAST(len(list(DISTINCT l_linestatus)) AS INT) AS n_statuses
FROM lineitem GROUP BY l_returnflag
""",
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array construction/sort/size (collect_set sorted for determinism)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.sort_array(F.collect_set("l_linestatus")).alias("statuses"),
            F.size(F.collect_set("l_linestatus")).alias("n_statuses"),
        )
    )


@register(
    "regexp_funcs",
    category="scalar",
    oracle=r"""
SELECT p_partkey,
       regexp_extract(p_name, '^(\w+)', 1)                      AS first_word,
       regexp_extract(p_brand, '#(\d+)', 1)                     AS brand_num,
       regexp_replace(p_name, '[aeiou]', '_', 'g')              AS devoweled,
       CASE WHEN regexp_matches(p_type, '^(ECONOMY|STANDARD)$') THEN 1 ELSE 0 END AS is_basic
FROM part WHERE p_partkey < 500
""",
)
def regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex battery: extract (group refs), global replace, full-match test
    (Spark rlike is find-anywhere, so the pattern is anchored on both
    sides to match DuckDB regexp_matches semantics)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.regexp_extract("p_brand", r"#(\d+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.when(F.col("p_type").rlike(r"^(ECONOMY|STANDARD)$"), 1).otherwise(0).alias("is_basic"),
    )


@register(
    "join_salted",
    category="join",
    oracle="""
SELECT o_orderpriority, count(*) AS n_items, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""",
)
def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted join: lineitem salted into 8 buckets, orders replicated
    per bucket — result certified identical to the plain equi-join (the
    salt only re-shards the shuffle). At 100 TB this is the manual remedy
    when one order key dominates; AQE skew-join is the automatic one."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = salted_join(li, orders, "l_orderkey", "o_orderkey", salt_buckets=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )
