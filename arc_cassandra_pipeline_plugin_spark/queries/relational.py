"""Operator-zoo queries: one certified query per relational operator
category from SURVEY.md §2B (projections/filters, every join type,
aggregation variants, grouping sets/cube/rollup, windows, sorts, set ops,
scalar/JSON functions, pivot, save-mode round-trip)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from arc_cassandra_pipeline_plugin_spark.functions import small_df

from arc_cassandra_pipeline_plugin_spark.queries import register, scratch_dir, session_suffix
from arc_cassandra_pipeline_plugin_spark.sources import load_table, register_tables


# ---------------------------------------------------------------------------
# projection / filter / predicate pushdown
# ---------------------------------------------------------------------------

@register(
    "filter_project",
    category="scan",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderpriority
FROM orders
WHERE o_orderstatus = 'O' AND o_totalprice > 200000.0
""",
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection+filter; both reach the parquet scan (PushedFilters +
    ReadSchema pruned to 5 columns — asserted in tests/test_plans.py)."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 200000.0))
        .select("o_orderkey", "o_custkey", "o_orderpriority")
    )


# ---------------------------------------------------------------------------
# joins — every type
# ---------------------------------------------------------------------------

@register(
    "join_inner",
    category="join",
    oracle="""
SELECT o_orderkey, c_custkey, c_mktsegment, round(o_totalprice, 2) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_totalprice > 300000.0
""",
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join; strategy left to Catalyst/AQE (customer scales with
    SF, so no static broadcast hint)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000.0)
    cust = load_table(spark, sf_dir, "customer")
    return orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "c_custkey", "c_mktsegment", F.round("o_totalprice", 2).alias("total_price")
    )


@register(
    "join_left",
    category="join",
    oracle="""
SELECT c_custkey, o.o_orderkey
FROM customer
LEFT JOIN (SELECT o_orderkey, o_custkey FROM orders WHERE o_totalprice > 350000.0) o
  ON c_custkey = o.o_custkey
""",
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with no qualifying orders."""
    cust = load_table(spark, sf_dir, "customer")
    big = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 350000.0)
        .select("o_orderkey", "o_custkey")
    )
    return cust.join(big, cust.c_custkey == big.o_custkey, "left").select(
        "c_custkey", "o_orderkey"
    )


@register(
    "join_right",
    category="join",
    oracle="""
SELECT c.c_custkey, o_orderkey
FROM (SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0) c
RIGHT JOIN orders ON c.c_custkey = o_custkey
WHERE o_totalprice > 400000.0
""",
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join: all qualifying orders, customer key nullable."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000.0).select(
        "c_custkey"
    )
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000.0)
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "right").select(
        "c_custkey", "o_orderkey"
    )


@register(
    "join_full",
    category="join",
    oracle="""
SELECT coalesce(b.nk, s.nk)   AS nationkey,
       b.n_buyers, s.n_suppliers
FROM (SELECT c_nationkey AS nk, count(*) AS n_buyers FROM customer WHERE c_acctbal > 9500.0 GROUP BY c_nationkey) b
FULL JOIN (SELECT s_nationkey AS nk, count(*) AS n_suppliers FROM supplier WHERE s_acctbal > 9000.0 GROUP BY s_nationkey) s
  ON b.nk = s.nk
""",
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two aggregates (the reference's own equality
    harness uses exactly this shape — TestUtils.scala:97-100)."""
    buyers = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9500.0)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_buyers"))
    )
    sellers = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000.0)
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return (
        buyers.alias("b")
        .join(sellers.alias("s"), F.col("b.nk") == F.col("s.nk"), "full")
        .select(
            F.coalesce(F.col("b.nk"), F.col("s.nk")).alias("nationkey"),
            "n_buyers",
            "n_suppliers",
        )
    )


@register(
    "join_cross",
    category="join",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of the two fixed-cardinality dims (5×25)."""
    return load_table(spark, sf_dir, "region").crossJoin(
        load_table(spark, sf_dir, "nation")
    ).select("r_name", "n_name")


@register(
    "join_semi",
    category="join",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 350000.0)
""",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join = EXISTS; no right columns, no row duplication."""
    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 350000.0)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti",
    category="join",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 350000.0)
""",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join = NOT EXISTS (the reference computes this via full
    join + null filters — TestUtils.scala:104-107; left_anti is the
    idiomatic single-operator Spark form)."""
    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 350000.0)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_theta",
    category="join",
    oracle="""
SELECT o_orderkey, l_linenumber, l_shipdate, o_orderdate
FROM orders JOIN lineitem
  ON o_orderkey = l_orderkey
 AND l_shipdate > o_orderdate + INTERVAL 120 DAY
WHERE o_totalprice > 400000.0
""",
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: equi-key plus a range predicate. The equi-key keeps it a
    hash join with a residual filter — never a nested-loop cartesian."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000.0)
    li = load_table(spark, sf_dir, "lineitem")
    return orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 120 DAYS")),
    ).select("o_orderkey", "l_linenumber", "l_shipdate", "o_orderdate")


# ---------------------------------------------------------------------------
# aggregation variants
# ---------------------------------------------------------------------------

@register(
    "agg_stats",
    category="aggregation",
    oracle="""
WITH s AS (
  SELECT l_returnflag,
         count(*) AS n,
         CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
         min(l_quantity) AS min_q, max(l_quantity) AS max_q,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sp,
         -- DECIMAL(19,2) forces DuckDB's square onto the hugeint path
         CAST(sum(CAST(l_extendedprice AS DECIMAL(19,2))
                  * CAST(l_extendedprice AS DECIMAL(19,2))) AS DOUBLE) AS qp,
         CAST(sum(CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS sum_tax
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag,
       n AS n_rows,
       n_suppliers,
       round(min_q, 2) AS min_qty,
       round(max_q, 2) AS max_qty,
       round(sp / CAST(n AS DOUBLE), 4) AS avg_price,
       round(CASE WHEN n <= 1 THEN NULL
                  ELSE sqrt((qp - sp * sp / CAST(n AS DOUBLE))
                            / (CAST(n AS DOUBLE) - 1.0)) END, 4) AS sd_price,
       sum_tax
FROM s
""",
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate function battery incl. count-distinct and sample stddev.

    avg/stddev are rebuilt from DECIMAL-exact (n, Σx, Σx²) partials so the
    result is independent of float accumulation order (the q5-at-sf1 bug
    class; a native stddev_samp over doubles drifts with partition
    layout), with ONE double expression tree mirrored in the oracle —
    sqrt is IEEE correctly-rounded on both engines. Spark keeps
    (18,2)² = (37,4) exact; the oracle casts to DECIMAL(19,2) so DuckDB's
    square lands on the hugeint path."""
    price2 = F.col("l_extendedprice").cast("decimal(18,2)")
    s = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.min("l_quantity").alias("min_q"),
            F.max("l_quantity").alias("max_q"),
            F.sum(price2).cast("double").alias("sp"),
            F.sum(price2 * price2).cast("double").alias("qp"),
            F.sum(F.col("l_tax").cast("decimal(18,2)")).cast("double").alias("sum_tax"),
        )
    )
    nd = F.col("n").cast("double")
    return s.select(
        "l_returnflag",
        F.col("n").alias("n_rows"),
        "n_suppliers",
        F.round(F.col("min_q"), 2).alias("min_qty"),
        F.round(F.col("max_q"), 2).alias("max_qty"),
        F.round(F.col("sp") / nd, 4).alias("avg_price"),
        F.round(
            F.when(F.col("n") <= 1, F.lit(None).cast("double")).otherwise(
                F.sqrt(
                    (F.col("qp") - F.col("sp") * F.col("sp") / nd)
                    / (nd - F.lit(1.0))
                )
            ),
            4,
        ).alias("sd_price"),
        "sum_tax",
    )


@register(
    "agg_distinct",
    category="aggregation",
    oracle="""
SELECT o_orderpriority,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       count(*) AS n_orders
FROM orders GROUP BY o_orderpriority
""",
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (expand+two-phase under the hood)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "agg_approx_distinct",
    category="aggregation",
    oracle="""
SELECT l_returnflag,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_exact,
       TRUE AS within_bound
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate count-distinct — the 100 TB substitute for
    exact distinct counts (no shuffle of the distinct values, fixed-size
    mergeable sketch). The sketch value itself is estimator-specific, so the
    certified contract is its accuracy: ``within_bound`` asserts the HLL
    estimate (rsd=0.02) lands within 5% of the exact count, which the
    oracle pins to TRUE."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_exact"),
            F.approx_count_distinct("l_partkey", 0.02).alias("_approx"),
        )
        .select(
            "l_returnflag",
            "n_exact",
            (
                F.abs(F.col("_approx") - F.col("n_exact"))
                <= 0.05 * F.col("n_exact")
            ).alias("within_bound"),
        )
    )


@register(
    "agg_cube",
    category="aggregation",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^k grouping-key combinations in one pass."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count(F.lit(1)).alias("n"))
    )


@register(
    "agg_rollup",
    category="aggregation",
    oracle="""
SELECT r_name, n_name, count(*) AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP along the region→nation hierarchy (dims broadcast)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        cust.join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


_GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


@register("agg_grouping_sets", category="aggregation", oracle=_GROUPING_SETS_SQL)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via the SQL surface (identical text runs on both
    engines — the view-based dataflow model from the reference)."""
    register_tables(spark, sf_dir, "lineitem")
    return spark.sql(_GROUPING_SETS_SQL)


# ---------------------------------------------------------------------------
# window functions
# ---------------------------------------------------------------------------

@register(
    "window_topk_per_group",
    category="window",
    oracle="""
SELECT c_custkey, o_orderkey, round(o_totalprice, 2) AS total_price, rn
FROM (
  SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
""",
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: ranking window + filter. AQE inserts a
    partial row_number pushdown (WindowGroupLimit) so only 3 rows per key
    survive the shuffle — the scalable form of per-group top-k."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        load_table(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
            "rn",
        )
    )


@register(
    "window_running_sum",
    category="window",
    oracle="""
SELECT l_suppkey, l_orderkey, l_linenumber,
       round(sum(l_quantity) OVER (
         PARTITION BY l_suppkey
         ORDER BY l_shipdate, l_orderkey, l_linenumber
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
FROM lineitem
WHERE l_suppkey < 10
""",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total with an explicit ROWS frame over a *total* order
    (shipdate ties broken by the unique line id — frame determinism)."""
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_suppkey") < 10)
        .withColumn("running_qty", F.round(F.sum("l_quantity").over(w), 2))
        .select("l_suppkey", "l_orderkey", "l_linenumber", "running_qty")
    )


@register(
    "window_lag_lead",
    category="window",
    oracle="""
SELECT o_custkey, o_orderkey,
       round(o_totalprice, 2) AS total_price,
       round(lag(o_totalprice)  OVER w, 2) AS prev_price,
       round(lead(o_totalprice) OVER w, 2) AS next_price
FROM orders
WHERE o_custkey < 50
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic lag/lead over each customer's order history."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 50)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
            F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
            F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
        )
    )


# ---------------------------------------------------------------------------
# set operations
# ---------------------------------------------------------------------------

def _half_year_custkeys(spark: SparkSession, sf_dir: str):
    orders = load_table(spark, sf_dir, "orders")
    h1 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    ).select("o_custkey")
    h2 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("o_custkey")
    return h1, h2


_SET_ORACLE_BASE = """
WITH h1 AS (SELECT o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'),
     h2 AS (SELECT o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
"""


@register(
    "set_union",
    category="setop",
    oracle=_SET_ORACLE_BASE + "SELECT o_custkey FROM h1 UNION SELECT o_custkey FROM h2",
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): customers active in either half of 1997."""
    h1, h2 = _half_year_custkeys(spark, sf_dir)
    return h1.union(h2).distinct()


@register(
    "set_intersect",
    category="setop",
    oracle=_SET_ORACLE_BASE + "SELECT o_custkey FROM h1 INTERSECT SELECT o_custkey FROM h2",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers active in both halves."""
    h1, h2 = _half_year_custkeys(spark, sf_dir)
    return h1.intersect(h2)


@register(
    "set_except",
    category="setop",
    oracle=_SET_ORACLE_BASE + "SELECT o_custkey FROM h1 EXCEPT SELECT o_custkey FROM h2",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct set semantics = ``subtract``): customers who
    churned after H1. (``exceptAll`` would keep multiplicity *differences*
    — a different operator.)"""
    h1, h2 = _half_year_custkeys(spark, sf_dir)
    return h1.subtract(h2)


# ---------------------------------------------------------------------------
# scalar functions
# ---------------------------------------------------------------------------

@register(
    "scalar_string_funcs",
    category="scalar",
    oracle="""
SELECT c_custkey,
       upper(c_name)                          AS name_upper,
       substr(c_name, 1, 8)                   AS name_prefix,
       length(c_name)                         AS name_len,
       concat(c_mktsegment, ':', c_name)      AS seg_name,
       replace(c_name, 'Customer', 'C')       AS name_short,
       trim(c_mktsegment)                     AS seg_trim
FROM customer WHERE c_custkey < 100
""",
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar battery (upper/substr/length/concat/replace/trim)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 100)
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.concat_ws(":", "c_mktsegment", "c_name").alias("seg_name"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("C")).alias("name_short"),
        F.trim("c_mktsegment").alias("seg_trim"),
    )


@register(
    "scalar_datetime_funcs",
    category="scalar",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT)      AS order_year,
       CAST(month(o_orderdate) AS INT)     AS order_month,
       CAST(dayofmonth(o_orderdate) AS INT) AS order_day,
       CAST(o_orderdate AS DATE)           AS order_date,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       o_orderdate + INTERVAL 30 DAY       AS due_ts
FROM orders WHERE o_orderkey < 500
""",
)
def scalar_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime scalar battery (extract/trunc/cast/interval arithmetic)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_ts"),
    )


@register(
    "scalar_calendar_funcs",
    category="scalar",
    oracle="""
SELECT o_orderkey,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-01') AS INT)
         AS days_to_cutoff,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(quarter(o_orderdate) AS INT) AS order_quarter,
       CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow_sunday1,
       CAST(weekofyear(o_orderdate) AS INT) AS iso_week
FROM orders WHERE o_orderkey < 1500
""",
)
def scalar_calendar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-arithmetic battery: day difference to a cutoff, month-end
    snapping, quarter, day-of-week (Spark's 1=Sunday convention — the
    oracle shifts DuckDB's 0=Sunday to match), ISO week number. These are
    the partitioning/bucketing helpers for time-organized 100 TB layouts."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1500)
    return o.select(
        "o_orderkey",
        F.datediff(F.lit("1998-12-01").cast("date"), F.col("o_orderdate").cast("date"))
        .alias("days_to_cutoff"),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.dayofweek("o_orderdate").alias("dow_sunday1"),
        F.weekofyear("o_orderdate").alias("iso_week"),
    )


@register(
    "scalar_math_funcs",
    category="scalar",
    oracle="""
SELECT o_orderkey,
       round(abs(o_totalprice - 200000.0), 2)          AS abs_diff,
       CAST(ceil(o_totalprice / 1000.0) AS BIGINT)     AS price_ceil_k,
       CAST(floor(o_totalprice / 1000.0) AS BIGINT)    AS price_floor_k,
       round(sqrt(o_totalprice), 6)                    AS price_sqrt,
       round(ln(o_totalprice), 6)                      AS price_ln,
       round(power(o_totalprice / 100000.0, 2), 6)     AS price_pow,
       CAST(o_orderkey % 7 AS BIGINT)                  AS key_mod
FROM orders WHERE o_orderkey < 1000 AND o_totalprice > 0
""",
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar battery; transcendentals rounded to absorb libm ulps,
    ceil/floor cast to bigint on both sides (DuckDB keeps double)."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderkey") < 1000) & (F.col("o_totalprice") > 0)
    )
    return o.select(
        "o_orderkey",
        F.round(F.abs(F.col("o_totalprice") - 200000.0), 2).alias("abs_diff"),
        F.ceil(F.col("o_totalprice") / 1000.0).cast("bigint").alias("price_ceil_k"),
        F.floor(F.col("o_totalprice") / 1000.0).cast("bigint").alias("price_floor_k"),
        F.round(F.sqrt("o_totalprice"), 6).alias("price_sqrt"),
        F.round(F.log("o_totalprice"), 6).alias("price_ln"),
        F.round(F.pow(F.col("o_totalprice") / 100000.0, 2), 6).alias("price_pow"),
        (F.col("o_orderkey") % 7).cast("bigint").alias("key_mod"),
    )


@register(
    "conditional_funcs",
    category="scalar",
    oracle="""
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'debt' WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS balance_band,
       coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_masked,
       round(greatest(c_acctbal, 0.0), 2) AS bal_clamped,
       round(least(c_acctbal, 5000.0), 2) AS bal_capped
FROM customer
""",
)
def conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/coalesce/nullif/greatest/least."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("balance_band"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_masked"
        ),
        F.round(F.greatest(F.col("c_acctbal"), F.lit(0.0)), 2).alias("bal_clamped"),
        F.round(F.least(F.col("c_acctbal"), F.lit(5000.0)), 2).alias("bal_capped"),
    )


@register(
    "json_funcs",
    category="scalar",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_value
FROM events WHERE event_type = 'click'
""",
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the events props column."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    return e.select(
        "event_id", F.get_json_object("props", "$.k").cast("int").alias("k_value")
    )


@register(
    "pivot_linestatus",
    category="aggregation",
    oracle="""
SELECT l_returnflag,
       round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_O,
       round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_F
FROM lineitem GROUP BY l_returnflag
""",
)
def pivot_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot on an explicit value list (explicit list = single-pass, no
    distinct-values pre-query — the scalable form)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .withColumnsRenamed({"O": "qty_O", "F": "qty_F"})
    )


@register(
    "window_ntile",
    category="window",
    oracle="""
SELECT o_orderkey,
       ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS price_quartile
FROM orders WHERE o_orderkey < 2000
""",
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile bucketing over a total order (price ties broken by key)."""
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 2000)
        .select("o_orderkey", F.ntile(4).over(w).alias("price_quartile"))
    )


_IN_SUBQUERY_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)
"""


@register("subquery_in", category="subquery", oracle=_IN_SUBQUERY_SQL)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery (SQL surface; Catalyst rewrites to a left-semi join —
    same plan as the DataFrame join_semi query)."""
    register_tables(spark, sf_dir, "customer", "orders")
    return spark.sql(_IN_SUBQUERY_SQL)


_NOT_EXISTS_SQL = """
SELECT s_suppkey, s_name FROM supplier
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_suppkey = s_suppkey AND l_quantity > 49 AND l_extendedprice > 80000.0
)
"""


@register("subquery_not_exists", category="subquery", oracle=_NOT_EXISTS_SQL)
def subquery_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated NOT EXISTS (→ left-anti join)."""
    register_tables(spark, sf_dir, "supplier", "lineitem")
    return spark.sql(_NOT_EXISTS_SQL)


_SCALAR_SUBQUERY_SQL = """
SELECT o_orderkey, round(o_totalprice, 2) AS total_price
FROM orders
WHERE o_totalprice > 1.8 * (SELECT avg(o_totalprice) FROM orders)
"""


@register("subquery_scalar", category="subquery", oracle=_SCALAR_SUBQUERY_SQL)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (computed once, broadcast as a
    literal into the filter)."""
    register_tables(spark, sf_dir, "orders")
    return spark.sql(_SCALAR_SUBQUERY_SQL)


_CORRELATED_SCALAR_SQL = """
SELECT c_custkey,
       (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
FROM customer WHERE c_custkey < 200
"""


@register("subquery_correlated_scalar", category="subquery", oracle=_CORRELATED_SCALAR_SQL)
def subquery_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (→ aggregate + left outer join rewrite)."""
    register_tables(spark, sf_dir, "customer", "orders")
    return spark.sql(_CORRELATED_SCALAR_SQL)


_UNION_ALL_SQL = """
SELECT o_custkey AS custkey, 'big_order' AS reason FROM orders WHERE o_totalprice > 400000.0
UNION ALL
SELECT c_custkey AS custkey, 'rich' AS reason FROM customer WHERE c_acctbal > 9900.0
"""


@register("set_union_all", category="setop", oracle=_UNION_ALL_SQL)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics, multiplicity preserved)."""
    register_tables(spark, sf_dir, "customer", "orders")
    return spark.sql(_UNION_ALL_SQL)


@register(
    "agg_mode_exact",
    category="aggregation",
    oracle="""
SELECT o_orderstatus, o_orderpriority AS mode_priority, n
FROM (
  SELECT o_orderstatus, o_orderpriority, count(*) AS n,
         row_number() OVER (PARTITION BY o_orderstatus
                            ORDER BY count(*) DESC, o_orderpriority) AS rn
  FROM orders GROUP BY 1, 2) t
WHERE rn = 1
""",
)
def agg_mode_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group MODE with a deterministic tiebreak (most frequent
    o_orderpriority per order status; ties resolve to the smallest value).
    Spark's native mode() is tie-nondeterministic, so the certified form
    is the two-level count + partitioned rank — the distributed argmax
    shape, map-side combinable on the first level."""
    from pyspark.sql.window import Window

    counts = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("n").desc(), F.col("o_orderpriority")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus", F.col("o_orderpriority").alias("mode_priority"), "n"
        )
    )


@register(
    "scalar_url_funcs",
    category="scalar",
    oracle="""
SELECT o_orderkey,
       'shop.example.com' AS host,
       '/orders/' || CAST(o_orderkey AS VARCHAR) AS path,
       CAST(o_custkey AS VARCHAR) AS cust_param,
       o_orderpriority AS decoded_priority
FROM orders WHERE o_orderkey < 2000
""",
)
def scalar_url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL functions round-trip: build a URL per row, then parse_url
    extracts HOST/PATH/QUERY parameters and url_decode inverts url_encode
    on a value with spaces/specials ('1-URGENT' etc.). The oracle states
    the expected components directly, so any parsing or percent-encoding
    defect breaks the match."""
    ev = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    url = F.concat(
        F.lit("https://shop.example.com/orders/"),
        F.col("o_orderkey").cast("string"),
        F.lit("?cust="),
        F.col("o_custkey").cast("string"),
        F.lit("&prio="),
        F.url_encode(F.col("o_orderpriority")),
    )
    return ev.select(
        "o_orderkey",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("cust")).alias("cust_param"),
        F.url_decode(F.parse_url(url, F.lit("QUERY"), F.lit("prio"))).alias(
            "decoded_priority"
        ),
    )


@register(
    "scalar_mask_redaction",
    category="scalar",
    oracle=r"""
SELECT c_custkey,
       regexp_replace(regexp_replace(regexp_replace(
         c_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
         AS name_masked,
       regexp_replace(regexp_replace(regexp_replace(
         c_name, '[A-Z]', '#', 'g'), '[a-z]', '#', 'g'), '[0-9]', '*', 'g')
         AS name_custom
FROM customer
""",
)
def scalar_mask_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shape-preserving data masking via the native mask() function
    (upper→X, lower→x, digit→n by default; custom mask characters on the
    second projection) — the display-redaction primitive that keeps format
    validators working on masked data. Oracle replays the identical
    character-class substitution with regexp_replace."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.mask(F.col("c_name")).alias("name_masked"),
        F.mask(
            F.col("c_name"),
            F.lit("#"), F.lit("#"), F.lit("*"), F.lit(None),
        ).alias("name_custom"),
    )


@register(
    "scalar_bitwise_ops",
    category="scalar",
    oracle="""
SELECT event_id,
       CAST(bit_count(CAST(event_id AS BIGINT)) AS INT) AS popcount,
       event_id << 3 AS shifted_left,
       event_id >> 2 AS shifted_right,
       xor(event_id, 255) AS xored,
       event_id & 4095 AS masked_low,
       event_id | 1 AS forced_odd
FROM events WHERE event_id < 5000
""",
)
def scalar_bitwise_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar bit-manipulation battery: popcount, shifts, xor, and/or
    masking — the primitives under bitmap indexes, bloom filters, SimHash
    banding, and Z-order keys, certified as row-level functions (their
    aggregate forms are in agg_bitwise_bool)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 5000)
    return ev.select(
        "event_id",
        F.bit_count("event_id").alias("popcount"),
        F.shiftleft(F.col("event_id"), 3).alias("shifted_left"),
        F.shiftright(F.col("event_id"), 2).alias("shifted_right"),
        F.col("event_id").bitwiseXOR(F.lit(255)).alias("xored"),
        F.col("event_id").bitwiseAND(F.lit(4095)).alias("masked_low"),
        F.col("event_id").bitwiseOR(F.lit(1)).alias("forced_odd"),
    )


@register(
    "sql_scripting_threshold",
    category="scalar",
    oracle="""
SELECT o_orderkey, round(o_totalprice, 2) AS total
FROM orders
WHERE o_totalprice > (SELECT max(o_totalprice) * 0.9 FROM orders)
""",
)
def sql_scripting_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL scripting (BEGIN/END compound with DECLARE + SET): a
    session variable is assigned from a scalar subquery over the data,
    then drives the final SELECT — procedural control flow entirely inside
    the SQL surface, no driver round-trip between the aggregate and the
    filter. The oracle is the equivalent single statement with the scalar
    subquery inlined."""
    register_tables(spark, sf_dir, "orders")
    return spark.sql("""
    BEGIN
      DECLARE thr DOUBLE;
      SET thr = (SELECT max(o_totalprice) * 0.9 FROM orders);
      SELECT o_orderkey, round(o_totalprice, 2) AS total
      FROM orders WHERE o_totalprice > thr;
    END
    """)


@register(
    "sql_execute_immediate_params",
    category="scalar",
    oracle="""
SELECT o_custkey, count(*) AS n_orders
FROM orders WHERE o_custkey < 100 GROUP BY o_custkey
""",
)
def sql_execute_immediate_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTE IMMEDIATE with positional USING parameters — server-side
    parameterized SQL (the injection-safe alternative to string splicing;
    the stage layer's ${param} substitution is the Arc-parity text path,
    this is the engine-native binding path). The oracle inlines the bound
    literal."""
    register_tables(spark, sf_dir, "orders")
    return spark.sql(
        "EXECUTE IMMEDIATE "
        "'SELECT o_custkey, count(*) AS n_orders "
        "FROM orders WHERE o_custkey < ? GROUP BY o_custkey' "
        "USING 100"
    )


@register(
    "set_union_by_name",
    category="setop",
    oracle="""
SELECT o_custkey AS custkey, o_totalprice AS amount, NULL AS segment
FROM orders WHERE o_totalprice > 400000.0
UNION ALL
SELECT c_custkey AS custkey, NULL AS amount, c_mktsegment AS segment
FROM customer WHERE c_acctbal > 9900.0
""",
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName(allowMissingColumns=True): positional UNION would
    mis-align these two frames (different column order, different column
    sets) — by-name resolution matches columns by identifier and fills
    each side's missing columns with NULL. The schema-evolution-safe way
    to stack heterogeneous extracts."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000.0)
        .select(
            F.col("o_totalprice").alias("amount"),
            F.col("o_custkey").alias("custkey"),
        )
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9900.0)
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_mktsegment").alias("segment"),
        )
    )
    return orders.unionByName(cust, allowMissingColumns=True).select(
        "custkey", "amount", "segment"
    )


@register(
    "sort_limit_offset",
    category="sort",
    oracle="""
SELECT o_orderkey, round(o_totalprice, 2) AS total
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 50 OFFSET 100
""",
)
def sort_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pagination: total order (price desc, key asc as the
    tiebreak) + OFFSET + LIMIT. Spark compiles the pair into a single
    global top-(offset+limit) pass (CollectLimit with offset) — it never
    materializes or skips 'the first 100 rows' per partition, so page N
    costs the same as page 1 plus O(offset) discarded rows, not a full
    sort."""
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(100)
        .limit(50)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("total"))
    )


@register(
    "sort_nulls_ordering",
    category="sort",
    oracle="""
SELECT event_id, maybe_val
FROM (
  SELECT event_id,
         CASE WHEN user_id % 5 = 0 THEN NULL ELSE value END AS maybe_val
  FROM events)
ORDER BY maybe_val DESC NULLS FIRST, event_id
LIMIT 200
""",
)
def sort_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULL placement in sorts: DESC NULLS FIRST (Spark's DESC
    default is NULLS LAST, so the placement must be stated on both
    engines), with an id tiebreak and a limit for a deterministic total
    order. The missing-value ordering contract matters anywhere sorted
    output feeds pagination or top-k."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("user_id") % 5 == 0, F.lit(None))
        .otherwise(F.col("value"))
        .alias("maybe_val"),
    )
    return ev.orderBy(
        F.col("maybe_val").desc_nulls_first(), F.col("event_id")
    ).limit(200)


@register(
    "ddl_bucketed_join",
    category="ddl",
    oracle="""
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderstatus
""",
)
def ddl_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog DDL under the correctness gate: both fact tables are
    written as BUCKETED catalog tables (bucketBy + sortBy on the join
    key), then joined table-to-table — at scale the bucketed layout
    co-locates the join and removes both shuffle exchanges (asserted in
    tests/test_scale.py); here the certified object is the full
    DDL→write→catalog-read→join path producing exactly the plain join's
    answer."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    import shutil
    from urllib.parse import urlparse

    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    sfx = session_suffix()
    for df, name in ((orders, f"acpps_cert_bko_{sfx}"), (li, f"acpps_cert_bkl_{sfx}")):
        # a fresh session's in-memory catalog does not know about a table
        # whose LOCATION survived a previous process — drop both the
        # catalog entry and any orphaned location before writing
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        loc = urlparse(warehouse).path or warehouse
        shutil.rmtree(f"{loc.rstrip('/')}/{name}", ignore_errors=True)
        key = df.columns[0]
        (
            df.write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .format("parquet")
            .saveAsTable(name)
        )
    o = spark.table(f"acpps_cert_bko_{sfx}")
    l = spark.table(f"acpps_cert_bkl_{sfx}")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"),
        )
    )


@register(
    "ddl_ctas_summary",
    category="ddl",
    oracle="""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders GROUP BY o_orderpriority
""",
)
def ddl_ctas_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE TABLE AS SELECT under the oracle gate: the aggregate
    materializes as a managed parquet catalog table, and the certified
    result is read back FROM THE TABLE — covering the DDL, the write, and
    the catalog read as one path (the everyday lakehouse summary-table
    op)."""
    import shutil
    from urllib.parse import urlparse

    register_tables(spark, sf_dir, "orders")
    name = f"acpps_cert_ctas_{session_suffix()}"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    loc = urlparse(warehouse).path or warehouse
    shutil.rmtree(f"{loc.rstrip('/')}/{name}", ignore_errors=True)
    spark.sql(f"""
        CREATE TABLE {name} USING parquet AS
        SELECT o_orderpriority,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders GROUP BY o_orderpriority
    """)
    return spark.table(name)


@register(
    "scan_schema_evolution",
    category="ddl",
    oracle="""
SELECT o_orderkey,
       round(o_totalprice, 2) AS total,
       CASE WHEN o_orderkey >= 1000 THEN o_orderpriority END AS priority
FROM orders WHERE o_orderkey < 2000
""",
)
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution at the scan: a table directory whose older files
    predate a column (two-column schema) and whose newer files carry it —
    read back with mergeSchema, old rows surface NULL for the added
    column. This is how a 100 TB table ACTUALLY evolves (new columns
    appear in new files only; nobody rewrites history), so the reader
    contract is the thing worth certifying."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    v1 = orders.filter(F.col("o_orderkey") < 1000).select(
        "o_orderkey", F.round("o_totalprice", 2).alias("total")
    )
    v2 = orders.filter(F.col("o_orderkey") >= 1000).select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("total"),
        F.col("o_orderpriority").alias("priority"),
    )
    path = scratch_dir("schema_evo")
    # the scratch dir is reused across invocations: overwrite on the first
    # write so repeated sweeps don't accumulate duplicate file generations
    v1.write.mode("overwrite").parquet(path)
    v2.write.mode("append").parquet(path)
    return spark.read.option("mergeSchema", "true").parquet(path)


@register(
    "scan_jsonl_roundtrip",
    category="ddl",
    oracle="""
SELECT doc_id, lang, n_chars, source
FROM documents WHERE doc_id < 300
""",
)
def scan_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines as a source format: rows written as JSONL, read back
    through spark.read.json with schema INFERENCE (types must come back as
    bigint/string without hints), certified against the original table —
    the interchange format every corpus pipeline ingests at some point.
    Inference costs one extra pass at scale; production readers pin an
    explicit schema, but the inferred contract is what this certifies."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    path = scratch_dir("jsonl")
    docs.select("doc_id", "lang", "n_chars", "source").write.mode("overwrite").json(path)
    back = spark.read.json(path)
    return back.select("doc_id", "lang", "n_chars", "source")


@register(
    "scan_binaryfile_ingest",
    category="scan",
    oracle="""
SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
       md5(hex(text)) AS content_md5
FROM documents WHERE doc_id < 40
""",
)
def scan_binaryfile_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `binaryFile` source — Spark's standard ingestion path for
    image/audio/document blob corpora (one row per file: path, length,
    content) — certified end to end: per-document binary files on disk are
    read back through the real source and fingerprinted, with the oracle
    recomputing size and digest from the originating table. The digest is
    md5 over the uppercase hex encoding because the oracle engine's md5
    only accepts strings; hex() bytes agree across engines.

    The 40-file fixture is materialized driver-side from a bounded collect
    (it IS the input layout being certified, not a data path). At corpus
    scale the source parallelizes by files-per-partition
    (maxPartitionBytes / openCostInBytes) and prunes on pathGlobFilter —
    the partitioning knobs, not this query, change."""
    import os

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 40)
        .select("doc_id", "text")
    )
    path = scratch_dir("binfiles")
    for r in docs.collect():  # bounded: 40 fixture rows
        with open(os.path.join(path, f"doc_{r['doc_id']}.bin"), "wb") as fh:
            fh.write(r["text"].encode("utf-8"))
    back = (
        spark.read.format("binaryFile").option("pathGlobFilter", "*.bin").load(path)
    )
    return back.select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin$", 1)
        .cast("bigint")
        .alias("doc_id"),
        F.col("length").alias("n_bytes"),
        F.md5(F.hex(F.col("content"))).alias("content_md5"),
    )


@register(
    "scan_csv_roundtrip",
    category="ddl",
    oracle="""
SELECT CAST(o_orderkey AS VARCHAR) AS o_orderkey,
       CAST(o_custkey AS VARCHAR) AS o_custkey,
       o_orderstatus, o_orderpriority
FROM orders WHERE o_orderkey < 800
""",
)
def scan_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-aware CSV as a file source, under the reference's contract
    (CassandraLoadSuite.scala:63 / DelimitedExtract defaults: header=true,
    NO schema inference → every column lands as string). Written and read
    back at query time; the oracle casts the originals to text. Integer
    and categorical columns only — float-to-text formatting is
    engine-specific and has no place in an exactness gate."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 800)
    path = scratch_dir("csv")
    orders.select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"
    ).write.mode("overwrite").option("header", True).csv(path)
    return spark.read.option("header", True).csv(path)


@register(
    "pivot_multi_agg",
    category="relational",
    oracle="""
SELECT o_orderpriority,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS F_n,
       round(coalesce(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 0), 2) AS F_total,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS O_n,
       round(coalesce(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 0), 2) AS O_total,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS P_n,
       round(coalesce(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'P'), 0), 2) AS P_total
FROM orders GROUP BY o_orderpriority
""",
)
def pivot_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with MULTIPLE aggregates per cell (count + sum for each
    order status): Spark names the output columns {value}_{agg alias}, so
    the aliases are pinned on both sides. Explicit pivot values keep the
    schema static — at scale an unvalued pivot costs an extra distinct
    pass and produces a data-dependent schema, both wrong for a certified
    contract."""
    orders = load_table(spark, sf_dir, "orders")
    out = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total"),
        )
    )
    return out.select(
        "o_orderpriority",
        *[c for s in ("F", "O", "P") for c in (f"{s}_n", f"{s}_total")],
    )


@register(
    "scan_text_parse_pipeline",
    category="ddl",
    oracle="""
SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
FROM documents WHERE doc_id < 300
""",
)
def scan_text_parse_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-text ingestion + manual parse: records land as opaque LINES
    through spark.read.text (no format assumption at the source — the
    shape of scraped/dumped corpus input), then from_json under an
    explicit schema lifts them to typed columns. Unlike scan_jsonl_roundtrip
    (format-aware reader, inferred schema), this certifies the
    read-raw-then-parse pipeline where the parse is an ordinary projection
    the engine can fuse and the schema is pinned by the caller."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    path = scratch_dir("text")
    docs.select(
        F.to_json(F.struct("doc_id", "lang", "n_chars")).alias("value")
    ).write.mode("overwrite").text(path)
    lines = spark.read.text(path)
    parsed = lines.select(
        F.from_json(F.col("value"), "doc_id BIGINT, lang STRING, n_chars BIGINT").alias("r")
    )
    return parsed.select("r.doc_id", "r.lang", "r.n_chars")


_PRICE_TIERS = [
    (0.0, 100_000.0, "low"),
    (100_000.0, 250_000.0, "mid"),
    (250_000.0, 1e9, "high"),
]


@register(
    "join_range_dim_lookup",
    category="join",
    oracle=f"""
WITH tiers(lo, hi, tier) AS (VALUES
  {", ".join(f"({lo!r}, {hi!r}, '{t}')" for lo, hi, t in _PRICE_TIERS)})
SELECT tier, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders JOIN tiers ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY tier
""",
)
def join_range_dim_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval lookup against a BROADCAST range dimension (price
    tiers): the fact side streams through a nested-loop probe of a 3-row
    table — O(rows × tiers) with tiers constant, the correct plan for
    tier/bracket/banding dimensions at any fact size (contrast
    events_proximity_pairs, where BOTH sides scale and binning is
    required). Generated VALUES keep the tier constants single-sourced."""
    tiers = small_df(spark, _PRICE_TIERS, "lo double, hi double, tier string")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(
            F.broadcast(tiers),
            (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
        )
    )


@register(
    "agg_weighted_median",
    category="aggregation",
    oracle="""
WITH lvl AS (
  SELECT l_returnflag, CAST(round(l_discount * 100) AS BIGINT) AS disc_pct,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS w
  FROM lineitem GROUP BY 1, 2),
cum AS (
  SELECT l_returnflag, disc_pct, w,
         sum(w) OVER (PARTITION BY l_returnflag ORDER BY disc_pct
                      ROWS UNBOUNDED PRECEDING) AS cw,
         sum(w) OVER (PARTITION BY l_returnflag) AS tw
  FROM lvl)
SELECT l_returnflag, CAST(min(disc_pct) AS INT) AS median_disc_pct
FROM cum WHERE 2 * cw >= tw GROUP BY l_returnflag
""",
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT quantity-weighted median discount per return flag: aggregate
    to the bounded level domain first (11 discount levels — integer
    percent), then the cumulative-weight crossing picks the median. The
    windows run over ≤11 rows per flag regardless of fact size, and every
    comparison is exact integer arithmetic (2·cum ≥ total — no halves, no
    floats). The level-collapse-then-rank shape is how ANY weighted
    quantile stays exact at 100 TB when the value domain is bounded."""
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_discount") * 100).cast("bigint").alias("disc_pct"),
        F.round(F.col("l_quantity")).cast("bigint").alias("qty"),
    )
    lvl = li.groupBy("l_returnflag", "disc_pct").agg(F.sum("qty").alias("w"))
    wc = (
        Window.partitionBy("l_returnflag")
        .orderBy("disc_pct")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("l_returnflag")
    cum = lvl.select(
        "l_returnflag",
        "disc_pct",
        F.sum("w").over(wc).alias("cw"),
        F.sum("w").over(wt).alias("tw"),
    )
    return (
        cum.filter(F.lit(2) * F.col("cw") >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(F.min("disc_pct").cast("int").alias("median_disc_pct"))
    )


@register(
    "orders_yoy_growth",
    category="window",
    oracle="""
WITH yearly AS (
  SELECT CAST(year(o_orderdate) AS INT) AS yr,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM orders GROUP BY 1)
SELECT yr, revenue,
       round(revenue - lag(revenue) OVER (ORDER BY yr), 2) AS yoy_delta
FROM yearly
""",
)
def orders_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue deltas: aggregate to the calendar-bounded
    year domain FIRST, then lag over ≤7 rows — the unpartitioned window
    runs on the aggregate, never the fact table (the level-collapse
    discipline every period-over-period metric needs at scale)."""
    from pyspark.sql.window import Window

    yearly = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.year("o_orderdate").cast("int").alias("yr"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"))
    )
    w = Window.orderBy("yr")
    return yearly.select(
        "yr",
        "revenue",
        F.round(F.col("revenue") - F.lag("revenue").over(w), 2).alias("yoy_delta"),
    )


@register(
    "agg_higher_moments",
    category="aggregation",
    oracle="""
WITH sums AS (
  SELECT event_type,
         count(*) AS n,
         CAST(SUM(CAST(round(value, 6) AS DECIMAL(24,6))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(round(value * value, 6) AS DECIMAL(30,6))) AS DOUBLE) AS s2,
         CAST(SUM(CAST(round(value * value * value, 6) AS DECIMAL(36,6))) AS DOUBLE) AS s3
  FROM events GROUP BY event_type),
m AS (
  SELECT event_type, n,
         s1 / n AS mean,
         s2 / n - (s1 / n) * (s1 / n) AS m2,
         s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n) AS m3
  FROM sums)
SELECT event_type, CAST(n AS BIGINT) AS n,
       round(mean, 6) AS mean,
       round(m2, 6) AS variance_pop,
       round(m3 / (m2 * sqrt(m2)), 6) AS skewness_pop
FROM m
""",
)
def agg_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness from EXACT moment sums: per-row powers rounded
    then decimal-summed (order-free), the moment composition done in
    identical expression order on both engines, final round-6. Built-in
    skewness()/kurtosis() differ between engines on sample-vs-population
    conventions and summation order — composing from exact power sums is
    the cross-engine-stable (and 100 TB map-side-combinable) form."""
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value")
    sums = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(v, 6).cast("decimal(24,6)")).cast("double").alias("s1"),
        F.sum(F.round(v * v, 6).cast("decimal(30,6)")).cast("double").alias("s2"),
        F.sum(F.round(v * v * v, 6).cast("decimal(36,6)")).cast("double").alias("s3"),
    )
    n = F.col("n")
    mean = F.col("s1") / n
    m2 = F.col("s2") / n - mean * mean
    m3 = F.col("s3") / n - F.lit(3) * mean * (F.col("s2") / n) + F.lit(2) * mean * mean * mean
    return sums.select(
        "event_type",
        n.cast("bigint").alias("n"),
        F.round(mean, 6).alias("mean"),
        F.round(m2, 6).alias("variance_pop"),
        F.round(m3 / (m2 * F.sqrt(m2)), 6).alias("skewness_pop"),
    )


_SCD2_CUTOVER = "1996-01-01"


@register(
    "join_scd2_point_in_time",
    category="join",
    oracle=f"""
SELECT CASE WHEN o_orderdate < TIMESTAMP '{_SCD2_CUTOVER}'
            THEN c_mktsegment || '_v1' ELSE c_mktsegment || '_v2' END AS segment_version,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1
""",
)
def join_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (SCD2) dimension join: each fact row matches the
    dimension VERSION whose validity interval contains the fact's event
    date — the temporal-correctness pattern every slowly-changing
    dimension needs (joining "current" attributes onto historical facts
    silently rewrites history). The dimension here carries two synthetic
    versions cut over at {_SCD2_CUTOVER}; the join is equi-key on custkey
    with the interval test as a residual (hash join, never a range scan),
    and the oracle derives the expected version directly from the fact
    date. Every row matches exactly one version (intervals partition
    time)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cut = F.lit(_SCD2_CUTOVER).cast("timestamp")
    far_past = F.lit("1900-01-01").cast("timestamp")
    far_future = F.lit("9999-01-01").cast("timestamp")
    dim = cust.select(
        "c_custkey",
        F.explode(
            F.array(
                F.struct(
                    F.concat(F.col("c_mktsegment"), F.lit("_v1")).alias("seg_v"),
                    far_past.alias("valid_from"),
                    cut.alias("valid_to"),
                ),
                F.struct(
                    F.concat(F.col("c_mktsegment"), F.lit("_v2")).alias("seg_v"),
                    cut.alias("valid_from"),
                    far_future.alias("valid_to"),
                ),
            )
        ).alias("v"),
    ).select("c_custkey", "v.seg_v", "v.valid_from", "v.valid_to")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    joined = orders.join(
        dim,
        (F.col("o_custkey") == F.col("c_custkey"))
        & (F.col("o_orderdate") >= F.col("valid_from"))
        & (F.col("o_orderdate") < F.col("valid_to")),
    )
    return joined.groupBy(F.col("seg_v").alias("segment_version")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
    )


@register(
    "distinct_rows",
    category="setop",
    oracle="SELECT DISTINCT o_custkey, o_orderstatus FROM orders",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates on a column subset ≡ SELECT DISTINCT."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderstatus")
        .dropDuplicates()
    )


_HAVING_SQL = """
SELECT o_custkey, count(*) AS n_orders, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders GROUP BY o_custkey HAVING count(*) >= 15
"""


@register("agg_having", category="aggregation", oracle=_HAVING_SQL)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING: post-aggregation filter (the aggregate-then-reduce shape)."""
    register_tables(spark, sf_dir, "orders")
    return spark.sql(_HAVING_SQL)


@register(
    "set_except_all",
    category="setop",
    oracle=_SET_ORACLE_BASE
    + "SELECT o_custkey FROM h1 EXCEPT ALL SELECT o_custkey FROM h2",
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics: multiplicity differences preserved) —
    the operator exceptAll maps to, distinct from subtract/EXCEPT."""
    h1, h2 = _half_year_custkeys(spark, sf_dir)
    return h1.exceptAll(h2)


@register(
    "set_intersect_all",
    category="setop",
    oracle=_SET_ORACLE_BASE
    + "SELECT o_custkey FROM h1 INTERSECT ALL SELECT o_custkey FROM h2",
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics: min of multiplicities)."""
    h1, h2 = _half_year_custkeys(spark, sf_dir)
    return h1.intersectAll(h2)


@register(
    "window_range_frame",
    category="window",
    oracle="""
SELECT o_orderkey,
       CAST(count(*) OVER (
         PARTITION BY o_custkey ORDER BY o_totalprice
         RANGE BETWEEN 50000 PRECEDING AND 50000 FOLLOWING) AS BIGINT) AS n_similar_price
FROM orders WHERE o_custkey < 100
""",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based window, ties included by definition —
    deterministic without a tiebreak column, unlike ROWS frames):
    per customer, how many of their orders fall within ±50k of each
    order's price."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-50000, 50000)
    )
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 100)
        .select("o_orderkey", F.count(F.lit(1)).over(w).alias("n_similar_price"))
    )


@register(
    "window_rank_stats",
    category="window",
    oracle="""
SELECT o_orderkey,
       rank()         OVER w AS rnk,
       dense_rank()   OVER w AS drnk,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist()    OVER w, 6) AS cdist
FROM orders WHERE o_orderkey < 1000
WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
""",
)
def window_rank_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking statistics battery over a total order: rank, dense_rank,
    percent_rank, cume_dist."""
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 1000)
        .select(
            "o_orderkey",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cdist"),
        )
    )


@register(
    "window_rank_global_scalable",
    category="window",
    oracle="""
SELECT o_orderkey,
       row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS global_rn
FROM orders
""",
)
def window_rank_global_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact global row_number over the FULL orders table with partitioned
    windows only (two-phase bucketed rank, operators/ranking.py) — the
    100 TB-safe form of window_rank_stats' global ordering; no
    single-partition WindowExec in the plan (asserted in test_plans)."""
    from arc_cassandra_pipeline_plugin_spark.operators.ranking import global_row_number

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return global_row_number(
        orders, "o_totalprice", ["o_orderkey"], out_col="global_rn"
    ).select("o_orderkey", "global_rn")


@register(
    "window_ntile_scalable",
    category="window",
    oracle="""
SELECT o_orderkey,
       ntile(8) OVER (ORDER BY o_totalprice, o_orderkey) AS price_octile
FROM orders
""",
)
def window_ntile_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact global ntile(8) over the FULL orders table derived from the
    two-phase bucketed rank (operators/ranking.py) — scale-safe ntile:
    SQL tile sizes are a pure function of the global row number, so the
    single-partition sort the built-in needs is never materialized."""
    from arc_cassandra_pipeline_plugin_spark.operators.ranking import global_ntile

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return global_ntile(
        orders, "o_totalprice", ["o_orderkey"], n=8, out_col="price_octile"
    ).select("o_orderkey", "price_octile")


_LISTAGG_SQL_SPARK = """
SELECT l_returnflag,
       listagg(DISTINCT l_linestatus, ',') WITHIN GROUP (ORDER BY l_linestatus) AS statuses_csv
FROM lineitem GROUP BY l_returnflag
"""


@register(
    "agg_listagg",
    category="aggregation",
    oracle="""
SELECT l_returnflag,
       string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses_csv
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (Spark 4 listagg WITHIN GROUP ≡ DuckDB
    string_agg ORDER BY) — deterministic via the explicit sort."""
    register_tables(spark, sf_dir, "lineitem")
    return spark.sql(_LISTAGG_SQL_SPARK)


@register(
    "unpivot_quantities",
    category="relational",
    oracle="""
SELECT l_orderkey, l_linenumber, measure, round(val, 2) AS val
FROM (
  SELECT l_orderkey, l_linenumber,
         'quantity' AS measure, l_quantity AS val FROM lineitem WHERE l_orderkey < 100
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice FROM lineitem WHERE l_orderkey < 100
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem WHERE l_orderkey < 100
)
""",
)
def unpivot_quantities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide → long, the inverse of pivot): three measure columns
    melt into (measure, val) rows — df.unpivot compiles to a single
    Expand node, one pass over the scan, no shuffle."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 100)
        .unpivot(
            ids=["l_orderkey", "l_linenumber"],
            values=["l_quantity", "l_extendedprice", "l_discount"],
            variableColumnName="measure",
            valueColumnName="val",
        )
        .withColumn("measure", F.regexp_replace("measure", "^l_", ""))
        .withColumn("val", F.round("val", 2))
    )


@register(
    "scalar_null_semantics",
    category="scalar",
    oracle="""
SELECT c_custkey,
       (c_mktsegment IS NOT DISTINCT FROM 'BUILDING') AS is_building_nullsafe,
       (nullif(c_mktsegment, 'BUILDING') IS NULL) AS nulled_out,
       coalesce(nullif(c_acctbal, 0.0), -1.0) AS bal_or_sentinel,
       (CASE WHEN c_acctbal < 0 THEN NULL ELSE round(c_acctbal, 2) END
          IS NOT DISTINCT FROM NULL) AS neg_is_null
FROM customer WHERE c_custkey < 500
""",
)
def scalar_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-semantics battery: null-safe equality (<=> ≡ IS NOT DISTINCT
    FROM), nullif-to-null, coalesce sentinels, and three-valued CASE —
    identical across engines by the SQL standard."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 500)
    neg_null = F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(
        F.round(F.col("c_acctbal"), 2)
    )
    return c.select(
        "c_custkey",
        F.col("c_mktsegment").eqNullSafe(F.lit("BUILDING")).alias("is_building_nullsafe"),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).isNull().alias("nulled_out"),
        F.coalesce(F.nullif(F.col("c_acctbal"), F.lit(0.0)), F.lit(-1.0)).alias(
            "bal_or_sentinel"
        ),
        neg_null.eqNullSafe(F.lit(None).cast("double")).alias("neg_is_null"),
    )


@register(
    "agg_decimal_exact",
    category="aggregation",
    oracle="""
SELECT l_returnflag,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) AS sum_price_exact,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(15,2)) * CAST(l_discount AS DECIMAL(5,2)))
            AS DOUBLE) AS sum_disc_exact
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decimal aggregation: cast money to DECIMAL before summing —
    associative integer arithmetic, so the result is EXACT and identical
    across engines and partitionings with NO rounding discipline needed
    (the one aggregate family where float drift cannot exist).

    The OUTPUT columns are cast decimal->DOUBLE on both sides: Spark's
    inferred sum precision (decimal(25,2)/decimal(31,4)) differs from
    DuckDB's (DECIMAL(38,2)/DECIMAL(38,4)), and while the values are
    identical, decimal-typed result columns normalize differently through
    external hashers (r10 driver gate: rows+schema green, hash red). The
    decimal sums stay exact internally; the final on-grid values are well
    inside double's 2**53 integer range at certified scales, so the cast
    is lossless and the doubles are bit-identical across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(15,2)")
    disc = F.col("l_discount").cast("decimal(5,2)")
    return li.groupBy("l_returnflag").agg(
        F.sum(price).cast("double").alias("sum_price_exact"),
        F.sum(price * disc).cast("double").alias("sum_disc_exact"),
    )


@register(
    "agg_histogram",
    category="aggregation",
    oracle="""
SELECT CAST(CASE WHEN o_totalprice < 0.0 THEN 0
            WHEN o_totalprice >= 600000.0 THEN 13
            ELSE 1 + CAST(floor(o_totalprice / 50000.0) AS INT) END AS BIGINT) AS bucket,
       count(*) AS n,
       round(min(o_totalprice), 2) AS lo,
       round(max(o_totalprice), 2) AS hi
FROM orders GROUP BY 1
""",
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via width_bucket (DuckDB 1.0 has no
    width_bucket, so the oracle spells out the same NIST bucket arithmetic:
    out-of-range to buckets 0 / n+1, else 1 + floor(x/width)) — the
    data-profiling primitive; one map-side-combined aggregate."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.width_bucket("o_totalprice", F.lit(0.0), F.lit(600000.0), F.lit(12)).alias(
                "bucket"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


@register(
    "agg_corr_covar",
    category="aggregation",
    oracle="""
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       round(covar_samp(l_quantity, l_discount), 6) AS covar_qty_disc,
       round(stddev_samp(l_extendedprice), 2) AS sd_price
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics (Pearson correlation, sample covariance,
    stddev) per group — single-pass distributed moments."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("covar_qty_disc"),
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("sd_price"),
    )


@register(
    "scalar_edit_distance",
    category="scalar",
    oracle="""
SELECT n.n_name, r.r_name,
       levenshtein(n.n_name, r.r_name) AS edit_dist
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
""",
)
def scalar_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein edit distance (fuzzy matching primitive) over the
    nation→region join — identical DP semantics in both engines."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return n.join(r, n.n_regionkey == r.r_regionkey).select(
        "n_name", "r_name", F.levenshtein("n_name", "r_name").alias("edit_dist")
    )


@register(
    "window_value_functions",
    category="window",
    oracle="""
SELECT o_orderkey, o_custkey,
       first_value(o_totalprice) OVER w AS first_price,
       last_value(o_totalprice) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price,
       nth_value(o_totalprice, 2) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window VALUE functions (first_value / last_value / nth_value) with
    explicit frames: each customer's first, latest, and second order price
    in date order. last/nth use the full-partition frame (the default
    running frame silently returns the CURRENT row for last_value — the
    classic frame bug this query pins down). Pure value selection under a
    unique total order — nothing to round, partitioned window only."""
    orders = load_table(spark, sf_dir, "orders")
    order_cols = [F.col("o_orderdate"), F.col("o_orderkey")]
    running = Window.partitionBy("o_custkey").orderBy(*order_cols)
    full = running.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_totalprice").over(running).alias("first_price"),
        F.last("o_totalprice").over(full).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(full).alias("second_price"),
    )


@register(
    "join_lateral_correlated",
    category="join",
    oracle="""
SELECT c.c_custkey, t.o_orderkey, round(t.o_totalprice, 2) AS o_totalprice
FROM customer c,
LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 2
) t
WHERE c.c_custkey < 100
""",
)
def join_lateral_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: each customer's two most expensive
    orders via a per-row dependent subquery — the SQL-standard LATERAL
    surface (Spark >= 3.2), distinct from the generator-lateral
    (explode) already certified.

    Catalyst decorrelates the lateral into a ranked join (no per-row
    re-execution); the ORDER/LIMIT inside the lateral carries a unique
    tiebreak so both engines pick identical rows."""
    from arc_cassandra_pipeline_plugin_spark.sources import register_tables

    register_tables(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, round(t.o_totalprice, 2) AS o_totalprice
        FROM customer c,
        LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 2
        ) t
        WHERE c.c_custkey < 100
        """
    )


_RECURSIVE_SQL = """
WITH RECURSIVE edges AS (
  SELECT DISTINCT event_type, next_type FROM (
    SELECT event_type,
           lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS next_type
    FROM events)
  WHERE next_type IS NOT NULL AND event_type <> next_type
),
reach(event_type, hops) AS (
  SELECT CAST('view' AS {string_t}), 0
  UNION ALL
  SELECT e.next_type, r.hops + 1
  FROM reach r JOIN edges e ON e.event_type = r.event_type
  WHERE r.hops < 6
)
SELECT event_type, CAST(min(hops) AS INT) AS min_hops
FROM reach GROUP BY event_type
"""


@register(
    "recursive_cte_reachability",
    category="relational",
    oracle=_RECURSIVE_SQL.format(string_t="VARCHAR"),
)
def recursive_cte_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native WITH RECURSIVE (Spark 4): minimum-hop reachability from the
    'view' event over the observed event-transition graph — the iterative
    computation the engine's dedicated operators (connected components,
    PageRank) hand-roll, here expressed declaratively and executed by
    Spark's own recursion operator.

    The recursion is depth-bounded (hops < 6 — the transition graph has 5
    node types), so UNION ALL termination is structural even on cycles;
    the min-hop aggregate collapses the path multiset deterministically.
    Identical SQL text runs on both engines."""
    from arc_cassandra_pipeline_plugin_spark.sources import register_tables

    register_tables(spark, sf_dir, "events")
    return spark.sql(_RECURSIVE_SQL.format(string_t="STRING"))


@register(
    "pipe_syntax_pricing",
    category="relational",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n_lines,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price
FROM lineitem
WHERE l_quantity < 30
GROUP BY l_returnflag, l_linestatus
""",
)
def pipe_syntax_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL PIPE syntax (|>): the linear FROM → WHERE → AGGREGATE
    dataflow form of a pricing summary — same Catalyst plan as the nested
    SQL, certified against the plain-SQL oracle (the pipe form is
    Spark-side surface; result semantics are engine-neutral)."""
    from arc_cassandra_pipeline_plugin_spark.sources import register_tables

    register_tables(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_quantity < 30
        |> AGGREGATE CAST(count(*) AS BIGINT) AS n_lines,
                     round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
                     round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price
           GROUP BY l_returnflag, l_linestatus
        """
    )


@register(
    "scalar_collation",
    category="scalar",
    oracle="""
SELECT p_brand,
       CAST(count(DISTINCT lower(p_type)) AS BIGINT) AS n_types_ci,
       CAST(count(DISTINCT p_type) AS BIGINT) AS n_types_cs,
       min(lower(p_name)) AS first_name_ci
FROM part GROUP BY p_brand
""",
)
def scalar_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 string collations: case-insensitive distinct counts and
    min under UTF8_LCASE — the collation-aware comparison/grouping
    surface. The oracle expresses the same semantics via lower() (for
    ASCII fixture data the two are equivalent; collation keys live
    JVM-side, so the certified output is lowercased for portability)."""
    from arc_cassandra_pipeline_plugin_spark.sources import register_tables

    register_tables(spark, sf_dir, "part")
    return spark.sql(
        """
        SELECT p_brand,
               CAST(count(DISTINCT p_type COLLATE UTF8_LCASE) AS BIGINT) AS n_types_ci,
               CAST(count(DISTINCT p_type) AS BIGINT) AS n_types_cs,
               lower(CAST(min(p_name COLLATE UTF8_LCASE) AS STRING)) AS first_name_ci
        FROM part GROUP BY p_brand
        """
    )


@register(
    "scalar_try_functions",
    category="scalar",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_orderkey % 7 = 0 THEN NULL
            ELSE round(o_totalprice / (o_orderkey % 7), 6) END AS safe_ratio,
       TRY_CAST(o_orderpriority AS INT) AS bad_cast,
       TRY_CAST(substr(o_orderpriority, 1, 1) AS INT) AS prio_num
FROM orders WHERE o_orderkey < 2000
""",
)
def scalar_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe scalar functions (try_divide / try_cast): NULL instead of
    a job-killing exception on divide-by-zero and unparsable casts — the
    landing-zone arithmetic contract (ANSI mode without the failures).
    One projection; the division is a single IEEE op rounded identically
    on both engines."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    return orders.select(
        "o_orderkey",
        F.round(
            F.try_divide(F.col("o_totalprice"), F.col("o_orderkey") % 7), 6
        ).alias("safe_ratio"),
        F.try_to_number(F.col("o_orderpriority"), F.lit("999")).cast("int").alias("bad_cast"),
        F.substring("o_orderpriority", 1, 1).try_cast("int").alias("prio_num"),
    )


@register(
    "window_topk_with_ties",
    category="window",
    oracle="""
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice, CAST(rnk AS INT) AS rnk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         rank() OVER (PARTITION BY o_custkey
                      ORDER BY CAST(round(o_totalprice, 2) AS DOUBLE) DESC) AS rnk
  FROM orders)
WHERE rnk <= 2
""",
)
def window_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k WITH TIES: rank() <= k keeps every row tied at the boundary
    (row_number() would arbitrarily drop all but one) — the semantic pin
    between the two ranking flavors that silently changes result
    cardinality. Ranking is on the 2-dp-rounded price so tie groups are
    identical on both engines; the rank filter still compiles through the
    WindowGroupLimit pushdown."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.round(F.col("o_totalprice"), 2).cast("double").desc()
    )
    return (
        orders.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 2)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


@register(
    "agg_filter_clause",
    category="aggregation",
    oracle="""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_all,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_finished,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_open,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                  FILTER (WHERE o_orderstatus = 'F') AS DOUBLE), 2) AS finished_revenue
FROM orders GROUP BY o_orderpriority
""",
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-standard FILTER clause on aggregates — per-aggregate
    predicates without CASE pyramids or self-joins; one pass, map-side
    combinable, decimal-exact revenue. Identical SQL text runs on both
    engines."""
    from arc_cassandra_pipeline_plugin_spark.sources import register_tables

    register_tables(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_all,
               CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_finished,
               CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_open,
               round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                          FILTER (WHERE o_orderstatus = 'F') AS DOUBLE), 2) AS finished_revenue
        FROM orders GROUP BY o_orderpriority
        """
    )


@register(
    "lateral_posexplode_ordinality",
    category="relational",
    oracle="""
SELECT doc_id, CAST(generate_subscripts(toks, 1) AS INT) AS pos,
       unnest(toks) AS token
FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      FROM documents WHERE doc_id < 20) d
""",
)
def lateral_posexplode_ordinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator WITH ORDINALITY: token rows carrying their 1-based
    position (posexplode ≡ unnest + generate_subscripts) — position-aware
    fan-out, the piece plain explode drops and sequence models need."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0)
    return docs.select("doc_id", F.posexplode(toks).alias("pos0", "token")).select(
        "doc_id", (F.col("pos0") + 1).cast("int").alias("pos"), "token"
    )


@register(
    "agg_grouping_id",
    category="aggregation",
    oracle="""
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INT) AS gid,
       CAST(count(*) AS BIGINT) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
""",
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() disambiguation for multi-level aggregates: the bit that
    tells a real NULL group key from a superaggregate row — without it,
    ROLLUP/GROUPING SETS outputs are ambiguous. gid is the standard
    bitmask (here over two columns), certified alongside the coalesced
    display keys."""
    from arc_cassandra_pipeline_plugin_spark.sources import register_tables

    register_tables(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INT) AS gid,
               CAST(count(*) AS BIGINT) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        """
    )


@register(
    "scan_orc_roundtrip",
    category="ddl",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM lineitem WHERE l_orderkey < 2000
GROUP BY l_returnflag, l_linestatus
""",
)
def scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC as the interchange format (Spark's second first-class columnar
    source): a lineitem slice is written to ORC with zlib compression and
    read back at query time; the aggregate over the roundtripped rows must
    equal the oracle's aggregate over the parquet originals — types,
    decimals and dictionary-encoded strings all surviving the format hop.
    Predicate/projection pushdown applies to the ORC scan exactly as to
    parquet (same DSv2 path)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    path = scratch_dir("orc")
    li.select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag", "l_linestatus"
    ).write.mode("overwrite").option("compression", "zlib").orc(path)
    back = spark.read.orc(path)
    return back.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("l_quantity").cast("bigint").alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sum_price"),
    )


_LATERAL_SQL = """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c
JOIN LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2
) t ON true
WHERE c.c_custkey < 200
"""


@register("subquery_lateral_topn", category="subquery", oracle=_LATERAL_SQL)
def subquery_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL table subquery (SQL:1999 LATERAL, Spark 3.2+ /
    DuckDB parity): per customer, the top-2 orders by price — the
    'correlated top-N' shape users reach for before learning window
    functions. Catalyst decorrelates the LATERAL into a ranked window
    join; the same SQL text runs on both engines, so the oracle IS the
    query."""
    register_tables(spark, sf_dir, "customer", "orders")
    return spark.sql(_LATERAL_SQL)


@register(
    "scan_dynamic_partition_overwrite",
    category="ddl",
    oracle="""
WITH base AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
  FROM orders WHERE o_orderkey < 2000),
-- the rewrite replaces ONLY partition 'O' with discounted rows (exact
-- integer cents: cents*9 // 10); 'F' and 'P' must survive untouched
final AS (
  SELECT o_orderkey, (price_cents * 9) // 10 AS price_cents, o_orderstatus
  FROM base WHERE o_orderstatus = 'O'
  UNION ALL
  SELECT o_orderkey, price_cents, o_orderstatus
  FROM base WHERE o_orderstatus <> 'O')
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
       round(sum(price_cents) / 100.0, 2) AS total
FROM final GROUP BY o_orderstatus
""",
)
def scan_dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite — the production incremental-rewrite
    mode: with ``partitionOverwriteMode=dynamic``, an overwrite touches
    ONLY the partitions present in the incoming frame. A
    partitioned-by-status table is written, then partition 'O' alone is
    rewritten with discounted prices (exact integer cents — the repo's
    money convention, so no float-boundary drift); the certified aggregate
    proves 'F' and 'P' survived untouched while 'O' was replaced (static
    mode would have dropped them — the data-loss trap this mode exists to
    fix)."""
    path = scratch_dir("dynpart")
    base = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 2000)
        .select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_cents"),
            "o_orderstatus",
        )
    )
    base.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    rewrite = base.filter(F.col("o_orderstatus") == "O").withColumn(
        "price_cents", (F.col("price_cents") * 9) / F.lit(10)
    ).withColumn("price_cents", F.floor("price_cents").cast("bigint"))
    (
        rewrite.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("o_orderstatus")
        .parquet(path)
    )
    return (
        spark.read.parquet(path)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("price_cents") / 100.0, 2).alias("total"),
        )
    )


@register(
    "scan_jsonl_gzip_roundtrip",
    category="ddl",
    oracle="""
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(o_orderkey) AS BIGINT) AS key_sum
FROM orders WHERE o_orderkey < 2000
GROUP BY o_orderstatus
""",
)
def scan_jsonl_gzip_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gzip-compressed JSONL as the interchange format: written with
    ``compression=gzip``, read back with an explicit schema (no inference
    job), aggregate certified against the source rows. The 100 TB caveat
    this query documents: gzip is NOT splittable — each ``.json.gz`` file
    is one task regardless of size, so a production writer must shard into
    many files sized for one executor core (this write inherits the
    upstream partitioning and does exactly that); zstd/bzip2-via-codec or
    plain parquet are the splittable alternatives."""
    path = scratch_dir("jsonlgz")
    src = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 2000)
        .select("o_orderkey", "o_orderstatus")
    )
    src.write.mode("overwrite").option("compression", "gzip").json(path)
    back = spark.read.schema("o_orderkey bigint, o_orderstatus string").json(path)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_orderkey").alias("key_sum"),
    )


@register(
    "ddl_analyze_table_stats",
    category="ddl",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS row_count,
       CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS priority_ndv
FROM orders WHERE o_orderkey < 2000
""",
)
def ddl_analyze_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE — the CBO prerequisite: a managed table is analyzed
    (table-level + column-level statistics), and the certified result is
    what the CATALOG now believes: rowCount from DESCRIBE EXTENDED and the
    column's distinct-count from DESCRIBE EXTENDED <col>. Spark's column
    NDV uses HyperLogLog++ but is exact at this cardinality (5 priorities);
    the certified values prove the statistics pipeline feeds the optimizer
    real numbers, not nulls — the difference between CBO join reordering
    working and silently not."""
    import shutil
    from urllib.parse import urlparse

    register_tables(spark, sf_dir, "orders")
    name = f"acpps_cert_stats_{session_suffix()}"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    loc = urlparse(warehouse).path or warehouse
    shutil.rmtree(f"{loc.rstrip('/')}/{name}", ignore_errors=True)
    spark.sql(f"""
        CREATE TABLE {name} USING parquet AS
        SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderkey < 2000
    """)
    spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR COLUMNS o_orderpriority")
    stats_row = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {name}")
        .filter(F.col("col_name") == "Statistics")
        .select("data_type")
        .first()
    )
    row_count = int(stats_row["data_type"].split(",")[1].strip().split(" ")[0])
    ndv_row = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {name} o_orderpriority")
        .filter(F.col("info_name") == "distinct_count")
        .select("info_value")
        .first()
    )
    ndv = int(ndv_row["info_value"])
    return small_df(spark, 
        [(row_count, ndv)], "row_count bigint, priority_ndv bigint"
    )


@register(
    "dq_referential_integrity",
    category="dq",
    oracle="""
SELECT 'lineitem->orders' AS fk, CAST(count(*) AS BIGINT) AS n_child,
       CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_orphans
FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
UNION ALL
SELECT 'orders->customer', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM orders od LEFT JOIN customer c ON c.c_custkey = od.o_custkey
UNION ALL
SELECT 'lineitem->part', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem l2 LEFT JOIN part p ON p.p_partkey = l2.l_partkey
UNION ALL
SELECT 'lineitem->supplier', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem l3 LEFT JOIN supplier s ON s.s_suppkey = l3.l_suppkey
""",
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema's four foreign
    keys: child row counts and orphan counts (child rows whose parent key
    does not exist) — the pre-flight every warehouse load runs before
    trusting downstream joins.

    Each check is one LEFT join probing the parent's key column only
    (pruned scan, broadcastable parents where small) with a null-count
    aggregate; checks union into a single audit table. At 100 TB the
    orphan probe is the same join the workload runs anyway — auditing
    costs one pass, not a new algorithm."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")

    def check(child, ckey, parent, pkey, name):
        p = parent.select(F.col(pkey).alias("_pk"))
        return (
            child.select(F.col(ckey).alias("_ck"))
            .join(p, F.col("_ck") == F.col("_pk"), "left")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_child"),
                F.sum(F.when(F.col("_pk").isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias("n_orphans"),
            )
            .select(F.lit(name).alias("fk"), "n_child", "n_orphans")
        )

    return (
        check(li, "l_orderkey", orders, "o_orderkey", "lineitem->orders")
        .unionAll(check(orders, "o_custkey", cust, "c_custkey", "orders->customer"))
        .unionAll(check(li, "l_partkey", part, "p_partkey", "lineitem->part"))
        .unionAll(check(li, "l_suppkey", supp, "s_suppkey", "lineitem->supplier"))
    )
