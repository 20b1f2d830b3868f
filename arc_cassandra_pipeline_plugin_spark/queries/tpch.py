"""Headline analytical queries (TPC-H-shaped) over the fixture star schema.

These are the bench workload: multi-table joins, large aggregations, top-k.
Plans to expect (verified in tests/test_plans.py): parquet scans with pushed
filters and pruned columns, broadcast joins for the fixed-cardinality dims
(region/nation), AQE-selected strategies elsewhere, single shuffle per
aggregation via partial aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arc_cassandra_pipeline_plugin_spark.queries import register
from arc_cassandra_pipeline_plugin_spark.sources import load_table


@register(
    "q1_pricing_summary",
    category="aggregation",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)          AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)     AS sum_base_price,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2)
            AS DOUBLE)                                                 AS sum_disc_price,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                           AS DECIMAL(18,6))), 2) AS DOUBLE)           AS sum_charge,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 4)                            AS avg_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 4)                            AS avg_price,
       round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 4)                            AS avg_disc,
       count(*)                                                        AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: scan-heavy groupBy/agg on lineitem.

    Flagship query. Two-level exact aggregation — decimal-exact output at
    vectorized-long speed (the r9 all-decimal rewrite was order-free but
    put a BigDecimal accumulator in the per-row hot loop; this buys that
    cost back with identical output):

    1. Per-partition LONG partials: ``groupBy(keys, spark_partition_id)``
       summing integer CENTS / MICROS — pure int64 whole-stage codegen
       for every data row, and because all rows of a hash-agg partition
       share one pid, the map-side partial collapses each partition to
       ≤|groups| rows before any shuffle (the shuffle moves ~6×P tiny
       rows).
    2. Order-free merge: the ≤partitions×groups partials are summed as
       DECIMAL(38,0) — integer decimal addition is exact in any order —
       then scaled down by ONE exact decimal division (result scale 6 ≥
       the value's 2/6 fractional digits, so no rounding) and cast to
       double, which is bit-identical to the oracle's
       ``CAST(sum(DECIMAL) AS DOUBLE)``.

    Exactness of the long grid: all four money columns are 2-dp values,
    so ``round(x*100)::BIGINT`` recovers the exact cents (certified
    registry cents convention), and the true products
    price·(1−disc) / price·(1−disc)·(1+tax) lie ON the 4/6-dp grid —
    micros are exactly ``p_c·(100−d_c)·100`` and ``p_c·(100−d_c)·(100+t_c)``
    in int64 (≤ ~1.2e11/row). The certified per-row DECIMAL(18,6) cast of
    the double product equals that same grid point (double product error
    ~1e-11 ≪ 5e-7 half-grid), so the sums are identical to the oracle's.

    Overflow headroom: per-partition micros sum ≤ rows/partition × 1.2e11;
    int64-safe below ~7e7 rows per partition — a 128 MB parquet split of
    lineitem is ~1–6M rows, 10×+ margin; the merge is DECIMAL(38,0), safe
    at any scale. Plan: pushed shipdate filter, two tiny shuffles
    (keys+pid, then keys), all per-row work in one codegen stage."""
    li = load_table(spark, sf_dir, "lineitem")
    l100 = F.lit(100).cast("bigint")
    p_c = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    q_c = F.round(F.col("l_quantity") * 100).cast("bigint")
    d_c = F.round(F.col("l_discount") * 100).cast("bigint")
    t_c = F.round(F.col("l_tax") * 100).cast("bigint")
    dp_u = p_c * (l100 - d_c) * l100
    ch_u = p_c * (l100 - d_c) * (l100 + t_c)
    part = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus", F.spark_partition_id().alias("_pid"))
        .agg(
            F.sum(q_c).alias("qty_c"),
            F.sum(p_c).alias("price_c"),
            F.sum(d_c).alias("disc_c"),
            F.sum(dp_u).alias("dp_u"),
            F.sum(ch_u).alias("ch_u"),
            F.count(F.lit(1)).alias("n"),
        )
    )

    def dec_sum(c: str):
        return F.sum(F.col(c).cast("decimal(38,0)")).alias(c)

    tot = part.groupBy("l_returnflag", "l_linestatus").agg(
        dec_sum("qty_c"), dec_sum("price_c"), dec_sum("disc_c"),
        dec_sum("dp_u"), dec_sum("ch_u"), F.sum("n").alias("n"),
    )
    sum_qty_d = (F.col("qty_c") / F.lit(100)).cast("double")
    sum_price_d = (F.col("price_c") / F.lit(100)).cast("double")
    n_d = F.col("n").cast("double")
    return tot.select(
        "l_returnflag",
        "l_linestatus",
        sum_qty_d.alias("sum_qty"),
        sum_price_d.alias("sum_base_price"),
        F.round(F.col("dp_u") / F.lit(1000000), 2).cast("double").alias("sum_disc_price"),
        F.round(F.col("ch_u") / F.lit(1000000), 2).cast("double").alias("sum_charge"),
        F.round(sum_qty_d / n_d, 4).alias("avg_qty"),
        F.round(sum_price_d / n_d, 4).alias("avg_price"),
        F.round((F.col("disc_c") / F.lit(100)).cast("double") / n_d, 4).alias("avg_disc"),
        F.col("n").alias("count_order"),
    )


@register(
    "q3_shipping_priority",
    category="join",
    oracle="""
SELECT l_orderkey,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
       o_orderdate
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: selective 3-way join → agg → total-order top-k.

    The customer filter is pushed to the scan; the customer→orders join is
    left to AQE (customer grows with SF — a static broadcast hint would be
    wrong at 100 TB); top-k is a TakeOrderedAndProject, not a full sort.
    """
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate"), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    )


@register(
    "q5_local_supplier_volume",
    category="join",
    oracle="""
SELECT n_name,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey  = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
""",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style 6-table join, structured for scale: the region
    selectivity (1 of 5 regions) is pushed into BOTH fact-side inputs
    before any big-big join — customer and supplier are semi-reduced by the
    broadcast ASIA nation set first, so the orders and lineitem joins see
    ~20% of the rows. The fixed-cardinality dims (region=5, nation=25 at
    every SF) broadcast unconditionally; everything that scales with SF is
    left to AQE."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asian_nations = F.broadcast(
        nation.join(region, nation.n_regionkey == region.r_regionkey).select(
            "n_nationkey", "n_name"
        )
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(asian_nations, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_nationkey")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(asian_nations, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "q10_returned_items",
    category="join",
    oracle="""
SELECT c_custkey, c_name,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
       n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style: returned-item revenue per customer, top 20."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "n_name")
    )


@register(
    "sort_limit_topk",
    category="sort",
    oracle="""
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total_price
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 15
""",
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: orderBy+limit compiles to TakeOrderedAndProject —
    per-partition heaps + driver merge, never a full global sort."""
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(15)
        .select(
            "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("total_price")
        )
    )


@register(
    "q6_forecast_revenue",
    category="aggregation",
    oracle="""
SELECT CAST(round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style: pure scan-filter-aggregate — every predicate reaches
    the parquet scan; zero joins, one tiny shuffle for the global sum."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * F.col("l_discount")).cast(
                        "decimal(18,6)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "q12_priority_shipping",
    category="join",
    oracle="""
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
GROUP BY l_returnflag
""",
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-style: join + conditional aggregation (CASE inside SUM)."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q18_large_orders",
    category="join",
    oracle="""
WITH big AS (
  SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
)
SELECT c_custkey, o_orderkey, round(o_totalprice, 2) AS total_price, total_qty
FROM big
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
""",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style: aggregate-then-semi-reduce — the HAVING aggregate
    shrinks lineitem to qualifying orders BEFORE joining orders/customer
    (never join first at 100 TB), then total-order top-k."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .filter(F.col("_qty") > 150)
        .select("l_orderkey", F.round("_qty", 2).alias("total_qty"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    return (
        big.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
        .select(
            "c_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("total_price"), "total_qty"
        )
    )


@register(
    "q4_order_priority",
    category="tpch",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_discount > 0.05)
GROUP BY o_orderpriority
""",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order priority checking): date-bounded orders
    semi-joined to qualifying lineitems (EXISTS ≡ left_semi — no row
    duplication, lineitem never materializes past the join), then a tiny
    5-group aggregate. The fixture lacks commit/receipt dates, so the
    EXISTS predicate is a discount threshold; the plan shape is Q4's.
    Filter + EXISTS shrink before any shuffle: the 100 TB-safe order."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    late = load_table(spark, sf_dir, "lineitem").filter(F.col("l_discount") > 0.05)
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q14_promo_effect",
    category="tpch",
    oracle="""
SELECT round(100.00 * sum(CASE WHEN p_type LIKE 'PROMO%'
                               THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= DATE '1995-09-01' AND l_shipdate < DATE '1995-10-01'
""",
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): one month of lineitem joined to part
    (part is the smaller side — broadcast), conditional revenue ratio in a
    single aggregate pass. The shipdate filter is pushed to the scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-09-01") & (F.col("l_shipdate") < "1995-10-01")
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_revenue"))
    )
