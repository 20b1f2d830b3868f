"""Second wave of TPC-H-shaped analytical queries (Q7/Q8/Q9/Q13/Q15/Q17/Q19/Q21/Q22).

Adapted to the fixture star schema (no partsupp table, no commit/receipt
dates, single-word p_type, 1995-2001 date range) while preserving each
query's *plan shape* — the thing that matters at 100 TB:

- Q7/Q8/Q9: fact-side revenue rollups where every dimension (nation, region,
  part-subset, supplier) broadcasts and the only big shuffle is the final
  group-by on a low-cardinality composite key.
- Q13: outer join + double aggregation (count-of-counts distribution).
- Q15: scalar-max semi-reduction joined back against an aggregate view.
- Q17: per-group scalar threshold (avg) applied back to the fact rows —
  expressed as aggregate-then-rejoin, never a correlated rescan.
- Q19: disjunctive pushdown — OR-of-ANDs predicate over a broadcast dim.
- Q21: multi-EXISTS (semi + anti) self-joins co-partitioned on the order key.
- Q22: scalar subquery threshold + NOT EXISTS anti-join.

Determinism: all revenue sums use exact DECIMAL(18,6) accumulation (cast per
row from the identical double product both engines compute, summed
associatively) and only convert to rounded double at the end, per the
project's cross-engine rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arc_cassandra_pipeline_plugin_spark.queries import register
from arc_cassandra_pipeline_plugin_spark.sources import load_table


def _rev_dec(price="l_extendedprice", disc="l_discount"):
    """Exact decimal revenue term: the double product is row-deterministic,
    the decimal sum is associative (partition-order independent)."""
    return (F.col(price) * (1 - F.col(disc))).cast("decimal(18,6)")


_REV_DEC_SQL = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))"


@register(
    "q7_volume_shipping",
    category="tpch",
    oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       CAST(round(sum({_REV_DEC_SQL}), 2) AS DOUBLE) AS revenue
FROM supplier
JOIN lineitem ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
""",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bilateral trade volume between two
    nations by year.

    Plan shape: nation (25 rows) broadcasts twice; supplier (tiny)
    broadcasts; the nation filter semi-reduces supplier and customer BEFORE
    they touch the fact tables, so the only large work is one
    lineitem-orders shuffle join and a 6-group aggregate. Spec:
    reference delegates all query semantics to the engine
    (CassandraExtract.scala registers views; SQLTransform runs SQL)."""
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    supp = (
        load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .select("s_suppkey", "supp_nation")
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .select("c_custkey", "cust_nation")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(_rev_dec()), 2).cast("double").alias("revenue"))
    )


@register(
    "q8_market_share",
    category="tpch",
    oracle=f"""
SELECT year(o_orderdate) AS o_year,
       round(CAST(sum(CASE WHEN n2.n_name = 'NATION_5' THEN {_REV_DEC_SQL}
                           ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / CAST(sum({_REV_DEC_SQL}) AS DOUBLE), 4) AS mkt_share
FROM lineitem
JOIN part     ON p_partkey  = l_partkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey  = o_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region    ON n1.n_regionkey = r_regionkey
JOIN supplier  ON s_suppkey = l_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY year(o_orderdate)
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): NATION_5's share of ECONOMY-part
    revenue sold into ASIA, by order year.

    Plan shape: part is filtered to 1/6 of rows and broadcast; region→nation
    →customer semi-reduction happens dim-side before the fact join; supplier
    nation lookup broadcasts. One fact shuffle (lineitem⋈orders), 2-group
    aggregate. The share division happens after exact decimal sums."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust_asia = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
                ).select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    supp_nation = (
        load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(
            F.broadcast(
                nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name"))
            ),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    rev = _rev_dec()
    nation5 = F.when(F.col("supp_nation") == "NATION_5", rev).otherwise(
        F.lit(0).cast("decimal(18,6)")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust_asia), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(nation5).cast("double") / F.sum(rev).cast("double"), 4
            ).alias("mkt_share")
        )
    )


@register(
    "q9_product_type_profit",
    category="tpch",
    oracle=f"""
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       CAST(round(sum({_REV_DEC_SQL}), 2) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON p_partkey  = l_partkey
JOIN supplier ON s_suppkey  = l_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON o_orderkey = l_orderkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, year(o_orderdate)
""",
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product type profit) by supplier nation and year.

    The fixture has no partsupp/supplycost, so profit degrades to revenue —
    the plan shape is Q9's: a LIKE-filtered part broadcast prunes lineitem,
    supplier+nation broadcast, one fact shuffle to orders, 175-group agg."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "n_name")
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(_rev_dec()), 2).cast("double").alias("sum_profit"))
    )


@register(
    "q13_customer_distribution",
    category="tpch",
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
""",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution): outer join preserving
    order-less customers, then a count-of-counts.

    Plan shape: the join-condition filter (priority) is applied to orders
    BEFORE the outer join (Catalyst pushes it to the scan — it is on the
    null-producing side's own columns); first aggregate shuffles on
    c_custkey, second on the tiny c_count domain. All-integer → exact."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders")
    joined = cust.join(
        orders.filter(F.col("o_orderpriority") != "1-URGENT").select(
            "o_custkey", "o_orderkey"
        ),
        F.col("c_custkey") == F.col("o_custkey"),
        "left",
    )
    return (
        joined.groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@register(
    "q15_top_supplier",
    category="tpch",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, sum({_REV_DEC_SQL}) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, round(CAST(total_rev AS DOUBLE), 2) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_rev = (SELECT max(total_rev) FROM revenue)
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): quarterly revenue view, then the supplier(s)
    achieving the global max.

    Plan shape: one shuffle to build the per-supplier aggregate; the global
    max is a 1-row aggregate broadcast back (never a global sort); supplier
    joins by broadcast. Max equality compares exact decimals — ties (all
    maxima) are kept, matching the SQL."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev_dec()).alias("total_rev")
    )
    mx = revenue.agg(F.max("total_rev").alias("mx"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(mx), F.col("total_rev") == F.col("mx"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_rev").cast("double"), 2).alias("total_revenue"),
        )
    )


@register(
    "q17_small_quantity_revenue",
    category="tpch",
    oracle="""
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 2)
       AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN (
  SELECT l_partkey AS agg_pk, count(*) AS part_cnt,
         sum(CAST(l_quantity AS DECIMAL(18,2))) AS part_qty
  FROM lineitem GROUP BY l_partkey
) ON agg_pk = l_partkey
WHERE p_brand = 'Brand#3'
  AND CAST(l_quantity AS DECIMAL(18,2)) * 5 * part_cnt < part_qty
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): lineitems below 20% of
    their part's average quantity, for one brand.

    The correlated scalar subquery becomes aggregate-then-rejoin (one
    lineitem pass builds per-part (count, qty-sum); rejoined on l_partkey —
    a co-partitioned shuffle, never a per-row rescan). The threshold
    `qty < 0.2 * avg` is evaluated as `qty * 5 * cnt < sum` in exact
    decimals: no division, no float boundary."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("agg_pk")).agg(
        F.count(F.lit(1)).alias("part_cnt"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("part_qty"),
    )
    brand = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#3")
        .select("p_partkey")
    )
    return (
        li.join(F.broadcast(brand), F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part, F.col("agg_pk") == F.col("l_partkey"))
        .filter(
            F.col("l_quantity").cast("decimal(18,2)") * 5 * F.col("part_cnt")
            < F.col("part_qty")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
                / 7.0,
                2,
            ).alias("avg_yearly")
        )
    )


@register(
    "q19_disjunctive_revenue",
    category="tpch",
    oracle=f"""
SELECT CAST(round(sum({_REV_DEC_SQL}), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
""",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue, disjunctive predicates): OR-of-ANDs
    across both sides of a broadcast join.

    Plan shape: the part-only disjuncts (brand ∈ {1,2,3}, size ≤ 35) are
    derivable and pushed to the broadcast side; the residual mixed predicate
    evaluates post-join inside codegen. Single row out — no shuffle at all
    beyond the final 1-group aggregate."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(F.round(F.sum(_rev_dec()), 2).cast("double").alias("revenue"))
    )


@register(
    "q21_suppliers_kept_waiting",
    category="tpch",
    oracle="""
WITH flagged AS (
  SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
  FROM lineitem l1
  JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
  WHERE l1.l_returnflag = 'R'
    AND EXISTS (SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM lineitem l3
                    WHERE l3.l_orderkey = l1.l_orderkey
                      AND l3.l_suppkey <> l1.l_suppkey
                      AND l3.l_returnflag = 'R')
)
SELECT s_name, count(*) AS numwait
FROM flagged JOIN supplier ON s_suppkey = l_suppkey
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 25
""",
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): the classic
    EXISTS + NOT EXISTS double self-join on the fact table.

    The fixture lacks commit/receipt dates, so "late" is proxied by
    l_returnflag = 'R'; the plan shape is Q21's: both correlated EXISTS
    become left_semi / left_anti self-joins on l_orderkey — all three
    lineitem legs shuffle-partition on the SAME key, so at scale they
    co-locate into one exchange reuse; supplier broadcasts; top-25 via
    TakeOrderedAndProject on (numwait desc, s_name)."""
    li = load_table(spark, sf_dir, "lineitem")
    l1 = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    f_orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("l2_ok"), F.col("l_suppkey").alias("l2_sk")
    )
    l3 = l1.select(
        F.col("l_orderkey").alias("l3_ok"), F.col("l_suppkey").alias("l3_sk")
    )
    flagged = (
        l1.join(f_orders, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .join(
            l2,
            (F.col("l_orderkey") == F.col("l2_ok"))
            & (F.col("l_suppkey") != F.col("l2_sk")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("l3_ok"))
            & (F.col("l_suppkey") != F.col("l3_sk")),
            "left_anti",
        )
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        flagged.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(25)
    )


@register(
    "q22_global_sales_opportunity",
    category="tpch",
    oracle="""
WITH pos AS (
  SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS bal_sum, count(*) AS bal_cnt
  FROM customer WHERE c_acctbal > 0.0
)
SELECT substr(c_name, length(c_name) - 1, 2) AS cntrycode,
       count(*) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer, pos
WHERE CAST(c_acctbal AS DECIMAL(18,2)) * bal_cnt > bal_sum
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY substr(c_name, length(c_name) - 1, 2)
""",
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): above-average-balance
    customers with no recent orders, grouped by a name-derived code.

    The scalar "average balance" subquery is a 1-row aggregate broadcast
    back as (sum, count); the threshold `bal > avg` is evaluated as
    `bal * cnt > sum` in exact decimals (no division, no float boundary).
    The recency NOT EXISTS is a left_anti join against date-filtered orders
    (filter pushed to the orders scan). Group key = last-2 chars of c_name
    (the fixture has no phone column)."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    pos = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).alias("bal_sum"),
            F.count(F.lit(1)).alias("bal_cnt"),
        )
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(pos))
        .filter(F.col("c_acctbal").cast("decimal(18,2)") * F.col("bal_cnt") > F.col("bal_sum"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(
            F.expr("substring(c_name, length(c_name) - 1, 2)").alias("cntrycode")
        )
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )


@register(
    "q2_min_price_supplier",
    category="tpch",
    oracle="""
WITH offers AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice) AS offer_price
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
parts AS (SELECT p_partkey FROM part WHERE p_type = 'LARGE' AND p_size < 25),
mins AS (
  SELECT l_partkey AS mp, min(offer_price) AS best
  FROM offers JOIN parts ON p_partkey = l_partkey GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, s_name, n_name,
       round(best, 2) AS min_offer_price
FROM offers
JOIN mins ON l_partkey = mp AND offer_price = best
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
""",
)
def q2_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): for each part in a
    type/size subset, the supplier(s) offering the lowest price.

    The fixture has no partsupp, so the offer book derives from lineitem
    (per (part, supplier) min line price). The correlated `= (SELECT
    min(...))` becomes aggregate-then-rejoin on the part key — one offers
    shuffle reused by both sides, broadcast part filter, broadcast
    supplier/nation decoration. Min compares RAW stored doubles (no
    arithmetic → no rounding boundary); all tied suppliers survive, as in
    the spec."""
    li = load_table(spark, sf_dir, "lineitem")
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("offer_price")
    )
    parts = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_type") == "LARGE") & (F.col("p_size") < 25))
        .select("p_partkey")
    )
    offers_f = offers.join(
        F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey")
    ).drop("p_partkey")
    mins = offers_f.groupBy(F.col("l_partkey").alias("mp")).agg(
        F.min("offer_price").alias("best")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_name", "s_nationkey")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "n_name")
    )
    return (
        offers_f.join(
            mins,
            (F.col("l_partkey") == F.col("mp"))
            & (F.col("offer_price") == F.col("best")),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_name",
            "n_name",
            F.round("best", 2).alias("min_offer_price"),
        )
    )


@register(
    "q11_important_parts",
    category="tpch",
    oracle=f"""
WITH v AS (
  SELECT l_partkey, sum({_REV_DEC_SQL}) AS part_value
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON n_nationkey = s_nationkey AND n_name = 'NATION_3'
  GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey,
       round(CAST(part_value AS DOUBLE), 2) AS part_value
FROM v
WHERE part_value * 2000 > (SELECT sum(part_value) FROM v)
""",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock identification): parts whose value
    through one nation's suppliers exceeds a fraction of that nation's
    total — the scalar-subquery-in-HAVING pattern.

    Value per part aggregates once (exact decimals); the nation total is a
    1-row re-aggregate of the SAME frame broadcast back — the fraction
    threshold `> 0.05% of total` is evaluated as `value * 2000 > total` in
    exact integer-scaled decimals (no float boundary). Supplier/nation
    broadcast; one fact shuffle on l_partkey."""
    nation3 = (
        load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").filter(
                    F.col("n_name") == "NATION_3"
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    v = (
        li.join(F.broadcast(nation3), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_rev_dec()).alias("part_value"))
    )
    total = v.agg(F.sum("part_value").alias("nation_total"))
    return (
        v.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") * 2000 > F.col("nation_total"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("part_value").cast("double"), 2).alias("part_value"),
        )
    )


@register(
    "q16_supplier_cardinality",
    category="tpch",
    oracle="""
WITH complaints AS (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7%')
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9, 13)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM complaints)
GROUP BY p_brand, p_type, p_size
""",
)
def q16_supplier_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (part/supplier relationship): distinct supplier
    counts per part attribute group, excluding black-listed suppliers via
    NOT IN (→ left_anti against a broadcast list).

    The part filter broadcasts (4 sizes, brand exclusion); the anti-join
    side is tiny; the only big operation is one distinct-count shuffle on
    the (brand, type, size) grid. All-integer → exact."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 5, 9, 13))
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    complaints = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_name").like("%7%"))
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(complaints),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_excess_suppliers",
    category="tpch",
    oracle="""
WITH blue_parts AS (SELECT p_partkey FROM part WHERE p_name LIKE 'blue%'),
moved AS (
  SELECT l_suppkey, l_partkey, sum(l_quantity) AS qty
  FROM lineitem JOIN blue_parts ON p_partkey = l_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
  GROUP BY l_suppkey, l_partkey
  HAVING sum(l_quantity) > 50
)
SELECT DISTINCT s_suppkey, s_name, n_name
FROM supplier
JOIN moved  ON l_suppkey = s_suppkey
JOIN nation ON n_nationkey = s_nationkey
""",
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (excess-volume suppliers): the nested semi-join
    chain — part name filter → half-year per-(supplier, part) volume
    threshold → distinct suppliers decorated with nation.

    Each link shrinks before the next join touches it: the part filter
    broadcasts into the date-pruned fact scan, the HAVING aggregate
    reduces to qualifying (supplier, part) pairs, and only the surviving
    supplier keys reach the dimension join. Quantity sums are exact at the
    fixture's integer quantities (sum of doubles holding integer values —
    exact for any order below 2^53)."""
    blue = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("blue%"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    moved = (
        li.join(F.broadcast(blue), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        supp.join(moved, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    )
