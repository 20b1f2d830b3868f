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
       round(CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             / CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE), 2) AS weighted_avg_price
FROM lineitem GROUP BY l_returnflag
""",
)
def udf_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UDF surface (SURVEY.md §2B: the reference registers none but the
    Arc context carries a udfPlugins registry — TestUtils.scala:80): a
    grouped-aggregate Pandas UDF (Arrow-batched, the only acceptable Python
    path in a hot loop) computing quantity-weighted average price,
    certified against the pure-SQL formulation.

    The UDF accumulates in integer CENTS (prices are a 2-dp grid; the
    rounded int64 products sum exactly), so its result is independent of
    Arrow batch/partition order — a raw float pandas sum would drift with
    physical layout, the q5-at-sf1 bug class. One double division at the
    end mirrors the oracle's expression tree; rounding happens OUTSIDE
    the UDF in Spark SQL (engine-consistent half-up on the double)."""

    @pandas_udf("double")
    def weighted_avg(price: pd.Series, qty: pd.Series) -> float:
        cents = (price * 100).round().astype("int64")
        q = qty.round().astype("int64")
        return float(int((cents * q).sum()) / 100.0 / float(int(q.sum())))

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


@register(
    "agg_approx_percentiles",
    category="aggregation",
    oracle="""
SELECT l_returnflag,
       to_json(quantile_disc(l_extendedprice, [0.25, 0.5, 0.75])) AS approx_pcts
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GK-sketch percentiles — the scale path (single pass, bounded memory,
    mergeable partials). Certified exactly: with ``accuracy`` ≥ the group
    row count the sketch is lossless and ``approx_percentile`` returns the
    exact discrete quantile ≡ DuckDB ``quantile_disc`` (verified element-
    identical at sf0.01). Output serialized with ``to_json`` so the array
    rides through the driver's hash compare as a scalar string."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.to_json(
            F.expr("approx_percentile(l_extendedprice, array(0.25, 0.5, 0.75), 10000000)")
        ).alias("approx_pcts")
    )


@register(
    "array_funcs",
    category="scalar",
    oracle="""
SELECT l_returnflag,
       to_json(list_sort(list(DISTINCT l_linestatus))) AS statuses,
       CAST(len(list(DISTINCT l_linestatus)) AS INT) AS n_statuses
FROM lineitem GROUP BY l_returnflag
""",
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array construction/sort/size (collect_set sorted for determinism;
    serialized via ``to_json`` — JSON string-array formatting is
    byte-identical across Spark/Jackson and DuckDB, and scalar strings are
    hashable by the driver's pandas-based compare)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.to_json(F.sort_array(F.collect_set("l_linestatus"))).alias("statuses"),
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


@register(
    "lateral_explode_tokens",
    category="scalar",
    oracle=r"""
SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
FROM documents WHERE doc_id < 20 AND length(trim(text)) > 0
""",
)
def lateral_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator/lateral surface: explode one row into N (the
    table-function shape; Python UDTFs compile to the same plan node)."""
    d = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 20) & (F.length(F.trim("text")) > 0)
    )
    return d.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("token")
    )


@register(
    "agg_minmax_by",
    category="aggregation",
    oracle="""
SELECT o_orderpriority,
       arg_max(o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey) AS top_order,
       arg_min(o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey) AS bottom_order
FROM orders GROUP BY o_orderpriority
""",
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (argmax/argmin) — ordering key is price-in-cents
    composed with the unique order key, so the winner is total-order
    deterministic in both engines."""
    o = load_table(spark, sf_dir, "orders")
    ordkey = (
        F.round(F.col("o_totalprice") * 100).cast("bigint") * F.lit(10000000)
        + F.col("o_orderkey")
    )
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", ordkey).alias("top_order"),
        F.min_by("o_orderkey", ordkey).alias("bottom_order"),
    )


@register(
    "map_funcs",
    category="scalar",
    oracle="""
SELECT event_id,
       '{"type":"' || event_type || '","k":"' || json_extract_string(props, '$.k') || '"}'
         AS attrs_json,
       '["type","k"]' AS attr_keys_json,
       2 AS n_attrs,
       event_type AS type_via_map
FROM events WHERE event_id < 100
""",
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type surface: build maps from event attrs, access/keys/size.
    The map itself is certified through its ``to_json`` serialization
    (insertion-ordered, no whitespace) — the oracle reconstructs the same
    JSON string from the raw columns, so the map semantics are value-checked
    without relying on engine-specific map literals."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    m = F.create_map(
        F.lit("type"), F.col("event_type"), F.lit("k"), F.get_json_object("props", "$.k")
    )
    return e.select(
        "event_id",
        F.to_json(m).alias("attrs_json"),
        F.to_json(F.map_keys(m)).alias("attr_keys_json"),
        F.size(m).alias("n_attrs"),
        m.getItem("type").alias("type_via_map"),
    )


@register(
    "array_higher_order",
    category="scalar",
    oracle="""
WITH q AS (
  SELECT l_orderkey,
         list(CAST(l_quantity AS INT) ORDER BY l_linenumber, CAST(l_quantity AS INT)) AS qs
  FROM lineitem WHERE l_orderkey < 5000 GROUP BY l_orderkey)
SELECT l_orderkey,
       CAST(len(list_filter(qs, x -> x > 25)) AS INT) AS n_big,
       len(list_filter(qs, x -> x = 50)) > 0 AS any_max,
       len(list_filter(qs, x -> NOT (x > 0))) = 0 AS all_pos,
       CAST(list_sum(qs) AS BIGINT) AS total_qty,
       to_json(list_transform(qs, x -> x * 2)) AS doubled_json
FROM q
""",
)
def array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array function battery — transform / filter / exists /
    forall / aggregate (reduce) over per-order quantity arrays, the lambda
    surface Catalyst compiles to codegen'd loops (never Python).

    Arrays are assembled in (l_linenumber, quantity) order — the fixture
    reuses line numbers within an order, so the quantity tiebreak makes the
    element order a total one on both engines; quantities are exact ints,
    the reduce is an integer fold, and the transformed array is serialized
    via to_json for a scalar, hashable certification."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 5000)
    grouped = li.groupBy("l_orderkey").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("l_linenumber"), F.col("l_quantity").cast("int").alias("q"))
                )
            ),
            lambda p: p.q,
        ).alias("qs")
    )
    return grouped.select(
        "l_orderkey",
        F.size(F.filter("qs", lambda x: x > 25)).alias("n_big"),
        F.exists("qs", lambda x: x == 50).alias("any_max"),
        F.forall("qs", lambda x: x > 0).alias("all_pos"),
        F.aggregate("qs", F.lit(0).cast("bigint"), lambda acc, x: acc + x).alias(
            "total_qty"
        ),
        F.to_json(F.transform("qs", lambda x: x * 2)).alias("doubled_json"),
    )


@register(
    "agg_bitwise_bool",
    category="aggregation",
    oracle="""
SELECT event_type,
       bit_and(user_id) AS uid_and,
       bit_or(user_id) AS uid_or,
       bit_xor(user_id) AS uid_xor,
       bool_and(value >= 0) AS all_nonneg,
       bool_or(value > 100) AS any_large
FROM events GROUP BY event_type
""",
)
def agg_bitwise_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise (BIT_AND/OR/XOR) and boolean (BOOL_AND/OR, i.e. EVERY/ANY)
    aggregates per group — both families are commutative-associative, so
    they map-side combine and are partition-order-free by algebra (no
    rounding needed, unlike float sums)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.bit_and("user_id").alias("uid_and"),
        F.bit_or("user_id").alias("uid_or"),
        F.bit_xor("user_id").alias("uid_xor"),
        F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
        F.bool_or(F.col("value") > 100).alias("any_large"),
    )


@register(
    "udf_scalar_arrow",
    category="udf",
    oracle=r"""
SELECT doc_id,
       regexp_replace(lower(text), '[aeiou]', '', 'g') AS devoweled,
       CAST(length(regexp_replace(lower(text), '[aeiou]', '', 'g')) AS INT) AS n_left
FROM documents
""",
)
def udf_scalar_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCALAR vectorized Python UDF (pandas_udf, Series → Series over the
    Arrow transport) — completes the Python-surface triad next to the
    grouped-agg pandas UDF and the applyInPandas grouped map. The kernel
    is a deterministic string rewrite so the certification is exact; the
    oracle is the same rewrite in SQL.

    Arrow batching amortizes the Python boundary to per-batch cost — the
    only acceptable shape for scalar Python at scale (a row-at-a-time
    Python UDF would be 10-100x slower and is deliberately absent from
    this library)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def devowel(s: pd.Series) -> pd.Series:
        return s.str.lower().str.replace(r"[aeiou]", "", regex=True)

    docs = load_table(spark, sf_dir, "documents")
    out = docs.select("doc_id", devowel(F.col("text")).alias("devoweled"))
    return out.select("doc_id", "devoweled", F.length("devoweled").alias("n_left"))


@register(
    "udf_map_in_arrow",
    category="udf",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(round(l_extendedprice * 100) AS BIGINT)
         * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS net_c4,
       CAST(l_quantity AS BIGINT) AS qty_int
FROM lineitem WHERE l_orderkey < 1000
""",
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow — the zero-copy Arrow-native Python surface (RecordBatch
    in, RecordBatch out; no pandas materialization, no object boxing).
    Completes the Python execution matrix next to pandas_udf scalar /
    grouped-agg / applyInPandas / mapInPandas / UDTF. The kernel runs
    pyarrow.compute (C++ vectorized) on each batch, so per-row Python cost
    is zero — the cheapest possible Python escape hatch for kernels that
    are already Arrow-expressible. Net price is computed in exact integer
    hundredths-of-cents (prices/discounts are 2-decimal values, so
    price*100 and discount*100 are within an ulp of integers — never near
    a rounding boundary), the repo's standard cross-engine float
    discipline."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def kernel(batches):
        for b in batches:
            price_c = pc.cast(
                pc.round(pc.multiply(b.column("l_extendedprice"), pa.scalar(100.0))),
                pa.int64(),
            )
            disc_c = pc.cast(
                pc.round(pc.multiply(b.column("l_discount"), pa.scalar(100.0))),
                pa.int64(),
            )
            net = pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_c))
            qty = pc.cast(b.column("l_quantity"), pa.int64())
            yield pa.RecordBatch.from_arrays(
                [b.column("l_orderkey"), b.column("l_linenumber"), net, qty],
                names=["l_orderkey", "l_linenumber", "net_c4", "qty_int"],
            )

    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 1000)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_quantity")
    )
    return li.mapInArrow(
        kernel,
        "l_orderkey bigint, l_linenumber int, net_c4 bigint, qty_int bigint",
    )


@register(
    "xml_funcs",
    category="scalar",
    oracle="""
SELECT event_id, event_id AS k_back, event_type AS t_back,
       CAST(NULL AS BIGINT) AS absent_is_null
FROM events WHERE event_id < 3000
""",
)
def xml_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 native XML: build a well-formed XML string per row, parse it
    back with from_xml under an explicit schema, and extract typed fields —
    a missing element yields NULL, mirroring the JSON/variant contract.
    Certified as a round-trip: the oracle states the expected fields
    directly, so a parser that mis-handles nesting, types, or absent
    elements cannot pass. XML lands as a first-class format next to
    CSV/JSON/parquet (per-row functions here; spark-xml file source is the
    same parser)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 3000)
    xml = F.concat(
        F.lit("<r><k>"), F.col("event_id").cast("string"),
        F.lit("</k><t>"), F.col("event_type"), F.lit("</t></r>"),
    )
    parsed = F.from_xml(xml, "k BIGINT, t STRING, missing BIGINT")
    return ev.select(
        "event_id",
        parsed.getField("k").alias("k_back"),
        parsed.getField("t").alias("t_back"),
        parsed.getField("missing").alias("absent_is_null"),
    )


@register(
    "csv_funcs",
    category="scalar",
    oracle="""
SELECT event_id, event_type AS type_back, props AS props_back,
       value AS value_back
FROM events WHERE event_id < 3000
""",
)
def csv_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row CSV functions: to_csv serializes a struct (the props column
    is JSON text containing commas and double quotes, forcing the writer
    through quoting + quote-doubling), from_csv parses it back under an
    explicit schema. Certified as a full round-trip against the identity
    oracle — any quoting/escaping/type-coercion defect breaks the match.
    Doubles survive because Java's shortest-repr toString parses back to
    the identical bits."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 3000)
    line = F.to_csv(F.struct("event_id", "event_type", "props", "value"))
    parsed = F.from_csv(
        line, F.lit("event_id bigint, event_type string, props string, value double")
    )
    return ev.select(
        "event_id",
        parsed.getField("event_type").alias("type_back"),
        parsed.getField("props").alias("props_back"),
        parsed.getField("value").alias("value_back"),
    )


@register(
    "join_null_semantics",
    category="join",
    oracle="""
WITH a AS (
  SELECT event_id, CASE WHEN user_id % 10 = 0 THEN NULL ELSE user_id END AS k
  FROM events WHERE event_id < 200),
b AS (
  SELECT event_id, CASE WHEN user_id % 10 = 0 THEN NULL ELSE user_id END AS k
  FROM events WHERE event_id >= 200 AND event_id < 400)
SELECT
  CAST((SELECT count(*) FROM a JOIN b ON a.k = b.k) AS BIGINT) AS n_inner,
  CAST((SELECT count(*) FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k) AS BIGINT)
    AS n_nullsafe,
  CAST((SELECT count(*) FROM a WHERE k IS NULL) AS BIGINT) AS n_left_nullkeys
""",
)
def join_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-key join semantics, certified: a plain equi-join DROPS null
    keys (SQL three-valued logic), the null-safe operator (<=> / IS NOT
    DISTINCT FROM) matches them — the difference between the two counts is
    exactly the null×null cross term, a silent row-loss (or row-explosion)
    bug class in ETL merges. Null-safe joins still hash-partition (null is
    one key), so the plan stays an equi-join, not a nested loop."""
    ev = load_table(spark, sf_dir, "events")
    key = F.when(F.col("user_id") % 10 == 0, F.lit(None)).otherwise(F.col("user_id"))
    a = ev.filter(F.col("event_id") < 200).select(F.col("event_id").alias("ea"), key.alias("ka"))
    b = ev.filter((F.col("event_id") >= 200) & (F.col("event_id") < 400)).select(
        F.col("event_id").alias("eb"), key.alias("kb")
    )
    n_inner = a.join(b, a["ka"] == b["kb"]).agg(F.count(F.lit(1)).alias("n_inner"))
    n_nullsafe = a.join(b, a["ka"].eqNullSafe(b["kb"])).agg(
        F.count(F.lit(1)).alias("n_nullsafe")
    )
    n_nullkeys = a.filter(F.col("ka").isNull()).agg(
        F.count(F.lit(1)).alias("n_left_nullkeys")
    )
    return (
        n_inner.crossJoin(n_nullsafe)
        .crossJoin(n_nullkeys)
        .select(
            F.col("n_inner").cast("bigint").alias("n_inner"),
            F.col("n_nullsafe").cast("bigint").alias("n_nullsafe"),
            F.col("n_left_nullkeys").cast("bigint").alias("n_left_nullkeys"),
        )
    )


@register(
    "json_malformed_audit",
    category="scalar",
    oracle="""
WITH j AS (
  SELECT event_id,
         CASE WHEN event_id % 10 = 0
              THEN substr(props, 1, length(props) - 1)
              ELSE props END AS s
  FROM events),
parsed AS (
  SELECT event_id,
         CASE WHEN json_valid(s) THEN CAST(json_extract(s, '$.k') AS INT) END AS k,
         NOT json_valid(s) AS is_corrupt
  FROM j)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN is_corrupt THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
       CAST(sum(CASE WHEN NOT is_corrupt THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
       CAST(sum(k) AS BIGINT) AS sum_k
FROM parsed
""",
)
def json_malformed_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-record handling for schema-on-read JSON: 10% of the payloads
    are truncated (simulating upstream corruption), and the audit counts
    parse failures vs successes plus an aggregate over the surviving field
    — the PERMISSIVE-mode contract (from_json returns NULL on malformed
    input instead of failing the job) that every landing-zone pipeline
    relies on.

    The corruption is deterministic (id-keyed), parsing is the JVM JSON
    reader (never Python), and all outputs are integer counts — exact on
    both engines."""
    ev = load_table(spark, sf_dir, "events")
    s = F.when(
        F.col("event_id") % 10 == 0,
        F.expr("substring(props, 1, length(props) - 1)"),
    ).otherwise(F.col("props"))
    parsed = ev.select(
        F.from_json(s, "k INT").alias("p"),
    )
    k = F.col("p.k")
    is_corrupt = F.col("p").isNull() | k.isNull()
    return parsed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.when(is_corrupt, 1).otherwise(0)).cast("bigint").alias("n_corrupt"),
        F.sum(F.when(~is_corrupt, 1).otherwise(0)).cast("bigint").alias("n_valid"),
        F.sum(k).cast("bigint").alias("sum_k"),
    )


@register(
    "agg_percentile_cont",
    category="aggregation",
    oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.5), 6) AS p50_qty,
       round(quantile_cont(l_quantity, 0.95), 6) AS p95_qty,
       round(quantile_cont(l_extendedprice, 0.5), 6) AS p50_price
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_percentile_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated (continuous) percentiles — the exact PERCENTILE_CONT
    semantics, complementing the discrete-quantile family: both engines
    interpolate linearly between the two adjacent order statistics, and
    6-dp rounding absorbs the one-ulp difference between the two
    algebraically-equal interpolation forms. Exact percentile() is a
    full-sort-per-group aggregate — the scale default remains the
    approx_percentile sketch (certified separately)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("p50_qty"),
        F.round(F.expr("percentile(l_quantity, 0.95)"), 6).alias("p95_qty"),
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("p50_price"),
    )
