"""Scale-strategy features: bucketed co-located joins (no shuffle),
skew-salted joins, Observation-based write metrics."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from arc_cassandra_pipeline_plugin_spark.context import PipelineContext
from arc_cassandra_pipeline_plugin_spark.operators.skew import salted_join
from arc_cassandra_pipeline_plugin_spark.plans import explain_str
from arc_cassandra_pipeline_plugin_spark.stages import (
    ParquetExtract,
    ParquetLoad,
    TableExtract,
    TableLoad,
)
from tests.conftest import SF_SMALL


def test_bucketed_join_has_no_shuffle(spark, ctx):
    """Two tables bucketed on the join key with equal bucket counts join
    with zero Exchange nodes — the co-location strategy that at 100 TB
    removes the dominant shuffle from repeated join workloads."""
    import shutil

    for t in ("orders_bkt", "lineitem_bkt"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"/tmp/spark-graft-warehouse/{t}", ignore_errors=True)
    for src, table, key in [
        ("orders", "orders_bkt", "o_orderkey"),
        ("lineitem", "lineitem_bkt", "l_orderkey"),
    ]:
        ParquetExtract(
            name=f"e_{src}", input_uri=f"{SF_SMALL}/{src}.parquet", output_view=f"{src}_bv"
        ).execute(spark, ctx)
        TableLoad(
            name=f"t_{src}",
            input_view=f"{src}_bv",
            table=table,
            save_mode="Overwrite",
            bucket_by=[key],
            num_buckets=4,
            sort_by=[key],
        ).execute(spark, ctx)

    o = TableExtract(name="xo", table="orders_bkt", output_view="o_b").execute(spark, ctx)
    l = TableExtract(name="xl", table="lineitem_bkt", output_view="l_b").execute(spark, ctx)
    # disable auto-broadcast so the join strategy question is real (at 100 TB
    # neither side of orders⋈lineitem is broadcastable)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        joined = l.join(o, l.l_orderkey == o.o_orderkey).groupBy("o_orderpriority").count()
        plan = explain_str(joined, "simple")
        # exactly ONE shuffle is expected: the 5-value group-by after the
        # join. The join inputs themselves must read bucketed with no
        # Exchange (that's the whole point of co-located bucketing).
        n_shuffles = len(re.findall(r"Exchange hashpartitioning", plan))
        assert "SortMergeJoin" in plan, plan
        assert n_shuffles == 1, f"expected only the post-join agg shuffle:\n{plan}"
        assert "Bucketed: true" in explain_str(joined, "formatted")
        assert joined.count() == 5
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS lineitem_bkt")


def test_salted_join_matches_plain_join(spark):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").select("l_orderkey", "l_quantity")
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    plain = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    salted = salted_join(li, orders, "l_orderkey", "o_orderkey", salt_buckets=4).count()
    assert plain == salted


def test_salted_join_spreads_key_across_buckets(spark):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    salt = (
        (F.xxhash64(*[F.col(c) for c in li.columns]) % 4 + 4) % 4
    ).cast("int")
    n_buckets = li.withColumn("s", salt).select("s").distinct().count()
    assert n_buckets == 4


def test_load_observation_records_metric(spark, ctx, tmp_path):
    ParquetExtract(
        name="e", input_uri=f"{SF_SMALL}/nation.parquet", output_view="nation_obs"
    ).execute(spark, ctx)
    st = ParquetLoad(
        name="l",
        input_view="nation_obs",
        output_uri=str(tmp_path / "obs_out"),
        save_mode="Overwrite",
    )
    st.execute(spark, ctx)
    assert st.stage_detail.as_dict()["records"] == 25


def test_declarative_bucketed_pipeline(spark, ctx):
    """TableLoad/TableExtract are reachable from the declarative config."""
    import shutil

    from arc_cassandra_pipeline_plugin_spark.config import parse_config

    spark.sql("DROP TABLE IF EXISTS region_tbl")
    shutil.rmtree("/tmp/spark-graft-warehouse/region_tbl", ignore_errors=True)
    cfg = {
        "stages": [
            {
                "type": "ParquetExtract",
                "name": "e",
                "inputURI": f"{SF_SMALL}/region.parquet",
                "outputView": "region_bd",
            },
            {
                "type": "TableLoad",
                "name": "t",
                "inputView": "region_bd",
                "table": "region_tbl",
                "saveMode": "Overwrite",
                "bucketBy": ["r_regionkey"],
                "numBuckets": 2,
            },
            {"type": "TableExtract", "name": "x", "table": "region_tbl", "outputView": "region_back"},
        ]
    }
    out = parse_config(cfg, ctx).run(spark, ctx)
    assert out.count() == 5
    spark.sql("DROP TABLE IF EXISTS region_tbl")


def test_partitioned_output_enables_partition_pruning(spark, ctx, tmp_path):
    """Hive-partitioned ParquetLoad output → reads with a partition-key
    filter prune at the directory level (PartitionFilters, no data scan of
    other partitions) — the layout strategy for time-partitioned 100 TB
    corpora."""
    from pyspark.sql import functions as F

    from arc_cassandra_pipeline_plugin_spark.plans import explain_str
    from arc_cassandra_pipeline_plugin_spark.sources import load_table

    out = str(tmp_path / "events_by_type")
    load_table(spark, SF_SMALL, "events").withColumn(
        "type_part", F.col("event_type")
    ).createOrReplaceTempView("events_pp")
    ParquetLoad(
        name="ld",
        input_view="events_pp",
        output_uri=out,
        save_mode="Overwrite",
        partition_by=["type_part"],
        partition_output=True,
    ).execute(spark, ctx)

    pruned = spark.read.parquet(out).filter(F.col("type_part") == "click")
    plan = explain_str(pruned, "formatted")
    assert "PartitionFilters" in plan and "type_part" in plan
    import os

    assert any(d.startswith("type_part=") for d in os.listdir(out))
    assert pruned.count() == spark.read.parquet(out).filter(
        F.col("type_part") == "click"
    ).count()


def test_ensure_parallelism_is_noop_on_multi_file_scan(spark, tmp_path):
    """The documented contract of functions.ensure_parallelism: it exists
    ONLY for the single-file single-row-group fixture pathology — when the
    scan itself yields >= defaultParallelism partitions (any real-scale
    table; locally a split multi-file fixture per tools/gen_split_fixtures
    with maxPartitionBytes sized down), it must return the input DataFrame
    UNCHANGED (no extra shuffle injected)."""
    from pyspark.sql import functions as F

    from arc_cassandra_pipeline_plugin_spark.functions import ensure_parallelism
    from arc_cassandra_pipeline_plugin_spark.sources import load_table
    from tests.conftest import SF_SMALL

    out = str(tmp_path / "documents_split.parquet")
    load_table(spark, SF_SMALL, "documents").repartition(64).write.parquet(out)

    confs = {
        "spark.sql.files.maxPartitionBytes": "16KB",
        "spark.sql.files.openCostInBytes": "0",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        df = spark.read.parquet(out)
        n = df.rdd.getNumPartitions()
        assert n >= spark.sparkContext.defaultParallelism, (
            f"split scan yielded only {n} partitions; test setup is wrong"
        )
        assert ensure_parallelism(df) is df, (
            "ensure_parallelism must be a no-op when the scan is already parallel"
        )
        # and the single-file pathology still triggers the repartition
        single = load_table(spark, SF_SMALL, "documents")
        if single.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism:
            assert ensure_parallelism(single) is not single
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partitions(spark):
    """AQE skew-join handling: with one hot key dominating, the adaptive
    final plan marks the sort-merge join as skew-handled. This is the
    automatic remedy salted_join complements manually."""
    from pyspark.sql import functions as F

    # 200k rows of one hot key + 10k spread keys, against a small dim
    hot = spark.range(200_000).select(F.lit(0).alias("k"), F.col("id").alias("v"))
    spread = spark.range(10_000).select((F.col("id") % 100 + 1).alias("k"), F.col("id").alias("v"))
    left = hot.union(spread)
    right = spark.range(101).select(F.col("id").alias("rk"), F.lit("x").alias("tag"))

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        joined = left.join(right, left.k == right.rk)
        # the action must run on THIS DataFrame's own QueryExecution
        # (count() would wrap it in a new aggregate plan) so the finalized
        # adaptive plan is inspectable afterwards
        assert len(joined.collect()) == 210_000
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan, final_plan[:2000]
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_scale_md_shuffle_inventory_is_fresh():
    """The generated shuffle inventory in SCALE.md must cover exactly the
    registered (non-pipeline) queries — a query added without rerunning
    `python tools/gen_scale_inventory.py` fails here, keeping the
    100×-scale story auditable as the registry grows."""
    import os

    from arc_cassandra_pipeline_plugin_spark.queries import load_all

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "SCALE.md")) as f:
        text = f.read()
    begin = "<!-- BEGIN GENERATED SHUFFLE INVENTORY"
    assert begin in text, "run python tools/gen_scale_inventory.py"
    section = text.split(begin)[1].split("<!-- END GENERATED")[0]
    listed = set(re.findall(r"^[|-] `([a-z0-9_]+)`", section, re.M))
    want = {n for n, q in load_all().items() if q.category != "pipeline"}
    missing = sorted(want - listed)
    stale = sorted(listed - want)
    assert not missing and not stale, (
        f"SCALE.md inventory out of date (run tools/gen_scale_inventory.py); "
        f"missing={missing[:5]} stale={stale[:5]}"
    )
