"""Cassandra stage CONTRACT tests: execute the CassandraExtract /
CassandraLoad / CassandraExecute read-write paths end-to-end against an
in-process stand-in registered under the real connector format name
(``sources/cassandra_fake.py``) — the sandbox has no cluster and no
connector jar, so until now these paths were config-validated but never run.

Mirrors the reference's integration round-trip
(``CassandraLoadSuite.scala:58-141``): Execute DDL ×2 → Load → Extract →
equality — plus contract assertions the suite implies: connector options
pass through verbatim, keyspace/table are injected, ``confirm.truncate``
gates Overwrite and is stripped from connector options, SaveMode maps to
the writer's overwrite flag, and CassandraExecute's connection settings
overlay stage params over session conf
(``CassandraConnectorConf.fromSparkConf``, ``CassandraExecute.scala:98-101``).
"""

from __future__ import annotations

import json
import os
import sys
import types

import pytest

from arc_cassandra_pipeline_plugin_spark.context import PipelineContext
from arc_cassandra_pipeline_plugin_spark.errors import DetailException
from arc_cassandra_pipeline_plugin_spark.sources.cassandra_fake import (
    register_fake_cassandra,
)
from arc_cassandra_pipeline_plugin_spark.stages import (
    CassandraExtract,
    CassandraLoad,
)
from arc_cassandra_pipeline_plugin_spark.stages.execute import CassandraExecute


@pytest.fixture()
def fake_cluster_root(spark, tmp_path):
    register_fake_cassandra(spark)
    return str(tmp_path / "cluster")


def _seed_view(spark, name):
    df = spark.createDataFrame(
        [(1, "alpha", 10.5), (2, "beta", 20.25), (3, "gamma", 30.0)],
        "id bigint, name string, score double",
    )
    df.createOrReplaceTempView(name)
    return df


def _conn_params(root):
    return {
        "spark.cassandra.connection.host": root,
        "spark.cassandra.connection.port": "9042",
        "spark.cassandra.output.consistency.level": "LOCAL_QUORUM",
    }


def test_cassandra_load_extract_roundtrip(spark, fake_cluster_root):
    """Load → Extract round-trip through the connector format string: the
    extracted frame equals the loaded frame by value (CassandraLoadSuite
    count/equality checks, :119-141)."""
    src = _seed_view(spark, "cass_rt_src")
    ctx = PipelineContext()
    CassandraLoad(
        name="load",
        input_view="cass_rt_src",
        keyspace="ks1",
        table="t1",
        save_mode="Append",
        params=_conn_params(fake_cluster_root),
    ).execute(spark, ctx)

    out = CassandraExtract(
        name="extract",
        output_view="cass_rt_out",
        keyspace="ks1",
        table="t1",
        params=_conn_params(fake_cluster_root),
    ).execute(spark, ctx)

    assert out.count() == 3
    assert set(out.columns) == {"id", "name", "score"}
    assert sorted(tuple(r) for r in out.collect()) == sorted(
        tuple(r) for r in src.collect()
    )


def test_connector_options_pass_through_verbatim(spark, fake_cluster_root):
    """Every stage param reaches the connector options unmodified, keyspace/
    table are injected, and confirm.truncate is STRIPPED before the write
    (CassandraLoad.scala:116-117)."""
    _seed_view(spark, "cass_opt_src")
    ctx = PipelineContext()
    params = {**_conn_params(fake_cluster_root), "confirm.truncate": "true"}
    CassandraLoad(
        name="load",
        input_view="cass_opt_src",
        keyspace="ks1",
        table="opts",
        save_mode="Overwrite",
        params=params,
    ).execute(spark, ctx)

    tdir = os.path.join(fake_cluster_root, "ks1", "opts")
    with open(os.path.join(tdir, "_write_options.json")) as fh:
        wopts = json.load(fh)
    assert wopts["spark.cassandra.connection.host"] == fake_cluster_root
    assert wopts["spark.cassandra.connection.port"] == "9042"
    assert wopts["spark.cassandra.output.consistency.level"] == "LOCAL_QUORUM"
    assert wopts["keyspace"] == "ks1" and wopts["table"] == "opts"
    assert "confirm.truncate" not in wopts, "gate param must not reach the connector"
    assert wopts["__overwrite"] is True, "SaveMode.Overwrite → writer overwrite flag"

    CassandraExtract(
        name="extract",
        output_view="cass_opt_out",
        keyspace="ks1",
        table="opts",
        params=_conn_params(fake_cluster_root),
    ).execute(spark, ctx)
    with open(os.path.join(tdir, "_read_options.json")) as fh:
        ropts = json.load(fh)
    assert ropts["spark.cassandra.connection.host"] == fake_cluster_root
    assert ropts["keyspace"] == "ks1" and ropts["table"] == "opts"


def test_overwrite_requires_truncate_confirmation_end_to_end(spark, fake_cluster_root):
    """The truncate gate fires BEFORE any connector write; with the gate
    satisfied, Overwrite truncates (replaces, not appends) the table
    (CassandraLoadSuite.scala:104)."""
    _seed_view(spark, "cass_gate_src")
    ctx = PipelineContext()
    base = dict(
        input_view="cass_gate_src",
        keyspace="ks1",
        table="gate",
        save_mode="Overwrite",
    )
    with pytest.raises(DetailException, match="confirm.truncate"):
        CassandraLoad(
            name="bad", params=_conn_params(fake_cluster_root), **base
        ).execute(spark, ctx)
    tdir = os.path.join(fake_cluster_root, "ks1", "gate")
    assert not os.path.exists(tdir), "gated write must not touch the sink"

    ok_params = {**_conn_params(fake_cluster_root), "confirm.truncate": "true"}
    CassandraLoad(name="ok1", params=ok_params, **base).execute(spark, ctx)
    CassandraLoad(name="ok2", params=ok_params, **base).execute(spark, ctx)
    out = CassandraExtract(
        name="extract",
        output_view="cass_gate_out",
        keyspace="ks1",
        table="gate",
        params=_conn_params(fake_cluster_root),
    ).execute(spark, ctx)
    assert out.count() == 3, "second Overwrite must truncate, not append"


def test_append_accumulates(spark, fake_cluster_root):
    _seed_view(spark, "cass_app_src")
    ctx = PipelineContext()
    for i in range(2):
        CassandraLoad(
            name=f"load{i}",
            input_view="cass_app_src",
            keyspace="ks1",
            table="app",
            save_mode="Append",
            params=_conn_params(fake_cluster_root),
        ).execute(spark, ctx)
    out = CassandraExtract(
        name="extract",
        output_view="cass_app_out",
        keyspace="ks1",
        table="app",
        params=_conn_params(fake_cluster_root),
    ).execute(spark, ctx)
    assert out.count() == 6


def test_extract_missing_table_fails_cleanly(spark, fake_cluster_root):
    ctx = PipelineContext()
    with pytest.raises(DetailException, match="does not exist"):
        CassandraExtract(
            name="extract",
            output_view="cass_missing",
            keyspace="ks1",
            table="nope",
            params=_conn_params(fake_cluster_root),
        ).execute(spark, ctx)


@pytest.fixture()
def stub_cassandra_driver(monkeypatch):
    """Stand-in for the cassandra-driver package: records (hosts, port, cql)
    so CassandraExecute's driver-side path runs end-to-end."""
    calls = {"clusters": [], "cql": []}

    class _Session:
        def execute(self, text):
            calls["cql"].append(text)

    class _Cluster:
        def __init__(self, hosts, port=9042):
            calls["clusters"].append((tuple(hosts), port))

        def connect(self):
            return _Session()

        def shutdown(self):
            pass

    pkg = types.ModuleType("cassandra")
    mod = types.ModuleType("cassandra.cluster")
    mod.Cluster = _Cluster
    pkg.cluster = mod
    monkeypatch.setitem(sys.modules, "cassandra", pkg)
    monkeypatch.setitem(sys.modules, "cassandra.cluster", mod)
    return calls


def test_cassandra_execute_ddl_roundtrip(spark, stub_cassandra_driver):
    """The reference round-trip's first two stages: CREATE KEYSPACE then
    CREATE TABLE via raw CQL (CassandraLoadSuite.scala:66-99), with
    ${param} substitution applied to the statement text."""
    ctx = PipelineContext(sql_params={"ks": "arc_it"})
    CassandraExecute(
        name="ddl1",
        sql=(
            "CREATE KEYSPACE IF NOT EXISTS ${ks} WITH REPLICATION = "
            "{'class': 'SimpleStrategy', 'replication_factor': 1}"
        ),
        params={"spark.cassandra.connection.host": "h1"},
    ).execute(spark, ctx)
    CassandraExecute(
        name="ddl2",
        sql="CREATE TABLE IF NOT EXISTS ${ks}.t (id int PRIMARY KEY)",
        params={"spark.cassandra.connection.host": "h1"},
    ).execute(spark, ctx)
    assert stub_cassandra_driver["cql"] == [
        "CREATE KEYSPACE IF NOT EXISTS arc_it WITH REPLICATION = "
        "{'class': 'SimpleStrategy', 'replication_factor': 1}",
        "CREATE TABLE IF NOT EXISTS arc_it.t (id int PRIMARY KEY)",
    ]


def test_cassandra_execute_failure_statement(spark, monkeypatch):
    """The reference's 'server failure statement' case
    (CassandraExecuteSuite.scala:72-97): an invalid statement ('HELP SHOW')
    surfaces the server's parse error wrapped as a DetailException carrying
    the stage detail — not a bare driver exception."""
    class _Session:
        def execute(self, text):
            raise RuntimeError("no viable alternative at input 'HELP'")

    class _Cluster:
        def __init__(self, hosts, port=9042):
            pass

        def connect(self):
            return _Session()

        def shutdown(self):
            pass

    pkg = types.ModuleType("cassandra")
    mod = types.ModuleType("cassandra.cluster")
    mod.Cluster = _Cluster
    pkg.cluster = mod
    monkeypatch.setitem(sys.modules, "cassandra", pkg)
    monkeypatch.setitem(sys.modules, "cassandra.cluster", mod)

    with pytest.raises(DetailException, match="no viable alternative at input 'HELP'") as ei:
        CassandraExecute(
            name="bad-statement",
            sql="HELP SHOW;",
            params={"spark.cassandra.connection.host": "h1"},
        ).execute(spark, PipelineContext())
    assert ei.value.stage_detail.get("name") == "bad-statement"


def test_cassandra_execute_conf_overlay(spark, stub_cassandra_driver):
    """Connection settings: stage params override session conf, session conf
    overrides defaults (CassandraConnectorConf.fromSparkConf overlay,
    CassandraExecute.scala:98-101)."""
    ctx = PipelineContext()
    spark.conf.set("spark.cassandra.connection.host", "conf-host")
    spark.conf.set("spark.cassandra.connection.port", "9043")
    try:
        CassandraExecute(name="e1", sql="SELECT 1").execute(spark, ctx)
        CassandraExecute(
            name="e2",
            sql="SELECT 2",
            params={
                "spark.cassandra.connection.host": "param-host",
                "spark.cassandra.connection.port": "9044",
            },
        ).execute(spark, ctx)
    finally:
        spark.conf.unset("spark.cassandra.connection.host")
        spark.conf.unset("spark.cassandra.connection.port")
    assert stub_cassandra_driver["clusters"] == [
        (("conf-host",), 9043),
        (("param-host",), 9044),
    ]


def test_full_reference_roundtrip_pipeline(spark, fake_cluster_root, stub_cassandra_driver):
    """The complete CassandraLoadSuite.scala:58-141 shape as one pipeline:
    Execute DDL ×2 → Load (Overwrite + confirm.truncate) → Extract →
    count equality against the source view."""
    from arc_cassandra_pipeline_plugin_spark.pipeline import Pipeline

    src = _seed_view(spark, "cass_e2e_src")
    stages = [
        CassandraExecute(
            name="create keyspace",
            sql=(
                "CREATE KEYSPACE IF NOT EXISTS arc_it WITH REPLICATION = "
                "{'class': 'SimpleStrategy', 'replication_factor': 1}"
            ),
        ),
        CassandraExecute(
            name="create table",
            sql="CREATE TABLE IF NOT EXISTS arc_it.e2e (id bigint PRIMARY KEY)",
        ),
        CassandraLoad(
            name="load",
            input_view="cass_e2e_src",
            keyspace="arc_it",
            table="e2e",
            save_mode="Overwrite",
            params={**_conn_params(fake_cluster_root), "confirm.truncate": "true"},
        ),
        CassandraExtract(
            name="extract",
            output_view="cass_e2e_out",
            keyspace="arc_it",
            table="e2e",
            params=_conn_params(fake_cluster_root),
        ),
    ]
    ctx = PipelineContext()
    Pipeline(stages=stages).run(spark, ctx)
    out = spark.table("cass_e2e_out")
    assert out.count() == src.count()
    assert len(stub_cassandra_driver["cql"]) == 2


def test_filter_pushdown_reaches_connector(spark, fake_cluster_root):
    """Predicate pushdown THROUGH the stage path: a downstream filter over
    the extracted view lands in the connector as pushed Filter objects
    (pushFilters), is applied source-side, and non-pushable predicates are
    returned to Spark for post-scan evaluation — the split the real
    connector makes for CQL-able predicates. Also witnesses the Python DS
    API's projection posture: the reader receives the FULL column set
    (pruning folds into the Project above the BatchScan; the JVM connector
    would receive a pruned schema), recorded rather than assumed."""
    _seed_view(spark, "cass_pd_src")
    ctx = PipelineContext()
    CassandraLoad(
        name="load",
        input_view="cass_pd_src",
        keyspace="ks1",
        table="pd",
        save_mode="Append",
        params=_conn_params(fake_cluster_root),
    ).execute(spark, ctx)

    out = CassandraExtract(
        name="extract",
        output_view="cass_pd_out",
        keyspace="ks1",
        table="pd",
        params=_conn_params(fake_cluster_root),
    ).execute(spark, ctx)
    # pushable comparison + non-pushable expression in one predicate
    got = (
        out.filter("score > 15.0 AND length(name) > 1")
        .select("name")
        .collect()
    )

    assert sorted(r["name"] for r in got) == ["beta", "gamma"]
    tdir = os.path.join(fake_cluster_root, "ks1", "pd")
    with open(os.path.join(tdir, "_read_pushdown.json")) as fh:
        rec = json.load(fh)
    pushed = {(p["type"], tuple(p["attribute"])) for p in rec["pushed"]}
    assert ("GreaterThan", ("score",)) in pushed, rec
    gt = next(p for p in rec["pushed"] if p["type"] == "GreaterThan")
    assert gt["value"] == 15.0
    # length(name) > 1 is not a CQL-able predicate shape — Spark keeps it
    assert not any(p["type"] == "GreaterThan" and p["attribute"] == ["name"]
                   for p in rec["pushed"])
    # projection posture: full column set at the reader (API limitation,
    # recorded so a future Spark that prunes flips this assertion loudly)
    assert rec["columns"] == ["id", "name", "score"]


def test_pushdown_filtering_is_source_side_and_correct(spark, fake_cluster_root):
    """The fake connector APPLIES accepted filters in read() — claiming a
    filter and not applying it would return rows Spark no longer
    re-checks. Certify equality against the unfiltered truth for every
    pushable shape."""
    _seed_view(spark, "cass_pda_src")
    ctx = PipelineContext()
    CassandraLoad(
        name="load",
        input_view="cass_pda_src",
        keyspace="ks1",
        table="pda",
        save_mode="Append",
        params=_conn_params(fake_cluster_root),
    ).execute(spark, ctx)
    out = CassandraExtract(
        name="extract",
        output_view="cass_pda_out",
        keyspace="ks1",
        table="pda",
        params=_conn_params(fake_cluster_root),
    ).execute(spark, ctx)
    cases = [
        ("id = 2", {2}),
        ("id > 1", {2, 3}),
        ("id >= 2", {2, 3}),
        ("id < 3", {1, 2}),
        ("id <= 2", {1, 2}),
        ("score IS NOT NULL", {1, 2, 3}),
    ]
    for pred, want in cases:
        got = {r["id"] for r in out.filter(pred).select("id").collect()}
        assert got == want, f"{pred}: got {got}, want {want}"
