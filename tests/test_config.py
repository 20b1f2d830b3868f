"""Config layer: parse/validate semantics ported from the reference
(CassandraExtract.scala:17-64, CassandraExecute.scala:21-62)."""

from __future__ import annotations

import os

import pytest

from arc_cassandra_pipeline_plugin_spark.config import parse_config
from arc_cassandra_pipeline_plugin_spark.context import PipelineContext
from arc_cassandra_pipeline_plugin_spark.errors import ConfigError
from arc_cassandra_pipeline_plugin_spark.stages import ParquetExtract, SQLTransform
from arc_cassandra_pipeline_plugin_spark.stages.base import inject_parameters


def test_parse_minimal_pipeline():
    p = parse_config(
        {
            "stages": [
                {
                    "type": "ParquetExtract",
                    "name": "e",
                    "inputURI": "/tmp/x.parquet",
                    "outputView": "v",
                }
            ]
        }
    )
    assert len(p.stages) == 1
    assert isinstance(p.stages[0], ParquetExtract)
    assert p.stages[0].input_uri == "/tmp/x.parquet"


def test_errors_accumulate_across_stages_and_keys():
    """All config problems reported at once (CassandraExtract.scala:58-62)."""
    with pytest.raises(ConfigError) as ei:
        parse_config(
            {
                "stages": [
                    {
                        "type": "ParquetExtract",
                        "name": "e",
                        "numPartitions": "eight",   # wrong type
                        "bogus": 1,                  # unknown key
                        "inputURI": "/x",
                        "outputView": "v",
                    },
                    {"type": "Nope", "name": "f"},   # unknown stage type
                ]
            }
        )
    keys = {(e.stage_index, e.key) for e in ei.value.errors}
    assert (0, "numPartitions") in keys
    assert (0, "bogus") in keys
    assert (1, "type") in keys


def test_save_mode_whitelist():
    """SaveMode whitelist (CassandraLoad.scala:35)."""
    with pytest.raises(ConfigError) as ei:
        parse_config(
            {
                "stages": [
                    {
                        "type": "ParquetLoad",
                        "name": "l",
                        "inputView": "v",
                        "outputURI": "/x",
                        "saveMode": "Truncate",
                    }
                ]
            }
        )
    assert "saveMode" in str(ei.value) or "Truncate" in str(ei.value)


def test_environment_filtering():
    """Stages excluded by environment are dropped (arc.json:6-9)."""
    cfg = {
        "stages": [
            {
                "type": "SQLTransform",
                "name": "prod only",
                "environments": ["production"],
                "sql": "SELECT 1 AS one",
                "outputView": "a",
            },
            {
                "type": "SQLTransform",
                "name": "everywhere",
                "sql": "SELECT 2 AS two",
                "outputView": "b",
            },
        ]
    }
    p = parse_config(cfg, PipelineContext(environment="test"))
    assert [s.name for s in p.stages] == ["everywhere"]
    p2 = parse_config(cfg, PipelineContext(environment="production"))
    assert [s.name for s in p2.stages] == ["prod only", "everywhere"]


def test_env_var_substitution():
    """${PWD}-style substitution in config text (arc.json:10)."""
    os.environ["SPARK_GRAFT_TEST_DIR"] = "/data/here"
    p = parse_config(
        '{"stages": [{"type": "ParquetExtract", "name": "e", '
        '"inputURI": "${SPARK_GRAFT_TEST_DIR}/t.parquet", "outputView": "v"}]}'
    )
    assert p.stages[0].input_uri == "/data/here/t.parquet"


def test_inject_parameters_strict():
    """${param} SQL injection fails on missing keys (CassandraExecute.scala:93)."""
    assert inject_parameters("SELECT * FROM t WHERE k = ${key}", {"key": "5"}) == (
        "SELECT * FROM t WHERE k = 5"
    )
    with pytest.raises(KeyError):
        inject_parameters("SELECT ${missing}", {})


def test_unknown_keys_listed_individually():
    with pytest.raises(ConfigError) as ei:
        parse_config(
            {
                "stages": [
                    {
                        "type": "SQLTransform",
                        "name": "t",
                        "sql": "SELECT 1",
                        "outputView": "v",
                        "first_unknown": 1,
                        "second_unknown": 2,
                    }
                ]
            }
        )
    keys = {e.key for e in ei.value.errors}
    assert {"first_unknown", "second_unknown"} <= keys


def test_optional_id_key_accepted():
    """Every stage accepts an optional 'id' (CassandraLoad.scala:26,
    CassandraExecute.scala:26-27) — reference-ported configs carrying ids
    must parse."""
    p = parse_config(
        {
            "stages": [
                {
                    "type": "SQLTransform",
                    "id": "stage-uuid-001",
                    "name": "t",
                    "sql": "SELECT 1 AS one",
                    "outputView": "v",
                }
            ]
        }
    )
    assert p.stages[0].stage_id == "stage-uuid-001"


def test_structtype_schema_through_dict_config():
    """parse_config(dict) accepts a programmatic StructType for 'schema'
    (the annotation-substring fallback must not reject it)."""
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("a", T.LongType())])
    p = parse_config(
        {
            "stages": [
                {
                    "type": "ParquetExtract",
                    "name": "e",
                    "inputURI": "/tmp/none.parquet",
                    "outputView": "v",
                    "schema": schema,
                }
            ]
        }
    )
    assert p.stages[0].schema is schema
