"""Structured per-stage logging (reference parity: Arc's stage-detail logs)."""

from __future__ import annotations

import json
import logging

from arc_cassandra_pipeline_plugin_spark.config import parse_config
from tests.conftest import SF_SMALL


def test_run_emits_stage_detail_json(spark, ctx, caplog):
    cfg = {
        "stages": [
            {
                "type": "ParquetExtract",
                "name": "log me",
                "inputURI": f"{SF_SMALL}/region.parquet",
                "outputView": "log_v",
            }
        ]
    }
    with caplog.at_level(logging.INFO, logger="arc_cassandra_pipeline_plugin_spark"):
        parse_config(cfg, ctx).run(spark, ctx)
    events = [json.loads(r.message) for r in caplog.records if r.message.startswith("{")]
    done = [e for e in events if e.get("event") == "stage completed"]
    assert done and done[0]["name"] == "log me"
    assert done[0]["outputColumns"] == 2
    assert "duration_ms" in done[0]


def test_failed_stage_logs_error(spark, ctx, caplog):
    import pytest

    from arc_cassandra_pipeline_plugin_spark.errors import DetailException

    cfg = {
        "stages": [
            {"type": "SQLTransform", "name": "boom", "sql": "SELEKT 1", "outputView": "x"}
        ]
    }
    with caplog.at_level(logging.ERROR, logger="arc_cassandra_pipeline_plugin_spark"):
        with pytest.raises(DetailException):
            parse_config(cfg, ctx).run(spark, ctx)
    errs = [json.loads(r.message) for r in caplog.records if r.levelno >= logging.ERROR]
    assert any(e.get("event") == "stage failed" and e.get("name") == "boom" for e in errs)
