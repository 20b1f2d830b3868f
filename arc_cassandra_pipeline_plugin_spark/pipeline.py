"""Pipeline execution: fold over stages; the last stage's DataFrame is the
pipeline result.

Mirrors ``ARC.run(pipeline)`` semantics (``CassandraLoadSuite.scala:134-138``):
stages run in declared order, each returning ``Optional[DataFrame]``; stages
that return ``None`` (execute stages, ``CassandraExecute.scala:110``) leave
the running result unchanged — the test suite asserts on the *last produced*
DataFrame after an Execute→Execute→Load→Extract chain.

Structured logging parity: the reference emits the per-stage detail map into
structured logs (Arc's logger; the map travels on exceptions too,
``CassandraExtract.scala:100-104``). ``run`` logs each completed stage's
``stage_detail`` as one JSON line on the ``arc_cassandra_pipeline_plugin_spark``
logger.
"""

from __future__ import annotations

import json
import logging
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from arc_cassandra_pipeline_plugin_spark.context import PipelineContext
from arc_cassandra_pipeline_plugin_spark.stages.base import PipelineStage

logger = logging.getLogger("arc_cassandra_pipeline_plugin_spark")


@dataclass
class Pipeline:
    """An ordered list of stages — the parsed form of the declarative
    ``"stages"`` array (``arc.json:2``)."""

    stages: list[PipelineStage] = field(default_factory=list)

    def run(
        self, spark: SparkSession, ctx: PipelineContext | None = None
    ) -> Optional[DataFrame]:
        return run(self, spark, ctx)


def run(
    pipeline: Pipeline, spark: SparkSession, ctx: PipelineContext | None = None
) -> Optional[DataFrame]:
    """Execute the pipeline; return the last stage's DataFrame (or the last
    non-None result if trailing stages are side-effect-only)."""
    ctx = ctx or PipelineContext()
    result: Optional[DataFrame] = None
    for stage in pipeline.stages:
        if not ctx.should_run(stage.environments):
            continue
        try:
            out = stage.execute(spark, ctx)
        except Exception:
            logger.error(json.dumps({"event": "stage failed", **stage.stage_detail.as_dict()}, default=str))
            raise
        logger.info(json.dumps({"event": "stage completed", **stage.stage_detail.as_dict()}, default=str))
        if out is not None:
            result = out
    return result
