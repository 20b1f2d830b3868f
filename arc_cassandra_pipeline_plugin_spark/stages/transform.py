"""Transform stages: view → SQL/DataFrame transform → view.

The reference's pipeline model presumes a ``SQLTransform`` stage between
extract and load (SURVEY.md §0; pipeline-composition pattern in
``src/it/resources/arc.json:1-30``) — all relational operators are supplied
by Spark SQL over the registered views. This module supplies that stage plus
a programmatic DataFrame-function variant.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

from arc_cassandra_pipeline_plugin_spark.context import PipelineContext
from arc_cassandra_pipeline_plugin_spark.stages.base import (
    PipelineStage,
    record_frame_metrics,
    register_view,
    repartition,
    resolve_sql_input,
)


@dataclass
class SQLTransform(PipelineStage):
    """Run a SQL statement over the registered views; publish the result as
    ``output_view``. SQL resolves inline or from ``input_uri``
    (``CassandraExecute.scala:31-32`` pattern) with ``${param}`` injection
    (``CassandraExecute.scala:93``). Catalyst owns the physical plan — this
    stage adds no execution logic of its own (SURVEY.md §4)."""

    stage_type: str = "SQLTransform"
    sql: str | None = None
    input_uri: str | None = None
    output_view: str = ""
    sql_params: dict[str, str] = field(default_factory=dict)
    num_partitions: int | None = None
    partition_by: list[str] = field(default_factory=list)
    persist: bool = False

    def _run(self, spark: SparkSession, ctx: PipelineContext) -> Optional[DataFrame]:
        merged = {**ctx.sql_params, **self.sql_params}
        text = resolve_sql_input(self.sql, self.input_uri, merged)
        self.stage_detail.set("sql", text)
        df = spark.sql(text)
        df = repartition(df, self.num_partitions, self.partition_by or None)
        register_view(df, self.output_view, ctx)
        record_frame_metrics(self.stage_detail, df, count=self.persist)
        if self.persist and not df.isStreaming:
            df.persist(ctx.storage_level)
        return df


@dataclass
class PythonTransform(PipelineStage):
    """Programmatic transform: a Python callable ``DataFrame -> DataFrame``
    over the input view. This is the hook extension operators (dedup,
    similarity, text analysis — :mod:`..operators`) plug into the
    declarative pipeline."""

    stage_type: str = "PythonTransform"
    input_view: str = ""
    output_view: str = ""
    fn: Callable[[DataFrame], DataFrame] | None = None
    num_partitions: int | None = None
    partition_by: list[str] = field(default_factory=list)
    persist: bool = False

    def _run(self, spark: SparkSession, ctx: PipelineContext) -> Optional[DataFrame]:
        if self.fn is None:
            raise ValueError("PythonTransform requires fn")
        df = self.fn(spark.table(self.input_view))
        df = repartition(df, self.num_partitions, self.partition_by or None)
        register_view(df, self.output_view, ctx)
        record_frame_metrics(self.stage_detail, df, count=self.persist)
        if self.persist and not df.isStreaming:
            df.persist(ctx.storage_level)
        return df
