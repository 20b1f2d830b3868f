"""Extract stages: external source → DataFrame → named temp view.

Rebuilds ``CassandraExtract`` (``CassandraExtract.scala:86-138``) with the
source format generalized: ``parquet`` / ``delimited`` (CSV) / ``json`` for
the fixture corpus, and a ``cassandra`` format gated behind the connector
package for true parity deployments. Stage semantics are identical across
formats:

1. streaming guard → empty DataFrame (``CassandraExtract.scala:92-94``)
2. source read, schema inferred by the source (``CassandraExtract.scala:95-98``)
3. optional repartition matrix (``CassandraExtract.scala:107-122``)
4. view registration honoring immutable mode (``CassandraExtract.scala:123``)
5. instrumentation + optional persist with forced materialization
   (``CassandraExtract.scala:126-133``)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from arc_cassandra_pipeline_plugin_spark.context import PipelineContext
from arc_cassandra_pipeline_plugin_spark.stages.base import (
    PipelineStage,
    record_frame_metrics,
    register_view,
    repartition,
)


@dataclass
class ExtractStage(PipelineStage):
    """Common extract behavior; subclasses implement :meth:`_read`."""

    output_view: str = ""
    num_partitions: int | None = None
    partition_by: list[str] = field(default_factory=list)
    persist: bool = False
    schema: T.StructType | str | None = None

    def _read(self, spark: SparkSession, ctx: PipelineContext) -> DataFrame:
        raise NotImplementedError

    def _empty_schema(self) -> T.StructType:
        """Schema of the streaming-guard empty frame. The reference returns a
        completely empty DataFrame (``spark.emptyDataFrame``,
        ``CassandraExtract.scala:93``)."""
        if isinstance(self.schema, T.StructType):
            return self.schema
        return T.StructType([])

    def _run(self, spark: SparkSession, ctx: PipelineContext) -> Optional[DataFrame]:
        if ctx.is_streaming:
            # Streaming guard: extract is explicitly not supported under a
            # streaming context (CassandraExtract.scala:92-94).
            df = spark.createDataFrame([], self._empty_schema())
        else:
            df = self._read(spark, ctx)

        df = repartition(df, self.num_partitions, self.partition_by or None)
        register_view(df, self.output_view, ctx)
        if self.persist and not df.isStreaming:
            # persist FIRST so the metrics count below materializes the cache
            # (CassandraExtract.scala:130-133: persist, then forced count) —
            # otherwise the count pays a full uncached pass and the first
            # downstream consumer recomputes the source.
            df.persist(ctx.storage_level)
        record_frame_metrics(self.stage_detail, df, count=self.persist)
        return df


@dataclass
class ParquetExtract(ExtractStage):
    """``spark.read.parquet`` source. Filters/projections a downstream query
    applies reach the scan via Catalyst pushdown (no stage code needed —
    SURVEY.md §4)."""

    stage_type: str = "ParquetExtract"
    input_uri: str = ""

    def _read(self, spark: SparkSession, ctx: PipelineContext) -> DataFrame:
        reader = spark.read.options(**self.params)
        if self.schema is not None:
            reader = reader.schema(self.schema)
        return reader.parquet(self.input_uri)


@dataclass
class DelimitedExtract(ExtractStage):
    """Header-aware CSV source — the reference's test pipeline input
    (``CassandraLoadSuite.scala:63``; declaratively ``DelimitedExtract`` in
    ``arc.json:4-12``). Matches the reference's read exactly: ``header=true``
    and no schema inference → all-string columns (``FIXTURES.md`` §1)."""

    stage_type: str = "DelimitedExtract"
    input_uri: str = ""
    header: bool = True
    delimiter: str = ","
    infer_schema: bool = False

    def _read(self, spark: SparkSession, ctx: PipelineContext) -> DataFrame:
        reader = (
            spark.read.option("header", self.header)
            .option("sep", self.delimiter)
            .option("inferSchema", self.infer_schema)
            .options(**self.params)
        )
        if self.schema is not None:
            reader = reader.schema(self.schema)
        return reader.csv(self.input_uri)


@dataclass
class ORCExtract(ExtractStage):
    """ORC source (Spark-native columnar alternative to parquet; same
    pushdown/pruning properties)."""

    stage_type: str = "ORCExtract"
    input_uri: str = ""

    def _read(self, spark: SparkSession, ctx: PipelineContext) -> DataFrame:
        reader = spark.read.options(**self.params)
        if self.schema is not None:
            reader = reader.schema(self.schema)
        return reader.orc(self.input_uri)


@dataclass
class JSONExtract(ExtractStage):
    """JSON-lines source (schema inferred unless supplied)."""

    stage_type: str = "JSONExtract"
    input_uri: str = ""
    multi_line: bool = False

    def _read(self, spark: SparkSession, ctx: PipelineContext) -> DataFrame:
        reader = spark.read.option("multiLine", self.multi_line).options(**self.params)
        if self.schema is not None:
            reader = reader.schema(self.schema)
        return reader.json(self.input_uri)


@dataclass
class CassandraExtract(ExtractStage):
    """Cassandra table scan, schema inferred by the connector
    (``CassandraExtract.scala:95-98``): ``spark.read.format(
    "org.apache.spark.sql.cassandra").options(**params).options(table=...,
    keyspace=...).load()``. Requires the spark-cassandra-connector jar on the
    classpath; in this fixture-only environment the read raises a clear
    error at execute time rather than import time."""

    stage_type: str = "CassandraExtract"
    table: str = ""
    keyspace: str = ""

    def _read(self, spark: SparkSession, ctx: PipelineContext) -> DataFrame:
        return (
            spark.read.format("org.apache.spark.sql.cassandra")
            .options(**self.params)
            .options(table=self.table, keyspace=self.keyspace)
            .load()
        )


@dataclass
class TableExtract(ExtractStage):
    """Catalog-table source (``spark.table``): reads managed/bucketed tables
    written by :class:`~..load.TableLoad`, preserving bucket metadata so
    downstream joins on the bucket key skip the shuffle."""

    stage_type: str = "TableExtract"
    table: str = ""

    def _read(self, spark: SparkSession, ctx: PipelineContext) -> DataFrame:
        return spark.table(self.table)


@dataclass
class RateStreamExtract(ExtractStage):
    """Structured Streaming ``rate`` source — extension beyond the reference
    (which stubs streaming entirely); used to replay fixture events through
    the streaming pipeline in tests (SURVEY.md §7 step 6)."""

    stage_type: str = "RateStreamExtract"
    rows_per_second: int = 100

    def _run(self, spark: SparkSession, ctx: PipelineContext) -> Optional[DataFrame]:
        df = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", self.rows_per_second)
            .options(**self.params)
            .load()
        )
        df = repartition(df, self.num_partitions, self.partition_by or None)
        register_view(df, self.output_view, ctx)
        self.stage_detail.set("outputColumns", len(df.schema))
        self.stage_detail.set("isStreaming", True)
        return df
