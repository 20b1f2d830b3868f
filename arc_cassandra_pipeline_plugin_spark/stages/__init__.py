"""Stage registry.

Mirrors Arc's ``ServiceLoader`` discovery of ``PipelineStagePlugin``
implementations (reference ``META-INF/services/...PipelineStagePlugin:1-3``,
loaded in ``TestUtils.scala:79``): the declarative ``"type"`` string in a
config dispatches to a registered stage class. Python entry-point style —
third-party packages can call :func:`register_stage`.
"""

from __future__ import annotations

from typing import Type

from arc_cassandra_pipeline_plugin_spark.stages.base import (
    PipelineStage,
    inject_parameters,
    register_view,
    repartition,
)
from arc_cassandra_pipeline_plugin_spark.stages.execute import (
    CassandraExecute,
    EqualityValidate,
    SQLExecute,
    SQLValidate,
)
from arc_cassandra_pipeline_plugin_spark.stages.extract import (
    CassandraExtract,
    DelimitedExtract,
    ExtractStage,
    JSONExtract,
    ORCExtract,
    ParquetExtract,
    RateStreamExtract,
    TableExtract,
)
from arc_cassandra_pipeline_plugin_spark.stages.load import (
    SAVE_MODES,
    CassandraLoad,
    DelimitedLoad,
    LoadStage,
    ORCLoad,
    ParquetLoad,
    TableLoad,
)
from arc_cassandra_pipeline_plugin_spark.stages.transform import (
    MetadataTransform,
    PythonTransform,
    SQLTransform,
    TypingTransform,
)

STAGE_REGISTRY: dict[str, Type[PipelineStage]] = {}


def register_stage(cls: Type[PipelineStage]) -> Type[PipelineStage]:
    """Register a stage class under its declarative ``stage_type`` string."""
    stage_type = cls.stage_type or cls.__name__
    STAGE_REGISTRY[stage_type] = cls
    return cls


for _cls in (
    ParquetExtract,
    ORCExtract,
    ORCLoad,
    DelimitedExtract,
    JSONExtract,
    CassandraExtract,
    RateStreamExtract,
    TableExtract,
    SQLTransform,
    PythonTransform,
    TypingTransform,
    MetadataTransform,
    ParquetLoad,
    DelimitedLoad,
    CassandraLoad,
    TableLoad,
    SQLExecute,
    SQLValidate,
    EqualityValidate,
    CassandraExecute,
):
    register_stage(_cls)

__all__ = [
    "PipelineStage",
    "ExtractStage",
    "LoadStage",
    "ParquetExtract",
    "DelimitedExtract",
    "JSONExtract",
    "CassandraExtract",
    "RateStreamExtract",
    "SQLTransform",
    "PythonTransform",
    "TypingTransform",
    "MetadataTransform",
    "ParquetLoad",
    "ORCExtract",
    "ORCLoad",
    "DelimitedLoad",
    "CassandraLoad",
    "TableLoad",
    "TableExtract",
    "SQLExecute",
    "SQLValidate",
    "EqualityValidate",
    "CassandraExecute",
    "SAVE_MODES",
    "STAGE_REGISTRY",
    "register_stage",
    "register_view",
    "repartition",
    "inject_parameters",
]
