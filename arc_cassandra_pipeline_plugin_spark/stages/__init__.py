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
    TextExtract,
    XMLExtract,
)
from arc_cassandra_pipeline_plugin_spark.stages.load import (
    SAVE_MODES,
    CassandraLoad,
    DelimitedLoad,
    LoadStage,
    ORCLoad,
    ParquetLoad,
    TableLoad,
    XMLLoad,
)
from arc_cassandra_pipeline_plugin_spark.stages.transform import (
    MetadataTransform,
    OperatorTransform,
    PythonTransform,
    SQLTransform,
    TypingTransform,
)

STAGE_REGISTRY: dict[str, Type[PipelineStage]] = {}

#: entry-point group third-party packages use to contribute stages — the
#: 1:1 Python analogue of the reference's ServiceLoader discovery file
#: (``META-INF/services/ai.tripl.arc.plugins.PipelineStagePlugin:1-3``).
ENTRY_POINT_GROUP = "arc_cassandra_pipeline_plugin_spark.stages"

_entry_points_loaded = False


def register_stage(cls: Type[PipelineStage]) -> Type[PipelineStage]:
    """Register a stage class under its declarative ``stage_type`` string."""
    stage_type = cls.stage_type or cls.__name__
    STAGE_REGISTRY[stage_type] = cls
    return cls


def load_entry_point_stages(refresh: bool = False) -> list[str]:
    """Discover and register stages contributed by installed packages via
    ``importlib.metadata`` entry points in :data:`ENTRY_POINT_GROUP` —
    ServiceLoader parity: an external package declares

    .. code-block:: toml

        [project.entry-points."arc_cassandra_pipeline_plugin_spark.stages"]
        my_stage = "my_pkg.stages:MyStage"

    and its ``"type"`` string becomes instantiable from declarative config
    with no edits to this repo (``TestUtils.scala:79`` loads the reference's
    plugins the same way at pipeline-parse time).

    Called lazily by config parsing when a stage type is not in the static
    registry, so a broken third-party distribution can never break import of
    this package. A contributed object that is not a PipelineStage subclass
    raises ``TypeError`` (matching ServiceLoader's hard failure on a bad
    provider); returns the list of newly registered type names.
    """
    global _entry_points_loaded
    if _entry_points_loaded and not refresh:
        return []
    import importlib.metadata as _md

    registered: list[str] = []
    entry_points = _md.entry_points(group=ENTRY_POINT_GROUP)
    for ep in entry_points:
        cls = ep.load()
        if not (isinstance(cls, type) and issubclass(cls, PipelineStage)):
            raise TypeError(
                f"entry point {ep.name!r} in group {ENTRY_POINT_GROUP!r} must "
                f"resolve to a PipelineStage subclass, got {cls!r}"
            )
        register_stage(cls)
        registered.append(cls.stage_type or cls.__name__)
    _entry_points_loaded = True
    return registered


for _cls in (
    ParquetExtract,
    ORCExtract,
    ORCLoad,
    XMLExtract,
    XMLLoad,
    TextExtract,
    DelimitedExtract,
    JSONExtract,
    CassandraExtract,
    RateStreamExtract,
    TableExtract,
    SQLTransform,
    PythonTransform,
    OperatorTransform,
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
    "OperatorTransform",
    "TypingTransform",
    "MetadataTransform",
    "ParquetLoad",
    "ORCExtract",
    "ORCLoad",
    "XMLExtract",
    "XMLLoad",
    "TextExtract",
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
    "ENTRY_POINT_GROUP",
    "load_entry_point_stages",
    "register_stage",
    "register_view",
    "repartition",
    "inject_parameters",
]
