"""Pipeline execution context.

Mirrors Arc's ``ARCContext`` as exercised by the reference test harness
(``TestUtils.scala:62-85``): environment, streaming flag, immutable-view mode,
default storage level, and a free-form user-data map. The context is the one
piece of global state stages consult; everything else flows through Spark
temp views (``CassandraExtract.scala:123`` / ``CassandraLoad.scala:96``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark import StorageLevel


@dataclass
class PipelineContext:
    """Execution context passed to every stage.

    Parameters mirror the reference's ``ARCContext`` fields
    (``TestUtils.scala:62-85``):

    - ``environment``: active environment name; stages declaring an
      ``environments`` list only run when it contains this value
      (``arc.json:6-9``).
    - ``is_streaming``: when True, extract stages short-circuit to an empty
      DataFrame (``CassandraExtract.scala:92-94``) and load stages skip
      streaming writes (``CassandraLoad.scala:108-109``).
    - ``immutable_views``: when True, view registration uses
      ``createTempView`` (raises on duplicates) instead of
      ``createOrReplaceTempView`` (``CassandraExtract.scala:123``).
    - ``storage_level``: default persist level; the reference pins
      ``MEMORY_AND_DISK_SER`` (``TestUtils.scala:70``) — in PySpark >= 3 the
      serialized distinction is moot, so ``MEMORY_AND_DISK`` is the
      idiomatic match (SURVEY.md §4).
    """

    environment: str = "test"
    is_streaming: bool = False
    immutable_views: bool = False
    storage_level: StorageLevel = field(default_factory=lambda: StorageLevel.MEMORY_AND_DISK)
    user_data: dict[str, Any] = field(default_factory=dict)
    # Global substitution parameters for ${param} injection in SQL text
    # (reference SQLUtils.injectParameters, CassandraExecute.scala:93).
    sql_params: dict[str, str] = field(default_factory=dict)

    def should_run(self, stage_environments: list[str] | None) -> bool:
        """Environment filtering: a stage with a non-empty ``environments``
        list runs only when the active environment is listed
        (``arc.json:6-9``, ``TestUtils.scala:58``)."""
        if not stage_environments:
            return True
        return self.environment in stage_environments
