"""PySpark-native analytics/ETL engine with the query and data-processing
capabilities of ``adamschmidt/arc-cassandra-pipeline-plugin``.

The reference is a plugin for the Arc declarative ETL framework contributing
three pipeline stages (CassandraExtract / CassandraLoad / CassandraExecute,
see reference ``src/main/resources/META-INF/services/...PipelineStagePlugin:1-3``)
whose computational model is "stages communicate through Spark SQL temp
views; Spark SQL supplies the relational algebra". This package rebuilds that
shell idiomatically in Python on the PySpark DataFrame/SQL API and extends the
operator surface with large-scale training-data-pipeline operators
(deduplication, similarity search, multimodal columns, text analysis).

Layout
------
- ``context``   — :class:`PipelineContext` (mirrors Arc's ``ARCContext``)
- ``config``    — declarative JSON pipeline parse/validate with error
  accumulation (reference ``CassandraExtract.scala:17-64`` semantics)
- ``pipeline``  — ``Pipeline`` / ``run``: fold stages, last DataFrame wins
- ``stages``    — extract / transform / load / execute stage classes
- ``sources``   — table catalog + readers for the fixture corpus
- ``operators`` — dedup, similarity, text analysis, as-of joins, multimodal
- ``functions`` — column-level helpers (vector math, text metrics, hashing)
- ``plans``     — physical-plan introspection (pushdown / broadcast asserts)
- ``streaming`` — Structured Streaming upgrades of the load path
- ``queries``   — the certified query registry backing ``__spark_entry__.py``
- ``testing``   — order-insensitive ``dataset_equality`` harness
"""

from __future__ import annotations

__version__ = "0.1.0"

from arc_cassandra_pipeline_plugin_spark.context import PipelineContext
from arc_cassandra_pipeline_plugin_spark.errors import DetailException, StageError

__all__ = ["PipelineContext", "StageError", "DetailException", "__version__"]
