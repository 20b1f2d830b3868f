"""Extension operators beyond the reference's surface (SURVEY.md §2B
north-star): deduplication, similarity search, text analysis, time-series
joins, multimodal columns. Each is a plain ``DataFrame -> DataFrame``
function usable directly or through a ``PythonTransform`` stage."""

from arc_cassandra_pipeline_plugin_spark.operators import (  # noqa: F401
    dedup,
    multimodal,
    sampling,
    similarity,
    skew,
    text,
    timeseries,
)

__all__ = ["dedup", "similarity", "text", "timeseries", "multimodal", "sampling", "skew"]
from arc_cassandra_pipeline_plugin_spark.operators import quality  # noqa: F401,E402

__all__.append("quality")
