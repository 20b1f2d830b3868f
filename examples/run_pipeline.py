"""Run the example declarative pipeline (the reference's arc.json pattern,
reference src/it/resources/arc.json:1-30)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arc_cassandra_pipeline_plugin_spark.config import parse_config
from arc_cassandra_pipeline_plugin_spark.context import PipelineContext
from arc_cassandra_pipeline_plugin_spark.sources import get_spark

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
spark = get_spark("example-pipeline")
ctx = PipelineContext(environment=sys.argv[1] if len(sys.argv) > 1 else "test")
# pass a config path (json or HOCON .conf) as argv[2]; defaults to the JSON
cfg = sys.argv[2] if len(sys.argv) > 2 else os.path.join(os.path.dirname(__file__), "pipeline.json")
with open(cfg) as f:
    pipeline = parse_config(f.read(), ctx)
result = pipeline.run(spark, ctx)
result.show()
