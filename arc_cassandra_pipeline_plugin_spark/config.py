"""Declarative pipeline config: JSON text → validated stage objects.

Rebuilds the reference's config layer semantics (``CassandraExtract.scala:
17-64``, ``CassandraLoad.scala:20-70``, ``CassandraExecute.scala:21-62``):

- a ``"stages"`` array of objects dispatched by ``"type"``
  (``arc.json:2``; ServiceLoader dispatch via the stage registry)
- typed key extraction with defaults and valid-value whitelists
  (saveMode whitelist ``CassandraLoad.scala:35``)
- unknown-key detection against an expected-keys list
  (``checkValidKeys``, ``CassandraExecute.scala:33-37``)
- **error accumulation**: every config problem across every key of every
  stage is reported at once (``CassandraExtract.scala:58-62``)
- environment filtering at parse time (``arc.json:6-9``)
- ``${ENV}`` substitution from the environment for values like ``${PWD}``
  (``arc.json:10``)
"""

from __future__ import annotations

import dataclasses
import json
import os
import re
from typing import Any

from arc_cassandra_pipeline_plugin_spark.context import PipelineContext
from arc_cassandra_pipeline_plugin_spark.errors import ConfigError, StageError
from arc_cassandra_pipeline_plugin_spark.pipeline import Pipeline
from arc_cassandra_pipeline_plugin_spark.stages import STAGE_REGISTRY, PipelineStage

# Declarative key → dataclass field. Keys follow the reference's camelCase
# config vocabulary (outputView/inputView/inputURI/numPartitions/partitionBy/
# saveMode/persist — CassandraExtract.scala:22-35, CassandraLoad.scala:25-40).
_KEY_TO_FIELD = {
    "name": "name",
    "id": "stage_id",
    "description": "description",
    "environments": "environments",
    "params": "params",
    "outputView": "output_view",
    "inputView": "input_view",
    "inputURI": "input_uri",
    "outputURI": "output_uri",
    "sql": "sql",
    "sqlParams": "sql_params",
    "authentication": "authentication",
    "numPartitions": "num_partitions",
    "partitionBy": "partition_by",
    "persist": "persist",
    "saveMode": "save_mode",
    "table": "table",
    "keyspace": "keyspace",
    "schema": "schema",
    "header": "header",
    "delimiter": "delimiter",
    "inferSchema": "infer_schema",
    "multiLine": "multi_line",
    "rowsPerSecond": "rows_per_second",
    "rowTag": "row_tag",
    "rootTag": "root_tag",
    "wholeText": "whole_text",
    "partitionOutput": "partition_output",
    "bucketBy": "bucket_by",
    "numBuckets": "num_buckets",
    "sortBy": "sort_by",
    "observeMetrics": "observe_metrics",
    "trim": "trim",
    "lenient": "lenient",
    "nullableValues": "nullable_values",
    "formatters": "formatters",
    "metadata": "metadata",
    "leftView": "left_view",
    "rightView": "right_view",
    "operator": "operator",
    "skipIndexColumn": "skip_index_col",
    "skipMin": "skip_min",
    "skipMax": "skip_max",
    "skipManifestURI": "skip_manifest_uri",
    "skipSortOutput": "skip_sort_output",
    "skipBloomColumn": "skip_bloom_col",
    "skipBloomValue": "skip_bloom_value",
    "skipBloomManifestURI": "skip_bloom_manifest_uri",
}
_FIELD_TO_KEY = {v: k for k, v in _KEY_TO_FIELD.items()}

_ENV_RE = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)\}")


def _substitute_env(text: str) -> str:
    """``${PWD}``-style substitution from process env (``arc.json:10``).
    Unknown variables are left intact (they may be SQL ``${param}``
    placeholders resolved later at execute time)."""
    return _ENV_RE.sub(lambda m: os.environ.get(m.group(1), m.group(0)), text)


def _coerce(field: dataclasses.Field, value: Any, key: str) -> Any:
    """Typed getters with validation, mirroring the reference's
    getValue[String]/[Int]/[Boolean]/[StringList] extractors
    (``CassandraExtract.scala:22-35``)."""
    typ = field.type if isinstance(field.type, str) else getattr(field.type, "__name__", "")
    if field.name in ("environments", "partition_by", "bucket_by", "sort_by", "nullable_values"):
        if not (isinstance(value, list) and all(isinstance(v, str) for v in value)):
            raise TypeError(f"expected a list of strings for '{key}'")
        return value
    if field.name in ("params", "sql_params", "formatters", "authentication"):
        if not isinstance(value, dict):
            raise TypeError(f"expected an object for '{key}'")
        return {str(k): str(v) for k, v in value.items()}
    if field.name == "metadata":
        if not isinstance(value, dict):
            raise TypeError(f"expected an object for '{key}'")
        return value
    if field.name in ("num_partitions", "num_buckets"):
        if isinstance(value, bool) or not isinstance(value, int):
            raise TypeError(f"expected an integer for '{key}'")
        return value
    if field.name in (
        "persist", "header", "infer_schema", "multi_line", "partition_output",
        "observe_metrics", "trim", "lenient", "skip_sort_output", "whole_text",
    ):
        if not isinstance(value, bool):
            raise TypeError(f"expected a boolean for '{key}'")
        return value
    if field.name == "rows_per_second":
        if isinstance(value, bool) or not isinstance(value, int):
            raise TypeError(f"expected an integer for '{key}'")
        return value
    if field.name in ("skip_min", "skip_max"):
        # index-range bound: any comparable scalar (the stage compares it
        # against the column's native min/max via Spark literals)
        if isinstance(value, bool) or not isinstance(value, (int, float, str)):
            raise TypeError(f"expected a scalar (number or string) for '{key}'")
        return value
    if field.name == "schema":
        # schema accepts a DDL string OR a programmatic StructType (the
        # annotation-substring fallback below would wrongly reject the
        # latter because the stringified annotation contains 'str')
        from pyspark.sql import types as T

        if not isinstance(value, (str, T.StructType)):
            raise TypeError(f"expected a DDL string or StructType for '{key}'")
        return value
    if "str" in str(typ) or field.name in ("sql", "input_uri", "output_uri", "description"):
        if not isinstance(value, str):
            raise TypeError(f"expected a string for '{key}'")
        return value
    return value


def instantiate_stage(index: int, spec: dict[str, Any]) -> tuple[PipelineStage | None, list[StageError]]:
    """Instantiate one stage spec, accumulating *all* errors
    (``Either[List[StageError], PipelineStage]`` semantics,
    ``CassandraExtract.scala:58-62``)."""
    errors: list[StageError] = []
    name = str(spec.get("name", f"stage-{index}"))
    stage_type = spec.get("type")
    if isinstance(stage_type, str) and stage_type not in STAGE_REGISTRY:
        # ServiceLoader parity: before rejecting, discover stages contributed
        # by installed packages via entry points (stages.ENTRY_POINT_GROUP)
        from arc_cassandra_pipeline_plugin_spark.stages import (
            load_entry_point_stages,
        )

        load_entry_point_stages(refresh=True)
    if not isinstance(stage_type, str) or stage_type not in STAGE_REGISTRY:
        errors.append(
            StageError(index, name, "type", f"unknown stage type {stage_type!r}; "
                       f"registered: {sorted(STAGE_REGISTRY)}")
        )
        return None, errors

    cls = STAGE_REGISTRY[stage_type]
    fields = {f.name: f for f in dataclasses.fields(cls) if f.init}
    expected_keys = {"type"} | {
        _FIELD_TO_KEY[fname] for fname in fields if fname in _FIELD_TO_KEY
    }

    # Unknown-key detection (checkValidKeys, CassandraExecute.scala:33-37).
    for key in spec:
        if key not in expected_keys:
            errors.append(StageError(index, name, key, "unknown config key"))

    kwargs: dict[str, Any] = {}
    for key, value in spec.items():
        if key == "type" or key not in _KEY_TO_FIELD:
            continue
        fname = _KEY_TO_FIELD[key]
        if fname not in fields:
            continue
        try:
            kwargs[fname] = _coerce(fields[fname], value, key)
        except TypeError as exc:
            errors.append(StageError(index, name, key, str(exc)))

    if "name" not in kwargs:
        errors.append(StageError(index, name, "name", "required key missing"))

    if errors:
        return None, errors
    try:
        stage = cls(**kwargs)  # dataclass validators (e.g. saveMode whitelist)
    except (ValueError, TypeError) as exc:
        errors.append(StageError(index, name, "-", str(exc)))
        return None, errors
    return stage, []


def parse_config(
    text_or_dict: str | dict[str, Any], ctx: PipelineContext | None = None
) -> Pipeline:
    """Parse config JSON into a :class:`Pipeline`.

    Raises :class:`ConfigError` with the complete accumulated error list on
    any validation failure — never just the first problem
    (``CassandraExtract.scala:58-62``). Stages whose ``environments`` list
    excludes the active environment are dropped at parse time
    (``arc.json:6-9``, ``TestUtils.scala:58``).
    """
    ctx = ctx or PipelineContext()
    if isinstance(text_or_dict, str):
        try:
            doc = json.loads(_substitute_env(text_or_dict))
        except json.JSONDecodeError:
            # the reference's config layer is Typesafe Config, i.e. HOCON —
            # a JSON superset with comments / unquoted keys / substitutions
            # (CassandraLoadSuite.scala:126 ArcPipeline.parseConfig)
            from arc_cassandra_pipeline_plugin_spark import hocon

            try:
                doc = hocon.loads(text_or_dict)
            except hocon.HoconError as exc:
                raise ConfigError([StageError(0, "-", "-", f"config parse error: {exc}")])
    else:
        doc = text_or_dict
    if not isinstance(doc, dict) or not isinstance(doc.get("stages"), list):
        raise ConfigError([StageError(0, "-", "stages", "config must be an object with a 'stages' array")])

    stages: list[PipelineStage] = []
    errors: list[StageError] = []
    for i, spec in enumerate(doc["stages"]):
        if not isinstance(spec, dict):
            errors.append(StageError(i, "-", "-", "stage spec must be an object"))
            continue
        stage, errs = instantiate_stage(i, spec)
        errors.extend(errs)
        if stage is None:
            continue
        if not ctx.should_run(stage.environments):
            continue
        stages.append(stage)

    if errors:
        raise ConfigError(errors)
    return Pipeline(stages)
