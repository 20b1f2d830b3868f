"""In-process contract-test double for the spark-cassandra-connector.

The sandbox has neither a Cassandra cluster nor the connector jar, so the
``CassandraExtract`` / ``CassandraLoad`` stages (format string
``org.apache.spark.sql.cassandra``, keyspace/table options, connector conf
passthrough — ``CassandraExtract.scala:95-98``, ``CassandraLoad.scala:110-153``)
could previously only be validated, never executed. This module closes that
gap: a PySpark Python Data Source registered under the connector's EXACT
format name, so the stages' ``_read``/``_write`` code paths run end-to-end
**unmodified** — same format string, same option surface.

Storage model: ``spark.cassandra.connection.host`` is interpreted as a local
root directory (the "cluster"); each keyspace/table is
``<root>/<keyspace>/<table>/`` holding

- ``part-*.jsonl`` — one JSON object per row, written by executor tasks,
- ``_schema.json``  — the table schema (StructType JSON), the analogue of
  connector schema inference from cluster metadata,
- ``_write_options.json`` / ``_read_options.json`` — the verbatim option
  map the stage handed the connector, recorded for contract assertions
  (params passthrough, keyspace/table injection, ``confirm.truncate``
  stripping).

This is explicitly a test double — deterministic, filesystem-backed, honest
about what it is — not a Cassandra client. It exists so the contract the
stages must honor (CassandraLoadSuite.scala:58-141 round-trip) is executed,
not merely config-checked.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

FORMAT_NAME = "org.apache.spark.sql.cassandra"
HOST_OPTION = "spark.cassandra.connection.host"


def _table_dir(options) -> str:
    root = options.get(HOST_OPTION)
    if not root:
        raise ValueError(
            f"fake cassandra source requires the '{HOST_OPTION}' option "
            "(interpreted as the storage root directory)"
        )
    keyspace = options.get("keyspace")
    table = options.get("table")
    if not keyspace or not table:
        raise ValueError("fake cassandra source requires keyspace and table options")
    return os.path.join(root, keyspace, table)


def _json_default(v):
    return str(v)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


#: filter classes the fake connector accepts — mirrors the real
#: connector's CQL-pushable predicate set (single-column comparisons and
#: null checks on clustering/indexed columns)
_PUSHABLE = (
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    LessThan,
    LessThanOrEqual,
    IsNotNull,
    IsNull,
)


def _filter_json(f) -> dict:
    out = {"type": type(f).__name__, "attribute": list(f.attribute)}
    if hasattr(f, "value"):
        out["value"] = f.value
    return out


class FakeCassandraReader(DataSourceReader):
    def __init__(self, dir_: str, schema: T.StructType):
        self.dir = dir_
        self.fields = [f.name for f in schema.fields]
        self.pushed: list = []
        # contract witness: the column set Spark hands the reader. The
        # Python Data Source API (as of Spark 4.1) does NOT prune columns
        # at the source — this recording makes the limitation assertable
        # instead of assumed (projection folds into the Project atop the
        # BatchScan; the real JVM connector receives a pruned schema).
        self._record({"columns": self.fields, "pushed": [], "rejected": []})

    def _record(self, payload: dict) -> None:
        with open(
            os.path.join(self.dir, "_read_pushdown.json"), "w", encoding="utf-8"
        ) as fh:
            json.dump(payload, fh, default=_json_default)

    def pushFilters(self, filters):
        """Accept the CQL-pushable predicate shapes and apply them source-
        side in :meth:`read`; everything else is returned to Spark for
        post-scan evaluation (exactly the split the real connector makes).
        Only invoked when ``spark.sql.python.filterPushdown.enabled`` is
        true — the recorded file lets tests assert the pushdown reached
        the connector."""
        rejected = []
        for f in filters:
            if isinstance(f, _PUSHABLE) and len(f.attribute) == 1:
                self.pushed.append(f)
            else:
                rejected.append(f)
        self._record(
            {
                "columns": self.fields,
                "pushed": [_filter_json(f) for f in self.pushed],
                "rejected": [_filter_json(f) for f in rejected],
            }
        )
        yield from rejected

    def _keep(self, obj: dict) -> bool:
        for f in self.pushed:
            v = obj.get(f.attribute[0])
            if isinstance(f, IsNull):
                if v is not None:
                    return False
            elif v is None:
                return False  # comparisons and IsNotNull all reject NULL
            elif isinstance(f, EqualTo):
                if v != f.value:
                    return False
            elif isinstance(f, GreaterThan):
                if not v > f.value:
                    return False
            elif isinstance(f, GreaterThanOrEqual):
                if not v >= f.value:
                    return False
            elif isinstance(f, LessThan):
                if not v < f.value:
                    return False
            elif isinstance(f, LessThanOrEqual):
                if not v <= f.value:
                    return False
        return True

    def partitions(self):
        # one partition per part file — scan parallelism mirrors the
        # connector's token-range splits
        files = sorted(
            f for f in os.listdir(self.dir) if f.startswith("part-")
        )
        return [_FilePartition(os.path.join(self.dir, f)) for f in files]

    def read(self, partition):
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                if line.strip():
                    obj = json.loads(line)
                    if self._keep(obj):
                        yield tuple(obj.get(name) for name in self.fields)


class _Commit(WriterCommitMessage):
    pass


class FakeCassandraWriter(DataSourceWriter):
    def __init__(self, dir_: str):
        self.dir = dir_

    def write(self, iterator):
        path = os.path.join(self.dir, f"part-{uuid.uuid4().hex}.jsonl")
        with open(path, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict(), default=_json_default) + "\n")
        return _Commit()

    def commit(self, messages):
        return None

    def abort(self, messages):
        return None


class FakeCassandraDataSource(DataSource):
    """Registered under the real connector's format name so the Cassandra
    stages execute verbatim against it."""

    @classmethod
    def name(cls):
        return FORMAT_NAME

    def schema(self):
        dir_ = _table_dir(self.options)
        schema_path = os.path.join(dir_, "_schema.json")
        if not os.path.exists(schema_path):
            raise ValueError(
                f"table {self.options.get('keyspace')}.{self.options.get('table')} "
                "does not exist in the fake cluster"
            )
        with open(schema_path, encoding="utf-8") as fh:
            schema = T.StructType.fromJson(json.load(fh))
        # driver-side: record the verbatim read options for contract asserts
        with open(os.path.join(dir_, "_read_options.json"), "w", encoding="utf-8") as fh:
            json.dump(dict(self.options), fh)
        return schema

    def reader(self, schema):
        return FakeCassandraReader(_table_dir(self.options), schema)

    def writer(self, schema, overwrite):
        dir_ = _table_dir(self.options)
        os.makedirs(dir_, exist_ok=True)
        if overwrite:
            # Cassandra truncates on Overwrite — which is exactly why the
            # stage gates this mode behind confirm.truncate
            for f in os.listdir(dir_):
                if f.startswith("part-"):
                    os.remove(os.path.join(dir_, f))
        with open(os.path.join(dir_, "_schema.json"), "w", encoding="utf-8") as fh:
            json.dump(schema.jsonValue(), fh)
        with open(
            os.path.join(dir_, "_write_options.json"), "w", encoding="utf-8"
        ) as fh:
            json.dump({**dict(self.options), "__overwrite": overwrite}, fh)
        return FakeCassandraWriter(dir_)


def register_fake_cassandra(spark) -> None:
    """Idempotently register the double on the session. Only for tests /
    clusters without the real connector — registering on a cluster that HAS
    the connector jar would shadow nothing (JVM sources win the lookup).

    Also enables ``spark.sql.python.filterPushdown.enabled``: Spark refuses
    to plan a Python source whose reader implements ``pushFilters`` while
    the conf is off, and the pushdown contract is part of what this double
    exists to witness."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(FakeCassandraDataSource)
