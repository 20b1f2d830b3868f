"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API).

The reference is, at its core, a source/sink connector plugin
(``CassandraExtract.scala`` / ``CassandraLoad.scala`` delegate scan and
write to the Spark-Cassandra connector's DataSource V2 implementation).
The Spark-native way to re-express "add a custom source/sink" in this repo
is the Python DataSource API: partition-aware batch reads (each
``InputPartition`` scans independently on an executor — the same
partition-per-token-range model the Cassandra connector uses) and
per-partition writes with a driver-side commit.

Two implementations:

- ``SyntheticDocsSource`` (format ``synthetic_docs``): deterministic
  synthetic document corpus — content is ``md5(doc_id)``, so every row is
  reproducible from pure SQL in any engine (the certified query's DuckDB
  oracle regenerates the identical table from ``range()``). Options:
  ``rows`` (total), ``partitions`` (parallelism).
- ``manifest_sink`` — a writer that records one manifest line per
  partition (row count + content checksum) and commits them as one
  manifest file: the minimal faithful shape of a distributed sink
  (executor-side write tasks, driver-side atomic commit), testable without
  external services.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


def synthetic_doc(doc_id: int) -> tuple[int, str, str]:
    """One deterministic synthetic document row (shared by source + tests).
    text = md5 of the id (reproducible as ``md5(CAST(i AS VARCHAR))`` in
    any SQL engine); source cycles over 5 buckets."""
    return doc_id, hashlib.md5(str(doc_id).encode()).hexdigest(), f"src_{doc_id % 5}"


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))

    def partitions(self):
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition: InputPartition):
        i = partition.value
        lo = self.rows * i // self.n_parts
        hi = self.rows * (i + 1) // self.n_parts
        for d in range(lo, hi):
            yield synthetic_doc(d)


class SyntheticDocsStreamReader:
    """Streaming counterpart (``SimpleDataSourceStreamReader``): emits the
    same deterministic corpus as the batch reader, ``batch_rows`` ids per
    micro-batch, with the offset = next unemitted id. ``read`` advances the
    offset; ``readBetweenOffsets`` replays any committed range exactly
    (deterministic content makes replay trivially exactly-once) — the two
    halves of the streaming-source contract the Cassandra connector's CDC
    readers implement natively."""

    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.batch_rows = int(options.get("batch_rows", 100))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = int(start["next"])
        hi = min(lo + self.batch_rows, self.rows)
        # list ITERATORS, not generators: Spark's prefetch cache copies the
        # returned iterator for replay; list iterators are copyable,
        # generators are not
        return iter([synthetic_doc(d) for d in range(lo, hi)]), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [synthetic_doc(d) for d in range(int(start["next"]), int(end["next"]))]
        )

    def commit(self, end: dict) -> None:
        pass


class SyntheticDocsSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id BIGINT, text STRING, source STRING"

    def reader(self, schema) -> DataSourceReader:
        return SyntheticDocsReader(self.options)

    def simpleStreamReader(self, schema) -> "SyntheticDocsStreamReader":
        return SyntheticDocsStreamReader(self.options)


@dataclass
class _ManifestCommit(WriterCommitMessage):
    part_id: int
    n_rows: int
    checksum: str


class ManifestWriter(DataSourceWriter):
    """Executor-side: stream rows, keep a count + order-insensitive XOR
    checksum (never buffers the partition). Driver-side commit writes ONE
    manifest atomically — the two-phase commit shape every real sink
    (including the Cassandra connector's) follows."""

    def __init__(self, options: dict):
        self.path = options["path"]

    def write(self, iterator) -> _ManifestCommit:
        from pyspark import TaskContext

        n = 0
        acc = 0
        for row in iterator:
            n += 1
            digest = hashlib.md5("|".join(str(v) for v in row).encode()).digest()
            acc ^= int.from_bytes(digest[:8], "big")
        pid = TaskContext.get().partitionId()
        return _ManifestCommit(part_id=pid, n_rows=n, checksum=f"{acc:016x}")

    def commit(self, messages) -> None:
        os.makedirs(self.path, exist_ok=True)
        lines = sorted(
            f"{m.part_id}\t{m.n_rows}\t{m.checksum}\n" for m in messages
        )
        tmp = os.path.join(self.path, "_manifest.tmp")
        with open(tmp, "w") as fh:
            fh.writelines(lines)
        os.replace(tmp, os.path.join(self.path, "manifest.tsv"))

    def abort(self, messages) -> None:
        tmp = os.path.join(self.path, "_manifest.tmp")
        if os.path.exists(tmp):
            os.remove(tmp)


class ManifestSink(DataSource):
    @classmethod
    def name(cls) -> str:
        return "manifest_sink"

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return ManifestWriter(self.options)


def register_python_datasources(spark) -> None:
    """Idempotently register both custom data sources on the session."""
    spark.dataSource.register(SyntheticDocsSource)
    spark.dataSource.register(ManifestSink)
