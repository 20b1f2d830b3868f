"""Custom Python DataSource (Spark 4 API): partition-aware synthetic source
and the two-phase-commit manifest sink."""

from __future__ import annotations

import os

from arc_cassandra_pipeline_plugin_spark.sources.pyds import (
    register_python_datasources,
    synthetic_doc,
)


def _read(spark, rows, parts):
    register_python_datasources(spark)
    return (
        spark.read.format("synthetic_docs")
        .option("rows", rows)
        .option("partitions", parts)
        .load()
    )


def test_source_partitioning_and_content(spark):
    df = _read(spark, 1000, 4)
    assert df.rdd.getNumPartitions() == 4
    got = {tuple(r) for r in df.collect()}
    assert got == {synthetic_doc(i) for i in range(1000)}


def test_source_rows_split_exactly(spark):
    # uneven split must neither drop nor duplicate rows
    df = _read(spark, 103, 8)
    assert df.count() == 103
    assert df.select("doc_id").distinct().count() == 103


def test_manifest_sink_two_phase_commit(spark, tmp_path):
    out = str(tmp_path / "sink")
    df = _read(spark, 500, 5)
    df.write.format("manifest_sink").mode("append").option("path", out).save()
    lines = open(os.path.join(out, "manifest.tsv")).read().strip().splitlines()
    assert len(lines) == 5  # one commit message per partition
    assert sum(int(l.split("\t")[1]) for l in lines) == 500
    # no leftover temp file from the commit
    assert not os.path.exists(os.path.join(out, "_manifest.tmp"))


def test_register_is_idempotent(spark):
    register_python_datasources(spark)
    register_python_datasources(spark)
    assert _read(spark, 10, 2).count() == 10


def test_stream_reader_matches_batch(spark, tmp_path):
    """The streaming reader must deliver exactly the batch corpus across
    micro-batches (no loss, no duplication), with the offset advancing
    batch_rows ids per micro-batch."""
    import time

    register_python_datasources(spark)
    stream = (
        spark.readStream.format("synthetic_docs")
        .option("rows", 350)
        .option("batch_rows", 100)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("pyds_stream_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_pyds"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = time.time() + 120
    try:
        while time.time() < deadline:
            if spark.table("pyds_stream_out").count() >= 350:
                break
            time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination(30)
    got = {tuple(r) for r in spark.table("pyds_stream_out").collect()}
    assert got == {synthetic_doc(i) for i in range(350)}
