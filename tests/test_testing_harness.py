"""dataset_equality port (TestUtils.scala:88-125): the known_data /
known_data_altered pair is the reference's canonical must-fail case."""

from __future__ import annotations

from arc_cassandra_pipeline_plugin_spark.testing import (
    cast_all_to_string,
    dataset_diff,
    dataset_equality,
)


def test_equal_datasets_match_regardless_of_order(spark, known_data):
    reversed_df = known_data.orderBy(known_data.columns[0])
    assert dataset_equality(known_data, reversed_df)


def test_altered_dataset_detected(known_data, known_data_altered):
    """Exactly one row differs (two fields) — must fail with one row on
    each side of the diff (TestUtils.scala:139-150)."""
    assert not dataset_equality(known_data, known_data_altered)
    diff = dataset_diff(known_data, known_data_altered)
    assert len(diff.left_only) == 1 and len(diff.right_only) == 1


def test_duplicate_multiplicity_detected(known_data):
    doubled = known_data.union(known_data)
    assert not dataset_equality(known_data, doubled)


def test_column_set_mismatch(known_data):
    assert not dataset_equality(known_data, known_data.drop("booleanDatum"))


def test_cast_all_to_string(known_data):
    """TestUtils.scala:152-155."""
    s = cast_all_to_string(known_data)
    assert all(f.dataType.simpleString() == "string" for f in s.schema)
    assert s.count() == known_data.count()
