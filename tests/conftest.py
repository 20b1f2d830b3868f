from __future__ import annotations

import datetime
import os
import sys
from decimal import Decimal

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from arc_cassandra_pipeline_plugin_spark.sources import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark("tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture()
def ctx():
    from arc_cassandra_pipeline_plugin_spark.context import PipelineContext

    return PipelineContext(environment="test")


@pytest.fixture(scope="session")
def known_data(spark):
    """The reference's typed golden rows (TestUtils.scala:127-136; see
    FIXTURES.md §2)."""
    return spark.createDataFrame(_KNOWN_ROWS, schema=_KNOWN_SCHEMA)


@pytest.fixture(scope="session")
def known_data_altered(spark):
    """Altered variant: row 2 differs in booleanDatum and integerDatum only
    (TestUtils.scala:139-150) — the canonical must-fail diff pair."""
    rows = list(_KNOWN_ROWS)
    r2 = list(rows[1])
    r2[0] = True   # booleanDatum flipped
    r2[4] = 35     # integerDatum changed
    rows[1] = tuple(r2)
    return spark.createDataFrame(rows, schema=_KNOWN_SCHEMA)


_KNOWN_SCHEMA = (
    "booleanDatum boolean, dateDatum date, decimalDatum decimal(38,18), "
    "doubleDatum double, integerDatum int, longDatum bigint, stringDatum string, "
    "timeDatum string, timestampDatum timestamp"
)

_KNOWN_ROWS = [
    (
        True,
        datetime.date(2016, 12, 18),
        Decimal("54.321"),
        42.4242,
        17,
        1520828868,
        "test,breakdelimiter",
        "12:34:56",
        datetime.datetime(2017, 12, 20, 21, 46, 54, tzinfo=datetime.timezone.utc),
    ),
    (
        False,
        datetime.date(2016, 12, 19),
        Decimal("12.345"),
        21.2121,
        34,
        1520828123,
        "breakdelimiter,test",
        "23:45:16",
        datetime.datetime(2017, 12, 29, 17, 21, 49, tzinfo=datetime.timezone.utc),
    ),
]
