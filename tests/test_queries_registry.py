"""Registry-wide smoke: every certified query runs at sf0.001 with a
non-degenerate, stable schema; oracle strings are well-formed DuckDB SQL.
(Exact value certification lives in tools/selfcheck.py, which the project
verify skill runs against sf0.01 — the driver's gate.)"""

from __future__ import annotations

import duckdb
import pytest

from arc_cassandra_pipeline_plugin_spark.queries import load_all
from arc_cassandra_pipeline_plugin_spark.sources import TABLES, table_path
from tests.conftest import SF_SMALL

REGISTRY = load_all()

#: queries intentionally without an oracle — EMPTY since round 2: every
#: registered query (including the approximate/ANN/array ones) carries a
#: DuckDB oracle (to_json'd outputs, generated SRP/IVF SQL, error-bound
#: certification for sketches)
ROWS_ONLY: set[str] = set()


def test_registry_covers_survey_categories():
    cats = {q.category for q in REGISTRY.values()}
    assert {
        "aggregation", "join", "scan", "window", "setop", "scalar", "sort",
        "text", "dedup", "similarity", "timeseries", "multimodal", "pipeline",
    } <= cats


def test_oracle_coverage():
    missing = {n for n, q in REGISTRY.items() if q.oracle is None} - ROWS_ONLY
    assert not missing, f"queries without oracle SQL: {missing}"


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    import os

    for t in TABLES:
        p = table_path(SF_SMALL, t)
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_runs_and_oracle_parses(spark, oracle_con, name):
    q = REGISTRY[name]
    df = q.fn(spark, SF_SMALL)
    assert df.columns, f"{name}: empty schema"
    assert len(df.columns) == len(set(df.columns)), f"{name}: duplicate column names"
    n = df.count()
    assert n >= 0
    if q.oracle is not None:
        rel = oracle_con.sql(q.oracle)
        ocols = [d[0] for d in rel.description]
        assert sorted(ocols) == sorted(df.columns), (
            f"{name}: column mismatch spark={sorted(df.columns)} oracle={sorted(ocols)}"
        )
