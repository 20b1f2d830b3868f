"""Registry-wide smoke: every certified query runs at sf0.001 with a
non-degenerate, stable schema; oracle strings are well-formed DuckDB SQL.
(Exact value certification lives in tools/selfcheck.py, which the project
verify skill runs against sf0.01 — the driver's gate.)"""

from __future__ import annotations

import os

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
    for t in TABLES:
        p = table_path(SF_SMALL, t)
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def test_percentile_calls_use_lossless_accuracy():
    """Every approx_percentile call in the certified queries must use the
    shared lossless accuracy (functions.LOSSLESS_PCTL_ACC): the
    quantile_disc oracle equivalence holds only while per-group rows ≤
    accuracy, and r10's ADVICE found sf1 fixtures already crossing the
    old 1e6 bound's rank-error guarantee. A drifting literal at one call
    site reintroduces the silent-fork class — this pins them all."""
    import re

    from arc_cassandra_pipeline_plugin_spark import functions as FN

    qdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "arc_cassandra_pipeline_plugin_spark",
        "queries",
    )
    pat = re.compile(r"approx_percentile\([^)]*?,\s*(\d[\d_]*)\)")
    offenders = []
    for fname in sorted(os.listdir(qdir)):
        if not fname.endswith(".py"):
            continue
        src = open(os.path.join(qdir, fname)).read()
        for m in pat.finditer(src):
            acc = int(m.group(1).replace("_", ""))
            if acc != FN.LOSSLESS_PCTL_ACC:
                line = src[: m.start()].count("\n") + 1
                offenders.append(f"{fname}:{line} accuracy={acc}")
    assert not offenders, (
        f"approx_percentile accuracy drift from LOSSLESS_PCTL_ACC="
        f"{FN.LOSSLESS_PCTL_ACC}: {offenders}"
    )


def _spark_type_cat(dt) -> str:
    """Collapse a Spark output type into the hash-comparison category the
    external driver's normalizer sees."""
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.ArrayType):
        return "list:" + _spark_type_cat(dt.elementType)
    return "other:" + dt.simpleString()


def _duck_type_cat(t: str) -> str:
    t = str(t).upper()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("FLOAT", "REAL", "DOUBLE"):
        return "float"
    if t.startswith("DECIMAL"):
        return "decimal"
    if t in ("VARCHAR", "TEXT", "STRING", "JSON"):
        # JSON folds into str: DuckDB's to_json yields JSON-typed columns
        # whose Python value is the same string Spark's to_json returns
        return "str"
    if t == "BOOLEAN":
        return "bool"
    if t == "DATE":
        return "date"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t.endswith("[]"):
        return "list:" + _duck_type_cat(t[:-2])
    return "other:" + t


#: category pairs (spark, duck) that hash identically through the driver's
#: normalization even though the engine types differ: DuckDB decimals are
#: fetched as float64 (lossy-normalized), so an oracle DECIMAL compares as
#: a float against a Spark double. The REVERSE is NOT safe — Spark decimal
#: outputs survive collection as decimal.Decimal objects and hash
#: differently from the oracle's floats (r10 agg_decimal_exact, the
#: round's only red driver row), hence the hard ban below.
_COMPATIBLE = {("float", "decimal")}


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_runs_and_oracle_parses(spark, oracle_con, name):
    q = REGISTRY[name]
    df = q.fn(spark, SF_SMALL)
    assert df.columns, f"{name}: empty schema"
    assert len(df.columns) == len(set(df.columns)), f"{name}: duplicate column names"
    n = df.count()
    assert n >= 0

    # driver-hash type audit (VERDICT r10 task #5): Spark output schemas
    # must never contain decimal columns — the driver's hasher sees Spark
    # decimals as Decimal objects but oracle decimals as floats, so a
    # value-identical result still hash-mismatches. End every decimal
    # pipeline with an explicit on-grid round + cast to DOUBLE (or an
    # identical mirrored DECIMAL(p,s) — but nothing in the registry needs
    # that today, so the simple invariant is a flat ban).
    for field in df.schema.fields:
        assert _spark_type_cat(field.dataType) != "decimal", (
            f"{name}.{field.name}: decimal-typed Spark output "
            f"({field.dataType.simpleString()}) — driver-hash hazard; cast "
            f"to DOUBLE after on-grid rounding (see r10 agg_decimal_exact)"
        )

    if q.oracle is not None:
        rel = oracle_con.sql(q.oracle)
        ocols = [d[0] for d in rel.description]
        assert sorted(ocols) == sorted(df.columns), (
            f"{name}: column mismatch spark={sorted(df.columns)} oracle={sorted(ocols)}"
        )
        # per-column type-category agreement under the driver's
        # normalization rules — type-level divergence fails here in
        # pytest, not in the external driver gate
        stypes = {f.name: _spark_type_cat(f.dataType) for f in df.schema.fields}
        otypes = dict(zip(rel.columns, [_duck_type_cat(t) for t in rel.types]))
        for col in sorted(stypes):
            s, o = stypes[col], otypes[col]
            assert s == o or (s, o) in _COMPATIBLE, (
                f"{name}.{col}: incompatible output types spark={s} "
                f"oracle={o} — these normalize differently through the "
                f"driver's value hasher"
            )
