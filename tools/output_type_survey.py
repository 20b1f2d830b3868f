"""One-off survey: per-column Spark-vs-DuckDB output type categories for
every registered query — input data for the mechanical output-type audit
test (VERDICT r10 task #5). Prints any column whose engine type categories
differ, and every decimal-typed output on either side."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

import duckdb
from pyspark.sql import SparkSession
from pyspark.sql import types as T

from arc_cassandra_pipeline_plugin_spark.queries import load_all
from arc_cassandra_pipeline_plugin_spark.sources import TABLES, table_path

SF = "/root/testdata/sf0.001"


def spark_cat(dt) -> str:
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.ArrayType):
        return "list:" + spark_cat(dt.elementType)
    return "other:" + dt.simpleString()


def duck_cat(t: str) -> str:
    t = t.upper()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("FLOAT", "REAL", "DOUBLE"):
        return "float"
    if t.startswith("DECIMAL"):
        return t.lower()
    if t in ("VARCHAR", "TEXT", "STRING"):
        return "str"
    if t == "BOOLEAN":
        return "bool"
    if t == "DATE":
        return "date"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t.endswith("[]"):
        return "list:" + duck_cat(t[:-2])
    return "other:" + t


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        p = table_path(SF, t)
        if os.path.exists(p):
            src = f"{p}/part*" if os.path.isdir(p) else p
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    n_mismatch = 0
    for name, q in sorted(load_all().items()):
        if q.oracle is None:
            continue
        try:
            df = q.fn(spark, SF)
            rel = con.sql(q.oracle)
        except Exception as e:  # noqa: BLE001
            print(f"ERR\t{name}\t{type(e).__name__}: {str(e)[:120]}")
            continue
        stypes = {f.name: spark_cat(f.dataType) for f in df.schema.fields}
        otypes = dict(zip(rel.columns, [duck_cat(str(t)) for t in rel.types]))
        for col in sorted(set(stypes) & set(otypes)):
            s, o = stypes[col], otypes[col]
            if s != o:
                print(f"DIFF\t{name}\t{col}\t{s}\t{o}")
                n_mismatch += 1
    print(f"-- {n_mismatch} category mismatches", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
