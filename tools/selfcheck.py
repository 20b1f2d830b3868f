"""Local replica of the driver's correctness gate: run every registered
query on Spark AND its DuckDB oracle on the same parquet tables, compare
row count + sorted-column value multiset EXACTLY (stricter than the
driver's hash — if this passes, any reasonable hash matches).

Usage: python tools/selfcheck.py [--json OUT.json] [sf_dir] [query ...]

--json writes a CORRECTNESS_r{N}.json-shaped report covering EVERY
registered query (the driver samples 50 per round; this is the
full-surface CI command).
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from arc_cassandra_pipeline_plugin_spark.queries import load_all
from arc_cassandra_pipeline_plugin_spark.sources import TABLES, get_spark, table_path


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return repr(float(v))
    except Exception:
        pass
    return v


def frame_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        key = tuple(norm_cell(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    plain = "--plain" in argv
    if plain:
        argv.remove("--plain")
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    registry = load_all()
    unknown = only - set(registry)
    if unknown:
        print(f"FAIL unknown query name(s): {sorted(unknown)}")
        return 1
    if plain:
        # the plain-session gauntlet: an UNCONFIGURED driver session (no
        # UTC pin, no tuned confs) — the config defenses in
        # sources.load_table must hold on whatever session the driver uses
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[32]")
            .appName("selfcheck-plain")
            .getOrCreate()
        )
    else:
        spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TABLES:
        p = table_path(sf_dir, t)
        if os.path.exists(p):
            # driver fixtures are single files; twin fixtures are Spark
            # multi-file directories (glob part files — works through
            # symlinked dirs, unlike a bare directory path)
            src = f"{p}/part*" if os.path.isdir(p) else p
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

    failures = []
    report: dict[str, dict] = {}
    for name, q in sorted(registry.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        rec = {
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        report[name] = rec
        try:
            sdf = q.fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(srows)
        except Exception as e:
            failures.append(name)
            rec["err"] = f"spark: {type(e).__name__}: {str(e)[:300]}"
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            continue
        if q.oracle is None:
            rec.update(rows_match=True, schema_match=True, hash_match=None,
                       err="rows-only (no oracle)")
            print(f"ok   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(q.oracle)
            ocols = [d[0] for d in rel.description]
            orows = rel.fetchall()
            rec["oracle_rows"] = len(orows)
        except Exception as e:
            failures.append(name)
            rec["err"] = f"oracle: {type(e).__name__}: {str(e)[:300]}"
            print(f"FAIL {name}: oracle error: {type(e).__name__}: {str(e)[:300]}")
            continue
        rec["rows_match"] = len(srows) == len(orows)
        if sorted(scols) != sorted(ocols):
            failures.append(name)
            rec["err"] = f"columns spark={sorted(scols)} oracle={sorted(ocols)}"
            print(f"FAIL {name}: columns spark={sorted(scols)} oracle={sorted(ocols)}")
            continue
        rec["schema_match"] = True
        sm = frame_multiset(scols, srows)
        om = frame_multiset(ocols, orows)
        if sm == om:
            rec["hash_match"] = True
            print(f"ok   {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")
        else:
            failures.append(name)
            rec["err"] = "value multiset mismatch"
            missing = [k for k in om if om[k] != sm.get(k, 0)][:3]
            extra = [k for k in sm if sm[k] != om.get(k, 0)][:3]
            print(
                f"FAIL {name}: value mismatch (spark {len(srows)} rows, oracle {len(orows)} rows)"
            )
            for k in missing:
                print(f"   oracle-side: {k} x{om[k]} (spark has {sm.get(k,0)})")
            for k in extra:
                print(f"   spark-side:  {k} x{sm[k]} (oracle has {om.get(k,0)})")
    if json_out:
        import json as _json

        with open(json_out, "w") as fh:
            _json.dump(report, fh, indent=1, sort_keys=True)
        print(f"wrote {json_out} ({len(report)} queries)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
