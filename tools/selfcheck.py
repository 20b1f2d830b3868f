"""Local replica of the driver's correctness gate: run every registered
query on Spark AND its DuckDB oracle on the same parquet tables, compare
row count + sorted-column value multiset EXACTLY (stricter than the
driver's hash — if this passes, any reasonable hash matches).

Usage: python tools/selfcheck.py [sf_dir] [query ...]
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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    registry = load_all()
    unknown = only - set(registry)
    if unknown:
        print(f"FAIL unknown query name(s): {sorted(unknown)}")
        return 1
    spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TABLES:
        p = table_path(sf_dir, t)
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = []
    for name, q in sorted(registry.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            continue
        if q.oracle is None:
            print(f"ok   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(q.oracle)
            ocols = [d[0] for d in rel.description]
            orows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: oracle error: {type(e).__name__}: {str(e)[:300]}")
            continue
        if sorted(scols) != sorted(ocols):
            failures.append(name)
            print(f"FAIL {name}: columns spark={sorted(scols)} oracle={sorted(ocols)}")
            continue
        sm = frame_multiset(scols, srows)
        om = frame_multiset(ocols, orows)
        if sm == om:
            print(f"ok   {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")
        else:
            failures.append(name)
            missing = [k for k in om if om[k] != sm.get(k, 0)][:3]
            extra = [k for k in sm if sm[k] != om.get(k, 0)][:3]
            print(
                f"FAIL {name}: value mismatch (spark {len(srows)} rows, oracle {len(orows)} rows)"
            )
            for k in missing:
                print(f"   oracle-side: {k} x{om[k]} (spark has {sm.get(k,0)})")
            for k in extra:
                print(f"   spark-side:  {k} x{sm[k]} (oracle has {om.get(k,0)})")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
