"""Generate the per-query shuffle inventory in SCALE.md from the ACTUAL
physical plans — not from prose. For every registered query the tool builds
the plan at sf0.001 and records:

- number of Exchange nodes (hash / range / single-partition broken out),
- the dominant partitioning keys (what the biggest shuffles key on),
- nested-loop joins present (cross-checked against the declared plan_shape).

The table is written between the BEGIN/END markers in SCALE.md;
``tests/test_scale.py`` asserts the section's name set equals the registry
(a query added without regenerating is a test failure, so the 100×-scale
story stays auditable as the registry grows).

Usage: python tools/gen_scale_inventory.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BEGIN = "<!-- BEGIN GENERATED SHUFFLE INVENTORY (tools/gen_scale_inventory.py) -->"
END = "<!-- END GENERATED SHUFFLE INVENTORY -->"

_HASH_RE = re.compile(r"Exchange hashpartitioning\(([^)]*?)(?:,\s*\d+)?\)")
_RANGE_RE = re.compile(r"Exchange rangepartitioning\(")
_SINGLE_RE = re.compile(r"Exchange SinglePartition")
_ROUNDROBIN_RE = re.compile(r"Exchange RoundRobinPartitioning")
_COLREF_RE = re.compile(r"([A-Za-z_][A-Za-z0-9_]*)#\d+")


def plan_row(name: str, q, plan: str) -> str:
    n_hash = len(_HASH_RE.findall(plan))
    n_range = len(_RANGE_RE.findall(plan))
    n_single = len(_SINGLE_RE.findall(plan))
    n_rr = len(_ROUNDROBIN_RE.findall(plan))
    total = n_hash + n_range + n_single + n_rr

    # dominant keys: most frequent hash-partitioning column sets
    keysets: dict[str, int] = {}
    for m in _HASH_RE.finditer(plan):
        cols = sorted(set(_COLREF_RE.findall(m.group(1))))
        if cols:
            k = ", ".join(cols)
            keysets[k] = keysets.get(k, 0) + 1
    keys = "; ".join(
        k for k, _ in sorted(keysets.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    ) or "—"

    bnlj = "BroadcastNestedLoopJoin" in plan or "CartesianProduct" in plan
    shape = q.plan_shape or ""
    nl = f"yes ({shape})" if bnlj and shape else ("yes" if bnlj else "")
    detail = []
    if n_hash:
        detail.append(f"{n_hash}h")
    if n_range:
        detail.append(f"{n_range}r")
    if n_single:
        detail.append(f"{n_single}s")
    if n_rr:
        detail.append(f"{n_rr}rr")
    shuffles = f"{total}" + (f" ({'+'.join(detail)})" if detail and total else "")
    return f"| `{name}` | {shuffles} | {keys} | {nl} |"


def main() -> None:
    from arc_cassandra_pipeline_plugin_spark.queries import load_all
    from arc_cassandra_pipeline_plugin_spark.sources import get_spark

    registry = load_all()
    spark = get_spark("gen_scale_inventory")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    failed = []
    for name in sorted(registry):
        q = registry[name]
        if q.category == "pipeline":
            continue
        try:
            df = q.fn(spark, "/root/testdata/sf0.001")
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # env-gated queries (streaming fakes etc.)
            failed.append((name, str(exc).splitlines()[0][:80]))
            continue
        rows.append(plan_row(name, q, plan))

    lines = [
        BEGIN,
        "",
        "### Generated per-query shuffle inventory",
        "",
        f"Derived from the physical plans at sf0.001 ({len(rows)} queries;",
        "regenerate with `python tools/gen_scale_inventory.py` — the name set",
        "is CI-pinned against the registry). Shuffle notation: `h` hash,",
        "`r` range, `s` single-partition (scalar/limit collection points),",
        "`rr` round-robin. Keys are the hash-exchange columns (top 3 sets by",
        "frequency). Nested-loop entries carry their declared `plan_shape`",
        "(1-row scalar broadcasts / dimension-bounded / deliberate all-pairs",
        "— see `queries/__init__.py`); an undeclared nested loop fails",
        "`tests/test_plans.py::test_no_accidental_cartesian_anywhere`.",
        "",
        "| query | exchanges | dominant hash keys | nested loop |",
        "|---|---|---|---|",
        *rows,
    ]
    if failed:
        lines += ["", "Plan not derivable in this environment:", ""]
        lines += [f"- `{n}`: {msg}" for n, msg in failed]
    lines += ["", END]

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "SCALE.md")
    with open(path) as f:
        text = f.read()
    block = "\n".join(lines)
    if BEGIN in text:
        pre = text.split(BEGIN)[0]
        post = text.split(END)[1]
        text = pre + block + post
    else:
        text = text.rstrip() + "\n\n" + block + "\n"
    with open(path, "w") as f:
        f.write(text)
    print(f"SCALE.md inventory: {len(rows)} queries, {len(failed)} skipped")


if __name__ == "__main__":
    main()
