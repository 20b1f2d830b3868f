"""Generate OPERATORS.md — a public-API reference for every operator
module, from signatures + first docstring lines. Run after adding or
changing operators: ``python tools/gen_operators_md.py``."""

from __future__ import annotations

import importlib
import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODULES = [
    "archive", "blocking",
    "dedup", "similarity", "text", "timeseries", "ranking", "packing",
    "graph", "linalg", "sketches", "bloom", "layout", "skew", "sampling",
    "quality", "multimodal", "spatial",
]


def main() -> None:
    lines = [
        "# OPERATORS — public API reference",
        "",
        "Generated from docstrings (`python tools/gen_operators_md.py`). Each entry is a",
        "plain `DataFrame -> DataFrame` function (or column helper); scale posture and",
        "cross-engine determinism notes live in the docstrings and `SCALE.md`.",
        "",
    ]
    n = 0
    for m in MODULES:
        mod = importlib.import_module(
            f"arc_cassandra_pipeline_plugin_spark.operators.{m}"
        )
        lines.append(f"## `operators.{m}`")
        lines += ["", (mod.__doc__ or "").strip().split("\n")[0], ""]
        for name, fn in sorted(vars(mod).items()):
            if (
                name.startswith("_")
                or not inspect.isfunction(fn)
                or fn.__module__ != mod.__name__
            ):
                continue
            try:
                sig = str(inspect.signature(fn))
            except (ValueError, TypeError):
                sig = "(...)"
            doc = (fn.__doc__ or "").strip().split("\n")[0].rstrip()
            lines.append(f"- **`{name}{sig}`** — {doc}")
            n += 1
        lines.append("")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "OPERATORS.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote OPERATORS.md: {n} functions across {len(MODULES)} modules")


if __name__ == "__main__":
    main()
