"""Rotating sf0.1-scale certification sample (r6 verdict item 3).

Correctness is fully swept at sf0.001/sf0.01; at sf0.1 adaptive features
(AQE, the setsim cost gate, hot-block salting) can elect DIFFERENT
physical plans, so each round certifies a fresh 50-query sample at sf0.1
via tools/selfcheck.py. Disjointness across rounds is structural: names
already present in any committed SELFCHECK_SF01_r*.json are excluded
before the md5-ordered pick, so the sweep walks the whole registry over
rounds instead of resampling the same queries.

Usage:
  python tools/sf01_rotation.py [N]          # print this round's N names
  python tools/selfcheck.py --json SELFCHECK_SF01_r{R}.json \
      /root/testdata/sf0.1 $(python tools/sf01_rotation.py)
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pick(n: int = 50) -> list[str]:
    from arc_cassandra_pipeline_plugin_spark.queries import load_all

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    done: set[str] = set()
    for f in os.listdir(root):
        if re.fullmatch(r"SELFCHECK_SF01_r\d+\.json", f):
            with open(os.path.join(root, f)) as fh:
                done.update(json.load(fh).keys())
    names = [q for q in load_all() if q not in done]
    names.sort(key=lambda q: hashlib.md5(f"sf01:{q}".encode()).hexdigest())
    return names[:n]


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    print("\n".join(pick(n)))
