"""Mechanical full-suite freshness gate (r9 verdict item 1 follow-up:
"make the round-close checklist's re-run-suite-after-ANY-registry-change
step mechanical").

The problem it closes: in r9 the committed suite figure was computed
BEFORE the round's last registry commit, so the round shipped with a red
test at HEAD. A prose checklist did not prevent that; a digest does.

Mechanism: ``tests/conftest.py`` writes ``SUITE_STAMP.json`` at the end
of any FULL-suite run (no -k/-m filter, no file selection, zero
failures), recording pass/fail/skip counts plus a content digest of every
``.py`` file under the package and ``tests/``. This module recomputes the
digest so anyone — builder at round close, driver, judge — can verify in
one command that the committed figure came from a run of EXACTLY the
committed source:

    python tools/suite_stamp.py          # exit 0 = stamp matches HEAD source
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def source_digest() -> str:
    """Content hash of every .py file the suite's result can depend on
    (package + tests + driver contract), path-labelled so renames count."""
    h = hashlib.sha256()
    pats = [
        "arc_cassandra_pipeline_plugin_spark/**/*.py",
        "tests/**/*.py",
        "__spark_entry__.py",
    ]
    files = sorted(
        f for pat in pats for f in glob.glob(os.path.join(ROOT, pat), recursive=True)
    )
    for f in files:
        h.update(os.path.relpath(f, ROOT).encode())
        with open(f, "rb") as fh:
            h.update(fh.read())
    return h.hexdigest()


def check() -> int:
    path = os.path.join(ROOT, "SUITE_STAMP.json")
    if not os.path.exists(path):
        print("STALE: SUITE_STAMP.json missing — run the full suite")
        return 1
    with open(path) as fh:
        stamp = json.load(fh)
    now = source_digest()
    if stamp.get("source_digest") != now:
        print(
            "STALE: source changed since the stamped full-suite run "
            f"(stamp {stamp.get('source_digest', '')[:12]}…, head {now[:12]}…) "
            "— re-run `python -m pytest tests/ -q`"
        )
        return 1
    if stamp.get("failed", 1) != 0:
        print(f"RED: stamped run had {stamp['failed']} failures")
        return 1
    print(
        f"FRESH: full suite at this exact source — {stamp['passed']} passed / "
        f"{stamp['failed']} failed / {stamp['skipped']} skipped ({stamp['when']})"
    )
    return 0


if __name__ == "__main__":
    sys.exit(check())
