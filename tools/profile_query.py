"""Stage-level profiler for one certified query (optimization guide §1).

Runs a named query into the noop sink on a bench-identical session with
event logging enabled, then parses the event log into a per-stage table:
wall duration, summed executor run time, task count, input bytes, shuffle
read/write bytes — the attribution the Spark UI would show, reconstructed
headlessly. One untimed warmup pass precedes the timed pass so JIT and
codegen compile outside the measurement (bench protocol parity).

Usage:
  python tools/profile_query.py <name> [--sf-dir DIR] [--trials N] [--plan OUT]

Default fixture is the bench's split sf0.1 twin (what BENCH_r*.json
measures). ``--plan OUT`` additionally writes ``explain('formatted')`` to
OUT (the plans/r11 evidence files).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def build_session(event_dir: str) -> SparkSession:
    """The bench session (sources.get_spark config) + event logging."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile_query")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.warehouse.dir", "/tmp/spark-graft-warehouse")
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", event_dir)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .getOrCreate()
    )


def parse_event_log(event_dir: str, t_mark_ms: float):
    """Aggregate the (single) event log: stages completed after t_mark_ms,
    with per-stage wall/cpu/io attribution summed from task-end events."""
    files = []
    for root, _dirs, names in os.walk(event_dir):
        for f in names:
            if not f.startswith(".") and "appstatus" not in f:
                files.append(os.path.join(root, f))
    stages: dict[tuple[int, int], dict] = {}
    job_of_stage: dict[int, tuple[int, str]] = {}
    for path in files:
        with open(path) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                kind = ev.get("Event")
                if kind == "SparkListenerJobStart":
                    desc = (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    )
                    for sid in ev.get("Stage IDs", []):
                        job_of_stage[sid] = (ev["Job ID"], desc)
                elif kind == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    sub = si.get("Submission Time")
                    com = si.get("Completion Time")
                    if sub is None or com is None or com < t_mark_ms:
                        continue
                    key = (si["Stage ID"], si["Stage Attempt ID"])
                    stages.setdefault(key, {}).update(
                        name=si.get("Stage Name", "")[:80],
                        wall_ms=com - sub,
                        submitted_ms=sub,
                        n_tasks=si.get("Number of Tasks", 0),
                    )
                elif kind == "SparkListenerTaskEnd":
                    key = (ev["Stage ID"], ev["Stage Attempt ID"])
                    tm = ev.get("Task Metrics") or {}
                    agg = stages.setdefault(key, {})
                    agg["run_ms"] = agg.get("run_ms", 0) + tm.get(
                        "Executor Run Time", 0
                    )
                    srm = tm.get("Shuffle Read Metrics") or {}
                    swm = tm.get("Shuffle Write Metrics") or {}
                    inm = tm.get("Input Metrics") or {}
                    agg["shuf_read"] = (
                        agg.get("shuf_read", 0)
                        + srm.get("Local Bytes Read", 0)
                        + srm.get("Remote Bytes Read", 0)
                    )
                    agg["fetch_wait_ms"] = agg.get("fetch_wait_ms", 0) + srm.get(
                        "Fetch Wait Time", 0
                    )
                    agg["shuf_write"] = agg.get("shuf_write", 0) + swm.get(
                        "Shuffle Bytes Written", 0
                    )
                    agg["input_bytes"] = agg.get("input_bytes", 0) + inm.get(
                        "Bytes Read", 0
                    )
    rows = []
    for (sid, att), agg in stages.items():
        if "wall_ms" not in agg:
            continue  # stage from before the mark or never completed
        job_id, desc = job_of_stage.get(sid, (-1, ""))
        rows.append(
            dict(
                stage=sid,
                attempt=att,
                job=job_id,
                desc=desc,
                **agg,
            )
        )
    rows.sort(key=lambda r: r["submitted_ms"])
    return rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("name")
    ap.add_argument("--sf-dir", default=None)
    ap.add_argument("--trials", type=int, default=1)
    ap.add_argument("--plan", default=None, help="write explain(formatted) here")
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()

    from bench import _split_fixture_dir  # noqa: E402
    from arc_cassandra_pipeline_plugin_spark.queries import load_all  # noqa: E402

    sf_dir = args.sf_dir or _split_fixture_dir("/root/testdata/sf0.1")
    registry = load_all()
    q = registry[args.name]

    event_dir = tempfile.mkdtemp(prefix="profile_evlog_")
    spark = build_session(event_dir)
    spark.sparkContext.setLogLevel("ERROR")

    if args.plan:
        df = q.fn(spark, sf_dir)
        from arc_cassandra_pipeline_plugin_spark.plans import explain_str

        with open(args.plan, "w") as fh:
            fh.write(explain_str(df, "formatted"))
        print(f"plan -> {args.plan}")

    if not args.no_warmup:
        spark.sparkContext.setJobDescription(f"warmup:{args.name}")
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    t_mark_ms = time.time() * 1000
    walls = []
    for i in range(args.trials):
        spark.sparkContext.setJobDescription(f"timed:{args.name}:{i}")
        t0 = time.time()
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls.append(time.time() - t0)
    spark.sparkContext.setJobDescription(None)

    # flush the event log by stopping the session
    spark.stop()
    rows = parse_event_log(event_dir, t_mark_ms)

    print(f"\nquery={args.name} sf_dir={sf_dir}")
    print("timed walls:", [round(w, 3) for w in walls])
    total_wall = sum(r["wall_ms"] for r in rows)
    print(
        f"{len(rows)} stages (timed region), sum(stage wall)={total_wall} ms"
        " — overlapping stages double-count\n"
    )
    hdr = (
        f"{'stage':>5} {'job':>4} {'wall_ms':>8} {'run_ms':>8} {'tasks':>5} "
        f"{'input':>9} {'sh_read':>9} {'sh_write':>9} {'fetchw':>7}  desc/name"
    )
    print(hdr)
    for r in rows:
        print(
            f"{r['stage']:>5} {r['job']:>4} {r['wall_ms']:>8} "
            f"{r.get('run_ms', 0):>8} {r.get('n_tasks', 0):>5} "
            f"{r.get('input_bytes', 0):>9} {r.get('shuf_read', 0):>9} "
            f"{r.get('shuf_write', 0):>9} {r.get('fetch_wait_ms', 0):>7}  "
            f"{(r['desc'] or r['name'])[:70]}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
