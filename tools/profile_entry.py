"""Per-entry profiler: run one registry entry exactly the way bench.py
does (same session shape, same warmup, same noop-sink timed action) and
attribute its wall time to individual Spark jobs via the event log.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
        python tools/profile_entry.py <entry> [<entry> ...] [--runs N]

For each entry prints: cold sec, warm secs, then the per-job table of
the LAST run (job id, duration ms, callsite) so the expensive jobs are
named — guide §1's "find out where the time actually goes" applied at
entry granularity.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from hadoop_app_spark import get_spark  # noqa: E402


def _parse_eventlog(log_dir: str) -> list[dict]:
    """[{job_id, ms, desc, callsite, t0}] from the newest event log."""
    logs = sorted(Path(log_dir).glob("*"), key=lambda p: p.stat().st_mtime)
    if not logs:
        return []
    newest = logs[-1]
    if newest.is_dir():  # Spark 4 rolling layout: eventlog_v2_<appid>/events_*
        parts = sorted(
            p for p in newest.iterdir() if p.name.startswith("events_")
        )
    else:
        parts = [newest]
    starts: dict[int, dict] = {}
    jobs: list[dict] = []
    for part in parts:
        _parse_part(part, starts, jobs)
    return jobs


def _parse_part(path: Path, starts: dict, jobs: list) -> None:
    with open(path) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if ev.get("Event") == "SparkListenerJobStart":
                props = ev.get("Properties") or {}
                starts[ev["Job ID"]] = {
                    "t0": ev["Submission Time"],
                    "desc": props.get("spark.job.description", ""),
                    "callsite": props.get("callSite.short", ""),
                }
            elif ev.get("Event") == "SparkListenerJobEnd":
                s = starts.pop(ev["Job ID"], None)
                if s:
                    jobs.append(
                        {
                            "job_id": ev["Job ID"],
                            "ms": ev["Completion Time"] - s["t0"],
                            "t0": s["t0"],
                            "desc": s["desc"],
                            "callsite": s["callsite"],
                        }
                    )


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 3
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs = int(a.split("=", 1)[1]) if "=" in a else runs
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    log_dir = "/tmp/prof_eventlog"
    import shutil

    shutil.rmtree(log_dir, ignore_errors=True)
    os.makedirs(log_dir, exist_ok=True)
    spark = get_spark(
        "profile_entry",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    from hadoop_app_spark.queries import REGISTRY

    # bench.py's warmup, verbatim
    REGISTRY["max_per_group"].fn(spark, sf_dir).collect()
    spark.range(32).repartition(8).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    for name in args:
        times = []
        marks = []
        for i in range(runs):
            t_mark = time.time() * 1000
            t0 = time.perf_counter()
            df = REGISTRY[name].fn(spark, sf_dir)
            t_build = time.perf_counter() - t0
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            times.append((round(dt, 3), round(t_build, 3)))
            marks.append(t_mark)
        print(f"\n=== {name}: runs (total, fn-build) = {times}")
        # flush the event log and attribute the LAST run's jobs
        spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
        jobs = [j for j in _parse_eventlog(log_dir) if j["t0"] >= marks[-1] - 50]
        jobs.sort(key=lambda j: -j["ms"])
        tot = sum(j["ms"] for j in jobs)
        print(f"    last run: {len(jobs)} jobs, {tot} ms in jobs")
        for j in jobs[:15]:
            print(f"    {j['ms']:7d} ms  job {j['job_id']:4d}  {j['callsite'][:60]}  {j['desc'][:40]}")
    spark.stop()


if __name__ == "__main__":
    main()
