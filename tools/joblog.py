"""Parse a Spark event log into per-job latency and per-stage skew stats.

Usage: python tools/joblog.py <event-log-file-or-dir> [--min-job-ms 0]

Feeds two round-5 evidence items:
* the driver-latency decomposition (how many jobs a pipeline run issues,
  how much wall clock the sub-second ones add up to — the scale-flat term
  behind the one-box efficiency gap), and
* the mega-cluster straggler check (per-stage max/median task time — the
  north rule's skew-mitigation criterion; a salted hot key shows up here
  as max/median ≥ 4).

Run any bench with SPARK_GRAFT_EVENTLOG_DIR=<dir> to produce the log.
"""

from __future__ import annotations

import json
import os
import statistics
import sys


def _event_lines(path: str):
    """Yield event-log lines from a single-file log, a rolling-log directory
    (eventlog_v2_*/events_N_* parts, in order), or a .zstd-compressed part."""
    if os.path.isdir(path):
        # numeric part order: lexicographic would put events_10 before
        # events_2, splitting jobs across mis-ordered parts
        def part_no(f: str) -> int:
            try:
                return int(f.split("_")[1])
            except (IndexError, ValueError):
                return 1 << 30
        parts = sorted(
            (f for f in os.listdir(path) if f.startswith("events_")),
            key=part_no,
        )
        for p in parts:
            yield from _event_lines(os.path.join(path, p))
        return
    if path.endswith(".zstd"):
        import subprocess

        out = subprocess.run(
            ["zstd", "-dc", path], capture_output=True, check=True
        ).stdout
        yield from out.decode("utf-8", "replace").splitlines()
        return
    with open(path) as f:
        yield from f


def parse(path: str) -> dict:
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    for line in _event_lines(path):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        kind = ev.get("Event")
        if kind == "SparkListenerJobStart":
            props = ev.get("Properties") or {}
            # merge, never overwrite: if the JobEnd was parsed first (parts
            # processed out of order, or a rolling log split mid-job) a
            # fresh dict here would silently discard its "end"
            j = jobs.setdefault(ev["Job ID"], {})
            j.update(
                start=ev["Submission Time"],
                callsite=props.get("callSite.short", ""),
                n_stages=len(ev.get("Stage Infos") or []),
            )
        elif kind == "SparkListenerJobEnd":
            j = jobs.setdefault(ev["Job ID"], {})
            j["end"] = ev["Completion Time"]
        elif kind == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            info = ev.get("Task Info", {})
            dur = info.get("Finish Time", 0) - info.get("Launch Time", 0)
            stages.setdefault(sid, {"task_ms": []})["task_ms"].append(dur)
        elif kind == "SparkListenerStageCompleted":
            si = ev.get("Stage Info", {})
            stages.setdefault(si.get("Stage ID"), {"task_ms": []})[
                "name"
            ] = si.get("Stage Name", "")

    job_rows = []
    for jid, j in sorted(jobs.items()):
        if "start" in j and "end" in j:
            job_rows.append(
                {
                    "job": jid,
                    "ms": j["end"] - j["start"],
                    "start": j["start"],
                    "callsite": j.get("callsite", ""),
                    "n_stages": j.get("n_stages", 0),
                }
            )
    stage_rows = []
    for sid, s in sorted(stages.items()):
        ts = s.get("task_ms", [])
        if not ts:
            continue
        med = statistics.median(ts)
        stage_rows.append(
            {
                "stage": sid,
                "name": s.get("name", "")[:60],
                "n_tasks": len(ts),
                "task_ms_median": round(med, 1),
                "task_ms_max": max(ts),
                "skew_max_over_median": round(max(ts) / med, 2) if med else None,
                "task_ms_sum": sum(ts),
            }
        )
    return {"jobs": job_rows, "stages": stage_rows}


def summarize(parsed: dict, min_job_ms: int = 0) -> dict:
    jobs = [j for j in parsed["jobs"] if j["ms"] >= min_job_ms]
    small = [j for j in jobs if j["ms"] < 1000]
    worst = sorted(
        (s for s in parsed["stages"] if s["n_tasks"] >= 4),
        key=lambda s: -(s["skew_max_over_median"] or 0),
    )[:8]
    return {
        "n_jobs": len(jobs),
        "total_job_ms": sum(j["ms"] for j in jobs),
        "n_subsecond_jobs": len(small),
        "subsecond_job_ms": sum(j["ms"] for j in small),
        "job_ms_sorted_desc": sorted((j["ms"] for j in jobs), reverse=True)[:20],
        "worst_stage_skew": worst,
    }


def main() -> None:
    target = sys.argv[1]
    min_ms = 0
    if "--min-job-ms" in sys.argv:
        min_ms = int(sys.argv[sys.argv.index("--min-job-ms") + 1])
    if os.path.isdir(target) and not any(
        f.startswith("events_") for f in os.listdir(target)
    ):
        # a dir OF logs (not a rolling eventlog_v2 dir, which parse()
        # handles whole): pick the newest actual log entry
        files = sorted(
            (os.path.join(target, f) for f in os.listdir(target)
             if not f.startswith(".") and not f.startswith("appstatus_")),
            key=os.path.getmtime,
        )
        target = files[-1]
    parsed = parse(target)
    print(json.dumps({"file": target, **summarize(parsed, min_ms)}, indent=1))


if __name__ == "__main__":
    main()
