"""Per-action latency decomposition of one timed pipeline run (round-5
VERDICT task 6): how many Spark jobs does the 300k pipeline issue inside
the timed window, and how much wall clock do they each take at a given
core count?  The scale-flat jobs (driver collects, checksums) are the
residual term behind the one-box scaling-efficiency gap.

Usage: python tools/action_probe.py [--rows 300000] [--cores 32]

Runs warmup + ONE timed pipeline with the Spark event log on, then maps
every job inside the timed window to its wall milliseconds (tools/joblog
parser).  Run once per core count and compare: jobs whose latency does
NOT drop with cores are the fixed floor.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=300_000)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument(
        "--hints",
        default="auto",
        choices=["auto", "on", "off"],
        help="no-broadcast hints: auto = size-conditional default",
    )
    args = ap.parse_args()

    evdir = tempfile.mkdtemp(prefix="action_probe_ev_")
    os.environ["SPARK_GRAFT_EVENTLOG_DIR"] = evdir

    from mhap_spark.config import PRESET_SCALE, hints_default_for_rows
    from mhap_spark.pipeline import run_pipeline
    from mhap_spark.session import build_session
    from mhap_spark.synth import INPUT_SCHEMA_DDL, corpus_to_rows, generate_corpus

    hints = (
        hints_default_for_rows(args.rows)
        if args.hints == "auto"
        else args.hints == "on"
    )
    cfg = PRESET_SCALE.with_overrides(no_broadcast_hints=hints)
    spark = build_session(
        f"action_probe_{args.cores}",
        master=f"local[{args.cores}]",
        shuffle_partitions=max(args.cores, 8),
    )
    wdf = spark.createDataFrame(
        corpus_to_rows(generate_corpus(10_000, seed=1, with_images=False)),
        INPUT_SCHEMA_DDL,
    ).repartition(max(args.cores * 2, 8))
    wout = run_pipeline(spark, wdf, cfg)
    wout["clusters"].count()
    wout["signatures"].unpersist()
    wout["pairs"].unpersist()

    df = (
        spark.createDataFrame(
            corpus_to_rows(generate_corpus(args.rows, seed=42, with_images=False)),
            INPUT_SCHEMA_DDL,
        )
        .repartition(max(args.cores * 2, 8))
        .persist()
    )
    df.count()

    t0_ms = int(time.time() * 1000)
    t0 = time.time()
    out = run_pipeline(spark, df, cfg)
    clusters = out["clusters"].persist()
    clusters.count()
    elapsed = time.time() - t0
    t1_ms = int(time.time() * 1000)
    spark.stop()  # flushes the event log

    from tools.joblog import parse

    files = sorted(
        (os.path.join(evdir, f) for f in os.listdir(evdir) if not f.startswith(".")),
        key=os.path.getmtime,
    )
    parsed = parse(files[-1])
    timed = [j for j in parsed["jobs"] if t0_ms <= j.get("start", 0) <= t1_ms]
    # driver gap = wall time not covered by ANY job.  Concurrent jobs (AQE
    # stage-jobs overlap routinely) make sum(ms) exceed busy wall time, so
    # the gap must come from the interval UNION, not the sum — otherwise it
    # under-reports or goes negative exactly on the runs being probed.
    covered = 0
    cur_s = cur_e = None
    for s, e in sorted((j["start"], j["start"] + j["ms"]) for j in timed):
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                covered += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        covered += cur_e - cur_s
    gaps = elapsed * 1000 - covered
    print(
        json.dumps(
            {
                "rows": args.rows,
                "cores": args.cores,
                "no_broadcast_hints": hints,
                "elapsed_s": round(elapsed, 2),
                "n_jobs_in_window": len(timed),
                "jobs_ms": [j["ms"] for j in timed],
                "jobs_named": [
                    {"ms": j["ms"], "callsite": j.get("callsite", "")}
                    for j in timed
                ],
                "sum_job_ms": sum(j["ms"] for j in timed),
                "covered_job_ms": int(covered),
                "driver_gap_ms": int(gaps),
            }
        )
    )


if __name__ == "__main__":
    main()
