"""Noise-gated scaling measurement.

This sandbox VM has an intermittent co-tenant: identical bench legs swing
2-4x between windows (BENCH/BASELINE.md documents 103 s vs 200 s an hour
apart; this session measured a local[16] leg at 297 s in a loaded window vs
~80 s quiet).  Interleaving + min-of-N defends against SOME of that, but a
co-tenant that stays busy across a whole interleaved round poisons every
leg equally, and the scaling ratio is then noise over noise.

This runner makes the window explicit: every pipeline leg is BRACKETED by
a multiprocessing busy-loop probe (the same probe that established the
0.86 one-box ceiling), and a leg is accepted only when the probe is quiet
both immediately before and immediately after it.  Rejected legs are kept
in the output record — the evidence is the acceptance rule plus the raw
rejects, not a silently curated best-of.

Usage:
    python tools/noise_gated_scaling.py --rows 300000 --lo 4 --hi 16 \
        --hints on --want 2 --out BENCH/SCALING_r5_gated.json
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _burn(seconds: float) -> int:
    t0 = time.time()
    x = 0
    while time.time() - t0 < seconds:
        for i in range(10_000):
            x += i * i
    return x


def probe(n_procs: int = 8, seconds: float = 2.0) -> float:
    """Wall-clock overhead ratio of n_procs CPU-bound processes running
    ``seconds`` of work each: 1.0 = idle host, >1.2 = somebody else is on
    the cores."""
    t0 = time.time()
    with mp.Pool(n_procs) as p:
        p.map(_burn, [seconds] * n_procs)
    return round((time.time() - t0) / seconds, 3)


def loadavg1() -> float:
    return os.getloadavg()[0]


def wait_quiet(threshold: float, max_wait_s: float = 3600.0) -> list[dict]:
    """Block until the host looks idle; returns the probe trail."""
    trail = []
    t0 = time.time()
    while True:
        la = loadavg1()
        ov = probe() if la < 2.0 else None  # skip the probe when load says busy
        trail.append({"loadavg1": round(la, 2), "probe_overhead": ov})
        if ov is not None and ov <= threshold:
            return trail
        if time.time() - t0 > max_wait_s:
            trail.append({"gave_up_after_s": round(time.time() - t0, 1)})
            return trail
        time.sleep(45)


def run_leg(cores: int, rows: int, hints: str, reps: int, env: dict) -> dict:
    cmd = [
        sys.executable, BENCH, "--pipeline-only",
        "--cores", str(cores), "--rows", str(rows),
        "--hints", hints, "--reps", str(reps),
    ]
    out = subprocess.run(
        cmd, capture_output=True, text=True, timeout=3600, env=env, cwd=REPO
    )
    if out.returncode != 0:
        raise RuntimeError(f"leg {cores}c failed:\n{out.stderr[-3000:]}")
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    return json.loads(lines[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=300_000)
    ap.add_argument("--lo", type=int, default=4)
    ap.add_argument("--hi", type=int, default=16)
    ap.add_argument("--hints", default="on")
    ap.add_argument("--reps", type=int, default=1, help="timed reps inside each leg")
    ap.add_argument("--want", type=int, default=2, help="accepted legs per level")
    ap.add_argument("--threshold", type=float, default=1.15,
                    help="max busy-probe overhead for an accepted window")
    ap.add_argument("--max-rounds", type=int, default=12)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    env = {**os.environ}
    env.setdefault("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-scratch")

    record: dict = {
        "rows": args.rows, "hints": args.hints, "threshold": args.threshold,
        "accepted": {args.lo: [], args.hi: []},
        "rejected": {args.lo: [], args.hi: []},
    }
    rnd = 0
    while rnd < args.max_rounds and any(
        len(record["accepted"][c]) < args.want for c in (args.lo, args.hi)
    ):
        rnd += 1
        for cores in (args.lo, args.hi):
            if len(record["accepted"][cores]) >= args.want:
                continue
            pre_trail = wait_quiet(args.threshold)
            leg = run_leg(cores, args.rows, args.hints, args.reps, env)
            post = probe()
            entry = {
                "round": rnd, "pre": pre_trail[-1], "post_overhead": post,
                "elapsed_s": leg["elapsed_s"], "leg": leg,
            }
            ok = (
                pre_trail[-1].get("probe_overhead") is not None
                and pre_trail[-1]["probe_overhead"] <= args.threshold
                and post <= args.threshold
            )
            record["accepted" if ok else "rejected"][cores].append(entry)
            print(
                f"[round {rnd}] {cores}c: {leg['elapsed_s']} s "
                f"pre={pre_trail[-1]} post={post} -> {'ACCEPT' if ok else 'reject'}",
                file=sys.stderr, flush=True,
            )

    done = all(record["accepted"][c] for c in (args.lo, args.hi))
    if done:
        best = {
            c: min(e["leg"]["elapsed_s"] for e in record["accepted"][c])
            for c in (args.lo, args.hi)
        }
        # the ratio reduces to best_lo/best_hi algebraically — the pairs
        # count only matters as a CROSS-LEG EQUALITY check, so enforce it
        # (a diverged output must never publish a throughput ratio)
        all_counts = {
            e["leg"]["n_candidate_pairs"]
            for c in (args.lo, args.hi)
            for e in record["accepted"][c]
        }
        assert len(all_counts) == 1, f"output diverged across legs: {all_counts}"
        pairs = all_counts.pop()
        t_lo = pairs / best[args.lo]
        t_hi = pairs / best[args.hi]
        record["best_elapsed_s"] = {f"local[{c}]": best[c] for c in (args.lo, args.hi)}
        record["throughput_ratio"] = round(t_hi / t_lo, 3)
        record["scaling_efficiency"] = round(
            (t_hi / t_lo) / (args.hi / args.lo), 3
        )
    out = json.dumps(record, indent=1, default=str)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out)
    print(out)


if __name__ == "__main__":
    main()
