"""Generic per-stage scaling probe: N timed executions of ONE pipeline
stage at a given core count, with per-stage executor metrics from the
Spark UI REST API (generalizes tools/candidates_gc_probe.py, which
root-caused the round-3 candidates artifact).

Why it exists (round 5): the single-shot `bench.py --stage-scaling`
children at 1M rows produced contradictory numbers (candidates 1.22x,
cc 0.26x, df_table 8.24x for 4x cores) on a host whose identical legs
swing 2-4x between windows.  A 3-rep min per stage inside ONE warm JVM,
with gc/spill/CPU-time readouts, is the defensible per-stage evidence:
min-of-3 rejects transient co-tenant noise, and the executorRunTime
total shows whether the PLAN does more work at higher parallelism
(it should not — and measured, it does not).

Usage: python tools/stage_probe.py <stage> <cores> [rows] [reps]
  stage in {sketch, candidates, verify, cc, cc_driver_finish}
Prints one "RESULT {json}" line.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    stage = sys.argv[1]
    cores = int(sys.argv[2])
    rows = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000_000
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    from mhap_spark.candidates import candidate_pairs
    from mhap_spark.cluster import connected_components
    from mhap_spark.config import PRESET_SCALE, hints_default_for_rows
    from mhap_spark.freq import FreqTable
    from mhap_spark.minhash import compute_signatures
    from mhap_spark.session import build_session
    from mhap_spark.synth import INPUT_SCHEMA_DDL, corpus_to_rows, generate_corpus
    from mhap_spark.verify import verified_pairs

    cfg = PRESET_SCALE.with_overrides(
        no_broadcast_hints=hints_default_for_rows(rows)
    )
    spark = build_session(
        f"stage_probe_{stage}_{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(cores, 8),
        extra={"spark.ui.enabled": "true"},
    )
    base = spark.sparkContext.uiWebUrl

    df = (
        spark.createDataFrame(
            corpus_to_rows(generate_corpus(rows, seed=42, with_images=False)),
            INPUT_SCHEMA_DDL,
        )
        .repartition(max(cores * 2, 8))
        .persist()
    )
    df.count()
    freq = FreqTable.compute(df, cfg)

    # build (and persist) everything UPSTREAM of the probed stage, exactly
    # as the fused pipeline leaves it when the stage runs
    sigs = cands = pairs = None
    if stage != "sketch":
        sigs = compute_signatures(df, cfg, freq).persist()
        sigs.count()
    if stage in ("verify", "cc", "cc_driver_finish"):
        cands = candidate_pairs(sigs, cfg).persist()
        cands.count()
    if stage in ("cc", "cc_driver_finish"):
        pairs = verified_pairs(cands, sigs, cfg).persist()
        pairs.count()

    def make():
        if stage == "sketch":
            return compute_signatures(df, cfg, freq)
        if stage == "candidates":
            return candidate_pairs(sigs, cfg)
        if stage == "verify":
            return verified_pairs(cands, sigs, cfg)
        if stage == "cc":
            return connected_components(
                pairs,
                sigs.select("image_id"),
                no_broadcast_hints=cfg.no_broadcast_hints,
            )
        if stage == "cc_driver_finish":
            return connected_components(
                pairs,
                sigs.select("image_id"),
                driver_finish_edges=cfg.cc_driver_finish_edges,
                no_broadcast_hints=cfg.no_broadcast_hints,
            )
        raise SystemExit(f"unknown stage {stage}")

    walls = []
    marker = -1
    app = None
    for _ in range(reps):
        app = json.loads(
            urllib.request.urlopen(base + "/api/v1/applications").read()
        )[0]["id"]
        stage_list = json.loads(
            urllib.request.urlopen(
                base + f"/api/v1/applications/{app}/stages"
            ).read()
        )
        marker = max((s["stageId"] for s in stage_list), default=-1)
        t0 = time.time()
        n = make().count()
        walls.append(round(time.time() - t0, 2))
    # executor metrics for the LAST rep only (stages after marker)
    stage_list = json.loads(
        urllib.request.urlopen(
            base + f"/api/v1/applications/{app}/stages?status=complete"
        ).read()
    )
    agg = {
        "executorRunTime_s": 0.0,
        "jvmGcTime_s": 0.0,
        "memSpilled_mb": 0.0,
        "diskSpilled_mb": 0.0,
        "shuffleWrite_mb": 0.0,
        "stages": 0,
    }
    for s in stage_list:
        if s["stageId"] <= marker:
            continue
        agg["executorRunTime_s"] += s["executorRunTime"] / 1e3
        agg["jvmGcTime_s"] += s.get("jvmGcTime", 0) / 1e3
        agg["memSpilled_mb"] += s["memoryBytesSpilled"] / 1e6
        agg["diskSpilled_mb"] += s["diskBytesSpilled"] / 1e6
        agg["shuffleWrite_mb"] += s["shuffleWriteBytes"] / 1e6
        agg["stages"] += 1
    out = {
        "stage": stage,
        "cores": cores,
        "rows": rows,
        "n_out": n,
        "wall_s": walls,
        "wall_min_s": min(walls),
        **{k: round(v, 2) for k, v in agg.items()},
        "gc_frac": round(
            agg["jvmGcTime_s"] / max(agg["executorRunTime_s"], 1e-9), 4
        ),
    }
    print("RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
