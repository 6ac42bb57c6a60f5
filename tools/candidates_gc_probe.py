"""Root-cause probe for the candidates-stage 32-core anti-scaling
(round-4 VERDICT task 2): run ONLY the candidates stage at a given core
count and report wall time alongside per-stage executorRunTime, jvmGcTime,
spill, and shuffle bytes from the Spark UI REST API — the ratio
gcTime/runTime distinguishes shared-heap GC contention (single-JVM
artifact) from genuine plan problems.

Usage: python tools/candidates_gc_probe.py <cores> [rows]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1])
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 300_000

    from mhap_spark.candidates import candidate_pairs
    from mhap_spark.config import PRESET_SCALE
    from mhap_spark.freq import FreqTable
    from mhap_spark.minhash import compute_signatures
    from mhap_spark.session import build_session
    from mhap_spark.synth import INPUT_SCHEMA_DDL, corpus_to_rows, generate_corpus

    cfg = PRESET_SCALE
    spark = build_session(
        f"cand_gc_{cores}",
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
    sigs = compute_signatures(df, cfg, freq).persist()
    sigs.count()

    # warmup rep (JIT) + 2 timed reps of ONLY the candidates stage
    walls = []
    marker = -1
    for rep in range(3):
        app = json.loads(
            urllib.request.urlopen(base + "/api/v1/applications").read()
        )[0]["id"]
        stages = json.loads(
            urllib.request.urlopen(
                base + f"/api/v1/applications/{app}/stages"
            ).read()
        )
        marker = max((s["stageId"] for s in stages), default=-1)
        t0 = time.time()
        n = candidate_pairs(sigs, cfg).count()
        walls.append(round(time.time() - t0, 2))
    # metrics for the LAST rep only (stages after marker)
    stages = json.loads(
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
    for s in stages:
        if s["stageId"] <= marker:
            continue
        agg["executorRunTime_s"] += s["executorRunTime"] / 1e3
        agg["jvmGcTime_s"] += s.get("jvmGcTime", 0) / 1e3
        agg["memSpilled_mb"] += s["memoryBytesSpilled"] / 1e6
        agg["diskSpilled_mb"] += s["diskBytesSpilled"] / 1e6
        agg["shuffleWrite_mb"] += s["shuffleWriteBytes"] / 1e6
        agg["stages"] += 1
    out = {
        "cores": cores,
        "rows": rows,
        "n_pairs": n,
        "wall_s": walls,
        "wall_min_s": min(walls[1:]),
        **{k: round(v, 2) for k, v in agg.items()},
        "gc_frac": round(agg["jvmGcTime_s"] / max(agg["executorRunTime_s"], 1e-9), 4),
    }
    print("RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
