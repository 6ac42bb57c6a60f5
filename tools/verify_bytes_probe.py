"""Measure shuffle bytes through the verify stage, with and without
candidate-id pruning of the signature side (round-4 VERDICT task 3).

Runs the star-preset pipeline front half on a synth corpus (optionally with a
planted mega-cluster), then executes verified_pairs under each variant and
reports total shuffle read/write bytes for the jobs it ran, from the Spark UI
REST API.  Bytes are deterministic — host noise does not affect them.

Usage: python tools/verify_bytes_probe.py [rows] [mega]
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path) as r:
        return json.loads(r.read())


def stage_bytes(spark, base: str, after_stage: int) -> dict:
    """Sum shuffle/input metrics over all completed stages with id > marker."""
    app = _api(base, "/api/v1/applications")[0]["id"]
    stages = _api(base, f"/api/v1/applications/{app}/stages?status=complete")
    tot = {"shuffle_write": 0, "shuffle_read": 0, "input": 0, "stages": 0}
    for s in stages:
        if s["stageId"] <= after_stage:
            continue
        tot["shuffle_write"] += s["shuffleWriteBytes"]
        tot["shuffle_read"] += s["shuffleReadBytes"]
        tot["input"] += s["inputBytes"]
        tot["stages"] += 1
    return tot


def max_stage(spark, base: str) -> int:
    app = _api(base, "/api/v1/applications")[0]["id"]
    stages = _api(base, f"/api/v1/applications/{app}/stages")
    return max((s["stageId"] for s in stages), default=-1)


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    mega = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000

    from mhap_spark.candidates import candidate_pairs
    from mhap_spark.config import PRESET_SCALE
    from mhap_spark.freq import FreqTable
    from mhap_spark.minhash import compute_signatures
    from mhap_spark.session import build_session
    from mhap_spark.synth import INPUT_SCHEMA_DDL, corpus_to_rows, generate_corpus
    from mhap_spark.verify import verified_pairs

    cfg = PRESET_SCALE
    spark = build_session(
        "verify_bytes", master="local[16]", extra={"spark.ui.enabled": "true"}
    )
    base = spark.sparkContext.uiWebUrl

    corpus = generate_corpus(rows, seed=42, with_images=False, mega_cluster=mega)
    df = (
        spark.createDataFrame(corpus_to_rows(corpus), INPUT_SCHEMA_DDL)
        .repartition(32)
        .persist()
    )
    df.count()
    freq = FreqTable.compute(df, cfg)
    sigs = compute_signatures(df, cfg, freq).persist()
    n_sigs = sigs.count()
    cands = candidate_pairs(sigs, cfg).persist()
    n_cands = cands.count()
    n_ids = (
        cands.selectExpr("src AS id").union(cands.selectExpr("dst AS id")).distinct().count()
    )
    print(f"rows={rows} mega={mega} sigs={n_sigs} cands={n_cands} distinct_ids={n_ids}")

    results = {}
    for variant in sys.argv[3].split(",") if len(sys.argv) > 3 else ["noprune", "prune"]:
        marker = max_stage(spark, base)
        out = verified_pairs(cands, sigs, cfg, prune=(variant == "prune"))
        n = out.count()
        b = stage_bytes(spark, base, marker)
        results[variant] = {"verified": n, **b}
        print(
            f"{variant}: verified={n} shuffle_write={b['shuffle_write']/1e6:.1f}MB "
            f"shuffle_read={b['shuffle_read']/1e6:.1f}MB stages={b['stages']}"
        )
    if len(results) == 2:
        a, b = results["noprune"], results["prune"]
        assert a["verified"] == b["verified"], "output mismatch!"
        cut = 1 - b["shuffle_write"] / a["shuffle_write"]
        print(f"shuffle-write byte cut: {cut:.1%}")
    spark.stop()


if __name__ == "__main__":
    main()
