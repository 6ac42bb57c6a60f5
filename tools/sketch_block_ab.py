"""Interleaved sketch-stage A/B: L2-blocked vs unblocked minhash kernel.

One warm JVM, alternating blocked (32k-key blocks) and unblocked (2^62)
reps so host drift cancels; the toggle rides to executors through the
closure capture in compute_signatures (a module-global lookup inside the
worker would re-import the default).  Asserts an identical SIGNATURE
checksum (xor of per-row hashes over sig+bottomk+bands) across every rep —
n_shingles alone is computed before the kernel and could never detect a
blocked-path divergence.

Usage: python tools/sketch_block_ab.py [rows] [reps] [cores]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import mhap_spark.minhash as mh
from mhap_spark.config import PRESET_SCALE
from mhap_spark.freq import FreqTable
from mhap_spark.minhash import compute_signatures
from mhap_spark.session import build_session
from mhap_spark.synth import INPUT_SCHEMA_DDL, corpus_to_rows, generate_corpus


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    spark = build_session(master=f"local[{cores}]")
    spark.sparkContext.setLogLevel("ERROR")
    cfg = PRESET_SCALE
    df = (
        spark.createDataFrame(
            corpus_to_rows(generate_corpus(rows, with_images=False)),
            INPUT_SCHEMA_DDL,
        )
        .repartition(64)
        .persist()
    )
    df.count()
    freq = FreqTable.compute(df, cfg)

    from pyspark.sql import functions as F

    def run(base: int) -> tuple[float, int]:
        mh._BLOCK_KEYS_BASE = base
        t0 = time.perf_counter()
        # checksum over the KERNEL OUTPUT (sig/bottomk/bands), not
        # n_shingles — shingling happens before batch_minhash, so an
        # n_shingles sum is blind to any blocked-kernel divergence
        n = (
            compute_signatures(df, cfg, freq)
            .select(
                F.bit_xor(
                    F.xxhash64(
                        "image_id", F.to_json(F.struct("sig", "bottomk", "bands"))
                    )
                ).alias("cs")
            )
            .collect()[0][0]
        )
        return time.perf_counter() - t0, n

    run(32_000)  # warm plan + JIT, discarded
    res: dict[str, list[float]] = {"blocked": [], "unblocked": []}
    checksums = set()
    for _ in range(reps):
        for name, base in (("blocked", 32_000), ("unblocked", 2**62)):
            t, n = run(base)
            res[name].append(round(t, 2))
            checksums.add(n)
    assert len(checksums) == 1, checksums
    print(
        json.dumps(
            {
                "rows": rows,
                "cores": cores,
                "reps": reps,
                "blocked_s": res["blocked"],
                "unblocked_s": res["unblocked"],
                "blocked_min": min(res["blocked"]),
                "unblocked_min": min(res["unblocked"]),
                "speedup_min": round(min(res["unblocked"]) / min(res["blocked"]), 3),
                "checksum_equal": True,
            }
        )
    )


if __name__ == "__main__":
    main()
