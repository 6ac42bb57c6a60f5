"""Multimodal column plumbing: opaque binary images + typed metadata.

Decode / feature-extract over ``mapInPandas`` with real Spark-side schema,
partitioning and Arrow batch shape.  The in-container codecs are the
deterministic pure-numpy ones from ``mhap_spark.codecs`` (png/qpng); formats
needing external libs (jpeg/webp/...) surface as ``decode_ok = false`` rows
with an error tag rather than failing the job — production swaps in a real
codec UDF with the same signature (task brief: stub decode, real plumbing).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from mhap_spark.codecs import decode_image, phash64

IMAGE_STATS_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("decode_ok", BooleanType()),
        StructField("decode_error", StringType()),
        StructField("dec_w", IntegerType()),
        StructField("dec_h", IntegerType()),
        StructField("mean_luma", DoubleType()),
        StructField("phash_recomputed", LongType()),
        StructField("phash_matches", BooleanType()),
    ]
)


def image_stats(df: DataFrame) -> DataFrame:
    """Decode every image, recompute its perceptual hash, and verify it
    matches the stored ``phash`` column — the engine-side half of the per-row
    invariant (BASELINE.json input_hint); the PSNR half needs the pre-encode
    pixels and lives in the test harness."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            ok = np.zeros(n, dtype=bool)
            err = [""] * n
            w = np.zeros(n, dtype=np.int32)
            h = np.zeros(n, dtype=np.int32)
            luma = np.zeros(n, dtype=np.float64)
            ph = np.zeros(n, dtype=np.int64)
            for i, (blob, fmt) in enumerate(zip(pdf["bytes"], pdf["fmt"])):
                try:
                    px = decode_image(bytes(blob), fmt)
                    ok[i] = True
                    h[i], w[i] = px.shape[0], px.shape[1]
                    luma[i] = float(px.mean())
                    ph[i] = np.int64(np.uint64(phash64(px)))
                except NotImplementedError as e:
                    err[i] = f"unsupported codec: {e}"
                except Exception as e:  # corrupt blob — report, don't fail the job
                    err[i] = f"decode failed: {e}"
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"],
                    "decode_ok": ok,
                    "decode_error": err,
                    "dec_w": w,
                    "dec_h": h,
                    "mean_luma": luma,
                    "phash_recomputed": ph,
                    "phash_matches": ok & (ph == pdf["phash"].to_numpy(dtype=np.int64)),
                }
            )

    return df.select("image_id", "bytes", "fmt", "phash").mapInPandas(
        gen, IMAGE_STATS_SCHEMA
    )
