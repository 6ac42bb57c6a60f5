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
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from pyspark.sql.types import BinaryType

from mhap_spark.codecs import avi_parse, decode_image, encode_image, phash64

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
                    # stored phash arrives coalesced + null-flagged JVM-side
                    # (see the select below): a nullable long column with any
                    # null in the batch converts Arrow→pandas as float64,
                    # where values > 2^53 (nearly all phash64 outputs) lose
                    # low bits and the NaN casts to garbage — the same hazard
                    # shingles.shingle_input coalesces against
                    "phash_matches": ok
                    & ~pdf["phash_is_null"].to_numpy(dtype=bool)
                    & (ph == pdf["phash"].to_numpy(dtype=np.int64)),
                }
            )

    return df.select(
        "image_id",
        "bytes",
        "fmt",
        F.coalesce(F.col("phash"), F.lit(0)).alias("phash"),
        F.col("phash").isNull().alias("phash_is_null"),
    ).mapInPandas(gen, IMAGE_STATS_SCHEMA)


def resize_bilinear(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Separable bilinear resample (pure numpy, vectorized) — (h, w) or
    (h, w, c) uint8 in/out."""
    if px.ndim == 3:
        return np.stack(
            [resize_bilinear(px[..., c], out_h, out_w) for c in range(px.shape[2])],
            axis=2,
        )
    h, w = px.shape
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = np.clip(ys - y0, 0.0, 1.0)[:, None]
    fx = np.clip(xs - x0, 0.0, 1.0)[None, :]
    p = px.astype(np.float64)
    py0, py1 = p[y0], p[y1]  # gather each row block once, not twice
    top = py0[:, x0] * (1 - fx) + py0[:, x1] * fx
    bot = py1[:, x0] * (1 - fx) + py1[:, x1] * fx
    out = top * (1 - fy) + bot * fy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


RESIZE_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
        StructField("resize_ok", BooleanType()),
        StructField("error", StringType()),
    ]
)


def resize_images(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Decode → bilinear resize → re-encode (same format), per Arrow batch —
    a REAL multimodal transform end-to-end on the in-container pure-numpy
    codecs; unsupported codecs surface as resize_ok=false rows (production
    swaps the decode/encode pair behind the identical signature)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt", "resize_ok", "error")}
            for img_id, blob, fmt, src_w, src_h in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"], pdf["w"], pdf["h"]
            ):
                try:
                    px = decode_image(bytes(blob), fmt)
                    rp = resize_bilinear(px, out_h, out_w)
                    out_rows["bytes"].append(encode_image(rp, fmt))
                    out_rows["resize_ok"].append(True)
                    out_rows["error"].append("")
                    out_rows["w"].append(out_w)
                    out_rows["h"].append(out_h)
                except Exception as e:
                    # passthrough rows keep the ORIGINAL blob — their w/h
                    # must describe those bytes (the source dims), not the
                    # target dims the resize never reached.  Null-safe on
                    # every source column: a corrupt row with NULL bytes or
                    # NULL dims must become a resize_ok=false DATA row, not
                    # a second exception that escapes the handler and kills
                    # the whole task (losing the batch's good rows with it)
                    out_rows["bytes"].append(bytes(blob) if blob is not None else None)
                    out_rows["resize_ok"].append(False)
                    out_rows["error"].append(str(e))
                    out_rows["w"].append(int(src_w) if pd.notna(src_w) else None)
                    out_rows["h"].append(int(src_h) if pd.notna(src_h) else None)
                out_rows["image_id"].append(img_id)
                out_rows["fmt"].append(fmt)
            yield pd.DataFrame(out_rows)

    return df.select("image_id", "bytes", "fmt", "w", "h").mapInPandas(
        gen, RESIZE_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", BinaryType()),
        StructField("frame_w", IntegerType()),
        StructField("frame_h", IntegerType()),
        StructField("decode_ok", BooleanType()),
    ]
)


def frame_sample(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video frame sampling — REAL demuxer (round-4; the round-1/3 roll-stub
    is gone): rows with fmt='avi' are parsed as RIFF-AVI containers
    (codecs.avi_parse walks the actual chunk structure), ``n_frames``
    frames are sampled evenly across the stream (all of them when the
    stream is shorter), and each payload is decoded+re-encoded through the
    stream's fourcc codec.  Still-image rows are single-frame videos
    (frame 0 = the image).  Rows whose container is corrupt or whose
    fourcc needs a codec this environment lacks (true MJPG → libjpeg)
    surface as decode_ok=false DATA rows rather than vanishing — the same
    corrupt-rows-as-data policy as image_stats.  One input row fans out to
    ≤ n_frames rows inside a mapInPandas batch; no per-row Python at the
    Spark layer."""
    if n_frames < 1:
        # n_frames=0 would make every valid video row emit ZERO output rows
        # (silently vanishing exactly the video inputs) — refuse loudly
        raise ValueError(f"frame_sample: n_frames must be >= 1, got {n_frames}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, blobs, ws, hs, oks = [], [], [], [], [], []

            def emit(img_id, f, blob, w, h, ok):
                ids.append(img_id)
                idxs.append(f)
                blobs.append(blob)
                ws.append(w)
                hs.append(h)
                oks.append(ok)

            for img_id, blob, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                try:
                    if fmt == "avi":
                        codec, _, _, payloads = avi_parse(bytes(blob))
                        total = len(payloads)
                        take = (
                            np.round(
                                np.linspace(0, total - 1, min(n_frames, total))
                            ).astype(int)
                            if total
                            else np.array([], dtype=int)
                        )
                        if total == 0:
                            # valid container, zero frame chunks: surface as
                            # a decode_ok=false DATA row like every other
                            # failure mode — never a vanished input row
                            emit(img_id, -1, None, 0, 0, False)
                        for f in take:
                            px = decode_image(payloads[f], codec)
                            emit(
                                img_id, int(f), encode_image(px, codec),
                                px.shape[1], px.shape[0], True,
                            )
                    else:
                        px = decode_image(bytes(blob), fmt)
                        emit(
                            img_id, 0, encode_image(px, fmt),
                            px.shape[1], px.shape[0], True,
                        )
                except Exception:
                    emit(img_id, -1, None, 0, 0, False)
            yield pd.DataFrame(
                {
                    "image_id": ids,
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "frame_bytes": blobs,
                    "frame_w": pd.array(ws, dtype="int32"),
                    "frame_h": pd.array(hs, dtype="int32"),
                    "decode_ok": pd.array(oks, dtype="boolean"),
                }
            )

    return df.select("image_id", "bytes", "fmt").mapInPandas(gen, FRAME_SCHEMA)


AUDIO_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("n_samples", LongType()),
        StructField("rms", DoubleType()),
        StructField("peak", DoubleType()),
        StructField("zero_crossings", LongType()),
    ]
)


def audio_pcm_stats(df: DataFrame, binary_col: str = "bytes", id_col: str = "image_id") -> DataFrame:
    """Audio feature extraction over an opaque binary column interpreted as
    raw 16-bit little-endian PCM — rms / peak / zero-crossing rate, whole
    batches vectorized.  Container formats (wav/mp3/flac) need external
    demuxers and are env-stubbed per the task brief; this pins the Spark
    plumbing (schema, batch shape, vectorized kernel) those plug into."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            ns = np.zeros(n, dtype=np.int64)
            rms = np.zeros(n, dtype=np.float64)
            peak = np.zeros(n, dtype=np.float64)
            zc = np.zeros(n, dtype=np.int64)
            for i, blob in enumerate(pdf[binary_col]):
                # NULL blob → 0 samples / zero stats, a data row like every
                # other failure mode (bytes(None) would kill the task)
                b = bytes(blob) if blob is not None else b""
                samples = np.frombuffer(b[: len(b) - (len(b) % 2)], dtype="<i2")
                ns[i] = len(samples)
                if len(samples):
                    x = samples.astype(np.float64) / 32768.0
                    rms[i] = float(np.sqrt(np.mean(x * x)))
                    peak[i] = float(np.abs(x).max())
                    zc[i] = int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
            yield pd.DataFrame(
                {
                    "image_id": pdf[id_col],
                    "n_samples": ns,
                    "rms": rms,
                    "peak": peak,
                    "zero_crossings": zc,
                }
            )

    return df.select(F.col(id_col), F.col(binary_col)).mapInPandas(gen, AUDIO_SCHEMA)
