"""Multimodal transforms beyond image_stats: resize (real), frame-sample
(1→N plumbing, stub decoder), audio-PCM features (task brief family)."""

import numpy as np
import pytest

from mhap_spark.codecs import decode_image, psnr
from mhap_spark.ops.multimodal import (
    audio_pcm_stats,
    frame_sample,
    resize_bilinear,
    resize_images,
)
from mhap_spark.synth import INPUT_SCHEMA_DDL, corpus_to_rows, generate_corpus


@pytest.fixture(scope="module")
def img_df(spark):
    rows = corpus_to_rows(generate_corpus(12, seed=8))
    return spark.createDataFrame(rows, INPUT_SCHEMA_DDL)


def test_resize_bilinear_identity_and_downscale():
    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, size=(32, 24, 3)).astype(np.uint8)
    same = resize_bilinear(px, 32, 24)
    assert psnr(px, same) == float("inf") or (same == px).all()
    down = resize_bilinear(px, 16, 12)
    assert down.shape == (16, 12, 3)
    # downscale of a constant image stays constant
    flat = np.full((32, 24), 77, dtype=np.uint8)
    assert (resize_bilinear(flat, 9, 7) == 77).all()


def test_resize_images_roundtrip(spark, img_df):
    out = resize_images(img_df, out_w=16, out_h=16).collect()
    assert len(out) == 12
    for r in out:
        assert r["resize_ok"], r["error"]
        px = decode_image(bytes(r["bytes"]), r["fmt"])
        assert px.shape[0] == 16 and px.shape[1] == 16


def test_frame_sample_fanout(spark, img_df):
    frames = frame_sample(img_df, n_frames=3).collect()
    assert len(frames) == 12 * 3
    by_img = {}
    for r in frames:
        by_img.setdefault(r["image_id"], []).append(r["frame_idx"])
    for idxs in by_img.values():
        assert sorted(idxs) == [0, 1, 2]
    # frame 0 is the original still (stub decoder rolls by frame_idx)
    f0 = next(r for r in frames if r["frame_idx"] == 0)
    assert f0["frame_w"] > 0 and f0["frame_h"] > 0


def test_audio_pcm_stats(spark):
    # 1-second 8 kHz sine at half amplitude as PCM16 → known rms/zero-crossings
    t = np.arange(8000) / 8000.0
    sine = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype("<i2")
    silent = np.zeros(1000, dtype="<i2")
    df = spark.createDataFrame(
        [("a", bytearray(sine.tobytes())), ("b", bytearray(silent.tobytes()))],
        "image_id string, bytes binary",
    )
    got = {r["image_id"]: r for r in audio_pcm_stats(df).collect()}
    assert got["a"]["n_samples"] == 8000
    assert got["a"]["rms"] == pytest.approx(0.5 / np.sqrt(2), rel=1e-2)
    assert got["a"]["peak"] == pytest.approx(0.5, rel=1e-2)
    # 440 Hz over 1 s → ~880 zero crossings
    assert abs(got["a"]["zero_crossings"] - 880) <= 2
    assert got["b"]["rms"] == 0.0 and got["b"]["n_samples"] == 1000
