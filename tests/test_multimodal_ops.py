"""Multimodal transforms beyond image_stats: resize (real), frame-sample
(real RIFF-AVI demux since round 4), audio-PCM features (task brief
family)."""

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


def test_frame_sample_stills_are_single_frame(spark, img_df):
    """Still images are 1-frame videos: frame 0 = the image, decode_ok."""
    frames = frame_sample(img_df, n_frames=3).collect()
    assert len(frames) == 12
    for r in frames:
        assert r["frame_idx"] == 0 and r["decode_ok"]
        assert r["frame_w"] > 0 and r["frame_h"] > 0


def test_frame_sample_real_avi_demux(spark):
    """REAL videos: mux 7 distinguishable frames into a RIFF-AVI, demux
    through the Spark operator, check the 3 sampled frames are the evenly
    spaced ones (0, 3, 6) and decode back to the original pixels; a corrupt
    container and an unsupported-codec (MJPG) stream surface as
    decode_ok=false data rows."""
    from mhap_spark.codecs import avi_encode

    frames_px = [
        np.full((16, 16, 3), 10 * (f + 1), dtype=np.uint8) for f in range(7)
    ]
    good = avi_encode(frames_px, fourcc=b"PNG ")
    mjpg = good.replace(b"vidsPNG ", b"vidsMJPG", 1)
    rows = [
        ("vid_good", bytearray(good), 16, 16, "avi", "", 0),
        ("vid_corrupt", bytearray(b"RIFFgarbage"), 16, 16, "avi", "", 0),
        ("vid_mjpg", bytearray(mjpg), 16, 16, "avi", "", 0),
    ]
    df = spark.createDataFrame(rows, INPUT_SCHEMA_DDL)
    got = frame_sample(df, n_frames=3).collect()
    by_img = {}
    for r in got:
        by_img.setdefault(r["image_id"], []).append(r)

    goods = sorted(by_img["vid_good"], key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in goods] == [0, 3, 6]
    for r in goods:
        px = decode_image(bytes(r["frame_bytes"]), "png")
        assert (px == frames_px[r["frame_idx"]]).all()
        assert r["decode_ok"] and r["frame_w"] == 16 and r["frame_h"] == 16

    for bad in ("vid_corrupt", "vid_mjpg"):
        (r,) = by_img[bad]
        assert not r["decode_ok"] and r["frame_idx"] == -1
        assert r["frame_bytes"] is None


def test_avi_container_roundtrip():
    """Muxer/demuxer round-trip without Spark: lossless PNG payloads come
    back bit-identical; lossy QPNG payloads hold the ≥40 dB invariant."""
    from mhap_spark.codecs import avi_encode, avi_parse

    rng = np.random.default_rng(7)
    frames = [rng.integers(0, 256, (24, 32, 3)).astype(np.uint8) for _ in range(5)]
    fmt, w, h, payloads = avi_parse(avi_encode(frames, fourcc=b"PNG "))
    assert (fmt, w, h, len(payloads)) == ("png", 32, 24, 5)
    assert all(
        (decode_image(p, fmt) == f).all() for f, p in zip(frames, payloads)
    )
    fmt_q, _, _, payloads_q = avi_parse(avi_encode(frames, fourcc=b"QPNG"))
    assert fmt_q == "qpng"
    assert all(
        psnr(decode_image(p, fmt_q), f) >= 40 for f, p in zip(frames, payloads_q)
    )


def test_avi_parse_picks_vids_stream_only(spark):
    """A second (audio) stream's NNdc chunks must not be conflated into the
    video frame list: stream index follows strh order, frames filter to the
    vids stream's 2-digit prefix."""
    import struct

    from mhap_spark.codecs import avi_encode, avi_parse, decode_image

    def chunk(tag, body):
        pad = b"\x00" if len(body) % 2 else b""
        return tag + struct.pack("<I", len(body)) + body + pad

    def lst(kind, body):
        return chunk(b"LIST", kind + body)

    rng = np.random.default_rng(9)
    frames = [rng.integers(0, 256, (24, 32, 3)).astype(np.uint8) for _ in range(3)]
    # rebuild the single-stream file into: stream 0 = auds, stream 1 = vids
    single = avi_encode(frames, fourcc=b"PNG ")
    _, w, h, payloads = avi_parse(single)
    avih = struct.pack("<14I", 100000, 0, 0, 0x10, len(frames), 0, 2, 0, w, h, 0, 0, 0, 0)
    auds_strh = b"auds" + b"\x00" * 52
    vids_strh = b"vids" + b"PNG " + b"\x00" * 48
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", auds_strh) + chunk(b"strf", b"\x00" * 16))
        + lst(b"strl", chunk(b"strh", vids_strh) + chunk(b"strf", b"\x00" * 40)),
    )
    movi_body = b"".join(
        chunk(b"00dc", b"\xde\xad\xbe\xef") + chunk(b"01dc", p) for p in payloads
    )
    body = b"AVI " + hdrl + lst(b"movi", movi_body)
    two_stream = b"RIFF" + struct.pack("<I", len(body)) + body

    fmt, _, _, got = avi_parse(two_stream)
    assert fmt == "png" and len(got) == 3  # not 6: audio chunks excluded
    assert all((decode_image(p, fmt) == f).all() for f, p in zip(frames, got))


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


def test_audio_null_blob_is_data_row(spark):
    """NULL binary → 0-sample data row, not a bytes(None) task crash."""
    df = spark.createDataFrame(
        [("a", bytearray(np.zeros(10, dtype="<i2").tobytes())), ("b", None)],
        "image_id string, bytes binary",
    )
    got = {r["image_id"]: r for r in audio_pcm_stats(df).collect()}
    assert got["b"]["n_samples"] == 0 and got["b"]["rms"] == 0.0
    assert got["a"]["n_samples"] == 10


def test_frame_sample_rejects_zero_frames(spark, img_df):
    """n_frames=0 would silently vanish every video row — must refuse."""
    with pytest.raises(ValueError, match="n_frames"):
        frame_sample(img_df, n_frames=0)


def test_image_stats_non_multiple_of_32_dims(spark):
    """A valid 40×40 image must report decode_ok=True with a phash — not a
    'decode failed: cannot reshape' misclassification."""
    from mhap_spark.codecs import encode_image, phash64
    from mhap_spark.ops.multimodal import image_stats

    px = np.random.default_rng(3).integers(0, 256, size=(40, 40, 3)).astype(np.uint8)
    ph_u = phash64(px)  # direct call also must not raise
    ph = ph_u - (1 << 64) if ph_u >= (1 << 63) else ph_u  # numpy-2-safe
    df = spark.createDataFrame(
        [("x", bytearray(encode_image(px, "png")), 40, 40, "png", "c", int(ph))],
        "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long",
    )
    row = image_stats(df).collect()[0]
    assert row["decode_ok"] and row["decode_error"] == ""
    assert (row["dec_w"], row["dec_h"]) == (40, 40)
    assert row["phash_recomputed"] == ph and row["phash_matches"]


def test_resize_failed_rows_keep_source_dims(spark):
    """A passthrough row (unsupported codec) carries the ORIGINAL bytes —
    its reported w/h must be the source dims, not the never-reached target."""
    rows = [("bad", bytearray(b"\x00\x01"), 32, 24, "jpeg", "cap", 0)]
    df = spark.createDataFrame(rows, INPUT_SCHEMA_DDL)
    r = resize_images(df, 64, 64).collect()[0]
    assert not r["resize_ok"]
    assert (r["w"], r["h"]) == (32, 24)
    assert bytes(r["bytes"]) == b"\x00\x01"


def test_resize_null_columns_become_data_rows(spark):
    """Corrupt rows with NULL dims or NULL bytes must surface as
    resize_ok=false DATA rows — a second exception escaping the handler
    would kill the task and lose the batch's GOOD rows with it."""
    rows = [
        ("null_dims", bytearray(b"\x00\x01"), None, None, "jpeg", "cap", 0),
        ("null_bytes", None, 8, 8, "jpeg", "cap", 0),
        ("good", None, None, None, "qpng", "cap", 0),
    ]
    # give 'good' a real decodable blob so the mixed batch proves survival
    from mhap_spark.codecs import encode_image

    px = np.full((8, 8, 3), 9, dtype=np.uint8)
    rows[2] = ("good", bytearray(encode_image(px, "qpng")), 8, 8, "qpng", "cap", 0)
    df = spark.createDataFrame(rows, INPUT_SCHEMA_DDL).coalesce(1)  # ONE batch
    got = {r["image_id"]: r for r in resize_images(df, 4, 4).collect()}
    assert len(got) == 3
    assert not got["null_dims"]["resize_ok"]
    assert got["null_dims"]["w"] is None and got["null_dims"]["h"] is None
    assert not got["null_bytes"]["resize_ok"]
    assert got["null_bytes"]["bytes"] is None
    assert got["good"]["resize_ok"] and (got["good"]["w"], got["good"]["h"]) == (4, 4)


def test_frame_sample_zero_frame_avi_surfaces(spark):
    """An AVI with a valid header but zero frame chunks must emit a
    decode_ok=false row, not silently vanish from the output.
    avi_encode refuses empty videos, so the container is built by hand
    (same chunk layout, empty movi LIST)."""
    import struct

    def chunk(tag, body):
        pad = b"\x00" if len(body) % 2 else b""
        return tag + struct.pack("<I", len(body)) + body + pad

    def lst(kind, body):
        return chunk(b"LIST", kind + body)

    avih = struct.pack("<14I", 100000, 0, 0, 0x10, 0, 0, 1, 0, 8, 8, 0, 0, 0, 0)
    strh = (
        b"vids" + b"QPNG"
        + struct.pack("<10I", 0, 0, 0, 1, 10, 0, 0, 0, 0xFFFFFFFF, 0)[:40]
        + struct.pack("<4H", 0, 0, 8, 8)
    )
    strf = struct.pack("<IiiHHI5I", 40, 8, 8, 1, 24, 0, 8 * 8 * 3, 0, 0, 0, 0)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    body = b"AVI " + hdrl + lst(b"movi", b"") + chunk(b"idx1", b"")
    empty_avi = b"RIFF" + struct.pack("<I", len(body)) + body
    rows = [("noframes", bytearray(empty_avi), 8, 8, "avi", "cap", 0)]
    df = spark.createDataFrame(rows, INPUT_SCHEMA_DDL)
    got = frame_sample(df, n_frames=4).collect()
    assert len(got) == 1
    assert got[0]["image_id"] == "noframes" and not got[0]["decode_ok"]


def test_image_stats_null_phash_batch_safe(spark, img_df):
    """One NULL stored phash in a batch must not poison the batch: before the
    round-5 fix the whole phash column round-tripped Arrow→pandas as float64
    (values > 2^53 lose low bits → false mismatches for CORRECT rows) and the
    NaN cast to garbage.  Null rows report phash_matches=false; every other
    row's verdict must equal the all-non-null run's."""
    from pyspark.sql import functions as F

    from mhap_spark.ops.multimodal import image_stats

    base = {r["image_id"]: r["phash_matches"] for r in image_stats(img_df).collect()}
    assert all(base.values())  # synth corpus stores its real phash

    null_id = sorted(base)[0]
    mixed_df = img_df.withColumn(
        "phash",
        F.when(F.col("image_id") == null_id, F.lit(None)).otherwise(F.col("phash")),
    ).coalesce(1)  # one partition → the null shares an Arrow batch with all rows
    mixed = {r["image_id"]: r for r in image_stats(mixed_df).collect()}
    assert mixed[null_id]["decode_ok"] and not mixed[null_id]["phash_matches"]
    for rid, want in base.items():
        if rid != null_id:
            assert mixed[rid]["phash_matches"] == want, rid
