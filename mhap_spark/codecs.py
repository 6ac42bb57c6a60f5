"""Image codecs + perceptual hash, pure numpy + stdlib zlib.

PIL/libjpeg are not available in this environment, so the multimodal
`bytes` column is backed by two deterministic, library-independent codecs
(the Spark-side plumbing — schema, Arrow batching, UDF signatures — is the
real deliverable; see task brief "multimodal columns"):

* ``png``  — minimal real PNG (8-bit RGB, filter 0, zlib), lossless.
* ``qpng`` — the lossy stand-in for JPEG: pixels quantized to a step of 4
  then PNG-encoded.  Max per-channel error 2 → PSNR ≈ 47 dB, comfortably
  above the ≥40 dB per-row invariant (BASELINE.json input_hint).

``phash64`` is a standard DCT perceptual hash (32×32 gray → 32×32 DCT-II →
8×8 low-frequency block → median threshold → 64 bits), deterministic and
library-independent (FIXTURES.md F1).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
QPNG_STEP = 4  # lossy quantization step (PSNR ≈ 47 dB)


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def png_encode(pixels: np.ndarray) -> bytes:
    """pixels: (h, w, 3) uint8 → PNG bytes (color type 2, filter 0 rows)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), pixels.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def png_decode(data: bytes) -> np.ndarray:
    """Minimal PNG decoder for images produced by :func:`png_encode`
    (8-bit RGB, filter 0).  Returns (h, w, 3) uint8."""
    assert data[:8] == _PNG_SIG, "not a PNG"
    pos, w = 8, 0
    h = 0
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", body[:10])
            assert depth == 8 and ctype == 2, "unsupported PNG subtype"
        elif tag == b"IDAT":
            idat += body
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, 1 + w * 3)
    assert (raw[:, 0] == 0).all(), "unsupported PNG filter"
    return raw[:, 1:].reshape(h, w, 3).copy()


def qpng_encode(pixels: np.ndarray) -> bytes:
    """Deterministic lossy codec: quantize to multiples of QPNG_STEP, then PNG."""
    q = ((pixels.astype(np.int32) + QPNG_STEP // 2) // QPNG_STEP) * QPNG_STEP
    return png_encode(np.clip(q, 0, 255).astype(np.uint8))


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return png_encode(pixels)
    if fmt == "qpng":
        return qpng_encode(pixels)
    raise NotImplementedError(
        f"codec {fmt!r} not available in this environment (no PIL/libjpeg); "
        "real deployments plug a decode UDF with the same signature"
    )


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt in ("png", "qpng"):
        return png_decode(data)
    raise NotImplementedError(f"codec {fmt!r} not available (see encode_image)")


# --- AVI container (real RIFF demux; round-4 VERDICT task 9) -----------------
#
# The frame-sampling operator previously stubbed its decoder (no video codec
# ships here).  The CONTAINER layer needs no codec: these are a real,
# spec-shaped RIFF-AVI muxer/demuxer — 'RIFF..AVI ' → LIST hdrl (avih, LIST
# strl(strh/strf)) → LIST movi ('00dc' chunks, word-aligned) → idx1.  Frame
# payloads use this repo's codecs (fourcc QPNG/PNG ); true MJPG payloads
# still need libjpeg and surface as unsupported-codec DATA rows, same policy
# as decode_image.

_FOURCC_TO_FMT = {b"QPNG": "qpng", b"PNG ": "png"}


def avi_encode(frames: list, fourcc: bytes = b"QPNG", fps: int = 10) -> bytes:
    """frames: list of (h, w, 3) uint8 arrays → AVI bytes ('00dc' per frame)."""
    assert frames, "empty video"
    h, w, _ = frames[0].shape
    fmt = _FOURCC_TO_FMT[fourcc]
    payloads = [encode_image(f, fmt) for f in frames]

    def chunk(tag: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return tag + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<14I", 1_000_000 // fps, 0, 0, 0x10, len(frames), 0, 1, 0, w, h, 0, 0, 0, 0
    )
    strh = (
        b"vids" + fourcc + struct.pack("<10I", 0, 0, 0, 1, fps, 0, len(frames), 0, 0xFFFFFFFF, 0)[:40]
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHHI5I", 40, w, h, 1, 24, 0, w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b"".join(chunk(b"00dc", p) for p in payloads)
    movi = lst(b"movi", movi_body)
    # idx1 offsets are relative to the start of the movi LIST's data
    idx, off = b"", 4
    for p in payloads:
        idx += b"00dc" + struct.pack("<3I", 0x10, off, len(p))
        off += 8 + len(p) + (len(p) % 2)
    riff_body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def avi_parse(data: bytes) -> tuple[str, int, int, list[bytes]]:
    """Demux an AVI: returns (codec_fmt, w, h, frame_payloads).

    Walks the real RIFF structure (not offsets we wrote): top-level chunks,
    hdrl's strh for the stream fourcc, movi's 00dc/00db entries in order.
    codec_fmt is the decode_image fmt string, or the raw fourcc lowercased
    when unsupported (decode then raises NotImplementedError — policy as
    decode_image)."""
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI ", "not an AVI"
    fourcc, w, h = None, 0, 0
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal fourcc, w, h
        while pos + 8 <= end:
            tag = data[pos : pos + 4]
            (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body_start = pos + 8
            if tag == b"LIST":
                walk(body_start + 4, body_start + length)
            elif tag == b"strh" and data[body_start : body_start + 4] == b"vids":
                fourcc = data[body_start + 4 : body_start + 8]
            elif tag == b"avih":
                w, h = struct.unpack("<II", data[body_start + 32 : body_start + 40])
            elif tag[2:4] in (b"dc", b"db"):
                frames.append(data[body_start : body_start + length])
            pos = body_start + length + (length % 2)

    walk(12, 8 + struct.unpack("<I", data[4:8])[0])
    assert fourcc is not None, "no video stream header"
    fmt = _FOURCC_TO_FMT.get(fourcc, fourcc.decode("latin1").strip().lower())
    return fmt, w, h, frames


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0, :] = np.sqrt(1.0 / n)
    return m


_DCT32 = _dct_matrix(32)


def phash64(pixels: np.ndarray) -> int:
    """64-bit DCT perceptual hash of an RGB image (any size ≥ 32×32 that is a
    multiple of 32 per side; synth uses exactly 32×32)."""
    g = pixels.astype(np.float64).mean(axis=2)
    if g.shape != (32, 32):  # box-downsample to 32×32
        h, w = g.shape
        g = g.reshape(32, h // 32, 32, w // 32).mean(axis=(1, 3))
    d = _DCT32 @ g @ _DCT32.T
    block = d[:8, :8].ravel()
    med = np.median(block[1:])  # exclude DC from the median
    bits = (block > med).astype(np.uint64)
    return int(bits @ (np.uint64(1) << np.arange(64, dtype=np.uint64)))


def phash64_batch(pixels: np.ndarray) -> np.ndarray:
    """Vectorized phash over a (n, 32, 32, 3) uint8 stack."""
    g = pixels.astype(np.float64).mean(axis=3)  # (n, 32, 32)
    d = np.matmul(np.matmul(_DCT32, g), _DCT32.T)  # broadcast BLAS matmuls
    block = d[:, :8, :8].reshape(len(g), 64)
    med = np.median(block[:, 1:], axis=1)
    bits = (block > med[:, None]).astype(np.uint64)
    return bits @ (np.uint64(1) << np.arange(64, dtype=np.uint64))
