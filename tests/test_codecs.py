"""Codec + phash tests; per-row invariant PSNR ≥ 40 dB (BASELINE.json input_hint)."""

import numpy as np

from mhap_spark.codecs import (
    decode_image,
    encode_image,
    phash64,
    png_decode,
    png_encode,
    psnr,
    qpng_encode,
)


def _img(seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(32, 32, 3)).astype(np.uint8)


def test_png_roundtrip_bitexact():
    px = _img()
    assert (png_decode(png_encode(px)) == px).all()


def test_qpng_psnr_at_least_40db():
    px = _img(1)
    out = png_decode(qpng_encode(px))
    assert psnr(px, out) >= 40.0


def test_encode_decode_dispatch():
    px = _img(2)
    assert (decode_image(encode_image(px, "png"), "png") == px).all()
    assert psnr(px, decode_image(encode_image(px, "qpng"), "qpng")) >= 40.0


def test_unknown_codec_stubbed():
    import pytest

    with pytest.raises(NotImplementedError):
        encode_image(_img(), "jpeg")


def test_phash_stability_under_noise():
    """Perceptually-close images → small Hamming distance; different → large."""
    rng = np.random.default_rng(3)
    coarse = rng.integers(0, 256, size=(4, 4, 3)).astype(np.float64)
    base = np.repeat(np.repeat(coarse, 8, axis=0), 8, axis=1)
    a = np.clip(base + rng.normal(0, 1.5, base.shape), 0, 255).astype(np.uint8)
    b = np.clip(base + rng.normal(0, 1.5, base.shape), 0, 255).astype(np.uint8)
    other = _img(4)
    ham = lambda x, y: bin(x ^ y).count("1")
    assert ham(phash64(a), phash64(b)) <= 10
    assert ham(phash64(a), phash64(other)) >= 16
