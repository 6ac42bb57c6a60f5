"""GRAFT-HASH-1 spec tests + golden vectors (FIXTURES.md F6, SURVEY.md §7.3)."""

import json
import os

import numpy as np
import pytest

from mhap_spark.hashing import (
    canonicalize_caption,
    caption_kgram_hashes,
    caption_kgram_hashes_batch,
    fmix64,
    phash_ngram_hashes,
    string_id_hash63,
    xorshift_step,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "fixtures", "golden_hashes.json")


def _fmix64_ref(x: int) -> int:
    """Pure-python murmur3 fmix64 (public constants)."""
    m = 0xFFFFFFFFFFFFFFFF
    x ^= x >> 33
    x = (x * 0xFF51AFD7ED558CCD) & m
    x ^= x >> 33
    x = (x * 0xC4CEB9FE1A85EC53) & m
    x ^= x >> 33
    return x


def test_fmix64_known_values():
    assert fmix64(np.array([0], dtype=np.uint64))[0] == 0
    assert fmix64(np.array([1], dtype=np.uint64))[0] == 0xB456BCFC34C2CB2C
    rng = np.random.default_rng(11)
    xs = rng.integers(0, 2**64, size=64, dtype=np.uint64)
    got = fmix64(xs)
    want = np.array([_fmix64_ref(int(v)) for v in xs], dtype=np.uint64)
    assert (got == want).all()


def test_xorshift_matches_java_semantics():
    # replicate x^=x<<21; x^=x>>>35; x^=x<<4 with python ints (64-bit wrap)
    def ref(x):
        m = 0xFFFFFFFFFFFFFFFF
        x ^= (x << 21) & m
        x ^= x >> 35
        x ^= (x << 4) & m
        return x

    rng = np.random.default_rng(7)
    xs = rng.integers(1, 2**63, size=100, dtype=np.uint64)
    got = xorshift_step(xs.copy())
    want = np.array([ref(int(v)) for v in xs], dtype=np.uint64)
    assert (got == want).all()


def test_caption_kgrams_basic():
    h = caption_kgram_hashes("abcdefghijklmnopqr", 16)
    assert len(h) == 3  # 18 chars → 3 windows
    assert (h < np.uint64(1 << 63)).all()  # 63-bit
    # same window content → same hash regardless of position
    h2 = caption_kgram_hashes("abcdefghijklmnop", 16)
    assert h[0] == h2[0]


def test_caption_canonicalization():
    assert canonicalize_caption("  Foo\tBar  ") == "foo bar"
    a = caption_kgram_hashes("The QUICK brown foxes", 16)
    b = caption_kgram_hashes("the quick  brown foxes", 16)
    assert a[0] == b[0]


def test_batch_matches_single():
    caps = ["ocean sunset over the mountain ridge", "x" * 10, "", "short cap here!!"]
    batch = caption_kgram_hashes_batch(caps, 16)
    for c, got in zip(caps, batch):
        want = caption_kgram_hashes(c, 16)
        assert got.dtype == np.uint64 and (got == want).all()


def test_phash_ngrams_shape_and_salt():
    p = np.array([0x0123456789ABCDEF, 0], dtype=np.int64)
    h = phash_ngram_hashes(p, 16)
    assert h.shape == (2, 49)
    # zero phash still yields position-distinct hashes (offset salting)
    assert len(np.unique(h[1])) == 49
    # caption space and phash space are disjoint by construction on sample
    c = caption_kgram_hashes("zzzzzzzzzzzzzzzzzzzz", 16)
    assert not np.intersect1d(h.ravel(), c).size


def test_string_id_hash63_deterministic():
    a = string_id_hash63(["img00000001", "img00000002"])
    b = string_id_hash63(["img00000001", "img00000002"])
    assert (a == b).all() and a[0] != a[1] and (a < np.uint64(1 << 63)).all()


def test_golden_vectors():
    """Frozen spec — regenerate ONLY on a deliberate spec change."""
    rng = np.random.default_rng(42)
    seeds = rng.integers(1, 2**63, size=8, dtype=np.uint64)
    state = seeds.copy()
    chain = []
    for _ in range(4):
        state = xorshift_step(state)
        chain.append([int(v) for v in state])
    current = {
        "fmix64": [int(v) for v in fmix64(seeds)],
        "xorshift_chain": chain,
        "caption_k16": [int(v) for v in caption_kgram_hashes("the quick brown fox jumps", 16)],
        "phash_w16": [int(v) for v in phash_ngram_hashes(np.array([12345], dtype=np.int64), 16)[0][:8]],
    }
    if not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with open(GOLDEN, "w") as f:
            json.dump(current, f, indent=1)
        pytest.skip("golden fixture written on first run")
    with open(GOLDEN) as f:
        frozen = json.load(f)
    assert current == frozen
