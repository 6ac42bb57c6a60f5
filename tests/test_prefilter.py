"""One-bit MinHash Hamming prefilter (mhap/sketch/MinHashBitSketch.java:31-92
analog): must cut stage-2 join input without changing verified output."""

import numpy as np
import pytest

from mhap_spark.candidates import candidate_pairs
from mhap_spark.config import MhapConfig
from mhap_spark.minhash import compute_signatures, pack_bitsig
from mhap_spark.synth import INPUT_SCHEMA_DDL, corpus_to_rows, generate_corpus
from mhap_spark.verify import hamming_prefilter, verified_pairs

# a config where the jaccard gate binds tight enough for the bound to filter:
# the one-bit sketch has σ(ĵ) = 1/√n ≈ 0.044 at 512 bits, so it can only
# separate candidates when the verify gate is well above the candidate-pool
# similarity floor — the near-dup image regime (j ≥ 0.5), not loose gates.
# measured on this corpus: 15.2% of stage-2 join input cut, verified output
# exactly preserved (margin 4σ ⇒ per-pair miss probability ~3e-5 in ĵ noise)
CFG = MhapConfig(
    num_hashes=512, min_jaccard=0.7, bit_prefilter=True, prefilter_margin_sd=4.0
)


def test_pack_bitsig_layout():
    sig = np.array([[0, 1, 2, 3] * 32, [1, 0, 1, 0] * 32], dtype=np.int32)  # 128 slots
    packed = pack_bitsig(sig)
    assert packed.shape == (2, 2)
    # row 0 LSBs: 0,1,0,1 repeating → bits 1,3,5,... set (little-endian packing)
    got0 = int(packed[0, 0]) & 0xFFFFFFFFFFFFFFFF
    want0 = sum(1 << b for b in range(1, 64, 2))
    assert got0 == want0
    # row 1 LSBs: 1,0,1,0 → even bits set
    got1 = int(packed[1, 0]) & 0xFFFFFFFFFFFFFFFF
    assert got1 == sum(1 << b for b in range(0, 64, 2))


def test_bitsig_hamming_tracks_jaccard():
    """Expected packed-bit Hamming ≈ num_hashes·(1−J)/2 — the estimator the
    bound in MhapConfig.prefilter_max_hamming assumes."""
    rng = np.random.default_rng(11)
    n = 4096
    for j in (0.0, 0.5, 0.9):
        a = rng.integers(0, 2**31, size=(1, n), dtype=np.int32)
        agree = rng.random(n) < j
        b = np.where(agree, a[0], rng.integers(0, 2**31, size=n, dtype=np.int32))
        pa, pb = pack_bitsig(a), pack_bitsig(b[None, :])
        ham = bin(int.from_bytes((pa ^ pb).tobytes(), "little")).count("1")
        expect = n * (1 - j) / 2
        assert abs(ham - expect) < 5 * np.sqrt(n) / 2, (j, ham, expect)


def test_prefilter_preserves_verified_pairs_and_reduces_join(spark):
    corpus = generate_corpus(800, seed=13)
    df = spark.createDataFrame(corpus_to_rows(corpus), INPUT_SCHEMA_DDL).repartition(8)
    sigs = compute_signatures(df, CFG, None).persist()
    cands = candidate_pairs(sigs, CFG).persist()
    n_cands = cands.count()
    assert n_cands > 0

    survivors = hamming_prefilter(cands, sigs, CFG).count()
    cut_frac = (n_cands - survivors) / n_cands
    assert cut_frac >= 0.05, f"prefilter cut only {cut_frac:.1%} of candidates"

    off = CFG.with_overrides(bit_prefilter=False)
    got_on = {
        (r["src"], r["dst"]) for r in verified_pairs(cands, sigs, CFG).collect()
    }
    got_off = {
        (r["src"], r["dst"]) for r in verified_pairs(cands, sigs, off).collect()
    }
    assert got_on == got_off, (
        f"prefilter changed verified output: only_on={got_on - got_off} "
        f"only_off={got_off - got_on}"
    )
    sigs.unpersist()
    cands.unpersist()


def test_prefilter_preserves_output_with_freq_weighting(spark):
    """With tf-idf weighting active the bitsig LSBs come from WEIGHTED
    MinHash slots, whose agreement probability is the weighted jaccard —
    which can sit below the plain bottom-k jaccard the verify gate measures
    (round-2 ADVICE).  The shipped bound assumes the two track each other;
    this pins that assumption empirically at the default 6σ margin: verified
    output must be identical with the prefilter on, weighting enabled."""
    from mhap_spark.freq import FreqTable

    cfg = MhapConfig(num_hashes=512, min_jaccard=0.7, bit_prefilter=True)
    corpus = generate_corpus(800, seed=13)
    df = spark.createDataFrame(corpus_to_rows(corpus), INPUT_SCHEMA_DDL).repartition(8)
    freq = FreqTable.compute(df, cfg)
    assert len(freq.keys) > 0, "weighting must actually be active"
    sigs = compute_signatures(df, cfg, freq).persist()
    cands = candidate_pairs(sigs, cfg).persist()
    got_on = {
        (r["src"], r["dst"]) for r in verified_pairs(cands, sigs, cfg).collect()
    }
    off = cfg.with_overrides(bit_prefilter=False)
    got_off = {
        (r["src"], r["dst"]) for r in verified_pairs(cands, sigs, off).collect()
    }
    assert got_on == got_off, (
        f"weighted prefilter changed output: dropped={got_off - got_on}"
    )
    sigs.unpersist()
    cands.unpersist()


def test_min_shingles_load_filter(spark):
    """Explicit min-length load filter (MhapMain min-store-length analog):
    rows below the distinct-shingle floor are dropped at sketch time."""
    from mhap_spark.synth import INPUT_SCHEMA_DDL

    rows = [
        ("long01", b"", 8, 8, "png", "a reasonably long caption with plenty of text", 0),
        ("tiny01", b"", 8, 8, "png", "tiny", 0),  # < k chars -> 0 shingles
    ]
    df = spark.createDataFrame(rows, INPUT_SCHEMA_DDL)
    base = MhapConfig(num_hashes=64, use_phash_shingles=False)
    all_rows = {r["image_id"] for r in compute_signatures(df, base, None).collect()}
    assert all_rows == {"long01", "tiny01"}
    filt = base.with_overrides(min_shingles=5)
    kept = {r["image_id"] for r in compute_signatures(df, filt, None).collect()}
    assert kept == {"long01"}
