"""Engine ⇄ oracle parity: the Spark kernels must reproduce the single-node
reference implementation bit-for-bit (signatures) and set-for-set (pairs,
clusters) at identical configs — SURVEY.md §5.2 kernel/candidate/stage-2 rows."""

import numpy as np
import pandas as pd
import pytest

from mhap_spark import oracle
from mhap_spark.config import MhapConfig
from mhap_spark.freq import FreqTable, df_ratio_table
from mhap_spark.minhash import compute_signatures
from mhap_spark.candidates import candidate_pairs
from mhap_spark.verify import verified_pairs
from mhap_spark.cluster import connected_components
from mhap_spark.synth import INPUT_SCHEMA_DDL, corpus_to_rows, generate_corpus

CFG = MhapConfig(num_hashes=128)  # small sketch → fast unit tier
N_ROWS = 200


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(N_ROWS, seed=42)


@pytest.fixture(scope="module")
def input_df(spark, corpus):
    return spark.createDataFrame(corpus_to_rows(corpus), INPUT_SCHEMA_DDL).repartition(4)


@pytest.fixture(scope="module")
def oracle_state(corpus):
    cfg = CFG
    shingle_sets = [
        oracle.row_shingles(c, int(p), cfg)
        for c, p in zip(corpus["caption"], corpus["phash"])
    ]
    freq = oracle.FreqFilter(oracle.df_ratio_table(shingle_sets), cfg)
    sigs = [oracle.weighted_minhash(sh, cfg, freq) for sh in shingle_sets]
    bottoms = [oracle.bottom_k(sh, cfg.ordered_sketch_size) for sh in shingle_sets]
    return shingle_sets, freq, sigs, bottoms


@pytest.fixture(scope="module")
def engine_sigs(spark, input_df):
    freq = FreqTable.from_df(df_ratio_table(input_df, CFG), CFG)
    df = compute_signatures(input_df, CFG, freq)
    pdf = df.toPandas().set_index("image_id").sort_index()
    return df, pdf


def test_freq_table_matches_oracle(spark, input_df, oracle_state):
    shingle_sets, freq_o, _, _ = oracle_state
    t = FreqTable.from_df(df_ratio_table(input_df, CFG), CFG)
    engine = dict(zip((int(k) for k in t.keys), t.ratios))
    assert engine.keys() == freq_o.map.keys()
    for k, v in freq_o.map.items():
        assert engine[k] == pytest.approx(v, abs=1e-12)
    # scaled idf agrees on hits and misses
    probe = np.array(list(freq_o.map.keys())[:50] + [123456789], dtype=np.uint64)
    got = t.scaled_idf(probe)
    want = np.array([freq_o.scaled_idf(int(k)) for k in probe])
    assert np.allclose(got, want, atol=1e-12)


def test_signatures_match_oracle_bitexact(corpus, oracle_state, engine_sigs):
    _, _, sigs_o, bottoms_o = oracle_state
    _, pdf = engine_sigs
    assert len(pdf) == N_ROWS
    for i, img in enumerate(corpus["image_id"]):
        row = pdf.loc[img]
        assert np.array_equal(np.asarray(row["sig"], dtype=np.int32), sigs_o[i]), img
        got_bk = np.asarray(row["bottomk"], dtype=np.int64).view(np.uint64)
        assert np.array_equal(got_bk, bottoms_o[i]), img


@pytest.mark.parametrize("strategy", ["grouped", "join"])
def test_candidates_match_oracle(spark, corpus, oracle_state, engine_sigs, strategy):
    _, _, sigs_o, bottoms_o = oracle_state
    sig_df, _ = engine_sigs
    got = {
        (r["src"], r["dst"]): r["votes"]
        for r in candidate_pairs(sig_df, CFG, strategy=strategy).collect()
    }
    want_rows = oracle.find_pairs(
        corpus["image_id"], sigs_o, bottoms_o, CFG.with_overrides(threshold=-1.0, min_jaccard=-1.0)
    )
    want = {(a, b): v for a, b, v, *_ in want_rows}
    assert got == want


def test_verified_pairs_match_oracle(spark, corpus, oracle_state, engine_sigs):
    _, _, sigs_o, bottoms_o = oracle_state
    sig_df, _ = engine_sigs
    cands = candidate_pairs(sig_df, CFG)
    got = {
        (r["src"], r["dst"]): (r["votes"], r["jaccard"], r["score"])
        for r in verified_pairs(cands, sig_df, CFG).collect()
    }
    want = {
        (a, b): (v, j, s)
        for a, b, v, j, s in oracle.find_pairs(
            corpus["image_id"], sigs_o, bottoms_o, CFG
        )
    }
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], abs=1e-12)
        assert got[k][2] == pytest.approx(want[k][2], abs=1e-9)


def test_verified_pairs_prune_is_lossless(spark, corpus, engine_sigs):
    """prune=True semi-joins the wide bottom-k table to candidate ids before
    the verify joins — it must be invisible in the output (it is a plan
    optimization, measured in tools/verify_bytes_probe.py)."""
    sig_df, _ = engine_sigs
    cands = candidate_pairs(sig_df, CFG)
    base = {
        (r["src"], r["dst"]): (r["votes"], r["jaccard"], r["score"])
        for r in verified_pairs(cands, sig_df, CFG, prune=False).collect()
    }
    pruned = {
        (r["src"], r["dst"]): (r["votes"], r["jaccard"], r["score"])
        for r in verified_pairs(cands, sig_df, CFG, prune=True).collect()
    }
    assert base == pruned


def test_connected_components_matches_union_find(spark):
    rng = np.random.default_rng(5)
    nodes = [f"n{i:04d}" for i in range(300)]
    edges = set()
    while len(edges) < 250:
        a, b = rng.integers(0, 300, 2)
        if a != b:
            edges.add((nodes[min(a, b)], nodes[max(a, b)]))
    pairs_df = spark.createDataFrame(sorted(edges), "src string, dst string")
    verts_df = spark.createDataFrame([(n,) for n in nodes], "image_id string")
    got = {
        r["image_id"]: r["cluster_id"]
        for r in connected_components(pairs_df, verts_df).collect()
    }
    want = oracle.connected_components(nodes, sorted(edges))
    assert got == want


def test_cc_driver_finish_equivalent(spark):
    """The driver union-find finish (cluster.py driver_finish_edges) must
    produce exactly the distributed fixpoint's clustering — pre-loop escape
    (cutoff above the edge count) and the default loop compared on the same
    random graph + a star-heavy graph (the dup-cluster shape)."""
    rng = np.random.default_rng(7)
    nodes = [f"n{i:04d}" for i in range(400)]
    edges = set()
    while len(edges) < 300:
        a, b = rng.integers(0, 400, 2)
        if a != b:
            edges.add((nodes[min(a, b)], nodes[max(a, b)]))
    for m in range(1, 60):  # star component (hub n0300): the dup-cluster shape
        edges.add((nodes[300], nodes[300 + m]))
    pairs_df = spark.createDataFrame(sorted(edges), "src string, dst string")
    verts_df = spark.createDataFrame([(n,) for n in nodes], "image_id string")
    loop = {
        r["image_id"]: r["cluster_id"]
        for r in connected_components(
            pairs_df, verts_df, driver_finish_edges=0
        ).collect()
    }
    finish = {
        r["image_id"]: r["cluster_id"]
        for r in connected_components(
            pairs_df, verts_df, driver_finish_edges=10_000
        ).collect()
    }
    assert loop == finish
    # mid-loop escape: cutoff below the initial edge count but above the
    # post-round residual, so the switch happens INSIDE the loop
    mid = {
        r["image_id"]: r["cluster_id"]
        for r in connected_components(
            pairs_df, verts_df, driver_finish_edges=len(edges) - 1
        ).collect()
    }
    assert mid == loop


def test_null_phash_rows_are_caption_only_and_batch_safe(spark):
    """A NULL phash must contribute ZERO phash shingles (caption-only row) —
    the default Arrow→pandas path would cast NaN to INT64_MIN, giving every
    null-phash row identical phash shingles (spurious clustering) AND
    corrupting non-null hashes above 2^53 in the same batch via the float64
    round-trip.  shingle_input resolves nulls JVM-side."""
    from mhap_spark.shingles import shingles_df

    cfg = MhapConfig(num_hashes=64)
    big_hash = (1 << 62) + 12345  # above 2^53: float64 round-trip would corrupt
    rows = [
        ("keep", None, 0, 0, "raw", "a sunny beach with palm trees", big_hash),
        ("null_a", None, 0, 0, "raw", "a red bicycle leaning on a wall", None),
        ("null_b", None, 0, 0, "raw", "snowy mountain peaks at dawn today", None),
    ]
    df = spark.createDataFrame(rows, INPUT_SCHEMA_DDL)
    got = {r["image_id"]: r for r in shingles_df(df, cfg).collect()}

    # null-phash rows: shingles == caption-only shingles (no phash n-grams,
    # and in particular NOT the INT64_MIN n-gram set both would share)
    cap_only = cfg.with_overrides(use_phash_shingles=False)
    cap = {r["image_id"]: r for r in shingles_df(df, cap_only).collect()}
    for rid in ("null_a", "null_b"):
        assert got[rid]["shingles"] == cap[rid]["shingles"]
    assert not set(got["null_a"]["shingles"]) & set(got["null_b"]["shingles"])

    # the non-null row in the same Arrow batch keeps bit-exact shingles
    solo = spark.createDataFrame([rows[0]], INPUT_SCHEMA_DDL)
    want = shingles_df(solo, cfg).collect()[0]["shingles"]
    assert got["keep"]["shingles"] == want

    # end-to-end: the two unrelated null-phash rows must not become a pair
    sigs = compute_signatures(df, cfg, freq=None)
    pairs = {
        (r["src"], r["dst"])
        for r in candidate_pairs(sigs, cfg).select("src", "dst").collect()
    }
    assert ("null_a", "null_b") not in pairs and ("null_b", "null_a") not in pairs


def test_cc_driver_finish_integer_ids(spark):
    """The CC API is id-type-agnostic everywhere else; the driver-finish
    path must not assume string ids (it is the DEFAULT regime at
    cc_driver_finish_edges=8M, so integer-id graphs hit it immediately)."""
    edges = [(i, i + 1) for i in range(0, 40, 2)] + [(1, 2)]
    pairs_df = spark.createDataFrame(edges, "src long, dst long")
    verts_df = spark.createDataFrame(
        [(i,) for i in range(42)], "image_id long"
    )
    finish = {
        r["image_id"]: r["cluster_id"]
        for r in connected_components(
            pairs_df, verts_df, driver_finish_edges=10_000
        ).collect()
    }
    loop = {
        r["image_id"]: r["cluster_id"]
        for r in connected_components(
            pairs_df, verts_df, driver_finish_edges=0
        ).collect()
    }
    assert finish == loop
    assert finish[3] == 0  # 0-1-2-3 merged via the (1,2) bridge, min id 0


def test_freq_edge_configs_no_crash(spark, input_df):
    """idf_scale=1.0 (flat idf span) and filter_cutoff=0.0 (retain all)
    are legal configs: idf_scale=1 means every hit weighs 1.0 (not a
    division by idf_scale−1 = 0), cutoff=0 anchors the idf span at the
    rarest observed ratio (not log(x/0)).  Engine and oracle mirror both
    guards, so signatures stay bit-exact."""
    from pyspark.sql import functions as F

    from mhap_spark.minhash import compute_signatures as _sigs

    for over in ({"idf_scale": 1.0}, {"filter_cutoff": 0.0}):
        cfg = MhapConfig(num_hashes=32, **over)
        freq = FreqTable.compute(input_df, cfg)
        out = _sigs(input_df, cfg, freq)
        assert out.where(F.size("sig") == cfg.num_hashes).count() == out.count()


@pytest.mark.parametrize(
    "over",
    [
        {"rows_per_band": 2},                      # 64 true LSH bands
        {"rows_per_band": 4, "num_min_matches": 4},  # 32 bands, gate ceil(4/4)=1
        {"rows_per_band": 2, "num_bands": 20},     # band subsampling on top
    ],
)
def test_lsh_banding_r_gt_1_matches_oracle(spark, corpus, input_df, oracle_state, over):
    """True LSH banding (rows_per_band > 1, previously untested): the engine
    folds r consecutive slots into one fmix64-chained band key
    (minhash.band_hashes); the oracle buckets on the exact r-slot tuple.
    Candidate sets, votes, and verified pairs must agree — including with
    num_bands subsampling layered on.  Signatures are banding-independent,
    so the module oracle state is reused."""
    cfg = CFG.with_overrides(**over)
    _, _, sigs_o, bottoms_o = oracle_state
    freq = FreqTable.from_df(df_ratio_table(input_df, cfg), cfg)
    sig_df = compute_signatures(input_df, cfg, freq)

    got = {
        (r["src"], r["dst"]): r["votes"]
        for r in candidate_pairs(sig_df, cfg).collect()
    }
    # candidate stage has no jaccard/score gate — disable both oracle gates
    want = {
        (a, b): v
        for a, b, v, *_ in oracle.find_pairs(
            corpus["image_id"], sigs_o, bottoms_o,
            cfg.with_overrides(threshold=-1.0, min_jaccard=-1.0),
        )
    }
    assert got == want and len(got) > 0

    got_v = {
        (r["src"], r["dst"]): (r["votes"], r["jaccard"])
        for r in verified_pairs(candidate_pairs(sig_df, cfg), sig_df, cfg).collect()
    }
    want_v = {
        (a, b): (v, j)
        for a, b, v, j, _ in oracle.find_pairs(
            corpus["image_id"], sigs_o, bottoms_o, cfg
        )
    }
    assert got_v.keys() == want_v.keys()
    for k in want_v:
        assert got_v[k][0] == want_v[k][0]
        assert got_v[k][1] == pytest.approx(want_v[k][1], abs=1e-12)


def test_trailing_empty_rows_batch_boundary(spark):
    """An Arrow batch ENDING in zero-shingle rows must not corrupt the last
    non-empty row's signature: the pre-round-5 reduceat-start clamp truncated
    that row's segment, dropping its final distinct key from every per-slot
    min (wrong slots → wrong band hashes → missed/spurious candidates,
    dependent on which rows sat at an Arrow batch boundary)."""
    from mhap_spark.minhash import batch_minhash

    # kernel level: rows followed by trailing/middle empty rows keep
    # bit-exact signatures, empty rows get zeros
    rng = np.random.default_rng(7)
    keys = rng.integers(1, 2**63, size=5, dtype=np.uint64)
    rows = np.array([0, 0, 0, 1, 1])
    for w in (np.ones(5, dtype=np.int64), np.array([3, 1, 2, 1, 2], dtype=np.int64)):
        alone = batch_minhash(rows, keys, w, np.array([0, 3, 5]), 64)
        trail = batch_minhash(rows, keys, w, np.array([0, 3, 5, 5, 5]), 64)
        assert (trail[:2] == alone).all() and (trail[2:] == 0).all()
        mid = batch_minhash(
            np.array([0, 0, 0, 2, 2]), keys, w, np.array([0, 3, 3, 5]), 64
        )
        assert (mid[[0, 2]] == alone).all() and (mid[1] == 0).all()

    # end to end: zero-shingle rows (empty caption + null phash) at the tail
    # of a single-partition batch; non-degenerate rows must stay bit-exact
    # with the per-row oracle, degenerate rows get the zeroed signature
    cfg = MhapConfig(num_hashes=64)
    rows_in = [
        ("a", None, 0, 0, "raw", "a sunny beach with palm trees", 12345),
        ("b", None, 0, 0, "raw", "snowy mountain peaks at dawn today", None),
        ("empty1", None, 0, 0, "raw", "", None),
        ("empty2", None, 0, 0, "raw", "", None),
    ]
    df = spark.createDataFrame(rows_in, INPUT_SCHEMA_DDL).coalesce(1)
    got = compute_signatures(df, cfg, freq=None).toPandas().set_index("image_id")
    cap_only = cfg.with_overrides(use_phash_shingles=False)
    want_a = oracle.weighted_minhash(oracle.row_shingles(rows_in[0][5], 12345, cfg), cfg, None)
    want_b = oracle.weighted_minhash(oracle.row_shingles(rows_in[1][5], 0, cap_only), cfg, None)
    assert np.array_equal(np.array(got.loc["a", "sig"], dtype=np.int32), want_a)
    assert np.array_equal(np.array(got.loc["b", "sig"], dtype=np.int32), want_b)
    for rid in ("empty1", "empty2"):
        assert got.loc[rid, "n_shingles"] == 0
        assert not any(got.loc[rid, "sig"])
    # the oracle mirrors the zeroed degenerate signature (no raise)
    assert not oracle.weighted_minhash(np.empty(0, dtype=np.uint64), cfg, None).any()


def test_row_blocked_minhash_identical():
    """The L2-blocked batch_minhash must be bit-identical to the unblocked
    kernel on the same flat arrays — rows are independent, so blocking by
    rows may not change a single slot.  Covers: multi-block splits, a row
    bigger than the block target on its own, empty rows at block edges,
    and both the weight-1 fast path and the weighted prefix path."""
    import mhap_spark.minhash as mh

    rng = np.random.default_rng(11)
    n_rows = 400
    counts = rng.integers(0, 60, size=n_rows)
    counts[7] = 3000  # one row alone larger than the forced block target
    counts[[0, 1, 150, 398, 399]] = 0  # empty rows incl. both edges
    row_starts = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(counts, out=row_starts[1:])
    n_keys = int(row_starts[-1])
    keys = rng.integers(1, 2**63, size=n_keys, dtype=np.uint64)
    rows = np.repeat(np.arange(n_rows), counts)
    for w in (
        np.ones(n_keys, dtype=np.int64),
        rng.integers(1, 4, size=n_keys, dtype=np.int64),
    ):
        want = mh._minhash_block(rows, keys, w, row_starts, 32)
        got = mh.batch_minhash(rows, keys, w, row_starts, 32)
        assert np.array_equal(got, want)
        old = mh._BLOCK_KEYS_BASE
        mh._BLOCK_KEYS_BASE = 512  # force many tiny blocks + the giant row
        try:
            forced = mh.batch_minhash(rows, keys, w, row_starts, 32)
        finally:
            mh._BLOCK_KEYS_BASE = old
        assert np.array_equal(forced, want)


def test_batch_minhash_rejects_zero_weights():
    """All batch_weights paths clamp weights to >= 1, and the block kernel's
    step-0 fast path relies on it (it advances EVERY key and takes the state
    as the first min).  The old loop silently treated a weight-0 key as
    never-contributing; a zero must now be rejected loudly, not silently
    reinterpreted as weight 1."""
    from mhap_spark.minhash import batch_minhash

    keys = np.array([3, 5, 9], dtype=np.uint64)
    rows = np.array([0, 0, 1])
    starts = np.array([0, 2, 3])
    w = np.array([1, 0, 2], dtype=np.int64)
    with pytest.raises(ValueError, match="weights >= 1"):
        batch_minhash(rows, keys, w, starts, 16)


def test_minhash_stream_dedup_identical():
    """The round-6 (key, weight)-stream dedup inside _minhash_block must be
    bit-identical to independent per-row computation.  Rows here share a
    small vocabulary (heavy cross-row duplication → the dedup gather path),
    while each single-row call sees only distinct (key, weight) pairs and
    takes the no-dedup path — so the two code paths check each other."""
    import mhap_spark.minhash as mh

    rng = np.random.default_rng(23)
    vocab = rng.integers(1, 2**63, size=40, dtype=np.uint64)
    n_rows = 120
    counts = rng.integers(1, 30, size=n_rows)
    row_starts = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(counts, out=row_starts[1:])
    n_keys = int(row_starts[-1])
    # distinct keys per row, drawn from the shared vocabulary
    keys = np.concatenate(
        [
            np.sort(rng.choice(vocab, size=c, replace=False))
            for c in counts
        ]
    )
    rows = np.repeat(np.arange(n_rows), counts)
    # weight is a function of the key (like tf=1 idf weighting), plus a few
    # per-row overrides so some keys appear under MULTIPLE weights
    wmap = {int(k): int(w) for k, w in zip(vocab, rng.integers(1, 5, size=len(vocab)))}
    weights = np.array([wmap[int(k)] for k in keys], dtype=np.int64)
    weights[rng.integers(0, n_keys, size=n_keys // 10)] += 1

    got = mh._minhash_block(rows, keys, weights, row_starts, 48)
    for i in range(n_rows):
        a, b = row_starts[i], row_starts[i + 1]
        solo = mh._minhash_block(
            np.zeros(b - a, dtype=np.int64),
            keys[a:b],
            weights[a:b],
            np.array([0, b - a], dtype=np.int64),
            48,
        )
        assert np.array_equal(got[i], solo[0]), f"row {i} diverged"


def test_verified_pairs_arrow_impl_equals_jvm(spark, corpus, oracle_state, engine_sigs):
    """The vectorized Arrow jaccard kernel (round-6 rewrite of
    bottom_k_jaccard_batch) must produce value-identical verified pairs to
    the JVM expression path — jaccard is integer hits / integer k, so the
    two implementations share every bit."""
    sig_df, _ = engine_sigs
    cands = candidate_pairs(sig_df, CFG)
    jvm = {
        (r["src"], r["dst"]): (r["votes"], r["jaccard"], r["score"])
        for r in verified_pairs(cands, sig_df, CFG, impl="jvm").collect()
    }
    arrow = {
        (r["src"], r["dst"]): (r["votes"], r["jaccard"], r["score"])
        for r in verified_pairs(cands, sig_df, CFG, impl="arrow").collect()
    }
    assert jvm == arrow
    assert jvm, "fixture must verify at least one pair"
