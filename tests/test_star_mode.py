"""Star candidate mode (PRESET_SCALE): engine ⇄ oracle parity and
cluster-recall equivalence with the exact pairs mode."""

import pytest

from mhap_spark import oracle
from mhap_spark.candidates import candidate_pairs
from mhap_spark.config import MhapConfig
from mhap_spark.freq import FreqTable, df_ratio_table
from mhap_spark.minhash import compute_signatures
from mhap_spark.pipeline import run_pipeline
from mhap_spark.synth import INPUT_SCHEMA_DDL, corpus_to_rows, generate_corpus, truth_pairs

CFG_STAR = MhapConfig(num_hashes=128, candidate_mode="star")
# full scale preset shape at unit size: star + band subsampling + sampled df
CFG_SCALE = MhapConfig(
    num_hashes=128, candidate_mode="star", num_bands=32, freq_sample_mod=4
)


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(400, seed=11)


@pytest.fixture(scope="module")
def input_df(spark, corpus):
    return spark.createDataFrame(corpus_to_rows(corpus), INPUT_SCHEMA_DDL).repartition(4)


def test_star_candidates_match_oracle(spark, corpus, input_df):
    freq = FreqTable.from_df(df_ratio_table(input_df, CFG_STAR), CFG_STAR)
    sig_df = compute_signatures(input_df, CFG_STAR, freq)
    got = {
        (r["src"], r["dst"]): r["votes"]
        for r in candidate_pairs(sig_df, CFG_STAR).collect()
    }
    shingle_sets = [
        oracle.row_shingles(c, int(p), CFG_STAR)
        for c, p in zip(corpus["caption"], corpus["phash"])
    ]
    freq_o = oracle.FreqFilter(oracle.df_ratio_table(shingle_sets), CFG_STAR)
    sigs_o = [oracle.weighted_minhash(sh, CFG_STAR, freq_o) for sh in shingle_sets]
    bottoms = [oracle.bottom_k(sh, CFG_STAR.ordered_sketch_size) for sh in shingle_sets]
    want = {
        (a, b): v
        for a, b, v, *_ in oracle.find_pairs(
            corpus["image_id"], sigs_o, bottoms, CFG_STAR.with_overrides(threshold=-1.0)
        )
    }
    assert got == want


def test_scale_preset_matches_oracle_and_truth(spark, corpus, input_df):
    """Band subsampling + hash-sampled df estimation: engine candidates still
    equal the oracle's at the identical config, and recall holds."""
    cfg = CFG_SCALE
    freq = FreqTable.from_df(df_ratio_table(input_df, cfg), cfg)
    sig_df = compute_signatures(input_df, cfg, freq)
    got = {
        (r["src"], r["dst"]): r["votes"]
        for r in candidate_pairs(sig_df, cfg).collect()
    }
    shingle_sets = [
        oracle.row_shingles(c, int(p), cfg)
        for c, p in zip(corpus["caption"], corpus["phash"])
    ]
    freq_o = oracle.FreqFilter(
        oracle.df_ratio_table(
            shingle_sets, ids=corpus["image_id"], sample_mod=cfg.freq_sample_mod
        ),
        cfg,
    )
    sigs_o = [oracle.weighted_minhash(sh, cfg, freq_o) for sh in shingle_sets]
    bottoms = [oracle.bottom_k(sh, cfg.ordered_sketch_size) for sh in shingle_sets]
    want = {
        (a, b): v
        for a, b, v, *_ in oracle.find_pairs(
            corpus["image_id"], sigs_o, bottoms, cfg.with_overrides(threshold=-1.0)
        )
    }
    assert got == want
    # bands actually subsampled
    first = sig_df.select("bands").first()
    assert len(first["bands"]) == 32

    truth = truth_pairs(corpus["true_cluster"], corpus["image_id"])
    out = run_pipeline(spark, input_df, cfg)
    cl = {r["image_id"]: r["cluster_id"] for r in out["clusters"].collect()}
    hit = sum(1 for a, b in truth if cl[a] == cl[b])
    assert hit / len(truth) >= 0.99


def test_star_clusters_preserve_recall(spark, corpus, input_df):
    """Star edges must reproduce the same planted-cluster recall as all-pairs
    mode (connectivity through verified hubs)."""
    truth = truth_pairs(corpus["true_cluster"], corpus["image_id"])
    star = run_pipeline(spark, input_df, CFG_STAR)
    cl = {r["image_id"]: r["cluster_id"] for r in star["clusters"].collect()}
    hit = sum(1 for a, b in truth if cl[a] == cl[b])
    assert hit / len(truth) >= 0.99

    # and star candidate volume is strictly smaller than all-pairs volume
    pairs_cfg = CFG_STAR.with_overrides(candidate_mode="pairs")
    n_star = star["pairs"].count()
    n_pairs = run_pipeline(spark, input_df, pairs_cfg)["pairs"].count()
    assert n_star < n_pairs
