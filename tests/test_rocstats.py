"""EstimateROC-analog op: confusion counts vs a brute-force python oracle."""

import itertools

import pytest

from mhap_spark.ops.rocstats import cluster_confusion, pair_confusion, truth_pairs_df


@pytest.fixture(scope="module")
def truth(spark):
    rows = [("a", 0), ("b", 0), ("c", 0), ("d", 1), ("e", 1), ("f", 2)]
    return spark.createDataFrame(rows, "image_id string, true_cluster long")


def test_truth_pairs(spark, truth):
    got = {(r["src"], r["dst"]) for r in truth_pairs_df(truth).collect()}
    assert got == {("a", "b"), ("a", "c"), ("b", "c"), ("d", "e")}


def test_pair_confusion(spark, truth):
    found = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "f")], "src string, dst string"
    )
    row = pair_confusion(found, truth).collect()[0]
    assert (row["tp"], row["fp"], row["fn"]) == (2, 1, 2)
    # universe = C(6,2) = 15 pairs → tn = 15 - 2 - 1 - 2 = 10
    assert row["tn"] == 10
    assert row["sensitivity"] == pytest.approx(2 / 4)
    assert row["specificity"] == pytest.approx(10 / 11)
    assert row["ppv"] == pytest.approx(2 / 3)


def test_cluster_confusion_perfect(spark, truth):
    clusters = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "a"), ("d", "d"), ("e", "d"), ("f", "f")],
        "image_id string, cluster_id string",
    )
    row = cluster_confusion(clusters, truth).collect()[0]
    assert (row["tp"], row["fp"], row["fn"]) == (4, 0, 0)
    assert row["tn"] == 11
    assert row["sensitivity"] == 1.0 and row["ppv"] == 1.0
    assert row["specificity"] == 1.0


def test_truth_pairs_capped_hot_cluster(spark):
    """A planted hot cluster is hash-sampled to the cap BEFORE the pair
    join (the reference samples 10k trials for the same reason,
    mhap/main/EstimateROC.java:72,802-840) — pair count is C(cap,2), not
    C(m,2), and the sample is deterministic across partitionings."""
    rows = [(f"im{i:05d}", 0) for i in range(10_000)] + [("x1", 1), ("x2", 1)]
    truth = spark.createDataFrame(rows, "image_id string, true_cluster long")
    outs = []
    for parts in (1, 16):
        pairs = truth_pairs_df(truth.repartition(parts), max_cluster_members=64)
        outs.append(sorted((r["src"], r["dst"]) for r in pairs.collect()))
    assert len(outs[0]) == 64 * 63 // 2 + 1  # capped hot cluster + exact small one
    assert outs[0] == outs[1]
    assert ("x1", "x2") in outs[0]  # below-cap clusters stay exact


def test_pair_confusion_found_outside_universe(spark, truth):
    """Found pairs with an endpoint missing from truth are excluded from the
    confusion counts (they made tn inconsistent — round-2 ADVICE) and
    surfaced in found_outside_universe."""
    found = spark.createDataFrame(
        [("a", "b"), ("a", "zzz"), ("q", "r")], "src string, dst string"
    )
    row = pair_confusion(found, truth).collect()[0]
    assert (row["tp"], row["fp"], row["fn"]) == (1, 0, 3)
    assert row["tn"] == 15 - 1 - 0 - 3
    assert row["found_outside_universe"] == 2
    assert row["tn"] >= 0 and row["specificity"] <= 1.0


def test_rescue_recovers_borderline_fp(spark):
    """Verify-rescore rescue (SW-rescue analog, EstimateROC.java:746-800):
    a found pair that truth omits but whose sketches verify at the looser
    gate moves out of fp; a genuinely-unrelated fp stays."""
    from mhap_spark.config import MhapConfig
    from mhap_spark.minhash import compute_signatures
    from mhap_spark.ops.rocstats import pair_confusion_with_rescue

    cfg = MhapConfig(num_hashes=128, use_phash_shingles=False, min_jaccard=0.0)
    texts = {
        "a": "the quick brown fox jumps over the lazy dog again and again ok",
        "b": "the quick brown fox jumps over the lazy dog again and again ok",
        "c": "completely unrelated musings about distributed query engines!!",
        "d": "yet another entirely different caption about sparse matrices..",
    }
    df = spark.createDataFrame(
        [(i, t, 0) for i, t in texts.items()],
        "image_id string, caption string, phash long",
    )
    sigs = compute_signatures(df, cfg, freq=None)
    # truth says nothing is duplicated; engine found (a,b) [real dup —
    # rescue should recover it] and (c,d) [junk — must stay fp]
    truth = spark.createDataFrame(
        [("a", 0), ("b", 1), ("c", 2), ("d", 3)],
        "image_id string, true_cluster long",
    )
    found = spark.createDataFrame([("a", "b"), ("c", "d")], "src string, dst string")
    row = pair_confusion_with_rescue(found, truth, sigs, cfg).collect()[0]
    assert row["fp"] == 2
    assert row["fp_rescued"] == 1
    assert row["fp_final"] == 1
    assert row["ppv_rescued"] == pytest.approx(0.5)


def test_cluster_confusion_overmerged(spark, truth):
    clusters = spark.createDataFrame(
        [("a", "x"), ("b", "x"), ("c", "x"), ("d", "x"), ("e", "x"), ("f", "x")],
        "image_id string, cluster_id string",
    )
    row = cluster_confusion(clusters, truth).collect()[0]
    n_all = len(list(itertools.combinations("abcdef", 2)))
    assert row["tp"] == 4 and row["fn"] == 0
    assert row["fp"] == n_all - 4
    assert row["tn"] == 0 and row["specificity"] == 0.0


def test_duplicate_truth_membership_does_not_double_count(spark):
    """Duplicated membership rows / overlapping clusters must not emit the
    same truth pair twice (double-counted tp would drive tn negative)."""
    truth = spark.createDataFrame(
        [("a", 0), ("a", 1), ("b", 0), ("b", 1)],
        "image_id string, true_cluster long",
    )
    got = [(r["src"], r["dst"]) for r in truth_pairs_df(truth).collect()]
    assert got == [("a", "b")]
    found = spark.createDataFrame([("a", "b")], "src string, dst string")
    row = pair_confusion(found, truth).collect()[0]
    # universe C(2,2)=1: the one pair is tp, tn exactly 0 — not -1
    assert (row["tp"], row["fp"], row["fn"], row["tn"]) == (1, 0, 0, 0)


def test_pair_confusion_empty_inputs_are_zero(spark):
    """A dup-free corpus (all truth clusters singletons, no found pairs)
    must yield tp=fp=fn=0 and tn=C(n,2) — F.sum over the empty join is NULL
    without the coalesce, poisoning tn and every derived rate."""
    singles = spark.createDataFrame(
        [("a", 0), ("b", 1), ("c", 2)], "image_id string, true_cluster long"
    )
    found = spark.createDataFrame([], "src string, dst string")
    row = pair_confusion(found, singles).collect()[0]
    assert (row["tp"], row["fp"], row["fn"], row["tn"]) == (0, 0, 0, 3)
