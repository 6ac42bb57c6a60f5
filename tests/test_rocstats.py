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
