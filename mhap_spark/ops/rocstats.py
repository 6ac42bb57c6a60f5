"""Retrieval-quality estimation — the engine's EstimateROC analog
(mhap/main/EstimateROC.java:173-262: sensitivity / specificity / PPV of an
overlap set against truth clusters).

Works on DataFrames end-to-end: truth pairs are derived from a
(image_id, true_cluster) table with a self-join, compared to found pairs by
full outer join — no driver-side pair materialization, so it runs at the
same scale as the pipeline itself (the reference samples 10k trials instead,
:72,802-840; exact counting is affordable when it's a distributed join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def truth_pairs_df(truth: DataFrame) -> DataFrame:
    """(image_id, true_cluster) → all intra-cluster (src, dst), src < dst.
    The self-join shuffles on the cluster id; Zipf-hot clusters are bounded
    by the same cap logic as candidate buckets if needed upstream."""
    l = truth.select(F.col("image_id").alias("src"), F.col("true_cluster").alias("c"))
    r = truth.select(F.col("image_id").alias("dst"), F.col("true_cluster").alias("c"))
    return l.join(r, "c").where(F.col("src") < F.col("dst")).select("src", "dst")


def pair_confusion(found: DataFrame, truth: DataFrame) -> DataFrame:
    """One row: tp / fp / fn / tn / sensitivity / specificity / ppv.

    found: (src, dst) engine pairs (canonical src<dst);
    truth: (image_id, true_cluster).

    Specificity (mhap/main/EstimateROC.java:819-840) comes for free here:
    the reference must SAMPLE negative pairs because its truth is an interval
    index it can only probe pointwise, but with tabular truth the universe of
    pairs is exactly C(n,2) over the truth's id set, so
    tn = C(n,2) − tp − fp − fn is exact, computed from one count-distinct —
    no pair ever materialized."""
    t = truth_pairs_df(truth).withColumn("in_truth", F.lit(1))
    f = found.select("src", "dst").distinct().withColumn("in_found", F.lit(1))
    j = t.join(f, ["src", "dst"], "full_outer")
    n_ids = truth.agg(
        F.count_distinct("image_id").alias("n_ids")
    )
    counts = j.agg(
        F.sum(F.when(F.col("in_truth").isNotNull() & F.col("in_found").isNotNull(), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("in_truth").isNull() & F.col("in_found").isNotNull(), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(F.col("in_truth").isNotNull() & F.col("in_found").isNull(), 1).otherwise(0)).alias("fn"),
    )
    return (
        counts.crossJoin(F.broadcast(n_ids))
        .withColumn(
            "tn",
            (F.col("n_ids") * (F.col("n_ids") - 1) / 2).cast("long")
            - F.col("tp") - F.col("fp") - F.col("fn"),
        )
        .select(
            "tp",
            "fp",
            "fn",
            "tn",
            F.round(F.col("tp") / (F.col("tp") + F.col("fn")), 6).alias("sensitivity"),
            F.round(F.col("tn") / (F.col("tn") + F.col("fp")), 6).alias("specificity"),
            F.round(F.col("tp") / (F.col("tp") + F.col("fp")), 6).alias("ppv"),
        )
    )


def cluster_confusion(clusters: DataFrame, truth: DataFrame) -> DataFrame:
    """Pair confusion induced by CLUSTER assignments (co-clustered = found):
    the metric BASELINE.json grades (dup-pair recall vs reference clusters).
    clusters: (image_id, cluster_id)."""
    l = clusters.select(F.col("image_id").alias("src"), F.col("cluster_id").alias("k"))
    r = clusters.select(F.col("image_id").alias("dst"), F.col("cluster_id").alias("k"))
    found = l.join(r, "k").where(F.col("src") < F.col("dst")).select("src", "dst")
    return pair_confusion(found, truth)
