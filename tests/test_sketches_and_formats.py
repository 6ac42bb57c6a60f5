"""Count-min sketch (CountMin.java analog), histogram auto-cutoff
(GetHistogramStats.java analog), and the M4 text emitter (MatchResult.java
golden format)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mhap_spark.formats import to_m4
from mhap_spark.freq import auto_filter_cutoff, histogram_stats
from mhap_spark.ops.sketches import CountMin, cms_cells


def test_cms_estimates_bounded(spark):
    """CMS invariants: estimate ≥ exact for every key; total overestimate
    bounded by the ε·N guarantee with generous slack (deterministic seed)."""
    rng = np.random.default_rng(2)
    # Zipf-ish: key k appears ~ 1000/k times
    keys = np.repeat(np.arange(1, 201, dtype=np.int64), (1000 // np.arange(1, 201)))
    rng.shuffle(keys)
    df = spark.createDataFrame([(int(k),) for k in keys], "key long").repartition(4)
    depth, width = 4, 1024
    cms = CountMin.compute(df, "key", depth=depth, width=width)
    uniq, exact = np.unique(keys, return_counts=True)
    est = cms.estimate(uniq)
    assert (est >= exact).all(), "CMS must never underestimate"
    n_total = len(keys)
    eps_bound = np.e / width * n_total
    # each key's overestimate should respect the eps*N bound (whp; all keys here)
    assert (est - exact <= 3 * eps_bound).all()
    # the sketch matrix row sums all equal N (every item lands once per row)
    assert (cms.matrix.sum(axis=1) == n_total).all()


def test_cms_merge_is_distributed(spark):
    """Cell table cardinality is bounded by depth·width, not input size."""
    df = spark.createDataFrame(
        [(int(i % 97),) for i in range(5000)], "key long"
    ).repartition(8)
    cells = cms_cells(df, "key", depth=4, width=256)
    assert cells.count() <= 4 * 256
    total = cells.agg(F.sum("n")).collect()[0][0]
    assert total == 4 * 5000  # every item counted once per sketch row


def _java_histogram_oracle(hist: dict[int, int], percent: float):
    """Literal re-expression of GetHistogramStats.java:63-90."""
    total = sum(hist.values())
    mean = sum(v * c for v, c in hist.items()) / total
    var = sum(c * (v - mean) ** 2 for v, c in hist.items()) / total
    s = sum(v * c for v, c in hist.items())
    running, cut = 0.0, None
    for v in sorted(hist):
        running += v * hist[v]
        if running / s > percent:
            cut = v
            break
    return mean, var ** 0.5, cut


@pytest.mark.parametrize("percent", [0.5, 0.9, 0.99])
def test_histogram_stats_matches_java_semantics(spark, percent):
    hist = {1: 1000, 2: 400, 3: 150, 5: 60, 8: 20, 13: 7, 100: 1}
    df = spark.createDataFrame(list(hist.items()), "value long, n long")
    row = histogram_stats(df, percent=percent).collect()[0]
    mean, sd, cut = _java_histogram_oracle(hist, percent)
    assert row["mean"] == pytest.approx(mean)
    assert row["stdev"] == pytest.approx(sd)
    assert row["cut"] == cut


def test_auto_filter_cutoff_on_corpus(spark):
    from mhap_spark.config import MhapConfig
    from mhap_spark.synth import INPUT_SCHEMA_DDL, corpus_to_rows, generate_corpus

    cfg = MhapConfig(num_hashes=128)
    df = spark.createDataFrame(
        corpus_to_rows(generate_corpus(300, seed=3)), INPUT_SCHEMA_DDL
    )
    cut = auto_filter_cutoff(df, cfg, percent=0.5)
    assert 0.0 < cut <= 1.0
    # higher percentile keeps more mass below the cut → cut value must not shrink
    cut99 = auto_filter_cutoff(df, cfg, percent=0.99)
    assert cut99 >= cut


def test_m4_golden_format(spark):
    pairs = spark.createDataFrame(
        [("img_a", "img_b", 7, 0.5, 0.912345678), ("img_a", "img_c", 3, 0.25, 0.75)],
        "src string, dst string, votes long, jaccard double, score double",
    )
    sigs = spark.createDataFrame(
        [("img_a", 120), ("img_b", 98), ("img_c", 77)],
        "image_id string, n_shingles int",
    )
    lines = [r["line"] for r in to_m4(pairs, sigs).collect()]
    assert lines == [
        "img_a img_b 0.087654 7.000000 0 0 0 120 0 0 0 98",
        "img_a img_c 0.250000 3.000000 0 0 0 120 0 0 0 77",
    ]
    # 12 space-separated fields, reference layout (MatchResult.java:98-113)
    assert all(len(l.split(" ")) == 12 for l in lines)


def test_m4_without_signatures(spark):
    pairs = spark.createDataFrame(
        [("x", "y", 2, 0.1, 0.5)],
        "src string, dst string, votes long, jaccard double, score double",
    )
    assert to_m4(pairs).collect()[0]["line"] == "x y 0.500000 2.000000 0 0 0 0 0 0 0 0"


def test_m4_missing_signature_endpoint_kept(spark):
    """A pair whose endpoint lacks a signature row must still be exported
    (left join, length 0) — an inner join silently dropped it."""
    pairs = spark.createDataFrame(
        [("img_a", "img_b", 7, 0.5, 0.9), ("img_a", "img_z", 3, 0.25, 0.75)],
        "src string, dst string, votes long, jaccard double, score double",
    )
    sigs = spark.createDataFrame(
        [("img_a", 120), ("img_b", 98)], "image_id string, n_shingles int"
    )
    lines = [r["line"] for r in to_m4(pairs, sigs).collect()]
    assert len(lines) == 2
    assert lines[1] == "img_a img_z 0.250000 3.000000 0 0 0 120 0 0 0 0"


def test_sketch_null_keys_dropped(spark):
    """Null keys (or cast-to-null strings) must not crash the Arrow kernels
    — they are dropped JVM-side before the batch reaches numpy."""
    from mhap_spark.ops.sketches import bloom_words

    df = spark.createDataFrame(
        [(1,), (None,), (2,), (1,)], "k long"
    )
    cms = cms_cells(df, "k", depth=2, width=64).collect()
    assert sum(r["n"] for r in cms) == 3 * 2  # 3 non-null keys × depth
    ref = cms_cells(df.where(F.col("k").isNotNull()), "k", depth=2, width=64)
    assert sorted((r["cell"], r["n"]) for r in cms) == sorted(
        (r["cell"], r["n"]) for r in ref.collect()
    )
    words = bloom_words(df, "k", m_bits=1 << 10, k_hashes=2).collect()
    assert words  # built without the NaN ValueError


def test_bloom_filter_membership_and_fpr(spark):
    """Bloom filter (FrequencyCounts.java:137,272-278 noise-membership
    analog): zero false negatives, FPR near the (1-e^(-kn/m))^k formula,
    bitmap identical across input partitionings (bit_or merge is
    order-insensitive)."""
    from mhap_spark.ops.sketches import BloomFilter, bloom_words

    n, m_bits, k = 5000, 1 << 16, 4
    members = np.arange(1_000_000, 1_000_000 + n, dtype=np.int64)
    df = spark.createDataFrame([(int(x),) for x in members], "key long")

    bf = BloomFilter.compute(df.repartition(8), "key", m_bits=m_bits, k_hashes=k)
    assert bf.might_contain(members).all(), "no false negatives, ever"

    probes = np.arange(5_000_000, 5_050_000, dtype=np.int64)  # disjoint
    fpr = bf.might_contain(probes).mean()
    expected = (1 - np.exp(-k * n / m_bits)) ** k
    assert fpr <= 3 * expected + 1e-3, (fpr, expected)

    # word table bounded by geometry and partitioning-invariant
    w1 = {(r["word_idx"], r["bits"])
          for r in bloom_words(df.repartition(2), "key", m_bits, k).collect()}
    w8 = {(r["word_idx"], r["bits"])
          for r in bloom_words(df.repartition(8), "key", m_bits, k).collect()}
    assert w1 == w8
    assert len(w1) <= m_bits // 64 + 1
