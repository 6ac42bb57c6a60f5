"""Pins for mhap_spark.oracle_ops — the sequential replicas behind the
round-4 VALUES-literal contract oracles.

The structural replicas (candidates, simhash, confusion, LSH/IVF) are
integration-checked end-to-end by tools/check_contract.py against the live
Spark queries; here we pin the two primitives whose correctness is NOT
implied by that comparison running at one data point: Spark-compatible
xxhash64 (both JVM input types the oracles hash) and the BigDecimal HALF_UP
rounding replica.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mhap_spark.oracle_ops import round_half_up, xxhash64_bytes, xxhash64_long


LONGS = [0, 1, -1, 42, 123456789, -987654321012345, 2**63 - 1, -(2**63)]
# every tail-length class of the XXH64 layout: empty, <4, exactly 4..7
# (4-byte lane), exactly 8 (word), 9..31 (word+lane+bytes), 32 (one stripe),
# 33+ (stripe + tail)
STRINGS = [
    "", "a", "abc", "abcd", "abcdefg", "abcdefgh", "abcdefghi",
    "hello world", "exact32bytes_exact32bytes_123456", "x" * 33,
    "the quick brown fox jumps over the lazy dog", "naïve café ß",
]


def test_xxhash64_long_matches_spark(spark):
    df = spark.createDataFrame([(v,) for v in LONGS], "v long")
    got = [r["h"] for r in df.select(F.xxhash64("v").alias("h")).collect()]
    assert got == [xxhash64_long(v) for v in LONGS]


def test_xxhash64_string_matches_spark(spark):
    df = spark.createDataFrame([(s,) for s in STRINGS], "s string")
    got = [r["h"] for r in df.select(F.xxhash64("s").alias("h")).collect()]
    assert got == [xxhash64_bytes(s.encode("utf-8")) for s in STRINGS]


@pytest.mark.parametrize(
    "x",
    [0.1234565, 0.12345649999, 0.1234575, 2.5e-6, -0.0000015, 124.42252604166667,
     1.0, 0.0, -3.9999995],
)
def test_round_half_up_matches_spark_round(spark, x):
    df = spark.createDataFrame([(x,)], "x double")
    got = df.select(F.round("x", 6).alias("r")).first()["r"]
    assert got == round_half_up(x, 6)


def test_hllpp_replica_matches_spark_exactly(spark):
    """oracle_ops.hllpp_count_distinct must reproduce F.approx_count_distinct
    to the LAST DIGIT across all three estimator regimes: linear counting
    (small n), bias-corrected raw estimate (n ≈ m..5m), and uncorrected raw
    (n ≫ 5m) — the pin behind the approx_distinct contract oracle."""
    import random

    from mhap_spark.oracle_ops import hllpp_count_distinct

    rng = random.Random(7)
    # 15 points: linear-counting regime (≤ ~2.5m), its boundary, the
    # bias-corrected mid band 1300–2500 where the knot interpolation acts,
    # and the uncorrected high regime
    for n in [1, 10, 100, 420, 500, 800, 1200, 1400, 1800, 2200, 2600,
              3500, 5000, 20000, 50000]:
        vals = [rng.randrange(-2**62, 2**62) for _ in range(n)]
        vals = vals + vals[: n // 3]  # duplicates must not move the estimate
        df = spark.createDataFrame([(v,) for v in vals], "x long").repartition(8)
        got = df.agg(F.approx_count_distinct("x").alias("e")).first()["e"]
        assert got == hllpp_count_distinct(vals), n
    assert hllpp_count_distinct([]) == 0
