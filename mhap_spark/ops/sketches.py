"""Distributed membership/frequency sketches: count-min
(mhap/sketch/CountMin.java:42-111 analog, Cormode–Muthukrishnan) and a Bloom
filter (mhap/sketch/FrequencyCounts.java:137,272-278 analog — the reference's
noise-membership variant for vocabularies too large for the sorted array),
both as DataFrame aggregations.

The reference keeps one sketch per JVM guarded by striped locks
(CountMin.java:60-80); the Spark-first shape is partial sketches per Arrow
batch merged by a bounded groupBy — cell-wise SUM for count-min, word-wise
OR for the Bloom bitmap — whose key space is fixed by the sketch geometry
regardless of input size, so the merge shuffle never grows with the data.
Point queries run driver-side on the collected (tiny) matrix/bitmap,
mirroring how the reference serves lookups from its merged array
(CountMin.java:94-111).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType, StructField, StructType

from mhap_spark.hashing import fmix64

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)

CELL_SCHEMA = StructType(
    [StructField("cell", LongType()), StructField("n", LongType())]
)


def _cms_slots(keys: np.ndarray, depth: int, width: int, seed: int) -> np.ndarray:
    """(n_keys, depth) int64 column indices — seeded fmix64 hash family
    (one salt per row of the sketch, same spec engine- and driver-side)."""
    keys = keys.astype(np.uint64, copy=False)
    out = np.empty((len(keys), depth), dtype=np.int64)
    with np.errstate(over="ignore"):
        for d in range(depth):
            salt = np.uint64(seed) + _GOLDEN * np.uint64(d + 1)
            out[:, d] = (fmix64(keys ^ salt) % np.uint64(width)).astype(np.int64)
    return out


def cms_cells(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 2048, seed: int = 42
) -> DataFrame:
    """(cell, n) — the merged count-min matrix as rows, cell = d·width + slot.

    Partial sketches are built per Arrow batch (numpy bincount) and merged by
    one groupBy-sum over at most depth·width distinct keys — map-side
    combinable and independent of input cardinality."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = np.zeros(depth * width, dtype=np.int64)
        for pdf in batches:
            keys = pdf[key_col].to_numpy(dtype=np.int64).view(np.uint64)
            slots = _cms_slots(keys, depth, width, seed)
            for d in range(depth):
                local += np.bincount(
                    slots[:, d] + d * width, minlength=depth * width
                )
        nz = np.flatnonzero(local)
        yield pd.DataFrame({"cell": nz.astype(np.int64), "n": local[nz]})

    # null keys (including unparseable values nulled by the cast) are not
    # counted — and must be dropped JVM-side: a nullable long batch reaches
    # pandas as float64+NaN and to_numpy(np.int64) raises (the shingles.py
    # Arrow hazard)
    return (
        df.select(F.col(key_col).cast("long").alias(key_col))
        .where(F.col(key_col).isNotNull())
        .mapInPandas(gen, CELL_SCHEMA)
        .groupBy("cell")
        .agg(F.sum("n").alias("n"))
    )


class CountMin:
    """Driver-side frozen sketch for point queries (estimate ≥ true count;
    overestimate ≤ ε·N w.p. 1−δ, ε = e/width, δ = e^−depth)."""

    def __init__(self, matrix: np.ndarray, seed: int):
        self.matrix = matrix  # (depth, width) int64
        self.seed = seed

    @classmethod
    def from_cells(
        cls, cells: DataFrame, depth: int = 4, width: int = 2048, seed: int = 42
    ) -> "CountMin":
        m = np.zeros(depth * width, dtype=np.int64)
        for r in cells.collect():
            m[int(r["cell"])] = int(r["n"])
        return cls(m.reshape(depth, width), seed)

    @classmethod
    def compute(
        cls, df: DataFrame, key_col: str, depth: int = 4, width: int = 2048,
        seed: int = 42,
    ) -> "CountMin":
        return cls.from_cells(
            cms_cells(df, key_col, depth, width, seed), depth, width, seed
        )

    def estimate(self, keys: np.ndarray) -> np.ndarray:
        """Point estimates for int64 keys: min over rows (CountMin.java:94-103)."""
        depth, width = self.matrix.shape
        slots = _cms_slots(
            np.asarray(keys, dtype=np.int64).view(np.uint64), depth, width, self.seed
        )
        ests = np.stack(
            [self.matrix[d, slots[:, d]] for d in range(depth)], axis=1
        )
        return ests.min(axis=1)


# ---------------------------------------------------------------------------
# Bloom filter — the reference's noise-membership structure for vocabularies
# too large for the sorted-array df table (FrequencyCounts.java:137,272-278).
# ---------------------------------------------------------------------------

WORD_SCHEMA = StructType(
    [StructField("word_idx", LongType()), StructField("bits", LongType())]
)


def _bloom_bit_positions(
    keys: np.ndarray, m_bits: int, k_hashes: int, seed: int
) -> np.ndarray:
    """(n_keys, k_hashes) int64 bit indices — same seeded fmix64 family as
    the CMS rows, so engine and oracle agree bit-for-bit."""
    keys = keys.astype(np.uint64, copy=False)
    out = np.empty((len(keys), k_hashes), dtype=np.int64)
    with np.errstate(over="ignore"):
        for j in range(k_hashes):
            salt = np.uint64(seed) ^ (_GOLDEN * np.uint64(2 * j + 1))
            out[:, j] = (fmix64(keys ^ salt) % np.uint64(m_bits)).astype(np.int64)
    return out


def bloom_words(
    df: DataFrame, key_col: str, m_bits: int = 1 << 20, k_hashes: int = 4,
    seed: int = 42,
) -> DataFrame:
    """(word_idx, bits) — the merged Bloom bitmap as non-zero 64-bit words.

    Partial bitmaps are built per Arrow batch (numpy), emitted as their
    non-zero words only, and merged by ONE groupBy-bit_or over at most
    m_bits/64 distinct keys — map-side combinable, shuffle bounded by the
    filter geometry, never by input cardinality.  The word-wise OR is the
    distributed stand-in for the reference's lock-striped shared bitmap."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = np.zeros(m_bits // 64 + 1, dtype=np.uint64)
        one = np.uint64(1)
        for pdf in batches:
            keys = pdf[key_col].to_numpy(dtype=np.int64).view(np.uint64)
            pos = _bloom_bit_positions(keys, m_bits, k_hashes, seed).ravel()
            np.bitwise_or.at(local, pos // 64, one << (pos % 64).astype(np.uint64))
        nz = np.flatnonzero(local)
        yield pd.DataFrame(
            {"word_idx": nz.astype(np.int64), "bits": local[nz].view(np.int64)}
        )

    # null keys dropped JVM-side — same NaN-poisoning hazard as cms_cells
    return (
        df.select(F.col(key_col).cast("long").alias(key_col))
        .where(F.col(key_col).isNotNull())
        .mapInPandas(gen, WORD_SCHEMA)
        .groupBy("word_idx")
        .agg(F.bit_or("bits").alias("bits"))
    )


class BloomFilter:
    """Driver-side frozen Bloom filter: no false negatives; false-positive
    rate ≈ (1 − e^(−k·n/m))^k.  Broadcast into kernels the same way as
    FreqTable (a task-closure numpy array)."""

    def __init__(self, words: np.ndarray, m_bits: int, k_hashes: int, seed: int):
        self.words = words  # (m_bits//64 + 1,) uint64
        self.m_bits = m_bits
        self.k_hashes = k_hashes
        self.seed = seed

    @classmethod
    def compute(
        cls, df: DataFrame, key_col: str, m_bits: int = 1 << 20,
        k_hashes: int = 4, seed: int = 42,
    ) -> "BloomFilter":
        w = np.zeros(m_bits // 64 + 1, dtype=np.uint64)
        for r in bloom_words(df, key_col, m_bits, k_hashes, seed).collect():
            w[int(r["word_idx"])] = np.uint64(np.int64(r["bits"]))
        return cls(w, m_bits, k_hashes, seed)

    def might_contain(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership probe for int64 keys → bool array."""
        pos = _bloom_bit_positions(
            np.asarray(keys, dtype=np.int64).view(np.uint64),
            self.m_bits, self.k_hashes, self.seed,
        )
        hit = (self.words[pos // 64] >> (pos % 64).astype(np.uint64)) & np.uint64(1)
        return hit.all(axis=1)
