"""Distributed frequency sketches: count-min (mhap/sketch/CountMin.java:42-111
analog, Cormode–Muthukrishnan) as a DataFrame aggregation.

The reference keeps one CountMin per JVM guarded by striped locks
(CountMin.java:60-80); the Spark-first shape is partial sketches per Arrow
batch merged by a cell-wise sum — a groupBy whose key space is bounded by
depth × width regardless of input size, so the merge shuffle never grows
with the data.  Point queries run driver-side on the collected (tiny)
matrix, mirroring how the reference serves estimates from its merged array
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

    return (
        df.select(F.col(key_col).cast("long").alias(key_col))
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
