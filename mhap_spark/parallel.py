"""Input-parallelism helper for Arrow-kernel operators.

The ops-layer kernels (MinHash sketching, SimHash, winnowing, LSH/IVF
assignment, fingerprints) run inside ``mapInPandas`` directly over the
source scan.  When the source is a small number of files — the driver's
test tables are ONE single-row-group parquet file each — the scan is a
single task, so the whole Python kernel runs on one core regardless of
the session's core count (round-6 plan audit: every documents-table
kernel query executed its MapInPandas node in exactly one task).

``spread`` repartitions such inputs up to the session's default
parallelism.  It is deliberately conditional: when the scan already has
at least ``defaultParallelism`` partitions (any real multi-file table at
scale), it is a no-op — no shuffle is added to a 100-TB input whose file
layout already parallelizes, so the cost is bounded by the small-input
case where the shuffle is trivially cheap.  Row-level outputs are
unaffected: every kernel in this repo is per-row deterministic and every
consumer aggregation is order-independent (pinned by the byte-identical
cross-partitioning runs in BENCH/BASELINE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to the session default parallelism iff its current
    plan yields fewer partitions (e.g. a single-file scan)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    # getNumPartitions touches the physical plan but launches no job
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
