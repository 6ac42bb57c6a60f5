"""Incremental ingest via Structured Streaming.

The reference is strictly batch (SURVEY.md §2.10); its closest feature is the
``-q`` mode that streams query files against an indexed set
(mhap/main/MhapMain.java:511-541).  This module expresses that incrementally:
new rows arrive as a stream, each micro-batch is sketched, probed against the
accumulated signature table, and appended to it — so duplicate detection runs
continuously as data lands.

``foreachBatch`` is the right tool (not stateful streaming operators): the
probe is a batch join against a large, growing table — exactly what
checkpointed batch joins do well, and what ``applyInPandasWithState`` cannot
hold in executor state at web scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from mhap_spark.candidates import probe_candidates
from mhap_spark.config import MhapConfig
from mhap_spark.freq import FreqTable
from mhap_spark.minhash import compute_signatures
from mhap_spark.verify import verified_pairs


class IncrementalDedup:
    """foreachBatch sink: sketch → probe vs indexed signatures → append.

    Directory layout under ``base_dir``: ``signatures/`` (accumulated
    signature table), ``matches/`` (verified duplicate pairs per batch),
    ``_stream_checkpoint/`` (Spark streaming offsets)."""

    def __init__(self, base_dir: str, cfg: MhapConfig, freq: FreqTable | None = None):
        self.base_dir = base_dir
        self.cfg = cfg
        self.freq = freq
        self.sig_path = os.path.join(base_dir, "signatures")
        self.match_path = os.path.join(base_dir, "matches")

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        sigs = compute_signatures(batch_df, self.cfg, self.freq).persist()
        if os.path.exists(self.sig_path):
            indexed = spark.read.parquet(self.sig_path)
            cands = probe_candidates(sigs, indexed, self.cfg).select(
                F.col("probe_id").alias("src"),
                F.col("index_id").alias("dst"),
                "votes",
            )
            both = sigs.select("image_id", "bottomk").unionByName(
                indexed.select("image_id", "bottomk")
            )
            matches = verified_pairs(cands, both, self.cfg).withColumn(
                "batch_id", F.lit(batch_id)
            )
            matches.write.mode("append").parquet(self.match_path)
        sigs.write.mode("append").parquet(self.sig_path)
        sigs.unpersist()

    def start(self, stream_df: DataFrame, trigger_available_now: bool = True):
        writer = (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option(
                "checkpointLocation", os.path.join(self.base_dir, "_stream_checkpoint")
            )
            .outputMode("append")
        )
        if trigger_available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()


def read_image_stream(
    spark: SparkSession, input_dir: str, schema_ddl: str, max_files: int = 4
) -> DataFrame:
    return (
        spark.readStream.schema(schema_ddl)
        .option("maxFilesPerTrigger", max_files)
        .parquet(input_dir)
    )
