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

from mhap_spark.candidates import candidate_pairs, probe_candidates
from mhap_spark.config import MhapConfig
from mhap_spark.freq import FreqTable
from mhap_spark.minhash import compute_signatures
from mhap_spark.verify import verified_pairs


class IncrementalDedup:
    """foreachBatch sink: sketch → probe vs indexed signatures → append.

    Directory layout under ``base_dir``: ``signatures/batch_id=N/``
    (accumulated signature table, one partition dir per micro-batch),
    ``matches/batch_id=N/`` (verified duplicate pairs per batch),
    ``_stream_checkpoint/`` (Spark streaming offsets).

    Duplicate coverage is complete (round-1 ADVICE fix): pairs WITHIN a
    micro-batch are found by running the batch's own signatures through
    stage-1 candidate generation, and pairs ACROSS batches by probing
    against the accumulated index — union of both feeds one verify pass.

    Writes are idempotent under foreachBatch retries: every batch overwrites
    its own ``batch_id=N`` partition directory, so a replayed batch replaces
    its previous (possibly partial) output instead of appending duplicates."""

    def __init__(self, base_dir: str, cfg: MhapConfig, freq: FreqTable | None = None):
        self.base_dir = base_dir
        self.cfg = cfg
        self.freq = freq
        self.sig_path = os.path.join(base_dir, "signatures")
        self.match_path = os.path.join(base_dir, "matches")

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        sigs = compute_signatures(batch_df, self.cfg, self.freq).persist()

        # intra-batch duplicates: stage 1 over the batch's own signatures
        cands = candidate_pairs(sigs, self.cfg)
        both = sigs.select("image_id", "bottomk")

        if os.path.exists(self.sig_path):
            # cross-batch duplicates: probe vs STRICTLY EARLIER batches only
            # (a retried batch must not probe its own half-written partition)
            indexed = spark.read.parquet(self.sig_path).where(
                F.col("batch_id") < F.lit(batch_id)
            )
            cands = cands.unionByName(
                probe_candidates(sigs, indexed, self.cfg).select(
                    F.col("probe_id").alias("src"),
                    F.col("index_id").alias("dst"),
                    "votes",
                )
            )
            both = both.unionByName(indexed.select("image_id", "bottomk"))

        matches = verified_pairs(cands, both, self.cfg)
        matches.write.mode("overwrite").parquet(
            os.path.join(self.match_path, f"batch_id={batch_id}")
        )
        sigs.write.mode("overwrite").parquet(
            os.path.join(self.sig_path, f"batch_id={batch_id}")
        )
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


def windowed_event_counts(
    stream_df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts over an event stream — the
    standard Structured Streaming late-data pattern (task brief §streams):
    rows later than ``watermark`` behind the max seen event time are
    dropped, and a window's aggregate is emitted (append mode) once the
    watermark passes its end, bounding state no matter how long the stream
    runs.  Batch-equivalent of the ``events_hourly`` contract query."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("hour_epoch"),
            key_col,
            "n_events",
        )
    )
