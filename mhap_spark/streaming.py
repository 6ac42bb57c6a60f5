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


def _has_committed_data(path: str) -> bool:
    """True iff ``path`` holds at least one COMMITTED parquet part file.

    A crash mid-write of the very first batch leaves the directory holding
    only an uncommitted ``_temporary`` subtree; ``os.path.exists`` alone
    then sends every foreachBatch replay into ``spark.read.parquet`` →
    UNABLE_TO_INFER_SCHEMA, an unrecoverable restart loop.  Walking for a
    real part file treats that state as "no data yet", letting the replay
    rewrite the batch cleanly."""
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if d != "_temporary"]
        if any(f.startswith("part-") for f in files):
            return True
    return False


class BandIndex:
    """Band-partitioned inverted index for the streaming ``-q`` mode — the
    10^12-row layout that streaming.py previously only described in prose.

    Layout: ``band_index/batch_id=N/pfx=P/*.parquet`` holding EXPLODED
    ``(band_hash, image_id)`` rows, pfx = pmod(band_hash, n_prefix).  Each
    micro-batch overwrites its own ``batch_id=N`` subtree (idempotent under
    foreachBatch retries, same discipline as the signature table).

    Probe physical shape — the point of the layout: the accumulated index
    is the enormous side, so it must NEVER be shuffled per batch.  The
    probe's exploded bands (batch_rows × n_bands rows of 16 B — MBs even at
    10k-row batches) are BROADCAST into a map-side hash semi-join against
    the index scan: per-batch cost is one columnar scan of two int64
    columns plus work proportional to the collision set, not to the index.
    Contrast the flat path (candidates.probe_candidates over the re-read
    signature table): it re-explodes and re-shuffles the ENTIRE index twice
    per batch (bucket sizes + the match join) — the measured round-4
    per-batch bottleneck.  Bucket-size capping stays exact: every index row
    of a probed band survives the semi-join, so sizes computed on the
    surviving subset equal the true bucket sizes for all probed bands.

    On a real cluster the remaining scan term parallelizes across
    executors and prunes by ``pfx`` for narrow probes; bench.py
    --index-growth measures how per-batch latency tracks index growth in
    both layouts."""

    def __init__(self, path: str, n_prefix: int = 64):
        self.path = path
        self.n_prefix = n_prefix

    def append(self, sigs: DataFrame, batch_id: int) -> None:
        bands = sigs.select(
            "image_id", F.explode("bands").alias("band_hash")
        ).withColumn("pfx", F.pmod(F.col("band_hash"), F.lit(self.n_prefix)))
        bands.write.mode("overwrite").partitionBy("pfx").parquet(
            os.path.join(self.path, f"batch_id={batch_id}")
        )

    def probe(
        self,
        probe_sigs: DataFrame,
        cfg: MhapConfig,
        batch_id: int,
        narrow_probe: bool = False,
    ) -> DataFrame | None:
        """(probe_id, index_id, votes ≥ gate) against batches strictly
        earlier than ``batch_id`` — same semantics as
        candidates.probe_candidates on the accumulated signatures.
        ``narrow_probe=True`` additionally prunes index partition
        directories to the probe's pfx set (worth it for lookup-style
        probes whose band count ≪ n_prefix)."""
        spark = probe_sigs.sparkSession
        if not _has_committed_data(self.path):
            return None
        idx = (
            spark.read.option("basePath", self.path)
            .parquet(self.path)
            .where(F.col("batch_id") < F.lit(batch_id))
        )
        probe = probe_sigs.select(
            F.col("image_id").alias("probe_id"),
            F.explode("bands").alias("band_hash"),
        )
        keys = probe.select("band_hash").distinct()
        if narrow_probe:
            # lookup-style probes (single items, tiny batches) touch fewer
            # prefixes than exist — push the literal pfx set into the scan
            # so whole partition DIRECTORIES are pruned before any IO.  One
            # bounded driver action (≤ n_prefix ints); wide batches hit
            # every prefix (batch_rows × n_bands ≫ n_prefix) and should
            # leave this off.
            pfx_list = [
                r["pfx"]
                for r in keys.select(
                    F.pmod(F.col("band_hash"), F.lit(self.n_prefix)).alias("pfx")
                )
                .distinct()
                .collect()
            ]
            if len(pfx_list) < self.n_prefix:
                idx = idx.where(F.col("pfx").isin(pfx_list))
        idx = idx.select("band_hash", F.col("image_id").alias("index_id"))
        # map-side semi filter: broadcast the (bounded) probe band set, scan
        # the (unbounded) index — collision rows only survive
        relevant = idx.join(F.broadcast(keys), ["band_hash"]).persist()
        try:
            sizes = relevant.groupBy("band_hash").agg(
                F.count(F.lit(1)).alias("bucket_size")
            )
            # sizes is bounded by the probed band count (tiny for lookup
            # probes) — gate the no-broadcast hint on the config like every
            # other join side instead of forbidding the broadcast outright
            sizes_ok = sizes.where(F.col("bucket_size") <= cfg.max_bucket_size)
            if cfg.no_broadcast_hints:
                sizes_ok = sizes_ok.hint("shuffle_hash")
            ok = relevant.join(sizes_ok, ["band_hash"])
            out = (
                ok.join(F.broadcast(probe), ["band_hash"])
                .where(F.col("probe_id") != F.col("index_id"))
                .groupBy("probe_id", "index_id")
                .agg(F.count(F.lit(1)).alias("votes"))
                .filter(F.col("votes") >= F.lit(cfg.min_band_matches()))
            )
            # materialize through the persisted collision set so the caller
            # can consume it repeatedly without re-scanning the index
            out = out.localCheckpoint(eager=True)
        finally:
            relevant.unpersist()
        return out


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
    its previous (possibly partial) output instead of appending duplicates.

    ``cache_index=True`` additionally pins the accumulated index in executor
    memory as a list of per-batch persisted slices (each the re-read of its
    own committed partition, so lineage stays one file scan per slice and
    nothing is ever copied): the probe then reads the index from block cache
    instead of re-scanning the whole signature parquet every batch — the
    measured per-batch bottleneck (BENCH/BASELINE.md round 4).  Durability
    is unchanged (parquet partitions remain the source of truth; on restart
    the existing table is loaded as one slice) and the retry guard is
    unchanged (slices strictly earlier than the current batch_id).  Sized
    for hot-window deployments; at 10^12 rows use ``band_index=True``
    (BandIndex — the band-partitioned layout whose probe never shuffles
    the index; measured vs flat in BENCH/BASELINE.md round 5).  The two
    flags are mutually exclusive (the band probe never reads the slice
    cache, so pinning slices would only leak storage memory);
    ``band_index`` wins when both are passed."""

    def __init__(
        self,
        base_dir: str,
        cfg: MhapConfig,
        freq: FreqTable | None = None,
        cache_index: bool = False,
        band_index: bool = False,
        id_pushdown_cap: int | None = None,
        keep_manifest: bool = False,
    ):
        if cfg.candidate_mode == "star":
            # star emission is hub-mediated: members connect only THROUGH the
            # bucket hub, and the transitive edges are closed by the batch
            # pipeline's CC stage — which this sink does not run.  Accepting
            # it silently would make per-batch match output depend on arrival
            # batching (intra-batch hub edges at star_min_votes vs cross-batch
            # probe pairs at min_band_matches()), violating the documented
            # complete-coverage contract.  Same loud-rejection discipline as
            # candidates.candidate_pairs' min_store+star check.
            raise ValueError(
                "IncrementalDedup requires candidate_mode='pairs': star-mode "
                "hub edges need the CC stage to close transitive matches, "
                "which the streaming sink does not run"
            )
        if cfg.min_store_shingles > 0:
            # the asymmetric store filter is a batch-index concept: applying
            # it intra-batch but probing the UNFILTERED accumulated table
            # cross-batch would report a (short, short) duplicate iff the
            # two rows arrived in different micro-batches — output depending
            # on arrival batching, the same contract violation star mode is
            # rejected for.  Implementing it needs an n_shingles filter on
            # the index side of both probe paths; until then, reject loudly.
            raise ValueError(
                "IncrementalDedup does not support min_store_shingles: the "
                "store filter would apply intra-batch but not to the "
                "accumulated index, making match output depend on arrival "
                "batching"
            )
        self.base_dir = base_dir
        self.cfg = cfg
        self.freq = freq
        # band-index verify side: matched ids at or below this count are
        # pushed into the signature scan as an In filter (row-group pruning);
        # above it the left-semi join applies (no driver-side id set).
        # None (default) derives the cap from the session's
        # spark.sql.parquet.pushdown.inFilterThreshold — ABOVE that
        # threshold Spark rewrites the pushed predicate to a min/max RANGE
        # filter, which cannot prune ids spread across the table, so a
        # bigger cap would ship ids to the driver for no pruning in return
        self.id_pushdown_cap = id_pushdown_cap
        # the band-index probe never reads the signature-slice cache, so
        # pinning a per-batch slice every micro-batch would grow executor
        # storage memory linearly with stream lifetime for zero benefit —
        # the flags are mutually exclusive and band_index wins
        self.cache_index = cache_index and not band_index
        self._slices: list[tuple[int, DataFrame]] = []  # (batch_id, persisted df)
        self.sig_path = os.path.join(base_dir, "signatures")
        self.match_path = os.path.join(base_dir, "matches")
        # keep_manifest=True: additionally write ``keep/batch_id=N`` with the
        # FIRST-ARRIVAL keep/drop decision per arriving row — the streaming
        # counterpart of cluster.keep_manifest.  A row is dropped iff it has
        # a verified match to an earlier batch (first arrival wins) or to a
        # smaller id within its own batch (ids tie-break inside a batch,
        # where arrival order is undefined).  Production-streaming
        # semantics: the index holds ALL seen rows — kept or dropped — so
        # "duplicate of a dropped row" still drops (no transitive-closure
        # canonicalization; the batch pipeline's CC keep_manifest is the
        # closure-exact variant).  PRECONDITION: image_id is unique across
        # the stream's lifetime (the engine's row key, and what the file
        # source + idempotent batch_id overwrite deliver) — the
        # dst-in-this-batch classification below reads an id recurring in a
        # LATER batch as an intra-batch match and would mis-orient that
        # pair's drop.  Cost: one re-read of the batch's just-written
        # matches partition + one tiny per-batch write — off by default so
        # the benched probe path is unchanged.
        self.keep_manifest = keep_manifest
        self.keep_path = os.path.join(base_dir, "keep")
        # band_index=True: cross-batch probing goes through the
        # band-partitioned inverted index (BandIndex) instead of re-reading
        # and re-shuffling the whole signature table — the 10^12-row layout.
        # The signature table remains the source of truth for the verify
        # arrays (pruned to matched ids only).
        self.bindex = (
            BandIndex(os.path.join(base_dir, "band_index")) if band_index else None
        )

    def _indexed(self, spark: SparkSession, batch_id: int) -> DataFrame | None:
        """Accumulated signatures of batches STRICTLY EARLIER than
        ``batch_id`` (a retried batch must not probe its own half-written
        partition), from block cache when ``cache_index`` is on."""
        if not _has_committed_data(self.sig_path):
            return None
        if not self.cache_index:
            return spark.read.parquet(self.sig_path).where(
                F.col("batch_id") < F.lit(batch_id)
            )
        if not self._slices:  # restart: adopt the existing table as one slice
            # the retry guard must be baked in HERE, not just at probe time:
            # on crash-replay the current batch's old partition already exists
            # on disk, and persisting it into the boot slice would serve its
            # stale rows alongside the fresh per-batch slice added after the
            # overwrite (duplicate index entries / FileNotFound on eviction)
            boot = (
                spark.read.parquet(self.sig_path)
                .where(F.col("batch_id") < F.lit(batch_id))
                .persist()
            )
            boot.count()
            self._slices.append((-1, boot))
        # every slice is already batch-pure: the boot slice (bid=-1) bakes
        # its `< batch_id` filter in at adoption, and each per-batch slice
        # holds only its own batch's rows — so selecting bid < batch_id
        # (which the -1 boot always satisfies) needs no re-filtering
        live = [df for bid, df in self._slices if bid < batch_id]
        if not live:  # first-batch retry on a fresh dir: no earlier batches
            return None
        out = live[0]
        for df in live[1:]:
            out = out.unionByName(df)
        return out

    def _append_cache(self, spark: SparkSession, batch_id: int) -> None:
        if not self.cache_index:
            return
        for i, (bid, df) in enumerate(self._slices):  # replace on retry
            if bid == batch_id:
                df.unpersist()
                del self._slices[i]
                break
        s = (
            spark.read.parquet(self.sig_path)
            .where(F.col("batch_id") == F.lit(batch_id))
            .persist()
        )
        s.count()
        self._slices.append((batch_id, s))

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        sigs = compute_signatures(batch_df, self.cfg, self.freq).persist()

        # intra-batch duplicates: stage 1 over the batch's own signatures
        cands = candidate_pairs(sigs, self.cfg)
        both = sigs.select("image_id", "bottomk")

        if self.bindex is not None:
            # cross-batch duplicates via the band-partitioned index: the
            # index side is scanned, never shuffled (see BandIndex.probe);
            # verify arrays come from the signature table PRUNED to matched
            # ids, so the wide bottom-k rows of unmatched index entries
            # never move either
            found = self.bindex.probe(sigs, self.cfg, batch_id)
            if found is not None:
                cands = cands.unionByName(
                    found.select(
                        F.col("probe_id").alias("src"),
                        F.col("index_id").alias("dst"),
                        "votes",
                    )
                )
                matched_ids = found.select(
                    F.col("index_id").alias("image_id")
                ).distinct()
                indexed = spark.read.parquet(self.sig_path).where(
                    F.col("batch_id") < F.lit(batch_id)
                )
                # fetch the matched index arrays with a PUSHED-DOWN id
                # filter when the match set is lookup-sized: ``found`` is
                # already materialized (localCheckpoint in probe), so
                # listing its distinct index ids is a cheap local job, and
                # an In(image_id, …) predicate reaches the parquet
                # row-group stats — on an image_id-sorted/bucketed
                # signature table the verify side then reads a handful of
                # row groups instead of scanning the whole table per batch.
                # The cap tracks the parquet In-pushdown threshold: above
                # it Spark pushes only a min/max range (no pruning for
                # spread ids), so wider batches take the semi-join, which
                # never holds the id set on the driver.
                cap = self.id_pushdown_cap
                if cap is None:
                    cap = int(
                        spark.conf.get(
                            "spark.sql.parquet.pushdown.inFilterThreshold", "10"
                        )
                    )
                ids = [
                    r["image_id"] for r in matched_ids.limit(cap + 1).collect()
                ]
                if len(ids) <= cap:
                    # ≤ cap rows under limit(cap+1) ⇒ this IS the full set
                    hit = (
                        indexed.where(F.col("image_id").isin(ids)) if ids else None
                    )
                else:
                    hit = indexed.join(matched_ids, "image_id", "left_semi")
                if hit is not None:
                    both = both.unionByName(hit.select("image_id", "bottomk"))
        else:
            indexed = self._indexed(spark, batch_id)
            if indexed is not None:
                # cross-batch duplicates: probe vs the accumulated index
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
        if self.keep_manifest:
            # round-6 (round-5 ADVICE): the keep manifest's documented
            # precondition — image_id unique across the stream's lifetime —
            # must fail LOUDLY: an id recurring in a later batch would be
            # classified as an intra-batch match below and its pair's drop
            # decision mis-oriented, silently violating first-arrival-wins.
            # One cheap left-semi count per batch, only when the manifest is
            # enabled (the benched probe path is unchanged).
            if _has_committed_data(self.sig_path):
                earlier_ids = (
                    spark.read.parquet(self.sig_path)
                    .where(F.col("batch_id") < F.lit(batch_id))
                    .select("image_id")
                )
                n_recur = (
                    batch_df.select("image_id")
                    .join(earlier_ids, "image_id", "left_semi")
                    .count()
                )
                if n_recur:
                    raise ValueError(
                        f"keep_manifest precondition violated: {n_recur} "
                        f"image_id(s) of batch {batch_id} already appear in "
                        "earlier batches; ids must be unique across the "
                        "stream's lifetime for first-arrival-wins decisions"
                    )
            # classify each match by whether dst is in THIS batch: pairs-mode
            # intra-batch matches are canonical src < dst (drop dst), while
            # cross-batch probe matches carry the probe row in src and the
            # earlier-indexed row in dst (drop src).  Read the matches back
            # from the partition just written — one small file scan instead
            # of recomputing the verify plan
            m = spark.read.parquet(
                os.path.join(self.match_path, f"batch_id={batch_id}")
            )
            batch_ids = batch_df.select("image_id")
            dst_in_batch = batch_ids.withColumnRenamed("image_id", "dst")
            drops = (
                m.join(dst_in_batch, "dst", "left_semi")
                .select(F.col("dst").alias("image_id"))
                .unionByName(
                    m.join(dst_in_batch, "dst", "left_anti").select(
                        F.col("src").alias("image_id")
                    )
                )
                .distinct()
            )
            # one left join, not anti+union: the drops subtree (parquet
            # re-read + classification joins) would otherwise execute twice
            keep = batch_ids.join(
                drops.withColumn("keep", F.lit(False)), "image_id", "left"
            ).select("image_id", F.coalesce("keep", F.lit(True)).alias("keep"))
            keep.write.mode("overwrite").parquet(
                os.path.join(self.keep_path, f"batch_id={batch_id}")
            )
        sigs.write.mode("overwrite").parquet(
            os.path.join(self.sig_path, f"batch_id={batch_id}")
        )
        sigs.unpersist()
        if self.bindex is not None:
            self.bindex.append(
                spark.read.parquet(self.sig_path).where(
                    F.col("batch_id") == F.lit(batch_id)
                ),
                batch_id,
            )
        self._append_cache(spark, batch_id)

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
