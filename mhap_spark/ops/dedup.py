"""Deduplication operators for document corpora — the training-data-pipeline
surface (task brief): exact, n-gram Jaccard, MinHash+LSH, SimHash.

All JVM-side where Spark builtins express the semantics; sketch-dependent
steps reuse the engine's Arrow kernels.  Designed for the ``documents``
table shape (doc_id, text, lang, source, n_chars) but column names are
parameters.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from mhap_spark.config import MhapConfig, hints_default_for_rows
from mhap_spark.hashing import caption_kgram_hashes_batch, fmix64


def normalized_text(col):
    """Canonical text form: lowercase, collapsed whitespace (JVM-side)."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup by normalized-text hash-groupBy: one row per distinct
    normalized text, representative = min id, with duplicate count.
    Shuffle on the (pruned) normalized text — partial agg keeps skew safe."""
    return (
        df.select(F.col(id_col), normalized_text(F.col(text_col)).alias("norm_text"))
        .groupBy("norm_text")
        .agg(
            F.min(id_col).alias("rep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
        .select("rep_id", "n_dups")
    )


def word_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str = "source",
    max_len_delta: int = 10,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """n-gram (word-set) Jaccard near-dup pairs with lossless two-level
    blocking: candidates must share ``block_col`` AND sit in adjacent length
    buckets of width ``max_len_delta`` — |len_l − len_r| ≤ Δ implies the
    bucket indices differ by ≤ 1, so emitting the right side into its bucket
    and both neighbors makes the equi-join key (blk, bucket) exhaustive for
    the length predicate with zero recall loss, and each qualifying pair is
    produced exactly once (the left row's own bucket value is unique).

    This replaces the round-1 per-``block_col`` quadratic self-join with a
    join whose key granularity grows with corpus length diversity — the
    VERDICT.md "weak at scale" fix.  Jaccard entirely via builtin array ops
    (array_intersect / array_union sizes), no Python."""
    w = max(int(max_len_delta), 1)
    # the length gate measures the NORMALIZED text — the same form the
    # jaccard is computed over — so whitespace/formatting drift between
    # normalized-identical duplicates cannot push a pair past the delta
    words = df.select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("blk"),
        F.length(normalized_text(F.col(text_col))).alias("len"),
        F.array_distinct(F.split(normalized_text(F.col(text_col)), " ")).alias("ws"),
    )
    l = words.withColumn("lb", F.floor(F.col("len") / w)).alias("l")
    r = (
        words.withColumn(
            "lb",
            F.explode(
                F.array(
                    F.floor(F.col("len") / w) - 1,
                    F.floor(F.col("len") / w),
                    F.floor(F.col("len") / w) + 1,
                )
            ),
        )
    ).alias("r")
    return (
        l.join(r, on=[F.col("l.blk") == F.col("r.blk"), F.col("l.lb") == F.col("r.lb")])
        .where(
            (F.col("l.id") < F.col("r.id"))
            & (F.abs(F.col("l.len") - F.col("r.len")) <= max_len_delta)
        )
        .select(
            F.col("l.id").alias("src"),
            F.col("r.id").alias("dst"),
            (
                F.size(F.array_intersect("l.ws", "r.ws"))
                / F.size(F.array_union("l.ws", "r.ws"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= min_jaccard)
    )


def _doc_cfg(df: DataFrame) -> MhapConfig:
    """Pure-text document config for the MinHash dedup surface.

    Unknown-scale entry point: resolve the broadcast-safety rule from the
    ACTUAL input size rather than assuming the small-corpus demo shape — a
    multi-million-row df through the hints-off path is exactly the round-4
    AQE-broadcast-OOM cliff.  The question is only "≥ 1M rows?", so count
    through a limit at the threshold: Spark stops feeding the count once
    the limit is hit, instead of executing the (possibly expensive derived)
    upstream plan in full a second time just to learn a number we only
    compare to 1M."""
    return MhapConfig(
        num_hashes=128,
        rows_per_band=4,
        num_min_matches=2,
        use_phash_shingles=False,
        no_broadcast_hints=hints_default_for_rows(df.limit(1_000_000).count()),
    )


def minhash_lsh_doc_pairs(
    df: DataFrame,
    cfg: MhapConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash+LSH near-dup candidates over text documents: char k-gram
    shingles → signature → banded buckets → pairs (the engine's stage 1
    applied to a pure-text corpus; hash-dependent → rows-only oracle)."""
    from mhap_spark.candidates import candidate_pairs
    from mhap_spark.minhash import compute_signatures
    from mhap_spark.parallel import spread

    if cfg is None:
        cfg = _doc_cfg(df)
    # single-file sources otherwise run the whole sketch kernel in ONE task
    # (round-6 plan audit); no-op when the scan already parallelizes
    df = spread(df)
    src = df.select(
        F.col(id_col).cast("string").alias("image_id"),
        F.col(text_col).alias("caption"),
        # NULL, not 0: documents have no phash, and shingle_input treats a
        # null phash as "no phash shingles".  A literal 0 would count as a
        # REAL phash under any caller-passed cfg with use_phash_shingles=True,
        # giving every document the same phash bit-n-grams — manufactured
        # cross-document overlap skewing signatures and band buckets
        F.lit(None).cast("long").alias("phash"),
    )
    sigs = compute_signatures(src, cfg, freq=None)
    return candidate_pairs(sigs, cfg).withColumnsRenamed(
        {"src": "src_doc", "dst": "dst_doc"}
    )


def minhash_dedup_keep(
    df: DataFrame,
    cfg: MhapConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document keep/drop decision — the actual OUTPUT of a
    training-data dedup pass (Lee et al., "Deduplicating Training Data
    Makes Language Models Better", ACL'22): MinHash+LSH candidate pairs →
    connected components → canonical representative per duplicate cluster.

    Returns ``(id_col, cluster_id, keep)`` covering EVERY input row:
    ``cluster_id`` = minimum member id of the row's duplicate component
    (its own id for singletons — the same rule the pipeline's CC stage
    pins, FIXTURES.md F4), ``keep`` = true iff the row IS its cluster's
    canonical representative.  ``filter(keep)`` is the deduplicated
    corpus; ``filter(~keep)`` joined back on ``cluster_id`` is the full
    drop manifest with provenance.

    Scale shape: stage 1 is the engine's bucketed candidate generation
    (capped/salted band buckets, never all-pairs), CC is the
    large-star/small-star loop whose shuffle width tracks the edge set,
    and the final decision is one string comparison on the CC output — no
    extra shuffle beyond the cluster join itself.  Min-id ordering is
    BINARY string order on both the engine and oracle sides (Spark and
    Python compare code points identically for the ASCII ids here)."""
    from mhap_spark.cluster import dedup_keep_from_pairs

    if cfg is None:
        cfg = _doc_cfg(df)
    pairs = minhash_lsh_doc_pairs(df, cfg, id_col, text_col)
    edges = pairs.select(
        F.col("src_doc").alias("src"), F.col("dst_doc").alias("dst")
    )
    verts = df.select(F.col(id_col).cast("string").alias("image_id"))
    return dedup_keep_from_pairs(
        edges,
        verts,
        max_iters=cfg.cc_max_iters,
        driver_finish_edges=cfg.cc_driver_finish_edges,
        no_broadcast_hints=cfg.no_broadcast_hints,
    ).select(F.col("image_id").alias(id_col), "cluster_id", "keep")


def winnow(hashes: np.ndarray, window: int) -> np.ndarray:
    """Winnowing fingerprint selection (Schleimer et al., SIGMOD'03): the
    distinct minima of every ``window`` consecutive k-gram hashes.

    Guarantee: two documents sharing an exact substring of length
    ≥ window + k − 1 characters share at least one selected fingerprint —
    the position-robust property that makes this the scale-out stand-in for
    suffix-array substring dedup (a suffix array is a global sorted
    structure; winnowed fingerprints shard by hash)."""
    n = len(hashes)
    if n == 0:
        return hashes
    if n <= window:
        return np.unique(hashes.min(keepdims=True))
    from numpy.lib.stride_tricks import sliding_window_view

    return np.unique(sliding_window_view(hashes, window).min(axis=1))


FP_PAIR_SCHEMA = StructType(
    [StructField("doc_id", StringType()), StructField("fp", LongType())]
)


def winnowed_fingerprints(
    df: DataFrame, k: int = 16, window: int = 32,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """(doc_id, fp) — winnowing fingerprints of each document's character
    k-gram hash stream (GRAFT-HASH-1 hashes, position order preserved),
    vectorized per Arrow batch."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            grams = caption_kgram_hashes_batch(pdf[text_col].tolist(), k)
            ids, fps = [], []
            for i, g in enumerate(grams):
                sel = winnow(g, window)
                if len(sel):
                    ids.append(np.full(len(sel), str(pdf[id_col].iloc[i])))
                    fps.append(sel.view(np.int64))
            if ids:
                yield pd.DataFrame(
                    {"doc_id": np.concatenate(ids), "fp": np.concatenate(fps)}
                )
            else:
                yield pd.DataFrame({"doc_id": pd.Series([], dtype=str),
                                    "fp": pd.Series([], dtype=np.int64)})

    from mhap_spark.parallel import spread

    return spread(df.select(F.col(id_col).alias(id_col), F.col(text_col))).mapInPandas(
        gen, FP_PAIR_SCHEMA
    )


def substring_dup_pairs(
    df: DataFrame, k: int = 16, window: int = 32, min_shared: int = 1,
    id_col: str = "doc_id", text_col: str = "text",
    max_bucket_size: int = 512,
) -> DataFrame:
    """Substring-level near-dup pairs — the Spark-first recast of
    suffix-array substring deduplication (the third dedup family of the
    task's north rule, alongside MinHash and SimHash; cf. the suffix-array
    pipeline of Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better").

    A global suffix array cannot shard; winnowed k-gram fingerprints can:
    any pair sharing an exact run of ≥ window + k − 1 characters shares a
    fingerprint (see winnow), so the pair join on the fingerprint hash is
    an exact blocking for long-substring duplication.  Same bucket-cap
    discipline as every other pair generator; votes = number of shared
    fingerprints (monotone in shared-substring length)."""
    from pyspark.sql import Window

    # one-pass bucket-capped pair emission (round-6, guide §2.4): the former
    # sizes-join + fingerprint self-join evaluated the winnowing kernel FOUR
    # times (plan audit: 4 MapInPandas nodes) — the window count rides the
    # same exchange as the collect_list groupBy, over-cap fingerprints are
    # dropped before any list materializes, and the kernel runs once.
    fps = winnowed_fingerprints(df, k=k, window=window, id_col=id_col, text_col=text_col)
    w = Window.partitionBy("fp")
    ok = fps.withColumn("bs", F.count(F.lit(1)).over(w)).where(
        F.col("bs").between(2, max_bucket_size)
    )
    grouped = ok.groupBy("fp").agg(F.collect_list("doc_id").alias("ids"))
    return (
        grouped.select(F.explode("ids").alias("src"), "ids")
        .select("src", F.explode("ids").alias("dst"))
        .where(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n_shared_fp"))
        .where(F.col("n_shared_fp") >= F.lit(min_shared))
    )


SIMHASH_SCHEMA = StructType(
    [StructField("doc_id", StringType()), StructField("simhash", LongType())]
)


def simhash_docs(
    df: DataFrame, k: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash per document (mirrors mhap/sketch/SimHash.java:33-103:
    bit-vote over the n-gram hash family), vectorized per Arrow batch."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            grams = caption_kgram_hashes_batch(pdf[text_col].tolist(), k)
            out = np.zeros(len(pdf), dtype=np.uint64)
            for i, g in enumerate(grams):
                if not len(g):
                    continue
                bits = (g[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                votes = 2 * bits.sum(axis=0).astype(np.int64) - len(g)  # +1/-1 per gram per bit
                out[i] = np.uint64(
                    ((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum()
                )
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype(str), "simhash": out.view(np.int64)}
            )

    from mhap_spark.parallel import spread

    return spread(df.select(F.col(id_col).alias(id_col), F.col(text_col))).mapInPandas(
        gen, SIMHASH_SCHEMA
    )


def _chunk_bounds(n_chunks: int, n_bits: int = 64) -> list[tuple[int, int]]:
    """Split ``n_bits`` into ``n_chunks`` disjoint (start, width) spans whose
    widths differ by at most 1 and cover every bit."""
    base, extra = divmod(n_bits, n_chunks)
    bounds, start = [], 0
    for i in range(n_chunks):
        width = base + (1 if i < extra else 0)
        bounds.append((start, width))
        start += width
    return bounds


def simhash_pairs_from_sketches(
    sh: DataFrame, max_hamming: int = 6, max_bucket_size: int = 512
) -> DataFrame:
    """(doc_id, simhash) → near-dup pairs with Hamming ≤ max_hamming.

    Blocking is multi-index hashing (the invariant the reference's banded
    index enforces via its confidence formula, mhap/sketch/BitVectorIndex.java:49-61):
    the 64-bit sketch is split into ``max_hamming + 1`` DISJOINT chunks, so
    any pair differing in ≤ max_hamming bits shares at least one chunk
    verbatim — pigeonhole over max_hamming+1 buckets — making blocking recall
    exactly 1.0 (up to the bucket cap).  Exact Hamming via bit_count(xor)
    JVM-side.  Chunk buckets above ``max_bucket_size`` are dropped (counted
    in a pre-pass before any join) — same noise-suppression shape as the
    MinHash band buckets."""
    n_chunks = max_hamming + 1
    if not 1 <= n_chunks <= 64:
        raise ValueError(f"max_hamming must be in [0, 63], got {max_hamming}")
    chunks = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_idx"),
                        F.shiftrightunsigned("simhash", start)
                        .bitwiseAND(F.lit(-1 if width == 64 else (1 << width) - 1))
                        .alias("chunk_val"),
                    )
                    for i, (start, width) in enumerate(_chunk_bounds(n_chunks))
                ]
            )
        ).alias("c"),
    ).select("doc_id", "simhash", "c.chunk_idx", "c.chunk_val")
    from pyspark.sql import Window

    # one-pass bucket-capped pair emission (round-6, guide §2.4; same shape
    # as substring_dup_pairs): window count + filter + collect_list of
    # (doc_id, simhash) structs on ONE exchange — the former sizes-join +
    # chunk self-join evaluated the SimHash kernel four times.
    w = Window.partitionBy("chunk_idx", "chunk_val")
    ok = chunks.withColumn("bs", F.count(F.lit(1)).over(w)).where(
        F.col("bs").between(2, max_bucket_size)
    )
    grouped = ok.groupBy("chunk_idx", "chunk_val").agg(
        F.collect_list(F.struct("doc_id", "simhash")).alias("ms")
    )
    return (
        grouped.select(F.explode("ms").alias("l"), "ms")
        .select("l", F.explode("ms").alias("r"))
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(
            F.col("l.doc_id").alias("src"),
            F.col("r.doc_id").alias("dst"),
            F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))).alias(
                "hamming"
            ),
        )
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["src", "dst"])
    )


def simhash_near_dup_pairs(
    df: DataFrame, max_hamming: int = 6, k: int = 8,
    id_col: str = "doc_id", text_col: str = "text",
    max_bucket_size: int = 512,
) -> DataFrame:
    """SimHash near-dup pairs over raw text: sketch (simhash_docs) then
    blocked exact-Hamming join (simhash_pairs_from_sketches — blocking recall
    1.0 for the given radius by construction)."""
    sh = simhash_docs(df, k=k, id_col=id_col, text_col=text_col)
    return simhash_pairs_from_sketches(
        sh, max_hamming=max_hamming, max_bucket_size=max_bucket_size
    )
