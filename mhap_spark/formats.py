"""Interop output formats.

M4 text emitter — byte-compatible with the reference's overlap output
(mhap/impl/MatchResult.java:98-113: ``"%s %s %.6f %.6f %d %d %d %d %d %d %d
%d"``) so downstream MHAP tooling (layout, filtering scripts) can consume
this engine's pairs unchanged.  Field mapping in the image+caption recast
(SURVEY.md §1.2 — no 1-D coordinates, no reverse strand):

    col  reference meaning            here
    1,2  from/to sequence header      src / dst image_id
    3    error = 1 − identity score   1 − score
    4    rawScore (shared min-hashes) votes
    5,9  orientation (0 fwd / 1 rev)  always 0 (no rc in this domain)
    6,7  a1, a2 overlap extents       0, 0 (positions dropped)
    8    from sequence length         src n_shingles (when signatures given)
    10,11 b1, b2 overlap extents      0, 0
    12   to sequence length           dst n_shingles (when signatures given)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def to_m4(pairs: DataFrame, signatures: DataFrame | None = None) -> DataFrame:
    """(src, dst, votes, jaccard, score) [+ signatures for lengths] →
    single-column DataFrame ``line`` of 12-field M4 rows, sorted by score
    descending then ids (the reference sorts matches by score,
    mhap/impl/MatchResult.java:92-95)."""
    df = pairs
    if signatures is not None:
        # LEFT joins: a pair whose endpoint is missing from the (possibly
        # filtered/pruned) signature table must still be emitted — an inner
        # join would silently drop it from the export; unknown lengths
        # render as 0, same as the signatures=None path
        ln = signatures.select("image_id", "n_shingles")
        df = (
            df.join(
                ln.select(
                    F.col("image_id").alias("src"),
                    F.col("n_shingles").alias("src_len"),
                ),
                "src",
                "left",
            )
            .join(
                ln.select(
                    F.col("image_id").alias("dst"),
                    F.col("n_shingles").alias("dst_len"),
                ),
                "dst",
                "left",
            )
            .withColumn("src_len", F.coalesce("src_len", F.lit(0)))
            .withColumn("dst_len", F.coalesce("dst_len", F.lit(0)))
        )
    else:
        df = df.withColumn("src_len", F.lit(0)).withColumn("dst_len", F.lit(0))
    return (
        df.orderBy(F.desc("score"), F.asc("src"), F.asc("dst"))
        .select(
            F.format_string(
                "%s %s %.6f %.6f %d %d %d %d %d %d %d %d",
                F.col("src"),
                F.col("dst"),
                1.0 - F.col("score"),
                F.col("votes").cast("double"),
                F.lit(0),
                F.lit(0),
                F.lit(0),
                F.col("src_len").cast("long"),
                F.lit(0),
                F.lit(0),
                F.lit(0),
                F.col("dst_len").cast("long"),
            ).alias("line")
        )
    )
