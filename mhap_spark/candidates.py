"""Stage-1 candidate generation: LSH band buckets → pairs → vote gate.

Spark-first re-expression of the reference's inverted index + vote counting
(mhap/impl/MinHashSearch.java:85-204): the per-slot hash maps become a
shuffle on the band key; the per-probe vote counter becomes
``groupBy(src, dst).count()``; the ``numMinMatches`` gate (:204) becomes a
HAVING filter.  Pair-order dedup (``src < dst``, :199-219) is a predicate.

Skew handling (north rule "salted repartition + hash-join + groupBy with
explicit skew mitigation for hot bands"):

* a map-side-combinable count pre-pass sizes every bucket BEFORE any list is
  collected, so a mega-bucket can never materialize;
* buckets larger than ``max_bucket_size`` are dropped and accounted in a
  metrics row — the scale analog of the reference's popular-k-mer noise
  suppression (mhap/sketch/FrequencyCounts.java:171-186);
* pair generation offers two physical strategies (bench-selected):
  - ``join``: salted self-equi-join on the band key — hot buckets are salted
    on the left and replicated on the right so no single task owns a hot key;
  - ``grouped``: collect bucket members (bounded by the cap) and emit pairs
    with two JVM-side explodes — one shuffle fewer, best when caps are tight.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, functions as F

from mhap_spark.config import MhapConfig
from mhap_spark.hints import scaled


def exploded_bands(signatures: DataFrame) -> DataFrame:
    """(image_id, band_hash) — one row per signature band.  The band index is
    already folded into band_hash (minhash.band_hashes salts the accumulator
    with the band ordinal), so carrying it separately would only widen every
    shuffle row and key."""
    return signatures.select(
        "image_id", F.explode("bands").alias("band_hash")
    )


def bucket_sizes(bands: DataFrame) -> DataFrame:
    """Bucket cardinalities; partial-agg safe under skew."""
    return bands.groupBy("band_hash").agg(
        F.count(F.lit(1)).alias("bucket_size")
    )


def _funnel_exprs(cfg: MhapConfig) -> list:
    """Aggregate expressions for the funnel metrics (shared by the standalone
    bucket_stats query and the zero-extra-job Observation path).

    ``candidate_pairs_generated`` counts emitted edges exactly: C(n,2) per
    eligible bucket in pairs modes, n−1 per bucket in star mode — where
    star-salt counts oversize buckets too (salted emission still produces
    exactly n−1 edges per bucket: members minus sub-hubs, plus sub-hub
    chain links; the global min is always its own sub-bucket's hub).
    ``n_buckets_capped`` counts over-cap buckets in every mode — dropped in
    pairs/star-drop, salted in star-salt."""
    star = cfg.candidate_mode == "star"
    per_bucket = (
        F.col("bucket_size") - 1
        if star
        else F.col("bucket_size") * (F.col("bucket_size") - 1) / 2
    )
    counted = (
        F.col("bucket_size") >= 2
        if star and cfg.oversize_star == "salt"
        else F.col("bucket_size").between(2, cfg.max_bucket_size)
    )
    return [
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(F.when(F.col("bucket_size") > cfg.max_bucket_size, 1).otherwise(0)).alias(
            "n_buckets_capped"
        ),
        F.max("bucket_size").alias("max_bucket_size_seen"),
        F.sum(F.when(counted, per_bucket).otherwise(0)).alias(
            "candidate_pairs_generated"
        ),
    ]


def bucket_stats(sizes: DataFrame, cfg: MhapConfig) -> DataFrame:
    """One-row funnel metrics (mirrors the reference's stderr stats,
    mhap/main/MhapMain.java:572-590).  Candidate count is mode-aware:
    C(n,2) per bucket in "pairs" mode, n−1 in "star" mode.

    Prefer passing ``funnel_obs`` to candidate_pairs: the same metrics then
    ride the pairs job as an Observation — zero extra jobs/scans."""
    return sizes.agg(*_funnel_exprs(cfg))


def _eligible_bands(bands: DataFrame, sizes: DataFrame, cfg: MhapConfig) -> DataFrame:
    ok = sizes.filter(
        (F.col("bucket_size") >= 2) & (F.col("bucket_size") <= cfg.max_bucket_size)
    )
    # bucket-stats side scales with the bucket count — never broadcast
    return bands.join(scaled(ok, cfg), ["band_hash"]).select(
        "image_id", "band_hash", "bucket_size"
    )


def _pairs_grouped(eligible: DataFrame) -> DataFrame:
    """collect_list (bounded by the cap) + double explode — zero extra shuffle
    beyond the groupBy; pairs are emitted inside whole-stage codegen."""
    grouped = eligible.groupBy("band_hash").agg(
        F.collect_list("image_id").alias("ids")
    )
    return (
        grouped.select(F.explode("ids").alias("src"), "ids")
        .select("src", F.explode("ids").alias("dst"))
        .where(F.col("src") < F.col("dst"))
    )


def _pairs_grouped_onepass(bands: DataFrame, cfg: MhapConfig) -> DataFrame:
    """Single-subtree grouped pair emission (round-6 optimization, guide
    §2.4): bucket sizing via a window count over the SAME exchange the
    collect_list groupBy uses, instead of a separate ``bucket_sizes``
    aggregation joined back onto a second copy of ``bands``.

    Why it matters: the two-subtree form evaluates the upstream plan twice —
    for an unpersisted signature source (the ops-layer MinHash/doc queries)
    that re-runs the whole Arrow sketch kernel, which the round-6 plan
    audit measured as 2 MapInPandas executions per query.  The window form
    keeps the mega-bucket discipline intact: the count is computed without
    collecting any list (WindowExec sorts, spills, and never materializes a
    bucket), over-cap buckets are filtered BEFORE collect_list, and the
    groupBy reuses the window's hash partitioning so no second exchange
    appears.  Output is identical to ``_pairs_grouped`` over
    ``_eligible_bands`` (same eligible set, same pair emission)."""
    from pyspark.sql import Window

    w = Window.partitionBy("band_hash")
    eligible = bands.withColumn(
        "bucket_size", F.count(F.lit(1)).over(w)
    ).where(F.col("bucket_size").between(2, cfg.max_bucket_size))
    return _pairs_grouped(eligible)


def _pairs_join(eligible: DataFrame, cfg: MhapConfig, hot_threshold: int) -> DataFrame:
    """Salted self-equi-join.  Cold buckets join on the bare band key; hot
    buckets (size > hot_threshold) get the classic skew treatment: the left
    side carries salt = pmod(hash(id), S), the right side is replicated to
    every salt, so each unordered pair is produced exactly once and no task
    owns an entire hot bucket."""
    s = cfg.salt_buckets
    cold = eligible.filter(F.col("bucket_size") <= hot_threshold)
    hot = eligible.filter(F.col("bucket_size") > hot_threshold)

    cold_pairs = (
        cold.alias("l")
        .join(
            cold.select("image_id", "band_hash").alias("r"),
            ["band_hash"],
        )
        .where(F.col("l.image_id") < F.col("r.image_id"))
        .select(F.col("l.image_id").alias("src"), F.col("r.image_id").alias("dst"))
    )

    hot_l = hot.withColumn("salt", F.pmod(F.xxhash64("image_id"), F.lit(s)))
    hot_r = hot.select("image_id", "band_hash").withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(s - 1)).cast("array<long>"))
    )
    hot_pairs = (
        hot_l.alias("l")
        .join(hot_r.alias("r"), ["band_hash", "salt"])
        .where(F.col("l.image_id") < F.col("r.image_id"))
        .select(F.col("l.image_id").alias("src"), F.col("r.image_id").alias("dst"))
    )
    return cold_pairs.unionByName(hot_pairs)


def _pairs_star(
    bands: DataFrame, cfg: MhapConfig, funnel_obs: Observation | None = None
) -> DataFrame:
    """Star emission: one (bucket-min → member) edge per bucket member —
    O(n) per bucket.  Connectivity within a bucket is preserved through the
    hub, so the downstream connected-components output is unchanged for any
    bucket whose hub verifies against its members (near-identical rows).
    src < dst holds by construction (src is the bucket minimum).

    Buckets larger than the cap (cfg.oversize_star == "salt", default):
    members are salted into ceil(size/cap) sub-buckets by crc32(image_id);
    each sub-bucket emits (sub-hub → member) edges and the sub-hubs chain to
    the bucket's global min — still exactly size−1 edges (the global min is
    always its own sub-bucket's hub), with no task ever holding more than
    ~cap·n_bands rows of one key.  A 10^12-row corpus' boilerplate
    mega-clusters (size ≫ cap in EVERY band) stay connected instead of
    silently fragmenting under the old drop-only behavior.  The emitted
    ``oversize`` flag lets the vote gate relax to 1 for these edges
    (see candidate_pairs); salt assignment is crc32 so the numpy oracle
    (zlib.crc32) replicates it bit-exactly.

    Physical shape (round-6 rewrite, guide §2.4): ONE window over the
    band_hash exchange computes bucket size AND hub attached to every band
    row, so edge emission is a filter + projection — no stats aggregation
    joined back, no second shuffle of the exploded bands (the pre-round-6
    groupBy+join form shuffled the 128-band explosion twice and re-scanned
    the signature cache for each side; the wave profile measured those as
    the largest candidate-stage jobs).  WindowExec sorts and spills, never
    materializes a bucket, so the mega-bucket discipline is unchanged.  The
    oversize path adds one shuffle of only the oversize rows on
    (band_hash, salt), whose key cardinality is bounded by the salt
    fan-out.  The funnel Observation moves to the window output: hub rows
    (image_id == src, exactly one per bucket) carry the per-bucket metrics,
    so the aggregate values are identical to the old one-row-per-bucket
    form — pinned exact by tests/test_star_mode.py (including the oversize
    mega adversary)."""
    from pyspark.sql import Window

    w = Window.partitionBy("band_hash")
    sized = bands.select(
        "band_hash",
        "image_id",
        F.count(F.lit(1)).over(w).alias("bucket_size"),
        F.min("image_id").over(w).alias("src"),
    )
    if funnel_obs is not None:
        is_hub = F.col("image_id") == F.col("src")
        star_salt = cfg.oversize_star == "salt"
        counted = (
            F.col("bucket_size") >= 2
            if star_salt
            else F.col("bucket_size").between(2, cfg.max_bucket_size)
        )
        sized = sized.observe(
            funnel_obs,
            F.sum(F.when(is_hub, 1).otherwise(0)).alias("n_buckets"),
            F.sum(
                F.when(is_hub & (F.col("bucket_size") > cfg.max_bucket_size), 1)
                .otherwise(0)
            ).alias("n_buckets_capped"),
            F.max("bucket_size").alias("max_bucket_size_seen"),
            F.sum(
                F.when(is_hub & counted, F.col("bucket_size") - 1).otherwise(0)
            ).alias("candidate_pairs_generated"),
        )
    if cfg.oversize_star != "salt":
        return (
            sized.where(
                F.col("bucket_size").between(2, cfg.max_bucket_size)
                & (F.col("image_id") != F.col("src"))
            )
            .select(
                "src", F.col("image_id").alias("dst"),
                F.lit(False).alias("oversize"),
            )
        )

    # Salt path, fused into the SAME chain: every row emits AT MOST ONE edge
    # (normal member → hub edge; oversize member → sub-hub edge; oversize
    # sub-hub row → chain edge to the bucket min), so the three former
    # union branches collapse to one CASE projection.  The sub-hub window
    # partitions by (band_hash, salt) — a superset of the band_hash hash
    # partitioning already established, so it adds only a per-partition
    # sort, no exchange, and the whole star emission is one linear plan
    # (the union form re-executed the bucket-size window once per branch).
    # A bucket is entirely normal or entirely oversize (size is a bucket
    # property), so the salt-0 groups of normal buckets never mix with
    # oversize sub-buckets.
    cap = cfg.max_bucket_size
    over = F.col("bucket_size") > cap
    salted = sized.withColumn(
        "salt",
        F.when(
            over,
            F.pmod(
                F.crc32(F.encode("image_id", "UTF-8")),
                F.expr(f"(bucket_size + {cap - 1}) div {cap}"),
            ),
        ).otherwise(F.lit(0)),
    )
    w2 = Window.partitionBy("band_hash", "salt")
    sub = salted.withColumn("sub_hub", F.min("image_id").over(w2))
    is_subhub = F.col("image_id") == F.col("sub_hub")
    keep = F.when(
        over,
        F.when(is_subhub, F.col("sub_hub") != F.col("src")).otherwise(F.lit(True)),
    ).otherwise(
        (F.col("bucket_size") >= 2) & (F.col("image_id") != F.col("src"))
    )
    return sub.where(keep).select(
        F.when(over & ~is_subhub, F.col("sub_hub"))
        .otherwise(F.col("src"))
        .alias("src"),
        F.when(over & is_subhub, F.col("sub_hub"))
        .otherwise(F.col("image_id"))
        .alias("dst"),
        over.alias("oversize"),
    )


def probe_candidates(
    probe_sigs: DataFrame, indexed_sigs: DataFrame, cfg: MhapConfig,
    funnel_obs: Observation | None = None,
) -> DataFrame:
    """Two-table mode — the reference's ``-q`` usage (stream query sequences
    against an indexed set, mhap/main/MhapMain.java:511-541;
    ``findMatches(toSelf=false)`` mhap/impl/MinHashSearch.java:200): probe rows
    are matched against the indexed table with no pair-order pruning.

    Returns (probe_id, index_id, votes ≥ gate).  The indexed side's bucket
    sizes are capped exactly like the self-join path.

    ``funnel_obs`` (optional) rides the INDEX side's bucket sizes — in probe
    mode ``candidate_pairs_generated`` therefore counts both-stored bucket
    pairs (the symmetric-index formula), a lower bound on probe candidates;
    the bucket counts/cap/max metrics are exact for the index."""
    probe = exploded_bands(probe_sigs).withColumnRenamed("image_id", "probe_id")
    index = exploded_bands(indexed_sigs).withColumnRenamed("image_id", "index_id")
    sizes = bucket_sizes(index)
    if funnel_obs is not None:
        sizes = sizes.observe(funnel_obs, *_funnel_exprs(cfg))
    index_ok = index.join(
        scaled(sizes.where(F.col("bucket_size") <= cfg.max_bucket_size), cfg),
        ["band_hash"],
    )
    return (
        probe.join(scaled(index_ok, cfg), ["band_hash"])
        .where(F.col("probe_id") != F.col("index_id"))
        .groupBy("probe_id", "index_id")
        .agg(F.count(F.lit(1)).alias("votes"))
        .filter(F.col("votes") >= F.lit(cfg.min_band_matches()))
    )


def candidate_pairs(
    signatures: DataFrame,
    cfg: MhapConfig,
    strategy: str = "grouped",
    hot_threshold: int = 64,
    funnel_obs: Observation | None = None,
    keep_oversize_flag: bool = False,
) -> DataFrame:
    """signatures → (src, dst, votes) with src < dst, votes ≥ gate.

    mode "pairs": votes = number of shared bands (shared slots when
    rows_per_band=1 — exactly the reference's vote semantics,
    mhap/impl/MinHashSearch.java:161-204), gate = min_band_matches.
    mode "star": linear-cost emission for cluster workloads; gate =
    star_min_votes.

    ``funnel_obs``: optional Observation — the bucket-funnel metrics
    (n_buckets, capped, max size, candidates generated) are then computed as
    a side effect of whatever action first materializes the pairs, instead
    of a separate job re-scanning the band table (round-1 Amdahl fix).

    With cfg.min_store_shingles > 0 (the reference's --min-store-length,
    mhap/main/MhapMain.java:79): rows below the threshold probe the index
    but are not stored in it — implemented as the asymmetric probe join
    (probe side = everyone, index side = stored rows only) with unordered
    canonicalization.  A both-stored pair is found from either direction
    with identical votes (same shared-band set), so groupBy-max dedup is
    exact; a (short, long) pair is found only via the long row's index
    entry; (short, short) pairs are skipped — exactly the reference's
    index-size/recall trade.  Star mode has no probe/store asymmetry
    (hub emission), so combining them is rejected loudly.
    """
    if cfg.min_store_shingles > 0:
        if cfg.candidate_mode == "star":
            raise ValueError(
                "min_store_shingles applies to pairs/join candidate modes; "
                "star-mode hub emission has no probe/store asymmetry"
            )
        stored = signatures.where(
            F.col("n_shingles") >= F.lit(cfg.min_store_shingles)
        )
        found = probe_candidates(signatures, stored, cfg, funnel_obs=funnel_obs)
        return (
            found.select(
                F.least("probe_id", "index_id").alias("src"),
                F.greatest("probe_id", "index_id").alias("dst"),
                "votes",
            )
            .groupBy("src", "dst")
            .agg(F.max("votes").alias("votes"))
        )
    bands = exploded_bands(signatures)
    if cfg.candidate_mode == "star":
        pairs = _pairs_star(bands, cfg, funnel_obs=funnel_obs)
        gate = cfg.star_min_votes
        # edges that EVER came out of an oversize (salted) bucket pass at
        # votes ≥ 1: sub-bucket membership jitters across bands when bucket
        # sizes change n_salt, so the vote gate would split an edge's votes
        # and fragment the mega-cluster; stage-2 verify is the real filter
        # for these (volume stays linear — size−1 edges per bucket).
        # ``keep_oversize_flag`` carries the flag downstream so the pipeline
        # can measure the purity of the votes≥1 relaxation (how many
        # oversize-relaxed edges survive verify).
        cols = ["src", "dst", "votes"] + (
            ["any_oversize"] if keep_oversize_flag else []
        )
        return (
            pairs.groupBy("src", "dst")
            .agg(
                F.count(F.lit(1)).alias("votes"),
                F.max("oversize").alias("any_oversize"),
            )
            .filter(
                F.col("votes")
                >= F.when(F.col("any_oversize"), F.lit(1)).otherwise(F.lit(gate))
            )
            .select(*cols)
        )
    if strategy == "grouped" and funnel_obs is None:
        # fast path: no funnel metrics requested → bucket sizing rides the
        # collect_list exchange as a window count (one evaluation of the
        # signature subtree; see _pairs_grouped_onepass).  The funnel path
        # keeps the standalone sizes aggregation because the Observation's
        # per-bucket metrics are defined over one-row-per-bucket input.
        pairs = _pairs_grouped_onepass(bands, cfg)
        return (
            pairs.groupBy("src", "dst")
            .agg(F.count(F.lit(1)).alias("votes"))
            .filter(F.col("votes") >= F.lit(cfg.min_band_matches()))
        )
    sizes = bucket_sizes(bands)
    if funnel_obs is not None:
        sizes = sizes.observe(funnel_obs, *_funnel_exprs(cfg))
    eligible = _eligible_bands(bands, sizes, cfg)
    if strategy == "grouped":
        pairs = _pairs_grouped(eligible)
        gate = cfg.min_band_matches()
    elif strategy == "join":
        pairs = _pairs_join(eligible, cfg, hot_threshold)
        gate = cfg.min_band_matches()
    else:
        raise ValueError(f"unknown candidate strategy {strategy!r}")
    return (
        pairs.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("votes"))
        .filter(F.col("votes") >= F.lit(gate))
    )
