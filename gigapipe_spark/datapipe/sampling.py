"""Deterministic sampling / mixing / packing for training-data pipelines.

The steps between "deduped corpus" and "training shards": pick a
reproducible subset (hash sampling), rebalance strata to a target
mixture (mixture planning + stratified rates), and pack documents into
fixed token budgets (sequence packing). Everything here is:

  deterministic   sampling decisions derive from md5(doc_id || seed) —
                  the same doc is kept for the same seed on any engine,
                  any partitioning, any run (no rand(), no
                  sample(fraction) whose outcome depends on the split)
  one-pass        sampling/packing are pure column expressions + one
                  bounded window; mixture planning is one groupBy over
                  stratum counts
  scale-correct   no global sort or single-partition window: packing
                  partitions by a doc-hash bucket, so the cluster packs
                  n_buckets streams in parallel and the only exchange is
                  the bucket hash shuffle

Hash-threshold scheme (shared with the DuckDB oracles): a doc's draw is
the first 8 hex chars of md5(CAST(id AS STRING) || ':' || seed), an
8-digit lowercase-hex string uniformly distributed over [0, 2^32).
`rate` maps to the literal threshold hex(floor(rate * 2^32)); keep iff
draw < threshold (plain string comparison — 8-digit lowercase hex
compares identically to its numeric value, and md5 agrees byte-for-byte
across engines, unlike xxhash64/rand seeds).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HASH_SPACE = 1 << 32  # draws cover [0, 2^32) — 8 hex chars


def rate_threshold_hex(rate: float) -> str:
    """Literal hex threshold for a sampling rate (embedded verbatim in
    both the Spark plan and the SQL oracle)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    if rate >= 1.0:
        return "ffffffff"
    return format(int(rate * HASH_SPACE), "08x")


def hash_draw(id_col: Column, seed: str) -> Column:
    """The doc's uniform draw: first 8 hex chars of md5(id ':' seed)."""
    return F.substring(
        F.md5(F.concat(id_col.cast("string"), F.lit(":" + seed))), 1, 8
    )


def hash_sample(
    docs: DataFrame, rate: float, seed: str = "0", id_col: str = "doc_id"
) -> DataFrame:
    """Keep a deterministic `rate` fraction of docs.

    Pure filter — reaches the scan as a predicate, no shuffle, and the
    kept set is stable across runs/engines/partitionings (rows where
    md5-draw < threshold). rate=1.0 keeps everything including any doc
    whose draw is the max value.
    """
    if rate >= 1.0:
        return docs
    thr = rate_threshold_hex(rate)
    return docs.filter(hash_draw(F.col(id_col), seed) < thr)


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    seed: str = "0",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum value gets its
    own rate (e.g. downsample en, keep all low-resource langs). Strata
    absent from `rates` use `default_rate`. Still one scan-level filter."""
    thr: Column = F.lit(rate_threshold_hex(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(
            F.col(strata_col) == value, F.lit(rate_threshold_hex(rate))
        ).otherwise(thr)
    # rate >= 1.0 means keep EVERYTHING in that stratum (a pure
    # threshold would drop the 1-in-2^32 draw equal to the max)
    listed = list(sorted(rates))
    keep_all: Column = (
        F.lit(default_rate >= 1.0) & ~F.col(strata_col).isin(*listed)
        if listed
        else F.lit(default_rate >= 1.0)
    )
    for value, rate in sorted(rates.items()):
        if rate >= 1.0:
            keep_all = keep_all | (F.col(strata_col) == value)
    return docs.filter(keep_all | (hash_draw(F.col(id_col), seed) < thr))


def mixture_plan(
    docs: DataFrame,
    weights: dict[str, float],
    budget: int,
    strata_col: str = "source",
) -> DataFrame:
    """Turn target mixture weights + a doc budget into per-stratum
    sampling rates.

    target_n(stratum) = budget * weight / Σweights; rate = min(1,
    target_n / available_n) — a stratum smaller than its target
    contributes everything it has (rate 1) rather than oversampling.
    Output: (stratum, n_docs, weight, target_n, rate). One groupBy over
    the corpus (counts only — no text moves); at 100 TB this is a
    metadata-sized aggregate. Feed the rates column into
    stratified_sample to materialize the mix.
    """
    total_w = sum(weights.values())
    if total_w <= 0:
        raise ValueError("weights must sum > 0")
    counts = docs.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w: Column = F.lit(None).cast("double")
    for value, weight in sorted(weights.items()):
        w = F.when(F.col("stratum") == value, F.lit(weight / total_w)).otherwise(w)
    counts = counts.withColumn("weight", w).filter(F.col("weight").isNotNull())
    target = F.col("weight") * F.lit(float(budget))
    return counts.select(
        "stratum",
        "n_docs",
        F.round("weight", 6).alias("weight"),
        F.round(target, 6).alias("target_n"),
        F.round(F.least(F.lit(1.0), target / F.col("n_docs")), 6).alias("rate"),
    )


def shuffle_order(
    docs: DataFrame,
    seed: str = "0",
    n_buckets: int = 64,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global training-order shuffle: every doc gets a
    reproducible (bucket, pos) — read buckets in order, rows by pos
    within each, and the corpus streams in a seed-keyed pseudo-random
    order that is identical on any engine/partitioning (no rand(), no
    zipWithIndex driver dependency).

    bucket = first hex nibbles of the md5 draw (so buckets are
    themselves random w.r.t. the input order); pos = rank of the draw
    within the bucket. The rank window partitions by bucket —
    n_buckets parallel streams, no global sort; a shard writer maps
    bucket → output file. A new seed is a completely new order.
    """
    draw = hash_draw(F.col(id_col), seed)
    bucket = (F.conv(F.substring(draw, 1, 4), 16, 10).cast("long") % n_buckets).alias(
        "bucket"
    )
    w = Window.partitionBy("bucket").orderBy("draw", id_col)
    return (
        docs.select(F.col(id_col), bucket, draw.alias("draw"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select(id_col, "bucket", "pos")
    )


def pack_sequences(
    docs: DataFrame,
    budget_tokens: int,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Greedy contiguous sequence packing: assign each doc to a packed
    training sequence of ~budget_tokens whitespace tokens.

    Docs are bucketed by id hash (`n_buckets` independent packing
    streams — this is what distributes: the only exchange is the bucket
    hash, and each bucket packs under one window partition, so raise
    n_buckets with the corpus; a global-order formulation would funnel
    100 TB through ONE window partition). Within a bucket docs are
    packed in draw order; a doc belongs to the sequence where its
    running token count starts (`floor(exclusive-cumsum / budget)`), so
    sequences may overflow the budget by at most one doc — the standard
    pack-then-truncate contract — rather than paying a sequential
    first-fit scan that no engine can parallelize.

    Output: (doc_id, bucket, seq_id, n_tokens, token_offset) where
    token_offset is the doc's start position within its bucket stream.
    """
    n_tokens = F.size(
        F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    ).cast("long")
    bucket = F.pmod(F.col(id_col), F.lit(n_buckets))  # id-derived: cheap + cross-engine
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        docs.select(
            F.col(id_col),
            bucket.alias("bucket"),
            n_tokens.alias("n_tokens"),
        )
        .withColumn("token_offset", cum)
        .select(
            id_col,
            "bucket",
            F.floor(F.col("token_offset") / budget_tokens).alias("seq_id"),
            "n_tokens",
            "token_offset",
        )
    )
