"""15-second metric rollup — the reference's continuous materialized view
(ref: ctrl/qryn/sql/log.sql:83-107: metrics_15s + MV intDiv(ts,15e9)*15e9).

Two forms of the same aggregation:
  - rollup_15s_batch: one groupBy over a samples DataFrame. All partials
    are re-aggregable (max(max), sum(sum), sum(count), max_by-last), so a
    downstream reader can merge buckets exactly like ClickHouse's
    AggregateFunction states merge (SURVEY §1.2).
  - rollup_15s_stream: the Structured Streaming variant — watermarked
    tumbling window, append mode, for continuous maintenance of the
    rollup table (SURVEY §2.8).

At 100 TB the batch form is a single map-side-combinable shuffle keyed
(fingerprint, bucket); no skew risk beyond what the key space carries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKET_NS = 15_000_000_000


def _bucket(col):
    return (F.col(col) - F.pmod(F.col(col), F.lit(BUCKET_NS))).alias("timestamp_ns")


def _cell_aggs() -> list[Column]:
    """Re-aggregable partials per 15s cell. Beyond the reference's set
    (last/max/min/count/sum/bytes), `first` and the intra-cell counter
    partials (reset amount / reset count / change count over consecutive
    sample pairs) make rate/increase/delta/resets/changes EXACTLY
    re-derivable from cells: a range bucket's sample pairs = intra-cell
    pairs (stored here) + cell-boundary pairs (one lag over cells at
    query time). Cell population is bounded by scrape rate × 15s, so the
    in-cell pair fold is O(few) per cell."""
    return [
        F.max_by("value", "timestamp_ns").alias("last"),
        F.min_by("value", "timestamp_ns").alias("first"),
        F.max("value").alias("max"),
        F.min("value").alias("min"),
        F.count(F.lit(1)).alias("count"),
        F.sum("value").alias("sum"),
        F.sum(F.length("string")).cast("double").alias("bytes"),
        F.sort_array(F.collect_list(F.struct("timestamp_ns", "value"))).alias(
            "__arr"
        ),
    ]


def _with_counter_partials(grouped: DataFrame) -> DataFrame:
    arr = F.col("__arr")
    n = F.size(arr)
    prevs = F.slice(arr, 1, F.greatest(n - 1, F.lit(0)))
    currs = F.slice(arr, 2, F.greatest(n - 1, F.lit(0)))

    def pair_sum(fn) -> Column:
        return F.aggregate(
            F.zip_with(prevs, currs, fn), F.lit(0.0), lambda acc, x: acc + x
        )

    reset_amt = pair_sum(
        lambda p, c: F.when(p["value"] > c["value"], p["value"]).otherwise(F.lit(0.0))
    )
    resets = pair_sum(
        lambda p, c: F.when(p["value"] > c["value"], F.lit(1.0)).otherwise(F.lit(0.0))
    )
    changes = pair_sum(
        lambda p, c: F.when(p["value"] != c["value"], F.lit(1.0)).otherwise(F.lit(0.0))
    )
    # last intra-cell pair (irate/idelta partials); first/last sample ts
    # for boundary-pair reconstruction
    last_el = F.try_element_at(arr, n)
    prev_el = F.try_element_at(arr, n - 1)
    return grouped.select(
        "fingerprint", "timestamp_ns", "last", "first", "max", "min",
        "count", "sum", "bytes", "type",
        reset_amt.alias("reset_amt"),
        resets.alias("resets"),
        changes.alias("changes"),
        F.try_element_at(arr, F.lit(1))["timestamp_ns"].alias("first_ts"),
        last_el["timestamp_ns"].alias("last_ts"),
        F.when(n >= 2, last_el["value"] - prev_el["value"]).alias("last_delta"),
        F.when(n >= 2, last_el["timestamp_ns"] - prev_el["timestamp_ns"]).alias(
            "last_dt"
        ),
    )


def rollup_15s_batch(samples: DataFrame) -> DataFrame:
    # type joins the grouping key — the reference's metrics_15s_mv
    # groups by type (log.sql:95) so a mixed log+metric fingerprint
    # keeps one cell per type rather than an arbitrary first("type")
    return _with_counter_partials(
        samples.groupBy("fingerprint", "type", _bucket("timestamp_ns")).agg(
            *_cell_aggs()
        )
    )


# struct field order doubles as the merge sort key (first_ts leads)
_CELL_FIELDS = [
    "first_ts", "last_ts", "first", "last", "max", "min", "count", "sum",
    "bytes", "reset_amt", "resets", "changes", "last_delta",
    "last_dt",
]


def merge_cells(cells: DataFrame) -> DataFrame:
    """Re-aggregate cell PARTIALS for the same (fingerprint, bucket)
    written by different flushes — the AggregatingMergeTree merge the
    reference's metrics_15s relies on (log.sql:83-107), extended to the
    counter partials.

    Gauge fields merge trivially (max/min/sum/count/bytes; first/last by
    first_ts/last_ts order). The counter partials need ONE boundary pair
    per adjacent flush-partial: folding in first_ts order, a partial
    joining after `acc` contributes its own intra-flush pairs plus the
    (acc.last → part.first) pair for reset_amt/resets/changes, and the
    merged cell's final pair is the joiner's own last pair when it has
    ≥2 samples, else the boundary pair. EXACT whenever flushes don't
    interleave inside one 15s cell (time-ordered ingest; the same
    assumption the reference's insert batching makes)."""
    ps = F.sort_array(F.collect_list(F.struct(*_CELL_FIELDS)))

    def merge(acc: Column, x: Column) -> Column:
        boundary_reset = F.when(
            acc["last"] > x["first"], acc["last"]
        ).otherwise(F.lit(0.0))
        return F.struct(
            acc["first_ts"].alias("first_ts"),
            x["last_ts"].alias("last_ts"),
            acc["first"].alias("first"),
            x["last"].alias("last"),
            F.greatest(acc["max"], x["max"]).alias("max"),
            F.least(acc["min"], x["min"]).alias("min"),
            (acc["count"] + x["count"]).alias("count"),
            (acc["sum"] + x["sum"]).alias("sum"),
            (acc["bytes"] + x["bytes"]).alias("bytes"),
            (acc["reset_amt"] + x["reset_amt"] + boundary_reset).alias(
                "reset_amt"
            ),
            (
                acc["resets"]
                + x["resets"]
                + F.when(acc["last"] > x["first"], F.lit(1.0)).otherwise(
                    F.lit(0.0)
                )
            ).alias("resets"),
            (
                acc["changes"]
                + x["changes"]
                + F.when(acc["last"] != x["first"], F.lit(1.0)).otherwise(
                    F.lit(0.0)
                )
            ).alias("changes"),
            F.when(x["count"] >= 2, x["last_delta"])
            .otherwise(x["first"] - acc["last"])
            .alias("last_delta"),
            F.when(x["count"] >= 2, x["last_dt"])
            .otherwise(x["first_ts"] - acc["last_ts"])
            .alias("last_dt"),
        )

    # per-(fingerprint, type) cells, matching the write-side grouping
    grouped = cells.groupBy("fingerprint", "type", "timestamp_ns").agg(
        ps.alias("__ps")
    )
    merged = F.aggregate(
        F.slice(F.col("__ps"), 2, F.greatest(F.size("__ps") - 1, F.lit(0))),
        F.try_element_at(F.col("__ps"), F.lit(1)),
        merge,
    )
    return grouped.select(
        "fingerprint",
        "type",
        "timestamp_ns",
        *[merged[f].alias(f) for f in _CELL_FIELDS if f not in ("first_ts",)],
        merged["first_ts"].alias("first_ts"),
    ).select(
        "fingerprint", "timestamp_ns", "last", "first", "max", "min",
        "count", "sum", "bytes", "type", "reset_amt", "resets", "changes",
        "first_ts", "last_ts", "last_delta", "last_dt",
    )


def rollup_15s_stream(samples_stream: DataFrame, watermark_delay: str = "30 seconds") -> DataFrame:
    """Streaming maintenance of the rollup (event time = timestamp_ns).

    The source must expose the same samples schema with an additional
    event-time column derived from timestamp_ns; late rows beyond the
    watermark are dropped, matching the reference's append-only model
    (SURVEY §2.8: watermark only needed for the rollup stream).
    """
    with_ts = samples_stream.withColumn(
        "event_time", F.timestamp_micros((F.col("timestamp_ns") / 1000).cast("long"))
    ).withWatermark("event_time", watermark_delay)
    grouped = (
        with_ts.groupBy(
            "fingerprint", "type", F.window("event_time", "15 seconds").alias("w")
        )
        .agg(*_cell_aggs())
        .withColumn("timestamp_ns", F.unix_micros(F.col("w.start")) * 1000)
        .drop("w")
    )
    return _with_counter_partials(grouped)
