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
        F.first("type").alias("type"),
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
    return _with_counter_partials(
        samples.groupBy("fingerprint", _bucket("timestamp_ns")).agg(*_cell_aggs())
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
            "fingerprint", F.window("event_time", "15 seconds").alias("w")
        )
        .agg(*_cell_aggs())
        .withColumn("timestamp_ns", F.unix_micros(F.col("w.start")) * 1000)
        .drop("w")
    )
    return _with_counter_partials(grouped)
