"""Streaming corpus curation: the datapipe operators on a document
STREAM (SURVEY §7.5 at ingest time rather than batch).

Two mechanisms, both pure Structured Streaming:

- ``dedup_exact_stream``: content-digest dedup with bounded state via
  ``dropDuplicatesWithinWatermark`` — the streaming analog of
  ``dedup.exact_dedup``. State holds one digest per distinct document
  seen inside the watermark horizon, so memory is bounded by (ingest
  rate × horizon), not corpus size; a 100 TB deployment sets the horizon
  to its ingest-window SLA and lets the batch pass (`dedup_exact`)
  handle cross-horizon duplicates.

- Stateless stages (quality filters, PII scrub, token stats) are plain
  column projections and compose on a stream unchanged —
  ``curate_stream`` chains the standard filter set as one example
  pipeline; ``test_streaming_curation`` pins stream/batch equivalence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_exact_stream(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    delay: str = "1 hour",
) -> DataFrame:
    """Keep the first-arriving document per content digest within the
    watermark horizon. One row of state per distinct digest; expired by
    the watermark, exactly like the reference's ingest-side dedup would
    be bounded by its buffer flush."""
    return (
        stream.withColumn("__digest", F.md5(F.col(text_col)))
        .withWatermark(ts_col, delay)
        .dropDuplicatesWithinWatermark(["__digest"])
        .drop("__digest")
    )


def curate_stream(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    delay: str = "1 hour",
    min_words: int = 3,
) -> DataFrame:
    """Example streaming curation pipeline: exact dedup, then the
    stateless quality gate (word-count floor + PII scrub), showing the
    batch operators compose on a stream unchanged."""
    from gigapipe_spark.datapipe.scrub import scrub_text

    deduped = dedup_exact_stream(stream, text_col, ts_col, delay)
    words = F.size(F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != ""))
    return deduped.filter(words >= min_words).withColumn(
        text_col, scrub_text(F.col(text_col))
    )
