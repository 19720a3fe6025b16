"""Regression tests for the round-5 driver ADVICE findings.

1. medium — ingest_fanout must write one time_series/gin row per
   (date, fingerprint, TYPE) like the reference (builder.go onEntries
   `for t := range tps`; log.sql ORDER BY (fingerprint, type)), so the
   label planners' `type IN (T, 0)` scoping sees mixed log+metric
   streams; rollup cells group by (fingerprint, bucket, type).
2. low — finalize_entries only peels __ttl_days__ when the writer-level
   ttl_days == 0 (builder.go: the label-dropping `continue` is inside
   the ttlDays == 0 branch).
3. low — loki_push values-triples set the METRIC bit only for a JSON
   Number third element (decodeStreamValue: `d.Next() != jx.Number` →
   Skip); a string "5" stays LOG-only.
4. low — Catalog.metadata on a store written before the metadata
   column existed returns empty instead of raising.
"""

import json

from pyspark.sql import functions as F

from gigapipe_spark.sources import ingest
from gigapipe_spark.storage.writer import Catalog, ingest_fanout


def _mixed_stream_raw(spark):
    # one label set, rows of three types: values pair → LOG(1),
    # values triple w/ number → BOTH(0), entries value-only → METRIC(2)
    t0 = 1_700_000_000_000_000_000
    payload = json.dumps(
        {
            "streams": [
                {
                    "stream": {"app": "mixed"},
                    "values": [
                        [str(t0), "a log line"],
                        [str(t0 + 1_000_000_000), "line with value", 7],
                    ],
                    "entries": [
                        {"ts": str(t0 + 2_000_000_000), "value": 3.5}
                    ],
                }
            ]
        }
    )
    return spark.createDataFrame([(payload,)], "payload string")


def test_series_row_per_type_for_mixed_stream(spark, tmp_path):
    decoded = ingest.loki_push(_mixed_stream_raw(spark))
    got = {r["type"] for r in decoded.collect()}
    assert got == {0, 1, 2}
    fps = {r["fingerprint"] for r in decoded.collect()}
    assert len(fps) == 1  # one label set → one fingerprint

    cat = Catalog(str(tmp_path / "store"))
    ingest_fanout(decoded.coalesce(1), cat)

    # one dimension row per (fingerprint, type), like the reference
    series = cat.read(spark, "time_series")
    assert series.count() == 3
    assert {r["type"] for r in series.collect()} == {0, 1, 2}

    # type IN (T, 0) scoping finds the stream from both planners
    gin = cat.read(spark, "gin")
    for labels_type in (1, 2):
        scoped = gin.filter(F.col("type").isin(0, labels_type))
        assert scoped.filter(
            (F.col("key") == "app") & (F.col("val") == "mixed")
        ).count() > 0

    # read_series dedups on (fingerprint, type); per_fingerprint
    # collapses for the label-join consumers
    assert cat.read_series(spark).count() == 3
    assert cat.read_series(spark, types=(0, 1)).count() == 2
    assert (
        cat.read_series(spark, types=(0, 2), per_fingerprint=True).count()
        == 1
    )


def test_rollup_cells_group_by_type(spark):
    from gigapipe_spark.streaming.rollup import merge_cells, rollup_15s_batch

    decoded = ingest.loki_push(_mixed_stream_raw(spark))
    metric_rows = decoded.filter(F.col("type").isin(0, 2))
    cells = rollup_15s_batch(metric_rows)
    rows = cells.collect()
    # both metric rows fall in one 15s bucket but keep per-type cells
    assert len(rows) == 2
    assert {r["type"] for r in rows} == {0, 2}
    merged = merge_cells(cells)
    assert merged.count() == 2  # merge respects the type key


def test_ttl_days_label_kept_under_writer_ttl(spark):
    t0 = 1_700_000_000_000_000_000
    payload = json.dumps(
        {
            "streams": [
                {
                    "stream": {"app": "web", "__ttl_days__": "14"},
                    "values": [[str(t0), "x"]],
                }
            ]
        }
    )
    raw = spark.createDataFrame([(payload,)], "payload string")
    decoded = ingest.loki_push(raw)
    # ttl_days == 0: label peeled, override applies (builder.go:318)
    r0 = ingest.finalize_entries(decoded).collect()[0]
    assert r0["ttl_days"] == 14
    assert "__ttl_days__" not in r0["labels"]
    # nonzero writer ttl: the reference KEEPS the label (and it stays in
    # the fingerprint) — the `continue` sits inside ttlDays == 0
    r30 = ingest.finalize_entries(decoded, ttl_days=30).collect()[0]
    assert r30["ttl_days"] == 30
    assert r30["labels"]["__ttl_days__"] == "14"
    assert r30["fingerprint"] != r0["fingerprint"]


def test_loki_values_metric_bit_requires_json_number(spark):
    t0 = 1_700_000_000_000_000_000
    payload = json.dumps(
        {
            "streams": [
                {
                    "stream": {"app": "w"},
                    "values": [
                        [str(t0), "s", "5"],       # string token → LOG only
                        [str(t0 + 1), "n", 5],      # int → BOTH
                        [str(t0 + 2), "f", 5.5],    # float → BOTH
                        [str(t0 + 3), "b", True],   # bool → LOG only
                        [str(t0 + 4), "plain"],     # no third → LOG
                    ],
                }
            ]
        }
    )
    raw = spark.createDataFrame([(payload,)], "payload string")
    got = {
        r["string"]: (r["type"], r["value"])
        for r in ingest.loki_push(raw).collect()
    }
    assert got["s"] == (1, 0.0)
    assert got["n"] == (0, 5.0)
    assert got["f"] == (0, 5.5)
    assert got["b"] == (1, 0.0)
    assert got["plain"] == (1, 0.0)


def test_metadata_on_pre_metadata_store(spark, tmp_path):
    import datetime

    df = spark.createDataFrame(
        [(datetime.date(2023, 11, 1), 1, {"__name__": "m"}, 2)],
        "date date, fingerprint long, labels map<string,string>, type int",
    )
    df.write.mode("overwrite").partitionBy("date").parquet(
        str(tmp_path / "store" / "time_series")
    )
    cat = Catalog(str(tmp_path / "store"))
    out = cat.metadata(spark)
    assert out.columns == ["metric_name", "metadata_json"]
    assert out.count() == 0
