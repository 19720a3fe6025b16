"""Trace MV layer (ref: ctrl/qryn/sql/traces.sql traces_input_*_mv)."""

import json

from pyspark.sql import functions as F

from gigapipe_spark.sources import ingest
from gigapipe_spark.storage.writer import Catalog, spans_fanout


def _spans(spark):
    payload = json.dumps(
        [
            {
                "id": "b1", "traceId": "a1", "name": "get /",
                "timestamp": 1700000000000000, "duration": 1500,
                "localEndpoint": {"serviceName": "web"},
                "tags": {"http.path": "/", "otel.status_code": "ERROR"},
            },
            {
                "id": "b2", "traceId": "a1", "parentId": "b1",
                "name": "select", "timestamp": 1700000000000100,
                "duration": 900, "localEndpoint": {"serviceName": "db"},
            },
        ]
    )
    return ingest.zipkin_spans(
        spark.createDataFrame([(payload,)], "payload string")
    )


def test_spans_fanout_roundtrip(spark, tmp_path):
    cat = Catalog(str(tmp_path / "store"))
    spans_fanout(_spans(spark), cat)
    traces = cat.read(spark, "tempo_traces")
    assert traces.count() == 2
    assert "date" in traces.columns  # partition column (toDate analog)
    # trace-by-id over the stored layout
    tid = "a1".rjust(32, "0")
    got = traces.filter(F.col("trace_id") == tid).orderBy("timestamp_ns").collect()
    assert [r["span_id"] for r in got] == ["b1".rjust(16, "0"), "b2".rjust(16, "0")]

    gin = cat.read(spark, "tempo_traces_attrs_gin")
    keys = {r["key"] for r in gin.select("key").distinct().collect()}
    # zipkin attr set flows into the GIN: tags, status mapping, name, svc
    assert {"http.path", "status", "name", "service.name"} <= keys
    err = gin.filter((F.col("key") == "status") & (F.col("val") == "error"))
    assert err.count() == 1
    assert err.collect()[0]["duration"] == 1_500_000

    kv = cat.read(spark, "tempo_traces_kv")
    row = kv.filter((F.col("key") == "status") & (F.col("val") == "error")).collect()
    assert len(row) == 1
    assert 0 <= row[0]["val_id"] < 10000  # cityHash64 % 10000 analog


def test_spans_fanout_gin_sorted_for_selector_skip(spark, tmp_path):
    """GIN files sort by (key, val, timestamp_ns) inside each date
    partition — the ORDER BY that lets an attr selector row-group-skip."""
    cat = Catalog(str(tmp_path / "store"))
    spans_fanout(_spans(spark), cat)
    gin = cat.read(spark, "tempo_traces_attrs_gin")
    sel = gin.filter((F.col("key") == "http.path") & (F.col("val") == "/"))
    assert sel.count() == 1


def test_stream_spans_fanout(spark, tmp_path):
    """Streaming trace ingest: raw payload stream → zipkin decode →
    tempo MV layer per micro-batch (the decoders are from_json-based so
    the same transform runs under readStream)."""
    import json as _json

    from gigapipe_spark.storage.writer import stream_spans_fanout

    src = str(tmp_path / "payloads")
    payload = _json.dumps(
        [{"id": "b1", "traceId": "a1", "name": "s", "timestamp": 1,
          "duration": 2, "localEndpoint": {"serviceName": "w"}}]
    )
    spark.createDataFrame([(payload,)], "payload string").write.mode(
        "overwrite"
    ).parquet(src)
    stream = spark.readStream.schema("payload string").parquet(src)
    decoded = ingest.zipkin_spans(stream)
    cat = Catalog(str(tmp_path / "store"))
    q = stream_spans_fanout(
        decoded, cat, str(tmp_path / "ck"), trigger_seconds=1
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = cat.read(spark, "tempo_traces").collect()
    assert len(rows) == 1 and rows[0]["span_id"] == "b1".rjust(16, "0")
    assert cat.read(spark, "tempo_traces_attrs_gin").count() > 0
