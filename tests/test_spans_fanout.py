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


def _zipkin_batch(spark, spans: list[dict]):
    payload = json.dumps(spans)
    return ingest.zipkin_spans(
        spark.createDataFrame([(payload,)], "payload string")
    )


def test_ancestor_index_incremental_equals_scratch(spark, tmp_path):
    """The ingest-maintained closure index (tempo_traces_anc) after TWO
    incremental appends — including an OUT-OF-ORDER parent (c2's parent
    c1 lands in batch 2, extending batch-1 spans' chains) — equals the
    closure built from scratch over the final span set, with no
    lingering duplicates beyond the duplicate-insensitive contract."""
    from gigapipe_spark.sources.views import ancestors_from_spans

    base = {"timestamp": 1_700_000_000_000_000, "duration": 10,
            "localEndpoint": {"serviceName": "w"}}
    # batch 1: root a, child b(a); plus orphan c2 whose parent c1 is
    # not yet ingested (out-of-order arrival)
    b1 = [
        {"id": "a0", "traceId": "aa01", "name": "root", **base},
        {"id": "b0", "traceId": "aa01", "parentId": "a0", "name": "mid", **base},
        {"id": "c2", "traceId": "aa01", "parentId": "c1", "name": "leaf", **base},
    ]
    # batch 2: c1 arrives with parent b0 -> c2's chain now reaches a0;
    # plus a second trace to prove trace scoping
    b2 = [
        {"id": "c1", "traceId": "aa01", "parentId": "b0", "name": "late", **base},
        {"id": "d0", "traceId": "bb02", "name": "other-root", **base},
        {"id": "d1", "traceId": "bb02", "parentId": "d0", "name": "other", **base},
    ]
    cat = Catalog(str(tmp_path / "store"))
    spans_fanout(_zipkin_batch(spark, b1), cat)
    spans_fanout(_zipkin_batch(spark, b2), cat)

    stored = {
        (r["trace_id"], r["span_id"], r["anc_id"])
        for r in cat.read(spark, "tempo_traces_anc").collect()
    }
    scratch_df = ancestors_from_spans(
        cat.read(spark, "tempo_traces").select(
            "trace_id", "span_id", "parent_id"
        ),
        8,
    )
    scratch = {
        (r["trace_id"], r["span_id"], r["anc_id"])
        for r in scratch_df.collect()
    }
    assert stored == scratch
    # the out-of-order chain resolved: c2 ->{c1, b0, a0}
    sid = lambda s: s.rjust(16, "0")
    tid = "aa01".rjust(32, "0")
    c2_anc = {a for (t, s, a) in stored if t == tid and s == sid("c2")}
    assert c2_anc == {sid("c1"), sid("b0"), sid("a0")}
    # anti-join kept the index lean: no duplicate pairs materialized
    rows = cat.read(spark, "tempo_traces_anc").count()
    assert rows == len(stored)


def test_store_traceql_ancestors_uses_index(spark, tmp_path):
    """StoreTraceQLContext.ancestors() reads the stored index when it
    exists (no closure build in the query path)."""
    from gigapipe_spark.storage.query import store_traceql_context

    base = {"timestamp": 1_700_000_000_000_000, "duration": 10,
            "localEndpoint": {"serviceName": "w"}}
    b = [
        {"id": "a0", "traceId": "aa01", "name": "root", **base},
        {"id": "b0", "traceId": "aa01", "parentId": "a0", "name": "mid", **base},
    ]
    cat = Catalog(str(tmp_path / "store"))
    spans_fanout(_zipkin_batch(spark, b), cat)
    ctx = store_traceql_context(spark, cat)
    anc = ctx.ancestors()
    # the plan is a bare index-table scan — a from-scratch closure
    # build would plan compose Joins/Unions
    plan = anc._jdf.queryExecution().optimizedPlan().toString()
    assert "Relation" in plan and "parquet" in plan
    assert "Join" not in plan and "Union" not in plan
    got = {(r["span_id"], r["anc_id"]) for r in anc.collect()}
    sid = lambda s: s.rjust(16, "0")
    assert got == {(sid("b0"), sid("a0"))}
