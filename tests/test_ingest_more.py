"""Datadog + OTLP traces decoders and trace-by-id lookup."""

import json

from gigapipe_spark.sources import ingest
from gigapipe_spark.sources.oracle import with_spans
from gigapipe_spark.traceql.compiler import TraceQLContext, trace_by_id
from tests.conftest import SF_DIR
from tests.oracle_utils import assert_match


def test_datadog_logs(spark):
    payload = json.dumps(
        [
            {
                "message": "oom killed",
                "status": "error",
                "hostname": "h1",
                "service": "api",
                "ddsource": "k8s",
                "ddtags": "env:prod,team:core",
                "timestamp": 1700000000000,
            },
            {"message": "ok", "status": "info", "timestamp": 1700000001000},
        ]
    )
    raw = spark.createDataFrame([(payload,)], "payload string")
    out = ingest.datadog_logs(raw).orderBy("timestamp_ns").collect()
    assert len(out) == 2
    r = out[0]
    assert r["string"] == "oom killed"
    assert r["timestamp_ns"] == 1700000000000 * 1_000_000
    assert r["labels"]["env"] == "prod" and r["labels"]["team"] == "core"
    assert r["labels"]["service"] == "api"
    assert r["labels"]["type"] == "datadog"  # constant label, datadog_json.go:85
    assert "status" not in r["labels"]  # unknown keys are skipped
    assert "service" not in out[1]["labels"]  # empty fields filtered


def test_otlp_traces(spark):
    payload = json.dumps(
        {
            "resourceSpans": [
                {
                    "resource": {
                        "attributes": [
                            {"key": "service.name", "value": {"stringValue": "web"}}
                        ]
                    },
                    "scopeSpans": [
                        {
                            "spans": [
                                {
                                    "traceId": "t1", "spanId": "a", "name": "GET /",
                                    "startTimeUnixNano": "1700000000000000000",
                                    "endTimeUnixNano": "1700000000500000000",
                                },
                                {
                                    "traceId": "t1", "spanId": "b", "parentSpanId": "a",
                                    "name": "SELECT",
                                    "startTimeUnixNano": "1700000000100000000",
                                    "endTimeUnixNano": "1700000000200000000",
                                },
                            ]
                        }
                    ],
                }
            ]
        }
    )
    raw = spark.createDataFrame([(payload,)], "payload string")
    out = ingest.otlp_traces(raw).orderBy("span_id").collect()
    assert len(out) == 2
    assert out[0]["parent_id"] == "" and out[1]["parent_id"] == "a"
    assert out[0]["duration_ns"] == 500_000_000
    assert out[0]["service_name"] == "web"


def test_trace_by_id(spark):
    df = trace_by_id(TraceQLContext(spark, SF_DIR), "t1")
    assert_match(
        df.select("trace_id", "span_id", "parent_id", "name"),
        with_spans(
            "SELECT trace_id, span_id, parent_id, name FROM spans WHERE trace_id = 't1'"
        ),
        SF_DIR,
    )
    rows = df.collect()
    assert rows[0]["parent_id"] == ""  # root ordered first


def test_zipkin_ndjson(spark):
    body = (
        '{"traceId":"f9","id":"a1","name":"get","timestamp":1000,"duration":50}\n'
        '\n'
        '{"traceId":"f9","id":"a2","parentId":"a1","name":"db","timestamp":1200,"duration":20}\n'
    )
    raw = spark.createDataFrame([(body,)], "payload string")
    rows = ingest.zipkin_ndjson(raw).orderBy("span_id").collect()
    assert len(rows) == 2
    assert rows[0]["timestamp_ns"] == 1_000_000 and rows[0]["duration_ns"] == 50_000
    assert rows[1]["parent_id"] == "a1".rjust(16, "0")


def test_datadog_cf(spark):
    lines = [
        ('{"ScriptName":"GetLog","Outcome":"success","EventType":"fetch",'
         '"EventTimestampMs":3000}',),
        ('{"ActionType":"login","ActionResult":true,"When":9000000000}',),
        ("not json at all",),
    ]
    raw = spark.createDataFrame(lines, "line string")
    rows = ingest.datadog_cf(raw).orderBy("timestamp_ns").collect()
    assert len(rows) == 3  # unparseable line still yields a (label-less) row
    assert rows[1]["labels"]["ScriptName"] == "GetLog"
    assert rows[1]["timestamp_ns"] == 3_000_000_000
    assert rows[2]["labels"]["ActionResult"] == "true"
    assert rows[2]["timestamp_ns"] == 9_000_000_000
    assert rows[2]["labels"]["ActionType"] == "login"


def test_merge_folded(spark):
    from gigapipe_spark.prof.tree import merge_folded

    folded = spark.createDataFrame(
        [("p1", "main;foo", 5), ("p2", "main;foo", 7), ("p2", "main;bar", 1)],
        "profile_id string, stack string, value long",
    )
    merged = {r["stack"]: r for r in merge_folded(folded).collect()}
    assert merged["main;foo"]["value"] == 12 and merged["main;foo"]["n_merged"] == 2
    assert merged["main;bar"]["value"] == 1
    per_prof = merge_folded(folded, by_profile=True).collect()
    assert len(per_prof) == 3
