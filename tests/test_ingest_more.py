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
    assert "service" not in out[1]["labels"]  # nulls filtered


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
