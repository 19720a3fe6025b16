"""Ingestion decoders + MV fan-out writer (ref: writer/utils/unmarshal/*,
writer/service/insert/*)."""

import json

from pyspark.sql import functions as F

from gigapipe_spark.sources import ingest
from gigapipe_spark.storage.writer import Catalog, ingest_fanout


def test_loki_push(spark):
    payload = json.dumps(
        {
            "streams": [
                {
                    "stream": {"app": "web", "env": "prod"},
                    "values": [
                        ["1700000000000000000", "GET /index 200"],
                        ["1700000001000000000", "GET /login 500"],
                    ],
                },
                {
                    "stream": {"app": "db"},
                    "values": [["1700000002000000000", "slow query 1.2s"]],
                },
            ]
        }
    )
    raw = spark.createDataFrame([(payload,)], "payload string")
    out = ingest.loki_push(raw).collect()
    assert len(out) == 3
    web = [r for r in out if r["labels"]["app"] == "web"]
    assert len(web) == 2
    assert web[0]["timestamp_ns"] == 1700000000000000000
    assert web[0]["string"] == "GET /index 200"
    assert web[0]["type"] == 1
    # same labels → same fingerprint; different labels → different
    assert web[0]["fingerprint"] == web[1]["fingerprint"]
    assert web[0]["fingerprint"] != out[2]["fingerprint"] or out[2]["labels"]["app"] == "web"


def test_influx_line(spark):
    lines = [
        ("cpu,host=h1,region=eu usage=0.55,idle=0.45 1700000000000000000",),
        ("mem,host=h1 used=1024i,note=\"skip\",up=true 1700000001000000000",),
        ("disk free=99.5 1700000002000000000",),
    ]
    raw = spark.createDataFrame(lines, "line string")
    out = ingest.influx_line(raw).collect()
    # reference shape (influx.go:54,75-90): measurement label + bare
    # field-key __name__; string/bool fields are skipped
    by_name = {
        (r["labels"]["measurement"], r["labels"]["__name__"]): r for r in out
    }
    assert set(by_name) == {
        ("cpu", "usage"), ("cpu", "idle"), ("mem", "used"), ("disk", "free")
    }
    cpu = by_name[("cpu", "usage")]
    assert cpu["value"] == 0.55
    assert cpu["labels"]["host"] == "h1" and cpu["labels"]["region"] == "eu"
    assert by_name[("mem", "used")]["value"] == 1024.0  # i-suffix integer
    disk = by_name[("disk", "free")]
    assert disk["labels"].get("host") is None
    assert disk["timestamp_ns"] == 1700000002000000000


def test_influx_line_message_logfmt(spark):
    """A `message` field turns the point into ONE log row
    (influx.go:62-73): bare message when it is the only field, logfmt
    with message first otherwise (getMessage:15-35)."""
    lines = [
        ('syslog,app=web message="boot ok" 1700000003000000000',),
        ('syslog,app=web message="multi field",sev=3i,ok=true 1700000004000000000',),
    ]
    raw = spark.createDataFrame(lines, "line string")
    out = ingest.influx_line(raw).orderBy("timestamp_ns").collect()
    assert len(out) == 2
    assert out[0]["string"] == "boot ok" and out[0]["type"] == 1
    assert out[1]["string"] == 'message="multi field" ok=true sev=3'
    assert out[1]["labels"]["measurement"] == "syslog"
    assert "__name__" not in out[1]["labels"]


def test_influx_line_precision(spark):
    """SetTimePrecision analog (influx.go:44): epoch timestamps scale by
    the precision query param."""
    raw = spark.createDataFrame([("cpu usage=1.0 1700000000",)], "line string")
    out = ingest.influx_line(raw, precision="s").collect()
    assert out[0]["timestamp_ns"] == 1700000000 * 10**9
    out_ms = ingest.influx_line(raw, precision="ms").collect()
    assert out_ms[0]["timestamp_ns"] == 1700000000 * 10**6


def test_elastic_bulk(spark):
    """elastic.go:56-137: the action line's labels govern following doc
    lines; docs are stored as the raw line; delete/update clear state."""
    body = "\n".join(
        [
            '{"index": {"_index": "logs", "_id": "7"}}',
            '{"message": "hello", "level": "info"}',
            '{"create": {"_index": "audit"}}',
            '{"message": "bye"}',
            '{"delete": {"_index": "logs", "_id": "9"}}',
            '{"orphan": "after delete, no state -> dropped"}',
        ]
    )
    raw = spark.createDataFrame([(body,)], "payload string")
    out = ingest.elastic_bulk(raw, now_ns=5).collect()
    assert len(out) == 2
    by_index = {r["labels"]["_index"]: r for r in out}
    hello = by_index["logs"]
    # the DOC line is stored verbatim; its fields are NOT labels
    assert hello["string"] == '{"message": "hello", "level": "info"}'
    assert "level" not in hello["labels"] and "message" not in hello["labels"]
    assert hello["labels"]["_id"] == "7"  # action string fields -> labels
    assert hello["labels"]["type"] == "elastic"
    assert hello["timestamp_ns"] == 5  # ingest-time stamp, not @timestamp
    assert by_index["audit"]["string"] == '{"message": "bye"}'


def test_elastic_bulk_target_and_orphans(spark):
    """Route target fills _index (and suppresses the action's own
    _index); doc lines before any action are dropped."""
    body = "\n".join(
        [
            '{"pre": "no action yet"}',
            '{"index": {"_index": "other", "_id": "1"}}',
            '{"m": "x"}',
        ]
    )
    raw = spark.createDataFrame([(body,)], "payload string")
    out = ingest.elastic_bulk(raw, target="routed").collect()
    assert len(out) == 1
    assert out[0]["labels"]["_index"] == "routed"
    assert out[0]["labels"]["_id"] == "1"


def test_zipkin_spans(spark):
    payload = json.dumps(
        [
            {
                "id": "b1", "traceId": "a1", "name": "get /",
                "timestamp": 1700000000000000, "duration": 1500,
                "localEndpoint": {"serviceName": "web"},
                "kind": "SERVER",
                "tags": {"http.path": "/", "otel.status_code": "ERROR"},
            },
            {
                "id": "b2", "traceId": "a1", "parentId": "b1", "name": "select",
                "timestamp": "1700000000000100", "duration": "900",  # string form
                "localEndpoint": {"serviceName": "db"},
            },
        ]
    )
    raw = spark.createDataFrame([(payload,)], "payload string")
    out = ingest.zipkin_spans(raw).orderBy("span_id").collect()
    assert len(out) == 2
    # ids normalize through decodeHexStr: left-padded lowercase hex
    assert out[0]["trace_id"] == "a1".rjust(32, "0")
    assert out[0]["span_id"] == "b1".rjust(16, "0")
    assert out[0]["parent_id"] == "" and out[1]["parent_id"] == "b1".rjust(16, "0")
    assert out[0]["timestamp_ns"] == 1700000000000000000  # µs → ns
    assert out[1]["duration_ns"] == 900000  # stringOrInt64: string accepted
    # span attrs collect the reference's key/val pairs (zipkin_json.go)
    a = out[0]["attrs"]
    assert a["kind"] == "server"  # lowercased
    assert a["http.path"] == "/"
    assert a["status"] == "error"  # otel.status_code → status mapping
    assert a["service.name"] == "web"
    assert a["local_endpoint_service_name"] == "web"


def test_zipkin_remote_endpoint_quirk(spark):
    """zipkin_json.go:120-127: remoteEndpoint's serviceName only replaces
    a non-empty local one; a span with ONLY a remoteEndpoint keeps ""."""
    payload = json.dumps(
        [
            {"id": "01", "traceId": "aa", "timestamp": 1, "duration": 1,
             "localEndpoint": {"serviceName": "loc"},
             "remoteEndpoint": {"serviceName": "rem"}},
            {"id": "02", "traceId": "aa", "timestamp": 1, "duration": 1,
             "remoteEndpoint": {"serviceName": "rem"}},
        ]
    )
    raw = spark.createDataFrame([(payload,)], "payload string")
    out = {r["span_id"][-2:]: r for r in ingest.zipkin_spans(raw).collect()}
    assert out["01"]["service_name"] == "rem"
    assert out["02"]["service_name"] == ""


def test_zipkin_invalid_hex_dropped(spark):
    payload = json.dumps(
        [{"id": "zz", "traceId": "a1", "timestamp": 1, "duration": 1}]
    )
    raw = spark.createDataFrame([(payload,)], "payload string")
    assert ingest.zipkin_spans(raw).count() == 0


def test_otlp_logs(spark):
    payload = json.dumps(
        {
            "resourceLogs": [
                {
                    "resource": {
                        "attributes": [
                            {"key": "service.name", "value": {"stringValue": "api"}}
                        ]
                    },
                    "scopeLogs": [
                        {
                            "logRecords": [
                                {
                                    "timeUnixNano": "1700000000000000000",
                                    "severityText": "ERROR",
                                    "body": {"stringValue": "boom"},
                                    "attributes": [
                                        {"key": "http.method", "value": {"stringValue": "GET"}}
                                    ],
                                }
                            ]
                        }
                    ],
                }
            ]
        }
    )
    raw = spark.createDataFrame([(payload,)], "payload string")
    out = ingest.otlp_logs(raw).collect()
    assert len(out) == 1
    r = out[0]
    assert r["string"] == "boom"
    # shared sanitize step (ref SanitizeKey, otlplogs.go:103): dots → _
    assert r["labels"]["service_name"] == "api"
    assert r["labels"]["http_method"] == "GET"
    assert "severity" not in r["labels"]
    assert r["labels"]["level"] == "ERROR"  # severity_text → level label


def test_otlp_logs_reference_semantics(spark):
    """otlplogs.go:22-101: scope attrs merge, AnyValue algebra, trace
    context labels, observed-time fallback."""
    payload = json.dumps(
        {
            "resourceLogs": [
                {
                    "resource": {
                        "attributes": [
                            {"key": "9bad.key", "value": {"intValue": "7"}}
                        ]
                    },
                    "scopeLogs": [
                        {
                            "scope": {
                                "attributes": [
                                    {"key": "lib", "value": {"stringValue": "sdk"}}
                                ]
                            },
                            "logRecords": [
                                {
                                    "observedTimeUnixNano": "1700000009000000000",
                                    "traceId": "0af7651916cd43dd8448eb211c80319c",
                                    "spanId": "b7ad6b7169203331",
                                    "body": {
                                        "kvlistValue": {
                                            "values": [
                                                {"key": "b", "value": {"boolValue": True}},
                                                {"key": "a", "value": {"doubleValue": 1.5}},
                                            ]
                                        }
                                    },
                                    "attributes": [
                                        {
                                            "key": "tags",
                                            "value": {
                                                "arrayValue": {
                                                    "values": [
                                                        {"intValue": "1"},
                                                        {"stringValue": "x"},
                                                    ]
                                                }
                                            },
                                        }
                                    ],
                                }
                            ],
                        }
                    ],
                }
            ]
        }
    )
    raw = spark.createDataFrame([(payload,)], "payload string")
    r = ingest.otlp_logs(raw).collect()[0]
    # SanitizeKey prefixes a leading digit (otlplogs.go:110-112)
    assert r["labels"]["_9bad_key"] == "7"
    assert r["labels"]["lib"] == "sdk"  # scope attrs merge
    assert r["labels"]["tags"] == '["1","x"]'  # array → JSON of strings
    assert r["labels"]["trace_id"] == "0af7651916cd43dd8448eb211c80319c"
    assert r["labels"]["span_id"] == "b7ad6b7169203331"
    assert "level" not in r["labels"]  # empty severity adds no label
    # kvlist body → sorted-key JSON object of stringified values
    assert r["string"] == '{"a":"1.5","b":"true"}'
    # timeUnixNano absent → observedTimeUnixNano
    assert r["timestamp_ns"] == 1700000009000000000


def test_ingest_fanout_roundtrip(spark, tmp_path):
    payload = json.dumps(
        {
            "streams": [
                {
                    "stream": {"app": "web"},
                    "values": [["1700000000000000000", "hello"]],
                }
            ]
        }
    )
    raw = spark.createDataFrame([(payload,)], "payload string")
    decoded = ingest.loki_push(raw)
    cat = Catalog(str(tmp_path / "store"))
    ingest_fanout(decoded, cat)
    ingest_fanout(decoded, cat)  # second batch appends
    samples = cat.read(spark, "samples")
    assert samples.count() == 2
    assert "date" in samples.columns  # partition column materialized
    series = cat.read_series(spark)
    assert series.count() == 1  # deduped on read
    gin = cat.read(spark, "gin")
    # service_name is discovered from the "app" candidate label on the
    # writer path (builder.go discoverServiceName) and indexed like any
    # other label
    assert {r["key"] for r in gin.select("key").distinct().collect()} == {
        "app",
        "service_name",
    }
    assert series.collect()[0]["labels"]["service_name"] == "web"
    # selector semi-join over the written store works end-to-end
    fp = series.collect()[0]["fingerprint"]
    assert samples.filter(F.col("fingerprint") == fp).count() == 2


def test_read_series_latest_labels_win_deterministic(spark, tmp_path):
    """ReplacingMergeTree contract: per fingerprint, the labels row from
    the LATEST date must win — deterministically, across >1 partition.
    (Regression: orderBy().dropDuplicates() did not guarantee this.)"""
    import datetime

    rows = []
    # one fingerprint, 8 dates, labels carry a version marker; spread
    # across many input partitions so the dedup runs through a shuffle
    for day in range(1, 9):
        rows.append(
            (
                datetime.date(2023, 11, day),
                12345,
                {"app": "web", "ver": f"v{day}"},
                "logs",
            )
        )
    df = spark.createDataFrame(
        rows, "date date, fingerprint long, labels map<string,string>, type string"
    ).repartition(8)
    df.write.mode("overwrite").partitionBy("date").parquet(
        str(tmp_path / "store" / "time_series")
    )
    cat = Catalog(str(tmp_path / "store"))
    for _ in range(3):  # stable across repeated evaluations
        got = cat.read_series(spark).collect()
        assert len(got) == 1
        assert got[0]["labels"]["ver"] == "v8"
        assert got[0]["date"] == datetime.date(2023, 11, 8)


def test_loki_push_all_reference_shapes(spark):
    """unmarshal.go:71-236: legacy `labels` string, `entries` objects with
    RFC3339/int-ns timestamps, numeric third `values` element, and the
    tp==3→0 type algebra."""
    payload = json.dumps(
        {
            "streams": [
                {
                    "stream": {"app": "web"},
                    "values": [
                        ["1700000000000000000", "hello"],
                        ["1700000000000000001", "both", 3.5],  # log+metric → 0
                        ["1700000000000000002"],  # ts only → type 0
                    ],
                },
                {
                    "labels": '{job="j1", env="pr\\"od"}',
                    "values": [["1700000000000000003", "legacy"]],
                },
                {
                    # stream and labels merge; labels pairs win
                    "stream": {"a": "1"},
                    "labels": '{a="2"}',
                    "values": [["1700000000000000004", "m"]],
                },
                {
                    "stream": {"x": "y"},
                    "entries": [
                        {"ts": "2021-12-26T16:00:06.944Z", "line": "iso"},
                        {"timestamp": "1700000000000000005", "value": 7.5},
                        {"ts": "bogus", "line": "dropped"},
                    ],
                },
            ]
        }
    )
    raw = spark.createDataFrame([(payload,)], "payload string")
    rows = {
        r["timestamp_ns"]: r for r in ingest.loki_push(raw).collect()
    }
    assert rows[1700000000000000000]["type"] == 1
    both = rows[1700000000000000001]
    assert (both["type"], both["value"], both["string"]) == (0, 3.5, "both")
    assert rows[1700000000000000002]["type"] == 0
    legacy = rows[1700000000000000003]
    assert legacy["labels"]["env"] == 'pr"od'  # strconv.Unquote escapes
    assert rows[1700000000000000004]["labels"]["a"] == "2"
    iso = rows[1640534406944000000]
    assert iso["string"] == "iso" and iso["type"] == 1
    metric_entry = rows[1700000000000000005]
    assert (metric_entry["type"], metric_entry["value"]) == (2, 7.5)
    assert len(rows) == 7  # the bogus-ts entry dropped
