"""Datadog metrics + collapsed-stack profile ingestion."""

import json

from gigapipe_spark.sources import ingest


def test_datadog_metrics(spark):
    # v2 shape (datadog_metrics_json.go): resources → resource{i+1}_{key}
    # labels, points as {timestamp, value} objects with loop-carried state
    # for missing fields.
    payload = json.dumps(
        {
            "series": [
                {
                    "metric": "system.cpu",
                    "resources": [{"name": "h1", "type": "host"}],
                    "tags": ["env:prod"],  # skipped by the decoder
                    "points": [
                        {"timestamp": 1700000000, "value": 0.5},
                        {"value": 0.7},  # ts carries from previous point
                        {"timestamp": 1700000060},  # value carries (0.7)
                    ],
                },
                {"metric": "system.mem",
                 "points": [{"timestamp": 1700000000, "value": 42.0}]},
            ]
        }
    )
    raw = spark.createDataFrame([(payload,)], "payload string")
    out = ingest.datadog_metrics(raw).collect()
    assert len(out) == 4
    cpu = sorted(
        (r for r in out if r["labels"]["__name__"] == "system.cpu"),
        key=lambda r: (r["timestamp_ns"], r["value"]),
    )
    assert [(r["timestamp_ns"], r["value"]) for r in cpu] == [
        (1700000000 * 10**9, 0.5),
        (1700000000 * 10**9, 0.7),
        (1700000060 * 10**9, 0.7),
    ]
    assert cpu[0]["labels"]["resource1_name"] == "h1"
    assert cpu[0]["labels"]["resource1_type"] == "host"
    assert "env" not in cpu[0]["labels"]  # tags are not parsed in v2
    assert cpu[0]["type"] == 2
    mem = [r for r in out if r["labels"]["__name__"] == "system.mem"][0]
    assert mem["value"] == 42.0


def test_datadog_metrics_point_state_defaults(spark):
    # Before any point sets them: ts ← now_ns param, value ← 0.0
    payload = json.dumps(
        {"series": [{"metric": "m", "points": [{}, {"timestamp": 5, "value": 1.5}]}]}
    )
    raw = spark.createDataFrame([(payload,)], "payload string")
    out = ingest.datadog_metrics(raw, now_ns=77).collect()
    got = sorted((r["timestamp_ns"], r["value"]) for r in out)
    assert got == [(77, 0.0), (5 * 10**9, 1.5)]


def test_collapsed_stacks(spark):
    lines = [
        (1, "main;compute;hash 10"),
        (1, "main;compute;sort 5"),
        (1, "main;io 3"),
        (2, "main;compute;hash 7"),
    ]
    raw = spark.createDataFrame(lines, "profile_id long, line string")
    out = ingest.collapsed_stacks(raw)
    p1 = {r["fn_name"]: r for r in out.filter("profile_id = 1").collect()}
    assert p1["main"]["total"] == 18 and p1["main"]["self"] == 0
    assert p1["compute"]["total"] == 15 and p1["compute"]["self"] == 0
    assert p1["hash"]["total"] == 10 and p1["hash"]["self"] == 10
    assert p1["io"]["total"] == 3 and p1["io"]["self"] == 3
    # parent chain: hash's parent is compute's id, compute's parent is main's
    assert p1["hash"]["parent"] == p1["compute"]["id"]
    assert p1["compute"]["parent"] == p1["main"]["id"]
    assert p1["main"]["parent"] == 0
    # node ids are stable across profiles (same path → same id)
    p2 = {r["fn_name"]: r for r in out.filter("profile_id = 2").collect()}
    assert p2["hash"]["id"] == p1["hash"]["id"]
    # merged across profiles: hash total = 17
    merged = (
        out.groupBy("id", "fn_name").sum("total").filter("fn_name = 'hash'").collect()
    )
    assert merged[0]["sum(total)"] == 17


def test_pyroscope_ingest_params():
    """go_pprof.go:98-120 name parse + binary_pprof.go:19 ns scaling."""
    from gigapipe_spark.sources.ingest import (
        parse_pyroscope_name,
        pyroscope_ingest_ns,
    )

    assert parse_pyroscope_name("api.cpu") == ("api.cpu", {})
    assert parse_pyroscope_name("api{env=prod,region=eu}") == (
        "api",
        {"env": "prod", "region": "eu"},
    )
    assert parse_pyroscope_name("api{}") == ("api", {})
    import pytest as _p

    with _p.raises(ValueError):
        parse_pyroscope_name("api{oddword}")
    # seconds / ms / µs / ns all normalize to ns
    assert pyroscope_ingest_ns(1700000000) == 1700000000 * 10**9
    assert pyroscope_ingest_ns(1700000000000) == 1700000000 * 10**9
    assert pyroscope_ingest_ns(1700000000000000000) == 1700000000 * 10**9
