"""Datadog metrics + collapsed-stack profile ingestion."""

import json

from gigapipe_spark.sources import ingest


def test_datadog_metrics(spark):
    payload = json.dumps(
        {
            "series": [
                {
                    "metric": "system.cpu",
                    "host": "h1",
                    "tags": ["env:prod", "role:db"],
                    "points": [[1700000000, 0.5], [1700000060, 0.7]],
                },
                {"metric": "system.mem", "points": [[1700000000, 42.0]]},
            ]
        }
    )
    raw = spark.createDataFrame([(payload,)], "payload string")
    out = ingest.datadog_metrics(raw).collect()
    assert len(out) == 3
    cpu = [r for r in out if r["labels"]["__name__"] == "system.cpu"]
    assert len(cpu) == 2
    assert cpu[0]["labels"]["env"] == "prod"
    assert cpu[0]["type"] == 2
    assert {r["value"] for r in cpu} == {0.5, 0.7}
    assert cpu[0]["timestamp_ns"] % 1_000_000_000 == 0
    mem = [r for r in out if r["labels"]["__name__"] == "system.mem"][0]
    assert "host" not in mem["labels"]


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
