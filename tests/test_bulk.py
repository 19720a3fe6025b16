"""Bulk ingest buffer (bulk.py) — the reference writer's BULK_MAX_AGE_MS
batching: push routes ack on enqueue, a flusher coalesces each window
into one decode + one journaled fan-out per (kind, params) group."""

import json
import os
import time
import urllib.request

import pytest

T0 = 1_700_000_000_000_000_000


@pytest.fixture()
def bulk_gateway(spark, tmp_path):
    from gigapipe_spark.httpd import HttpGateway
    from gigapipe_spark.storage.query import StoreEngine
    from gigapipe_spark.storage.writer import Catalog

    root = str(tmp_path / "store")
    cat = Catalog(root)
    eng = StoreEngine(spark, root, catalog=cat)
    gw = HttpGateway(eng, bulk_max_age_ms=150.0)
    port = gw.start()
    yield gw, f"http://127.0.0.1:{port}", cat
    gw.stop()


def _post(base, path, body: bytes, ctype="application/json"):
    req = urllib.request.Request(
        base + path, data=body, method="POST",
        headers={"Content-Type": ctype},
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        return r.status


def _loki(i):
    return json.dumps(
        {"streams": [{"stream": {"app": f"a{i % 3}"},
                      "values": [[str(T0 + i), f"line {i}"]]}]}
    ).encode()


def test_bulk_coalesces_pushes_into_one_fanout(spark, bulk_gateway):
    """N pushes inside one age window land as ONE journaled batch (one
    parquet file per partition), and every row is queryable after the
    flush."""
    gw, base, cat = bulk_gateway
    n = 12
    t0 = time.monotonic()
    for i in range(n):
        assert _post(base, "/loki/api/v1/push", _loki(i)) == 204
    enqueue_s = time.monotonic() - t0
    # acks are enqueue-speed (no Spark job in the request path)
    assert enqueue_s < 5.0
    deadline = time.monotonic() + 60
    while time.monotonic() < deadline:
        if gw.bulk.flushes >= 1 and not gw.bulk._buf:
            break
        time.sleep(0.1)
    assert gw.bulk.errors == 0
    assert cat.read(spark, "samples").count() == n
    part = os.path.join(cat.path("samples"), "oid=0", "date=2023-11-14")
    files = [f for f in os.listdir(part) if f.endswith(".parquet")]
    # 12 pushes fell into at most a couple of flush windows — far fewer
    # fan-outs than pushes (each fan-out writes one file per partition)
    assert len(files) <= 3, files


def test_bulk_groups_by_params_and_kind(spark, bulk_gateway):
    """Different route kinds and different elastic targets flush as
    separate groups but within the same cycles; rows end up correctly
    attributed."""
    gw, base, cat = bulk_gateway
    doc = json.dumps({"index": {}}) + "\n" + json.dumps(
        {"@timestamp": "2023-11-14T22:13:20Z", "message": "hello"}
    ) + "\n"
    assert _post(base, "/es1/_bulk", doc.encode(), "application/x-ndjson") == 200
    assert _post(base, "/es2/_bulk", doc.encode(), "application/x-ndjson") == 200
    assert _post(base, "/loki/api/v1/push", _loki(0)) == 204
    deadline = time.monotonic() + 60
    while time.monotonic() < deadline:
        if not gw.bulk._buf and gw.bulk.flushes >= 1:
            break
        time.sleep(0.1)
    assert gw.bulk.errors == 0
    series = cat.read_series(spark)
    import pyspark.sql.functions as F

    targets = {
        r[0]
        for r in series.select(F.col("labels")["_index"]).collect()
        if r[0] is not None
    }
    assert targets == {"es1", "es2"}  # params kept the groups apart
    assert cat.read(spark, "samples").count() == 3


def test_bulk_stop_drains_pending(spark, tmp_path):
    """Gateway stop() flushes acked-but-unflushed pushes before exit —
    a graceful shutdown loses nothing."""
    from gigapipe_spark.httpd import HttpGateway
    from gigapipe_spark.storage.query import StoreEngine
    from gigapipe_spark.storage.writer import Catalog

    root = str(tmp_path / "store")
    cat = Catalog(root)
    eng = StoreEngine(spark, root, catalog=cat)
    gw = HttpGateway(eng, bulk_max_age_ms=60_000.0)  # window >> test
    port = gw.start()
    base = f"http://127.0.0.1:{port}"
    for i in range(3):
        assert _post(base, "/loki/api/v1/push", _loki(i)) == 204
    gw.stop()  # drain happens here, not on a timer
    assert cat.read(spark, "samples").count() == 3


def test_bulk_bad_group_does_not_poison_others(spark, bulk_gateway):
    """A whole-group decode failure is counted and logged; the other
    groups in the same cycle still flush."""
    gw, base, cat = bulk_gateway
    # remote-write with garbage bytes: the snappy/proto decode of the
    # GROUP raises; loki in the same window must still land
    assert _post(base, "/api/prom/push", b"\x00garbage",
                 "application/x-protobuf") == 204
    assert _post(base, "/loki/api/v1/push", _loki(1)) == 204
    deadline = time.monotonic() + 60
    while time.monotonic() < deadline:
        if not gw.bulk._buf and gw.bulk.flushes >= 1:
            break
        time.sleep(0.1)
    assert cat.read(spark, "samples").count() >= 1


def test_async_insert_false_forces_sync(spark, bulk_gateway):
    """X-Async-Insert: false routes one request through the synchronous
    fan-out even with bulk configured (middleware.go getAsyncMode
    INSERT_MODE_SYNC) — the row is queryable the moment the ack lands."""
    gw, base, cat = bulk_gateway
    req = urllib.request.Request(
        base + "/loki/api/v1/push", data=_loki(7), method="POST",
        headers={"X-Async-Insert": "false"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.status == 204
    # no flush wait: the synchronous path already wrote it
    assert cat.read(spark, "samples").count() == 1


def test_metrics_exposes_bulk_counters(bulk_gateway):
    """/metrics grows the bulk flush/error/queue series when bulk is
    configured — observability for the new async window."""
    gw, base, cat = bulk_gateway
    with urllib.request.urlopen(base + "/metrics", timeout=60) as r:
        text = r.read().decode()
    assert "bulk_flush_cycles_total" in text
    assert "bulk_queue_bytes" in text
