"""Regression tests for the round-6 driver ADVICE findings.

1. medium — StoreEngine._prof_frames must collapse the append-only
   profiles_series table to ONE row per fingerprint (its write-side
   dropDuplicates is per-batch only): a re-pushed series would multiply
   fact rows through the planners' per-fingerprint joins and double
   sums/series rows.
2. medium — push routes replying 204 must send headers only (no stray
   `{}` body): RFC clients don't read a body on 204, so leftover bytes
   desync the next response on an HTTP/1.1 keep-alive connection.
3. low — sim_ann_pq_exact must disable pq_fit's train_cap so the exact
   degenerate config stays exact beyond 65536 vectors.
4. low — loki_index_volume (legacy path) and prom_metadata join
   series_table per fingerprint: the store keeps one row per
   (fingerprint, type), so a mixed log+metric stream must not double
   the sums.
5. low — the WS tail loop must see a close frame already buffered in
   the handler's rfile (raw conn.recv bypassed the buffer) and parse
   full frames, not 2-byte peeks.
"""

import http.client
import json
import time

from gigapipe_spark.sources import ingest
from gigapipe_spark.storage.writer import Catalog, ingest_fanout

T0 = 1_700_000_000_000_000_000


def _folded(spark, pid, env):
    return spark.createDataFrame(
        [
            (pid, T0, "process_cpu", "api", "cpu", "nanoseconds",
             {"env": env}, 1_000_000, "main;handle 10"),
            (pid, T0, "process_cpu", "api", "cpu", "nanoseconds",
             {"env": env}, 1_000_000, "main;db 5"),
        ],
        "profile_id string, timestamp_ns long, type string,"
        " service_name string, period_type string, period_unit string,"
        " tags map<string,string>, duration_ns long, line string",
    )


def test_prof_frames_dedup_series_across_pushes(spark, tmp_path):
    """Two pushes of the SAME series (same label set → same fingerprint)
    must not double select_series values or duplicate series rows."""
    from gigapipe_spark.sources.ingest import folded_profiles_input
    from gigapipe_spark.storage.query import StoreEngine
    from gigapipe_spark.storage.writer import profiles_fanout

    cat = Catalog(str(tmp_path / "store"))
    # two separate fanout calls = two batches: the per-batch
    # dropDuplicates at write time cannot see across them
    profiles_fanout(
        folded_profiles_input(_folded(spark, "p1", "prod"), "cpu",
                              "nanoseconds").coalesce(1), cat)
    profiles_fanout(
        folded_profiles_input(_folded(spark, "p2", "prod"), "cpu",
                              "nanoseconds").coalesce(1), cat)

    eng = StoreEngine(spark, cat.root, catalog=cat)
    _, series, _ = eng._prof_frames()
    fps = [r["fingerprint"] for r in series.select("fingerprint").collect()]
    assert len(fps) == len(set(fps)) == 1

    # series endpoint: one label set, not two duplicate rows
    assert eng.pyroscope_series().count() == 1

    # select_series sums duration_ns per profile fact row: two profiles
    # × 1_000_000 — a dup-join would double it to 4_000_000
    rows = eng.pyroscope_select_series(
        '{env="prod"}', [], 60_000_000_000, agg="sum"
    ).collect()
    assert sum(r["value"] for r in rows) == 2_000_000.0


def test_http_keepalive_push_sequence(spark, tmp_path):
    """Two pushes + a query on ONE persistent HTTP/1.1 connection: a
    stray body on the 204 would desync the second response."""
    from gigapipe_spark.httpd import HttpGateway
    from gigapipe_spark.storage.query import StoreEngine

    root = str(tmp_path / "kastore")
    cat = Catalog(root)
    eng = StoreEngine(spark, root, catalog=cat)
    gw = HttpGateway(eng)
    port = gw.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        payload = json.dumps({
            "streams": [{"stream": {"app": "ka"},
                         "values": [[str(T0), "one"]]}]
        })
        for i in range(2):
            conn.request("POST", "/loki/api/v1/push", body=payload)
            r = conn.getresponse()
            assert r.status == 204
            assert r.read() == b""  # no body bytes on the wire
        conn.request(
            "GET", "/loki/api/v1/query_range?query=%7Bapp%3D%22ka%22%7D"
        )
        r = conn.getresponse()
        assert r.status == 200
        body = json.loads(r.read())
        assert body["status"] == "success"
        conn.close()
    finally:
        gw.stop()


def test_pq_exact_disables_train_cap(spark, monkeypatch):
    """sim_ann_pq_exact must pass train_cap=0 (every subvector a seed)."""
    from gigapipe_spark import registry
    from gigapipe_spark.datapipe import simsearch

    seen = {}
    real = simsearch.pq_topk

    def spy(*a, **kw):
        seen.update(kw)
        return real(*a, **kw)

    monkeypatch.setattr(simsearch, "pq_topk", spy)
    fn = registry.QUERIES["sim_ann_pq_exact"]
    fn(spark, "/root/testdata/sf0.001").limit(1).collect()
    assert seen.get("train_cap") == 0


def test_mixed_type_stream_volume_not_doubled(spark, tmp_path):
    """A stream ingested as both log and metric (same fingerprint, two
    series rows on the store) must not double legacy index/volume or
    prom metadata sums."""
    from gigapipe_spark.storage.query import StoreEngine

    payload = json.dumps({
        "streams": [{
            "stream": {"app": "web"},
            "values": [[str(T0), "hello"]],  # pair → LOG(1)
            "entries": [
                {"ts": str(T0 + 1_000_000_000), "value": 3.5},  # METRIC(2)
                {"ts": str(T0 + 2_000_000_000), "value": 4.5},
            ],
        }]
    })
    raw = spark.createDataFrame([(payload,)], "payload string")
    cat = Catalog(str(tmp_path / "mixstore"))
    ingest_fanout(ingest.loki_push(raw).coalesce(1), cat)

    eng = StoreEngine(spark, cat.root, catalog=cat)
    # sanity: the store really has two series rows for one fingerprint
    assert eng.series_table().count() == 2

    vol = {r["app"]: r["volume"]
           for r in eng.loki_index_volume(by="app").collect()}
    assert vol == {"web": len("hello")}

    # the base Engine's sample-count metadata path (StoreEngine
    # overrides prom_metadata with stored metadata, but the base join
    # still serves fixture engines and must not double on dup series)
    from gigapipe_spark.api import Engine

    md = {r["metric"]: r["samples"]
          for r in Engine.prom_metadata(eng).collect()}
    assert md == {"web": 2}


def test_ws_tail_sees_buffered_close_frame(spark, tmp_path):
    """Close frame sent immediately after the upgrade request (likely
    already sitting in the handler's buffered rfile when the tail loop
    starts) must terminate the tail promptly — the server closes the
    TCP connection."""
    import base64
    import hashlib
    import socket as socketlib

    from gigapipe_spark.httpd import _WS_MAGIC, HttpGateway
    from gigapipe_spark.storage.query import StoreEngine

    root = str(tmp_path / "wstore")
    cat = Catalog(root)
    eng = StoreEngine(spark, root, catalog=cat)
    payload = json.dumps({
        "streams": [{"stream": {"app": "wsc"},
                     "values": [[str(T0), "x"]]}]
    })
    raw = spark.createDataFrame([(payload,)], "payload string")
    ingest_fanout(ingest.loki_push(raw).coalesce(1), cat)
    gw = HttpGateway(eng)
    port = gw.start()
    try:
        s = socketlib.create_connection(("127.0.0.1", port), timeout=60)
        key = base64.b64encode(b"0123456789abcdef").decode()
        req = (
            f"GET /loki/api/v1/tail?query=%7Bapp%3D%22wsc%22%7D HTTP/1.1\r\n"
            f"Host: x\r\nConnection: Upgrade\r\nUpgrade: websocket\r\n"
            f"Sec-WebSocket-Key: {key}\r\n\r\n"
        ).encode()
        # upgrade request AND close frame in one segment: the close
        # frame lands in the handler's rfile buffer before the loop
        s.sendall(req + b"\x88\x80\x00\x00\x00\x00")
        accept = base64.b64encode(
            hashlib.sha1((key + _WS_MAGIC).encode()).digest()
        ).decode()
        deadline = time.time() + 60
        buf = b""
        while time.time() < deadline:
            chunk = s.recv(65536)
            if not chunk:
                break  # server closed — the loop saw the close frame
            buf += chunk
        else:
            raise AssertionError("tail loop ignored buffered close frame")
        assert accept.encode() in buf  # upgrade really happened
        s.close()
    finally:
        gw.stop()
