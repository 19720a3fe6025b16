"""Differential: the SAME pushes through the bulk buffer and through
the synchronous fan-out must produce IDENTICAL store contents (the
bulk machinery may change batching, never data). Covers group
coalescing, param keying, TTL threading, and every decoder's bulk
twin. Timestamp-carrying payloads only — receive-time stamps
legitimately differ between the paths."""

import json
import time
import urllib.request

import pytest

# soak/crash integration probes: slow tier (see pytest.ini)
pytestmark = pytest.mark.slow

T0 = 1_700_000_000_000_000_000


def _gateway(spark, root, bulk: bool):
    from gigapipe_spark.httpd import HttpGateway
    from gigapipe_spark.storage.query import StoreEngine
    from gigapipe_spark.storage.writer import Catalog

    cat = Catalog(root)
    eng = StoreEngine(spark, root, catalog=cat)
    gw = HttpGateway(eng, bulk_max_age_ms=100.0 if bulk else None)
    return gw, gw.start(), cat


def _push_all(base):
    def post(path, body, ctype="application/json", hdrs=None):
        req = urllib.request.Request(
            base + path, data=body, method="POST",
            headers={"Content-Type": ctype, **(hdrs or {})},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status

    for i in range(4):
        assert post("/loki/api/v1/push", json.dumps(
            {"streams": [{"stream": {"app": f"a{i % 2}"},
                          "values": [[str(T0 + i), f"eq line {i}"]]}]}
        ).encode()) == 204
    assert post("/loki/api/v1/push", json.dumps(
        {"streams": [{"stream": {"app": "ttl"},
                      "values": [[str(T0 + 99), "ttl line"]]}]}
    ).encode(), hdrs={"X-Ttl-Days": "7"}) == 204
    assert post(
        "/influx/write",
        f"cpu,host=h1 usage=0.5 {T0}\nmem,host=h1 used=7i {T0 + 1}\n".encode(),
        "text/plain",
    ) == 204
    # elastic _bulk is excluded: its rows are ALWAYS receive-time
    # stamped (the reference ingests docs at wall clock), so the two
    # paths legitimately differ there like the timestamp-less kinds
    spans = json.dumps([
        {"id": "b1", "traceId": "a1", "name": "root",
         "timestamp": T0 // 1000, "duration": 1500,
         "localEndpoint": {"serviceName": "web"}},
        {"id": "b2", "traceId": "a1", "parentId": "b1", "name": "child",
         "timestamp": T0 // 1000 + 10, "duration": 900,
         "localEndpoint": {"serviceName": "db"}},
    ])
    assert post("/tempo/spans", spans.encode()) == 202
    otlp = json.dumps({"resourceLogs": [{"scopeLogs": [{"logRecords": [
        {"timeUnixNano": str(T0 + 5),
         "body": {"stringValue": "otlp eq"}}]}]}]})
    assert post("/v1/logs", otlp.encode()) == 204


# fact tables compare RAW (every row must match); dimension tables are
# append-logs reconciled on read (sync writes one row per push-batch,
# bulk one per flush group — latest-wins/distinct semantics), so they
# compare through the same reconciliation the readers use
FACT_TABLES = ("samples", "tempo_traces", "tempo_traces_attrs_gin",
               "tempo_traces_anc")


def _snapshot(spark, cat):
    from pyspark.sql import functions as F

    out = {}
    for t in FACT_TABLES:
        df = cat.read(spark, t)
        cols = sorted(df.columns)
        out[t] = sorted(
            [tuple(str(v) for v in row) for row in
             df.select(*cols).collect()]
        )
    series = (
        cat.read(spark, "time_series")
        .groupBy("fingerprint", "type")
        .agg(F.max_by("labels", "updated_at_ns").alias("labels"),
             F.max("updated_at_ns").alias("updated_at_ns"),
             F.max("ttl_days").alias("ttl_days"))
    )
    out["time_series"] = sorted(
        [tuple(str(v) for v in row) for row in
         series.select(*sorted(series.columns)).collect()]
    )
    gin = cat.read(spark, "gin").select(
        "fingerprint", "type", "key", "val").distinct()
    out["gin"] = sorted(
        [tuple(str(v) for v in row) for row in gin.collect()]
    )
    return out


TABLES = FACT_TABLES + ("time_series", "gin")


def test_bulk_path_equals_sync_path(spark, tmp_path):
    gw_s, port_s, cat_s = _gateway(spark, str(tmp_path / "sync"), bulk=False)
    try:
        _push_all(f"http://127.0.0.1:{port_s}")
    finally:
        gw_s.stop()
    gw_b, port_b, cat_b = _gateway(spark, str(tmp_path / "bulk"), bulk=True)
    try:
        _push_all(f"http://127.0.0.1:{port_b}")
    finally:
        gw_b.stop()  # drains
    assert gw_b.bulk.errors == 0 and gw_b.bulk.dropped_payloads == 0
    snap_s, snap_b = _snapshot(spark, cat_s), _snapshot(spark, cat_b)
    for t in TABLES:
        assert snap_b[t] == snap_s[t], f"table {t} diverges"
    # sanity: the comparison actually covered data
    assert len(snap_s["samples"]) == 8  # 4+1 loki + 2 influx + 1 otlp
    assert len(snap_s["tempo_traces"]) == 2
