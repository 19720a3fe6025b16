"""Service-composition soak (VERDICT r11 task 7).

`python -m gigapipe_spark` runs bulk flusher + rotate/compact loop +
query handler threads against ONE SparkSession; each piece is tested
alone, but this probe runs them TOGETHER under sustained concurrent
push+query load with a rotation tick mid-flight:

  - 2 push threads (Loki JSON log lines + influx metric lines) through
    the bulk buffer (BULK_MAX_AGE_MS=100)
  - 2 query threads (Loki query_range + Prometheus instant) polling the
    fresh window continuously
  - 1 label/meta thread (unbounded label values — cross-partition scan
    racing the rotate)
  - an old (2023) partition pushed up front; a maintenance tick fires
    mid-soak with SAMPLES_DAYS retention, dropping it while everything
    else is in flight

Asserts: no thread dies, every query answers 2xx, the rotate actually
removes the old partition, and after a clean shutdown (gw.stop drains
the bulk buffer) every acked push is queryable — acked == stored.

Usage: python scripts/soakprobe.py [seconds]   (default 120)
Prints one JSON verdict line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import threading
import time
import urllib.error
import urllib.parse
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_soak(spark, root: str, seconds: float) -> dict:
    from gigapipe_spark.__main__ import build_gateway, maintenance_tick

    cfg = {
        "store": root,
        "host": "127.0.0.1",
        "port": 0,
        "mode": "all",
        "basic_auth": None,
        "allow_origin": "*",
        "samples_days": 30,
        "rotate_interval_s": 3600.0,
        "compact": True,
        "refresh_interval_s": 10.0,
        "bulk_max_age_ms": 100.0,
        "bulk_max_size_bytes": 16 * 1024 * 1024,
    }
    gw = build_gateway(cfg, spark, port=0)
    port = gw.start()
    base = f"http://127.0.0.1:{port}"
    now_ns = time.time_ns()
    old_ns = 1_700_000_000_000_000_000  # 2023-11-14: rotated mid-soak

    def post(path, body, ctype="application/json"):
        req = urllib.request.Request(
            base + path, data=body, method="POST",
            headers={"Content-Type": ctype},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status

    def get(path):
        with urllib.request.urlopen(base + path, timeout=60) as r:
            return r.status, r.read()

    # seed the OLD partition the rotate will drop
    seed = json.dumps({"streams": [{"stream": {"app": "old"},
                       "values": [[str(old_ns), "old line"]]}]}).encode()
    assert post("/loki/api/v1/push", seed) == 204

    stop = threading.Event()
    stats = {"loki_acked": 0, "influx_acked": 0, "queries": 0,
             "meta": 0, "rejected_503": 0}
    errors: list[str] = []

    def guard(name, fn):
        def loop():
            while not stop.is_set():
                try:
                    fn()
                except Exception as ex:  # noqa: BLE001 — soak verdict
                    errors.append(f"{name}: {type(ex).__name__}: {ex}")
                    return
        t = threading.Thread(target=loop, daemon=True, name=name)
        t.start()
        return t

    def push_loki():
        i = stats["loki_acked"]
        body = json.dumps({"streams": [{
            "stream": {"app": f"soak{i % 5}"},
            "values": [[str(now_ns + i), f"soak line {i}"]],
        }]}).encode()
        try:
            if post("/loki/api/v1/push", body) == 204:
                stats["loki_acked"] += 1
        except urllib.error.HTTPError as ex:
            if ex.code == 503:
                stats["rejected_503"] += 1  # backpressure is a valid answer
            else:
                raise
        time.sleep(0.02)

    def push_influx():
        i = stats["influx_acked"]
        line = f"soakcpu,host=h{i % 3} value={i % 7} {now_ns + i}"
        try:
            if post("/influx/write", line.encode(), "text/plain") == 204:
                stats["influx_acked"] += 1
        except urllib.error.HTTPError as ex:
            if ex.code == 503:
                stats["rejected_503"] += 1
            else:
                raise
        time.sleep(0.05)

    q_sel = urllib.parse.quote('{app=~"soak.*"}')
    q_prom = urllib.parse.quote("soakcpu")

    def query_loki():
        st, body = get(
            f"/loki/api/v1/query_range?query={q_sel}"
            f"&start={now_ns - 10**9}&end={now_ns + 10**12}&limit=100"
        )
        assert st == 200, body[:200]
        stats["queries"] += 1
        time.sleep(0.2)

    def query_prom():
        st, body = get(
            f"/api/v1/query?query={q_prom}&time={(now_ns + 10**12) // 10**9}"
        )
        assert st == 200, body[:200]
        stats["queries"] += 1
        time.sleep(0.3)

    def query_meta():
        st, body = get(f"/loki/api/v1/label/app/values"
                       f"?start=0&end={now_ns + 10**12}")
        assert st == 200, body[:200]
        stats["meta"] += 1
        time.sleep(0.5)

    threads = [
        guard("push_loki", push_loki),
        guard("push_influx", push_influx),
        guard("query_loki", query_loki),
        guard("query_prom", query_prom),
        guard("query_meta", query_meta),
    ]

    # mid-soak rotation tick on the main thread
    time.sleep(seconds / 2)
    tick = maintenance_tick(spark, gw.engine.catalog, cfg)
    gw.engine.refresh()  # same-process reader must drop stale listings
    rotated_old = any("2023-11-14" in p for p in
                      (tick["rotated"] or {}).get("dropped", []))

    time.sleep(seconds / 2)
    stop.set()
    for t in threads:
        t.join(timeout=30)
    alive_after_join = [t.name for t in threads if t.is_alive()]
    bulk_errors = gw.bulk.errors if gw.bulk else 0
    dropped = gw.bulk.dropped_payloads if gw.bulk else 0
    gw.stop()  # drains the bulk buffer

    # post-drain: every acked push is stored
    from pyspark.sql import functions as F
    samples = gw.engine.catalog.read(spark, "samples")
    stored_loki = samples.filter(
        F.col("string").startswith("soak line")).count()
    stored_influx = samples.filter(F.col("string") == "").filter(
        F.col("timestamp_ns") >= now_ns).count()
    old_left = samples.filter(F.col("string") == "old line").count()

    verdict = {
        "seconds": seconds,
        "stats": stats,
        "thread_errors": errors,
        "threads_stuck": alive_after_join,
        "rotate_dropped_old": rotated_old,
        "old_rows_after_rotate": old_left,
        "bulk_flush_errors": bulk_errors,
        "bulk_dropped_payloads": dropped,
        "acked_loki": stats["loki_acked"],
        "stored_loki": stored_loki,
        "acked_influx": stats["influx_acked"],
        "stored_influx": stored_influx,
        "ok": (
            not errors
            and not alive_after_join
            and rotated_old
            and old_left == 0
            and bulk_errors == 0
            and stored_loki == stats["loki_acked"]
            and stored_influx == stats["influx_acked"]
            and stats["queries"] > 0
            and stats["meta"] > 0
        ),
    }
    return verdict


def main() -> None:
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 120.0
    from gigapipe_spark.session import get_spark

    spark = get_spark("soakprobe")
    root = tempfile.mkdtemp(prefix="soak_") + "/store"
    verdict = run_soak(spark, root, seconds)
    print(json.dumps(verdict), flush=True)
    sys.exit(0 if verdict["ok"] else 1)


if __name__ == "__main__":
    main()
