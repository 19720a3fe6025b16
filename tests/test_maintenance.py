"""Retention / tiering / settings (storage.maintenance) — the ctrl-plane
rotate analog: whole-partition drops, tier moves, latest-wins settings."""

import json
import os
from datetime import date

from pyspark.sql import functions as F

from gigapipe_spark.sources import ingest
from gigapipe_spark.storage.maintenance import (
    RotatePolicy,
    get_setting,
    put_setting,
    read_tiered,
    rotate,
    tier_root,
)
from gigapipe_spark.storage.writer import Catalog, ingest_fanout


def _day_ns(d: str) -> int:
    from datetime import datetime, timezone

    return int(datetime.fromisoformat(d + "T12:00:00+00:00").timestamp()) * 10**9


def _store(spark, tmp_path, days):
    """A catalog with one loki batch per day in `days`."""
    cat = Catalog(str(tmp_path / "store"))
    for d in days:
        payload = json.dumps(
            {
                "streams": [
                    {"stream": {"app": "web"}, "values": [[str(_day_ns(d)), f"line {d}"]]}
                ]
            }
        )
        decoded = ingest.loki_push(spark.createDataFrame([(payload,)], "payload string"))
        ingest_fanout(decoded, cat)
    return cat


def test_rotate_drops_and_moves_whole_partitions(spark, tmp_path):
    days = ["2026-01-01", "2026-02-01", "2026-02-10", "2026-03-01"]
    cat = _store(spark, tmp_path, days)
    today = date.fromisoformat("2026-03-02")
    res = rotate(
        spark,
        cat,
        drop_days=45,  # 2026-01-01 (60d) is gone
        policies=(RotatePolicy(ttl_days=14, move_to="cold"),),  # 02-01 + 02-20 → cold
        today=today,
    )
    assert len(res["dropped"]) == 3  # one partition per table
    assert all("date=2026-01-01" in p for p in res["dropped"])
    assert len(res["moved"]) == 6  # two dates × three tables
    hot_dates = {
        r["date"].isoformat() for r in cat.read(spark, "samples").select("date").collect()
    }
    assert hot_dates == {"2026-03-01"}
    cold = spark.read.parquet(os.path.join(tier_root(cat, "cold"), "samples"))
    assert cold.count() == 2  # the two moved days' rows


def test_read_tiered_spans_hot_and_cold(spark, tmp_path):
    cat = _store(spark, tmp_path, ["2026-02-01", "2026-03-01"])
    rotate(
        spark,
        cat,
        drop_days=365,
        policies=(RotatePolicy(ttl_days=14, move_to="cold"),),
        today=date.fromisoformat("2026-03-02"),
    )
    merged = read_tiered(spark, cat, "samples", tiers=("cold",))
    assert merged.count() == 2  # both rows visible across roots
    # partition pruning still applies per root: the date column survived
    assert merged.filter(F.col("date") == "2026-03-01").count() == 1


def test_rotate_policy_unchanged_is_noop(spark, tmp_path):
    cat = _store(spark, tmp_path, ["2026-03-01"])
    today = date.fromisoformat("2026-03-02")
    first = rotate(spark, cat, drop_days=45, today=today)
    assert first["skipped"] == []
    again = rotate(spark, cat, drop_days=45, today=today)
    assert again == {"dropped": [], "moved": [], "skipped": ["policy unchanged"]}
    # a policy CHANGE re-runs the walk
    changed = rotate(spark, cat, drop_days=30, today=today)
    assert changed["skipped"] == []


def test_settings_latest_wins(spark, tmp_path):
    cat = Catalog(str(tmp_path / "store"))
    assert get_setting(spark, cat, "rotate", "policy") is None
    put_setting(spark, cat, "rotate", "policy", "v1")
    put_setting(spark, cat, "rotate", "policy", "v2")
    put_setting(spark, cat, "other", "policy", "x")  # different fp, no clash
    assert get_setting(spark, cat, "rotate", "policy") == "v2"
    assert get_setting(spark, cat, "other", "policy") == "x"


def test_compact_merges_small_files_and_restores_sort(spark, tmp_path):
    from gigapipe_spark.storage.maintenance import compact

    cat = _store(spark, tmp_path, ["2026-03-01"] * 4)  # 4 appended batches
    part = os.path.join(cat.path("samples"), "oid=0", "date=2026-03-01")
    before = [f for f in os.listdir(part) if f.endswith(".parquet")]
    assert len(before) >= 4  # one file per append at least
    done = compact(spark, cat, "samples", target_files_per_partition=1)
    assert done == {"2026-03-01": len(before)}
    after = [f for f in os.listdir(part) if f.endswith(".parquet")]
    assert len(after) == 1
    rows = spark.read.parquet(part).collect()
    assert len(rows) == 4  # nothing lost
    keys = [(r.fingerprint, r.timestamp_ns) for r in rows]
    assert keys == sorted(keys)  # in-file sort restored
    # idempotent: a second run is a no-op
    assert compact(spark, cat, "samples", target_files_per_partition=1) == {}


def test_compact_codec_rewrite_records_setting(spark, tmp_path):
    from gigapipe_spark.storage.maintenance import compact

    cat = _store(spark, tmp_path, ["2026-03-01"] * 2)
    compact(spark, cat, "samples", target_files_per_partition=1, codec="zstd")
    assert get_setting(spark, cat, "codec", "samples") == "zstd"
    part = os.path.join(cat.path("samples"), "oid=0", "date=2026-03-01")
    assert any(".zstd." in f for f in os.listdir(part))


def test_partition_walk_skips_crash_leftovers(spark, tmp_path):
    """An interrupted compact() leaves .compact_tmp/.compact_old dirs;
    rotate/compact must skip them instead of failing on date parse."""
    from gigapipe_spark.storage.maintenance import compact, rotate

    cat = _store(spark, tmp_path, ["2026-03-01"] * 2)
    part = os.path.join(cat.path("samples"), "oid=0", "date=2026-03-01")
    os.makedirs(part + ".compact_tmp")  # simulated crash leftover
    res = rotate(spark, cat, drop_days=365, today=date.fromisoformat("2026-03-02"))
    assert res["dropped"] == []
    done = compact(spark, cat, "samples", target_files_per_partition=1)
    assert done == {"2026-03-01": 2}


def test_rotate_trace_tables(spark, tmp_path):
    """TTL rotation applies uniformly to the trace MV tables (the
    reference attaches the same TTL clause per table, rotate.go)."""
    import datetime
    import json

    from gigapipe_spark.sources import ingest
    from gigapipe_spark.storage.maintenance import rotate
    from gigapipe_spark.storage.writer import Catalog, spans_fanout

    cat = Catalog(str(tmp_path / "store"))
    old_day = datetime.datetime(2020, 1, 1, tzinfo=datetime.timezone.utc)
    new_day = datetime.datetime(2023, 11, 1, tzinfo=datetime.timezone.utc)
    for i, day in enumerate((old_day, new_day)):
        ts_us = int(day.timestamp()) * 10**6
        payload = json.dumps(
            [{"id": f"b{i}", "traceId": "a1", "name": "s",
              "timestamp": ts_us, "duration": 5,
              "localEndpoint": {"serviceName": "w"}}]
        )
        spans_fanout(
            ingest.zipkin_spans(
                spark.createDataFrame([(payload,)], "payload string")
            ),
            cat,
        )
    assert cat.read(spark, "tempo_traces").count() == 2
    rotate(
        spark, cat, drop_days=365,
        today=datetime.date(2023, 11, 2),
        tables=("tempo_traces", "tempo_traces_attrs_gin", "tempo_traces_kv",
                "tempo_traces_attr_map"),
    )
    remaining = cat.read(spark, "tempo_traces").collect()
    assert len(remaining) == 1 and remaining[0]["date"].year == 2023
    assert cat.read(spark, "tempo_traces_attrs_gin").filter(
        "date < '2021-01-01'"
    ).count() == 0


def test_heal_compact_torn_swap_restores_partition(spark, tmp_path):
    """A kill between compact()'s two renames leaves the partition only
    in `.compact_old` — invisible to every reader. Healing must rename
    it back (and drop the tmp); a completed swap's leftover old dir is
    finished off instead."""
    import shutil

    from gigapipe_spark.storage.maintenance import heal_compact_leftovers

    cat = _store(spark, tmp_path, ["2026-03-01", "2026-03-02"])
    p1 = os.path.join(cat.path("samples"), "oid=0", "date=2026-03-01")
    p2 = os.path.join(cat.path("samples"), "oid=0", "date=2026-03-02")
    # torn swap on p1: old moved aside, tmp present, live missing
    os.rename(p1, p1 + ".compact_old")
    shutil.copytree(p1 + ".compact_old", p1 + ".compact_tmp")
    # completed swap on p2: live present, old leftover not yet deleted
    shutil.copytree(p2, p2 + ".compact_old")
    healed = heal_compact_leftovers(cat.root)
    assert healed == [p1]
    assert os.path.isdir(p1) and not os.path.isdir(p1 + ".compact_tmp")
    assert not os.path.isdir(p1 + ".compact_old")
    assert os.path.isdir(p2) and not os.path.isdir(p2 + ".compact_old")
    assert cat.read(spark, "samples").count() == 2  # nothing lost


def test_compact_heals_torn_swap_before_rewriting(spark, tmp_path):
    """compact() on a store with a torn swap restores the partition
    first, then compacts it — no silent disappearance."""
    from gigapipe_spark.storage.maintenance import compact

    cat = _store(spark, tmp_path, ["2026-03-01"] * 3)
    part = os.path.join(cat.path("samples"), "oid=0", "date=2026-03-01")
    os.rename(part, part + ".compact_old")  # torn mid-swap
    done = compact(spark, cat, "samples", target_files_per_partition=1)
    assert done == {"2026-03-01": 3}
    assert spark.read.parquet(part).count() == 3


def test_compact_runs_journal_repair_first(spark, tmp_path):
    """A crashed writer's half-applied batch (journal entry pending)
    must be rolled back BEFORE compaction merges its partial files into
    a new file that repair could only remove wholesale (losing the
    pre-batch rows with it)."""
    import shutil

    from gigapipe_spark.storage import journal
    from gigapipe_spark.storage import writer as w
    from gigapipe_spark.storage.maintenance import compact

    cat = _store(spark, tmp_path, ["2026-03-01"] * 2)
    part = os.path.join(cat.path("samples"), "oid=0", "date=2026-03-01")
    # simulate a crashed fan-out from a previous writer process:
    # journal entry snapshots the 2-file state, then a partial file lands
    j = journal.BatchJournal(cat.root, "0", ("samples",), ["2026-03-01"])
    j.begin()
    src = next(f for f in os.listdir(part) if f.endswith(".parquet"))
    shutil.copy(
        os.path.join(part, src), os.path.join(part, "part-partial.parquet")
    )
    assert len([f for f in os.listdir(part) if f.endswith(".parquet")]) == 3
    # previous writer "died": drop our process's flock so the next
    # maintenance call re-acquires it (which runs repair)
    w.release_store_process_lock(cat.root)
    done = compact(spark, cat, "samples", target_files_per_partition=1)
    assert done == {"2026-03-01": 2}  # repair removed the partial file first
    assert spark.read.parquet(part).count() == 2
    # no pending batch entries left (the mutation-seq / maint-marker
    # snapshot plumbing may legitimately live in _journal)
    assert not [
        n
        for n in os.listdir(os.path.join(cat.root, "_journal"))
        if n.endswith(".json")
    ]


def test_fully_rotated_table_still_answers_queries(spark, tmp_path):
    """Retention that empties a table entirely (every partition aged
    out) must leave it queryable with zero rows — the reference's empty
    ClickHouse table answers, it doesn't 500. rotate() captures a
    schema sidecar before dropping the last partition; Catalog.read
    falls back to it when parquet inference has nothing left."""
    from gigapipe_spark.storage.query import StoreEngine

    cat = _store(spark, tmp_path, ["2023-11-14"])
    rotate(
        spark, cat, drop_days=7,
        tables=("samples", "time_series", "gin", "patterns", "metrics_15s"),
        today=date.fromisoformat("2026-08-16"),
    )
    # partitions are gone, dirs remain
    assert os.path.isdir(cat.path("time_series"))
    assert cat.read(spark, "time_series").count() == 0
    assert cat.read(spark, "samples").columns  # schema survived
    eng = StoreEngine(spark, cat.root, catalog=cat)
    assert eng.loki_labels().count() == 0  # the live-service repro


def test_read_tiered_survives_fully_moved_hot_root(spark, tmp_path):
    """A policy that tiers EVERY hot partition leaves the hot root with
    only _SUCCESS; read_tiered must still union the tier copies (and a
    sidecar-backed empty hot root alone must read as zero rows)."""
    cat = _store(spark, tmp_path, ["2026-01-01", "2026-01-05"])
    rotate(
        spark, cat, drop_days=3650,
        policies=(RotatePolicy(ttl_days=1, move_to="cold"),),
        today=date.fromisoformat("2026-03-02"),
    )
    assert read_tiered(spark, cat, "samples", tiers=("cold",)).count() == 2
    assert read_tiered(spark, cat, "samples").count() == 0  # hot only


def test_rotate_covers_rollup_table(spark, tmp_path):
    """metrics_15s is date-partitioned and journaled like the fact
    tables — retention must expire its cells with their samples (the
    reference's TTL clause covers the rollup MV too, log.sql:83-107).
    Ingest a metric line so the rollup leg writes, then rotate."""
    from gigapipe_spark.storage.maintenance import ALL_TABLES

    assert "metrics_15s" in ALL_TABLES
    cat = Catalog(str(tmp_path / "store"))
    payload = json.dumps(
        {"streams": [{"stream": {"app": "m"},
                      "values": [[str(_day_ns("2023-11-14")), "v", 1.5]]}]}
    )
    decoded = ingest.loki_push(
        spark.createDataFrame([(payload,)], "payload string")
    )
    ingest_fanout(decoded, cat)
    assert cat.read(spark, "metrics_15s").count() > 0
    rotate(spark, cat, drop_days=7, tables=ALL_TABLES,
           today=date.fromisoformat("2026-08-16"))
    assert cat.read(spark, "metrics_15s").count() == 0  # sidecar-backed


def test_rotate_tier_move_overwrites_partial_dest(spark, tmp_path):
    """A crashed cross-filesystem tier move leaves a partial copy at
    dest+'.tier_tmp' while the hot partition survives intact (the hot
    copy is never touched before the atomic rename); re-running rotate
    must drop the partial tmp and complete the move — no nesting, no
    garbage files surviving into dest."""
    cat = _store(spark, tmp_path, ["2026-01-01"])
    src = os.path.join(cat.path("samples"), "oid=0", "date=2026-01-01")
    dest = os.path.join(tier_root(cat, "cold"), "samples", "oid=0",
                        "date=2026-01-01")
    tmp = dest + ".tier_tmp"
    os.makedirs(tmp)  # simulated partial copy from a crashed move
    with open(os.path.join(tmp, "part-partial.parquet"), "wb") as fh:
        fh.write(b"garbage")
    rotate(
        spark, cat, drop_days=3650,
        policies=(RotatePolicy(ttl_days=1, move_to="cold"),),
        today=date.fromisoformat("2026-03-02"),
    )
    assert not os.path.isdir(src)
    assert not os.path.isdir(tmp)
    assert not os.path.isdir(os.path.join(dest, "date=2026-01-01"))  # no nesting
    assert read_tiered(spark, cat, "samples", tiers=("cold",)).count() == 1


def test_rotate_merges_late_arrivals_into_completed_tier_move(spark, tmp_path):
    """The round-11 data-loss window: rotate tiers a day, then a
    backfill push with old timestamps RE-CREATES the hot date
    partition. The next rotate used to rmtree the completed dest
    (assuming it was a torn copy) and replace it with only the late
    rows — silently dropping the already-tiered committed data. Now
    dest exists ⟺ move completed, and late arrivals MERGE in."""
    cat = _store(spark, tmp_path, ["2026-01-01"])
    pol = (RotatePolicy(ttl_days=14, move_to="cold"),)
    today = date.fromisoformat("2026-03-02")
    rotate(spark, cat, drop_days=3650, policies=pol, today=today)
    cold = os.path.join(tier_root(cat, "cold"), "samples")
    assert spark.read.parquet(cold).count() == 1  # day fully tiered
    # late-arriving backfill push recreates the hot date=2026-01-01
    # partition with a DIFFERENT row (new line text → new file)
    payload = json.dumps(
        {"streams": [{"stream": {"app": "late"},
                      "values": [[str(_day_ns("2026-01-01")), "late row"]]}]}
    )
    decoded = ingest.loki_push(
        spark.createDataFrame([(payload,)], "payload string"))
    ingest_fanout(decoded, cat)
    res = rotate(spark, cat, drop_days=3650, policies=pol, today=today)
    assert res["skipped"] == []  # expired partitions force the walk
    merged = read_tiered(spark, cat, "samples", tiers=("cold",))
    lines = {r["string"] for r in merged.select("string").collect()}
    assert lines == {"line 2026-01-01", "late row"}  # BOTH survive
    assert merged.count() == 2
    src = os.path.join(cat.path("samples"), "oid=0", "date=2026-01-01")
    assert not os.path.isdir(src)  # hot copy consumed by the merge


def test_rotate_tier_move_rerun_after_source_delete_crash(spark, tmp_path):
    """Crash window: dest landed via the atomic rename but the hot
    partition's delete was interrupted — the hot leftover holds the
    very files already in dest. Re-running rotate must absorb it
    without duplicating rows (same part filename ⇒ same file)."""
    import shutil as _sh

    cat = _store(spark, tmp_path, ["2026-01-01"])
    src = os.path.join(cat.path("samples"), "oid=0", "date=2026-01-01")
    dest = os.path.join(tier_root(cat, "cold"), "samples", "oid=0",
                        "date=2026-01-01")
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    _sh.copytree(src, dest)  # simulate: rename done, rmtree(src) torn
    rotate(
        spark, cat, drop_days=3650,
        policies=(RotatePolicy(ttl_days=1, move_to="cold"),),
        today=date.fromisoformat("2026-03-02"),
    )
    assert not os.path.isdir(src)
    assert read_tiered(spark, cat, "samples", tiers=("cold",)).count() == 1


def test_tier_move_cross_filesystem_branch(spark, tmp_path, monkeypatch):
    """The EXDEV fallback (the actual TO DISK case): os.rename refuses,
    so the move runs copytree → atomic rename → delete-hot. Simulated
    by making the first direct rename raise EXDEV; the tmp dir must not
    survive and the data must read back from the tier."""
    import errno
    import os as _os

    from gigapipe_spark.storage import maintenance as m

    cat = _store(spark, tmp_path, ["2026-01-01"])
    src = os.path.join(cat.path("samples"), "oid=0", "date=2026-01-01")
    dest = os.path.join(tier_root(cat, "cold"), "samples", "oid=0",
                        "date=2026-01-01")
    real_rename = _os.rename

    def exdev_rename(a, b):
        if a == src and b == dest:  # only the direct same-fs shortcut
            raise OSError(errno.EXDEV, "cross-device link")
        return real_rename(a, b)

    monkeypatch.setattr(m.os, "rename", exdev_rename)
    m._tier_move(src, dest)
    assert not os.path.isdir(src)
    assert not os.path.isdir(dest + ".tier_tmp")
    assert os.path.isdir(dest)
    assert read_tiered(spark, cat, "samples", tiers=("cold",)).count() == 1


def test_tier_move_merge_file_copy_is_crash_safe(spark, tmp_path):
    """ADVICE r12: the merge branch used shutil.move per file, which
    cross-filesystem is copy2+unlink — a crash mid-copy left a PARTIAL
    dst that the next re-run's dest-exists check then kept as the
    tiered truth while deleting the intact hot copy. Now each file
    copies to dst+'.tier_tmp' and renames into place, so a torn
    per-file tmp is discarded and the hot file recopied whole."""
    from gigapipe_spark.storage import maintenance as m

    cat = _store(spark, tmp_path, ["2026-01-01"])
    src = os.path.join(cat.path("samples"), "oid=0", "date=2026-01-01")
    dest = os.path.join(tier_root(cat, "cold"), "samples", "oid=0",
                        "date=2026-01-01")
    os.makedirs(dest, exist_ok=True)  # completed prior move (empty day)
    # simulate a crash mid-file-copy from an earlier merge attempt:
    # a torn per-file tmp sits in dest, the hot file is intact
    hot_files = [n for n in os.listdir(src) if not n.startswith((".", "_"))]
    assert hot_files
    victim = hot_files[0]
    torn = os.path.join(dest, victim + ".tier_tmp")
    with open(torn, "wb") as f:
        f.write(b"\x00torn")  # garbage partial copy
    m._tier_move(src, dest)
    assert not os.path.isdir(src)
    assert not os.path.exists(torn)  # torn tmp discarded, not promoted
    # the merged file is the FULL hot copy, readable parquet
    assert read_tiered(spark, cat, "samples", tiers=("cold",)).count() == 1
