"""Retention / tiering / settings — the ctrl-plane maintenance layer.

The reference rotates data with ClickHouse TTL clauses: each table gets
`TTL insert_time + INTERVAL ttl [TO DISK 'tier'], drop_expr` plus
`ttl_only_drop_parts = 1` (whole parts only), and remembers the applied
policy in a fingerprinted `settings` KV table read with
`argMax(value, inserted_at)` (ref: ctrl/qryn/maintenance/rotate.go:48-95
rotateTables, :17-46 get/putSetting; env surface SAMPLES_DAYS /
STORAGE_POLICY docs/configuration.md:60-61).

The Spark-native analog operates on the Catalog's date-partitioned
parquet layout:

  rotate()        whole DATE PARTITIONS are the "parts": partitions
                  older than drop_days are deleted; partitions older
                  than a policy's ttl_days move to that tier's root
                  (cheap directory rename — the `TO DISK` analog; at
                  cluster scale the same walk issues object-store
                  copies/deletes, still metadata-sized: the walk is
                  O(partitions), never O(rows))
  read_tiered()   a reader spanning hot + tier roots (the storage-
                  policy-aware merged view); partition pruning still
                  applies per root because the date=... layout survives
                  the move
  put_setting/    append-only KV with latest-wins read via
  get_setting     max_by(value, inserted_at) — the argMax contract,
                  including the reference's "skip work when the stored
                  policy already matches" fast path in rotate()
"""

from __future__ import annotations

import os
import shutil
import time
from dataclasses import dataclass
from datetime import date as _date

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gigapipe_spark.storage.writer import Catalog

FACT_TABLES = ("samples", "time_series", "gin")
# every date-partitioned table the fan-out writers maintain — rotation
# and compaction apply uniformly (the reference's per-table TTL clauses,
# rotate.go:48-95, cover the trace/profile tables the same way)
ALL_TABLES = (
    "samples", "time_series", "gin", "metrics_15s", "patterns",
    "tempo_traces", "tempo_traces_attrs_gin", "tempo_traces_kv",
    "tempo_traces_attr_map", "tempo_traces_anc",
    "profiles", "profiles_series", "profiles_series_gin",
    "profiles_series_keys", "profiles_folded",
)

# in-file sort keys per table for compact() rewrites — the same
# ORDER BY each fan-out writer applies via sortWithinPartitions, so a
# compacted partition regains its row-group-skipping stats
TABLE_SORT_COLS: dict[str, tuple[str, ...]] = {
    "samples": ("fingerprint", "timestamp_ns"),
    "metrics_15s": ("fingerprint", "timestamp_ns"),
    "time_series": ("fingerprint",),
    "gin": ("key", "val", "fingerprint"),
    "patterns": ("timestamp_10m", "fingerprint"),
    "tempo_traces": ("trace_id", "timestamp_ns"),
    "tempo_traces_attrs_gin": ("key", "val", "timestamp_ns"),
    "tempo_traces_kv": ("key", "val_id"),
    "tempo_traces_attr_map": ("trace_id", "timestamp_ns"),
    "tempo_traces_anc": ("trace_id",),
    "profiles": ("type_id", "service_name", "timestamp_ns"),
    "profiles_series": ("fingerprint",),
    "profiles_series_gin": ("key", "val", "type_id"),
    "profiles_series_keys": ("key", "val_id"),
    "profiles_folded": ("type_id", "service_name"),
}


@dataclass(frozen=True)
class RotatePolicy:
    """Mirror of rotate.go's RotatePolicy{TTL, MoveTo}: after ttl_days,
    move the partition to tier `move_to` (e.g. "cold")."""

    ttl_days: int
    move_to: str


def _partition_dates(table_path: str) -> list[tuple[str, str]]:
    """[(iso_date, partition_dir)] for a date-partitioned table,
    descending the oid= tenant level when present (PARTITION BY
    (oid, date), traces.sql:19). Non-date names — including
    crash-leftover `.compact_tmp`/`.compact_old` dirs from an
    interrupted compact() — are skipped, so maintenance walks stay safe
    to re-run after any failure."""
    if not os.path.isdir(table_path):
        return []
    roots = [
        os.path.join(table_path, n)
        for n in sorted(os.listdir(table_path))
        if n.startswith("oid=") and os.path.isdir(os.path.join(table_path, n))
    ] or [table_path]
    out = []
    for root in roots:
        for name in sorted(os.listdir(root)):
            if not name.startswith("date="):
                continue
            iso = name.split("=", 1)[1]
            try:
                _date.fromisoformat(iso)
            except ValueError:
                continue
            out.append((iso, os.path.join(root, name)))
    return out


def tier_root(catalog: Catalog, tier: str) -> str:
    return catalog.root + "__tier_" + tier


def rotate(
    spark: SparkSession,
    catalog: Catalog,
    drop_days: int,
    policies: tuple[RotatePolicy, ...] = (),
    tables: tuple[str, ...] = FACT_TABLES,
    today: _date | None = None,
) -> dict[str, list[str]]:
    """Apply retention to every table: drop partitions older than
    `drop_days`, move older-than-policy partitions to their tier.

    Whole partitions only (the ttl_only_drop_parts=1 contract — no
    row-level rewrite ever happens here). Policies apply most-aged
    first, so with (7d → cold, 30d → archive) a 40-day partition goes
    to archive, a 10-day one to cold. Returns {action: [paths]} and
    records the applied policy string under settings type="rotate" —
    if the stored value already matches, the walk is skipped entirely
    (rotate.go:74-76).

    Holds the store writer lock for the whole walk: partition deletes /
    tier moves must not interleave with a live fan-out's appends, and
    taking the flock first forces journal.repair() + compact-leftover
    healing BEFORE any partition is touched (rotating a half-applied
    batch's partition would otherwise freeze the inconsistency in).
    """
    from gigapipe_spark.storage.snapshot import maintenance_window
    from gigapipe_spark.storage.writer import store_write_lock

    with store_write_lock(catalog.root), maintenance_window(catalog.root):
        return _rotate_locked(spark, catalog, drop_days, policies, tables, today)


def _rotate_locked(
    spark: SparkSession,
    catalog: Catalog,
    drop_days: int,
    policies: tuple[RotatePolicy, ...],
    tables: tuple[str, ...],
    today: _date | None,
) -> dict[str, list[str]]:
    today = today or _date.today()
    policy_str = f"drop:{drop_days};" + ";".join(
        f"{p.ttl_days}->{p.move_to}" for p in sorted(policies, key=lambda p: -p.ttl_days)
    )
    if get_setting(spark, catalog, "rotate", "policy") == policy_str and not any(
        _expired(today, drop_days, policies, table, catalog) for table in tables
    ):
        return {"dropped": [], "moved": [], "skipped": ["policy unchanged"]}
    by_age = sorted(policies, key=lambda p: -p.ttl_days)
    dropped: list[str] = []
    moved: list[str] = []
    for table in tables:
        sidecar_done = False
        for iso, part_dir in _partition_dates(catalog.path(table)):
            age = (today - _date.fromisoformat(iso)).days
            if age > drop_days or any(age > p.ttl_days for p in by_age):
                # capture the table's schema ONCE before retention can
                # empty it: readers answer a fully-rotated table with
                # zero rows (writer._empty_from_sidecar), like the
                # reference's empty ClickHouse table
                if not sidecar_done:
                    _ensure_schema_sidecar(spark, catalog.path(table))
                    sidecar_done = True
            if age > drop_days:
                shutil.rmtree(part_dir)
                dropped.append(part_dir)
                continue
            for pol in by_age:
                if age > pol.ttl_days:
                    dest_table = os.path.join(tier_root(catalog, pol.move_to), table)
                    # preserve the oid level in the tier copy
                    rel = os.path.relpath(part_dir, catalog.path(table))
                    dest = os.path.join(dest_table, rel)
                    os.makedirs(os.path.dirname(dest), exist_ok=True)
                    _tier_move(part_dir, dest)
                    moved.append(dest)
                    break
    put_setting(spark, catalog, "rotate", "policy", policy_str)
    return {"dropped": dropped, "moved": moved, "skipped": []}


def _tier_move(part_dir: str, dest: str) -> None:
    """Crash-safe TO-DISK partition move with late-arrival merge.

    Invariant: `dest` exists ⟺ a move COMPLETED (it only ever appears
    via atomic rename of a fully-copied `dest + '.tier_tmp'`). That
    removes the old ambiguity where an existing dest could be either a
    torn copy (hot authoritative) or a finished prior move that a
    backfill push re-created the hot partition after — the old code
    rmtree'd dest unconditionally and silently lost the already-tiered
    day's committed data when late rows arrived.

      dest missing  → same-fs: one atomic os.rename (no crash window);
                      cross-fs: copytree to dest.tier_tmp, atomic
                      rename, then delete the hot copy. A crash at any
                      point leaves either the hot partition intact
                      (partial tmp is dropped on re-run — the hot copy
                      stays untouched until AFTER the rename) or a
                      complete dest plus a hot leftover, which the
                      merge branch below absorbs idempotently.
      dest exists   → completed prior move + late-arriving hot rows:
                      MERGE file-by-file. Spark part filenames embed a
                      task UUID, so a same-named file in dest is the
                      crash-before-source-delete leftover of the very
                      file already tiered — drop the hot copy; any
                      other file moves in under its own (unique) name.
                      Never rmtree dest.
    """
    tmp = dest + ".tier_tmp"
    if os.path.isdir(tmp):
        # partial copy from a crashed prior rotate; the hot partition
        # was never touched before the rename, so it is authoritative
        shutil.rmtree(tmp)
    if os.path.isdir(dest):
        for name in os.listdir(part_dir):
            src = os.path.join(part_dir, name)
            dst = os.path.join(dest, name)
            if os.path.exists(dst):
                (shutil.rmtree if os.path.isdir(src) else os.remove)(src)
            else:
                # shutil.move cross-filesystem is copy2+unlink: a crash
                # mid-copy would leave a PARTIAL dst that the
                # dst-exists branch above then treats as the tiered
                # truth (deleting the intact hot copy). Mirror the
                # directory-level protocol: full copy to a tmp name,
                # atomic rename within the dest fs, only then drop src.
                file_tmp = dst + ".tier_tmp"
                if os.path.exists(file_tmp):
                    (shutil.rmtree if os.path.isdir(file_tmp) else os.remove)(
                        file_tmp
                    )
                if os.path.isdir(src):
                    shutil.copytree(src, file_tmp)
                else:
                    shutil.copy2(src, file_tmp)
                os.rename(file_tmp, dst)
                (shutil.rmtree if os.path.isdir(src) else os.remove)(src)
        shutil.rmtree(part_dir)
        return
    try:
        os.rename(part_dir, dest)  # same-filesystem: atomic, done
        return
    except OSError:
        pass  # EXDEV — the actual TO DISK cross-device case
    shutil.copytree(part_dir, tmp)
    os.rename(tmp, dest)
    shutil.rmtree(part_dir)


def _expired(
    today: _date,
    drop_days: int,
    policies: tuple[RotatePolicy, ...],
    table: str,
    catalog: Catalog,
) -> bool:
    min_ttl = min([drop_days] + [p.ttl_days for p in policies])
    return any(
        (today - _date.fromisoformat(iso)).days > min_ttl
        for iso, _ in _partition_dates(catalog.path(table))
    )


def read_tiered(
    spark: SparkSession, catalog: Catalog, table: str, tiers: tuple[str, ...] = ()
) -> DataFrame:
    """Union of the hot table and its tier copies — the reader's view of
    a storage policy spanning disks. Each root keeps the date=...
    layout, so time-bound predicates still prune partitions per root."""
    paths = [catalog.path(table)] + [
        os.path.join(tier_root(catalog, t), table) for t in tiers
    ]
    existing = [p for p in paths if os.path.isdir(p)]
    if not existing:
        raise FileNotFoundError(f"no data for table {table} in {paths}")
    df = None
    for p in existing:
        try:
            part = spark.read.option("basePath", p).parquet(p)
        except Exception as ex:
            # a policy that moved EVERY hot partition to a tier leaves
            # the hot root uninferable (_SUCCESS only) — the tier copies
            # still hold the data, so skip the empty root instead of
            # failing the whole union (sidecar fallback when this is
            # the only root at all)
            if "UNABLE_TO_INFER_SCHEMA" not in str(ex):
                raise
            from gigapipe_spark.storage.writer import _empty_from_sidecar

            part = _empty_from_sidecar(spark, p)
            if part is None:
                continue
        df = part if df is None else df.unionByName(part)
    if df is None:
        raise FileNotFoundError(f"no data for table {table} in {paths}")
    return df


def compact(
    spark: SparkSession,
    catalog: Catalog,
    table: str,
    target_files_per_partition: int = 1,
    sort_cols: tuple[str, ...] | None = None,
    codec: str | None = None,
) -> dict[str, int]:
    """Merge a table's small files per date partition — the MergeTree
    background-merge analog, plus the codec-rewrite verb
    (ctrl/qryn/maintenance/codec.go:9 UpdateTextCodec does it with
    ALTER COLUMN ... CODEC; a parquet lake re-encodes by rewriting).

    Streaming foreachBatch appends land one small file per micro-batch
    per task — at 100 TB that's a metadata explosion (every query pays
    per-file open + planning). Each date partition is rewritten to
    `target_files_per_partition` files, re-sorted by `sort_cols` so the
    rewrite RESTORES the row-group-skipping order that interleaved
    appends destroyed (two sorted appends = a 2-way interleave; the
    compacted file is globally sorted again, like a CH part merge).
    Partitions at-or-under the target file count are left untouched —
    compaction must be idempotent and cheap to re-run on a schedule.

    Single-partition rewrites only (crash-safe unit = one date dir,
    swapped via rename after the new files land); returns
    {iso_date: files_before} for the partitions it rewrote.

    Holds the store writer lock across the rewrite: an append landing
    in `part_dir` between the read and the rename swap would be
    silently deleted with `.compact_old`. Taking the flock also runs
    journal.repair() + heal_compact_leftovers() first, so compaction
    never bakes a crashed batch's partial files into a merged file
    that a later repair can't surgically remove.
    """
    from gigapipe_spark.storage.snapshot import maintenance_window
    from gigapipe_spark.storage.writer import store_write_lock

    with store_write_lock(catalog.root), maintenance_window(catalog.root):
        return _compact_locked(
            spark, catalog, table, target_files_per_partition, sort_cols, codec
        )


def _compact_locked(
    spark: SparkSession,
    catalog: Catalog,
    table: str,
    target_files_per_partition: int,
    sort_cols: tuple[str, ...] | None,
    codec: str | None,
) -> dict[str, int]:
    if sort_cols is None:
        sort_cols = TABLE_SORT_COLS.get(table, ("fingerprint", "timestamp_ns"))
    heal_compact_leftovers(catalog.root)
    done: dict[str, int] = {}
    for iso, part_dir in _partition_dates(catalog.path(table)):
        files = [f for f in os.listdir(part_dir) if f.endswith(".parquet")]
        if len(files) <= target_files_per_partition:
            continue
        tmp_dir = part_dir + ".compact_tmp"
        writer = (
            spark.read.parquet(part_dir)
            .repartition(target_files_per_partition)
            .sortWithinPartitions(*sort_cols)
            .write.mode("overwrite")
        )
        if codec:
            writer = writer.option("compression", codec)
        writer.parquet(tmp_dir)
        old_dir = part_dir + ".compact_old"
        os.rename(part_dir, old_dir)
        os.rename(tmp_dir, part_dir)
        shutil.rmtree(old_dir)
        done[iso] = len(files)
    if codec:
        put_setting(spark, catalog, "codec", table, codec)
    return done


def _ensure_schema_sidecar(spark: SparkSession, table_path: str) -> None:
    """Record the table's full schema (partition columns included) in
    `<table>/_schema.json` while data still exists to read it from —
    rotation may be about to delete the last partition, after which
    spark.read.parquet can no longer infer anything. Atomic (tmp +
    rename), idempotent, one footer read when missing."""
    import json as _json

    from gigapipe_spark.storage.writer import SCHEMA_SIDECAR

    sc_path = os.path.join(table_path, SCHEMA_SIDECAR)
    if os.path.isfile(sc_path):
        return
    try:
        schema = spark.read.parquet(table_path).schema
    except Exception:
        return  # nothing readable to capture; keep the old behavior
    tmp = sc_path + ".tmp"
    with open(tmp, "w") as fh:
        _json.dump(schema.jsonValue(), fh)
    os.rename(tmp, sc_path)


def heal_compact_leftovers(root: str) -> list[str]:
    """Heal the crash window inside compact()'s two-rename swap: a kill
    between `rename(part, part.compact_old)` and `rename(tmp, part)`
    leaves the partition's data ONLY in `.compact_old`, which every
    reader and maintenance walk skips — the partition silently
    disappears. Restore deterministically:

      - `.compact_old` present, live dir MISSING → the swap was torn:
        rename the old dir back (the pre-compact state is the one state
        guaranteed complete) and drop any `.compact_tmp`;
      - `.compact_old` present, live dir present → compact finished its
        second rename but crashed before rmtree: finish the delete;
      - bare `.compact_tmp` → incomplete rewrite, drop it.

    Runs under the writer flock (called from _acquire_process_lock next
    to journal.repair, and from compact() itself). The walk is
    O(partition dirs) — at object-store scale this is one LIST per
    table prefix filtered on the `.compact_` suffix, metadata-sized.
    Returns the healed partition paths."""
    healed: list[str] = []
    if not os.path.isdir(root):
        return healed
    from gigapipe_spark.storage.snapshot import maintenance_window

    with maintenance_window(root):
        _heal_compact_walk(root, healed)
    return healed


def _heal_compact_walk(root: str, healed: list[str]) -> None:
    for table in sorted(os.listdir(root)):
        tdir = os.path.join(root, table)
        if not os.path.isdir(tdir) or table.startswith("_"):
            continue
        levels = [
            os.path.join(tdir, n)
            for n in sorted(os.listdir(tdir))
            if n.startswith("oid=") and os.path.isdir(os.path.join(tdir, n))
        ] or [tdir]
        for lvl in levels:
            for name in sorted(os.listdir(lvl)):
                path = os.path.join(lvl, name)
                if name.endswith(".compact_old"):
                    live = path[: -len(".compact_old")]
                    if os.path.isdir(live):
                        shutil.rmtree(path)  # swap completed; finish delete
                    else:
                        tmp = live + ".compact_tmp"
                        if os.path.isdir(tmp):
                            shutil.rmtree(tmp)
                        os.rename(path, live)
                        healed.append(live)
                elif name.endswith(".compact_tmp"):
                    live = path[: -len(".compact_tmp")]
                    # the .compact_old branch above may already have
                    # consumed this tmp (listdir snapshot predates it)
                    if os.path.isdir(path) and not os.path.isdir(
                        live + ".compact_old"
                    ):
                        shutil.rmtree(path)


# --- settings KV (ref: rotate.go getSetting/putSetting + argMax read) --------


def put_setting(
    spark: SparkSession, catalog: Catalog, tp: str, name: str, value: str
) -> None:
    fp = _setting_fp(tp, name)
    from gigapipe_spark.storage.writer import store_write_lock

    row = spark.createDataFrame(
        [(fp, tp, name, value, time.time_ns())],
        "fingerprint long, type string, name string, value string, inserted_at long",
    )
    with store_write_lock(catalog.root):
        row.write.mode("append").parquet(catalog.path("settings"))


def get_setting(
    spark: SparkSession, catalog: Catalog, tp: str, name: str
) -> str | None:
    path = catalog.path("settings")
    if not os.path.isdir(path):
        return None
    fp = _setting_fp(tp, name)
    row = (
        spark.read.parquet(path)
        .filter(F.col("fingerprint") == fp)
        .groupBy("fingerprint")
        .agg(F.max_by("value", "inserted_at").alias("value"))
        .collect()
    )
    return row[0]["value"] if row else None


def _setting_fp(tp: str, name: str) -> int:
    """Stable settings-row fingerprint. The reference hashes the
    JSON-ish '{"type":..., "name":...' prefix with its DJB label hash
    (rotate.go:17-19); equality semantics are all that matters, so
    crc32 of the same canonical string serves here."""
    import zlib

    return zlib.crc32(f'{{"type":"{tp}", "name":"{name}"'.encode())
