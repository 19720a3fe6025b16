"""Profiles MV layer (ref: ctrl/qryn/sql/profiles.sql)."""

from pyspark.sql import functions as F

from gigapipe_spark.storage.writer import Catalog, profiles_fanout

_SCHEMA = (
    "timestamp_ns long, type string, service_name string,"
    " sample_types_units array<struct<name: string, unit: string>>,"
    " period_type string, period_unit string, tags map<string,string>,"
    " duration_ns long, payload_type string, payload string,"
    " values_agg array<struct<fn: string, total: long, self: int>>"
)


def _batch(spark):
    rows = [
        (
            1700000000_000000000, "memory", "api",
            [("alloc_space", "bytes"), ("alloc_objects", "count")],
            "space", "bytes", {"env": "prod"},
            10_000_000_000, "0", "payload-a",
            [("main", 100, 40)],
        ),
        (
            1700000060_000000000, "memory", "api",
            [("alloc_space", "bytes"), ("alloc_objects", "count")],
            "space", "bytes", {"env": "prod"},
            10_000_000_000, "0", "payload-b",
            [("main", 120, 50)],
        ),
        (
            1700000000_000000000, "process_cpu", "web",
            [("cpu", "nanoseconds")],
            "cpu", "nanoseconds", {"env": "dev", "ver": "2"},
            5_000_000_000, "0", "payload-c",
            [("run", 7, 7)],
        ),
    ]
    return spark.createDataFrame(rows, _SCHEMA)


def test_profiles_fanout_roundtrip(spark, tmp_path):
    cat = Catalog(str(tmp_path / "store"))
    profiles_fanout(_batch(spark), cat)

    prof = cat.read(spark, "profiles")
    assert prof.count() == 3
    mem = prof.filter(F.col("type_id") == "memory:space:bytes")
    assert mem.count() == 2
    # same logical series → same fingerprint across both timestamps
    assert mem.select("fingerprint").distinct().count() == 1

    series = cat.read(spark, "profiles_series")
    assert series.count() == 2  # per-date dedup of the two mem rows
    svc = {r["type_id"]: r for r in series.collect()}
    # series tags append service_name (profiles.sql:78)
    assert svc["memory:space:bytes"]["tags"]["service_name"] == "api"
    assert svc["memory:space:bytes"]["tags"]["env"] == "prod"

    gin = cat.read(spark, "profiles_series_gin")
    env = gin.filter((F.col("key") == "env") & (F.col("val") == "prod"))
    assert env.count() == 1
    assert env.collect()[0]["type_id"] == "memory:space:bytes"

    keys = cat.read(spark, "profiles_series_keys")
    assert keys.filter(F.col("key") == "ver").count() == 1
    assert all(0 <= r["val_id"] < 10000 for r in keys.collect())


def test_profiles_fingerprint_tag_order_invariant(spark, tmp_path):
    """The fingerprint hashes SORTED tag pairs (arraySort in
    profiles_mv) — permuting the tag map must not split a series."""
    rows = [
        (1, "t", "s", [("a", "u")], "p", "u", {"x": "1", "y": "2"},
         0, "0", "", []),
        (2, "t", "s", [("a", "u")], "p", "u", {"y": "2", "x": "1"},
         0, "0", "", []),
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    cat = Catalog(str(tmp_path / "store"))
    profiles_fanout(df, cat)
    prof = cat.read(spark, "profiles")
    assert prof.select("fingerprint").distinct().count() == 1
