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


def test_folded_fanout_store_render(spark, tmp_path):
    """pprof/collapsed ingest → profiles_folded store → StoreEngine
    render levels + diff over the stored layout."""
    from gigapipe_spark.storage.query import StoreEngine
    from gigapipe_spark.storage.writer import folded_fanout

    rows = [
        (1_700_000_000_000_000_000, "api", "memory:space:bytes", "p1",
         "main;alloc 10"),
        (1_700_000_000_000_000_000, "api", "memory:space:bytes", "p1",
         "main;alloc;big 5"),
        (1_700_000_000_000_000_000, "api", "process_cpu:cpu:ns", "p2",
         "main;cpu 99"),
        (1_700_000_000_000_000_000, "web", "memory:space:bytes", "p3",
         "main;alloc 7"),
    ]
    batch = spark.createDataFrame(
        rows,
        "timestamp_ns long, service_name string, type_id string,"
        " profile_id string, line string",
    )
    cat = Catalog(str(tmp_path / "store"))
    folded_fanout(batch, cat)

    eng = StoreEngine(spark, cat.root, catalog=cat)
    levels = eng.pyroscope_render(
        service="api",
        profile_type_id="memory:alloc_space:bytes:space:bytes",
    )
    # root level: main total = 15 (the cpu profile is type-scoped out)
    assert levels[0][0]["fn_name"] == "main" and levels[0][0]["total"] == 15
    alloc = [n for n in levels[1] if n["fn_name"] == "alloc"][0]
    assert alloc["total"] == 15 and alloc["self"] == 10

    diff = eng.pyroscope_render_diff(
        "api", "web", profile_type_id="memory:alloc_space:bytes:space:bytes"
    ).collect()
    d = {r["id"]: r for r in diff}
    # alloc: left 15 vs right 7 → total_delta -8
    assert any(r["total_delta"] == -8 for r in diff)
    # the big frame exists only on the left
    assert any(r["total_left"] == 5 and r["total_right"] == 0 for r in diff)


def test_pprof_ingest_to_store_render(spark, tmp_path):
    """Full profile loop: binary pprof body → pprof_folded decode →
    folded_fanout store → StoreEngine flamegraph (the /ingest →
    /pyroscope/render path over the written layout)."""
    import gzip

    from gigapipe_spark.sources import protowire as pw
    from gigapipe_spark.storage.query import StoreEngine
    from gigapipe_spark.storage.writer import folded_fanout
    from tests.test_protowire import _pprof

    raw = spark.createDataFrame(
        [("p1", bytearray(gzip.compress(_pprof())))],
        "profile_id string, payload binary",
    )
    folded = pw.pprof_folded(raw).select(
        F.lit(1_700_000_000_000_000_000).alias("timestamp_ns"),
        F.lit("api").alias("service_name"),
        F.lit("process_cpu:cpu:nanoseconds").alias("type_id"),
        "profile_id",
        "line",
    )
    cat = Catalog(str(tmp_path / "store"))
    folded_fanout(folded, cat)
    eng = StoreEngine(spark, cat.root, catalog=cat)
    levels = eng.pyroscope_render(
        service="api",
        profile_type_id="process_cpu:samples:count:cpu:nanoseconds",
    )
    root = levels[0][0]
    assert root["fn_name"] == "main" and root["total"] == 12
    foo = [n for n in levels[1] if n["fn_name"] == "foo"][0]
    assert foo["total"] == 12 and foo["self"] == 5
