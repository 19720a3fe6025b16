"""End-to-end: wire payload → decoder → MV fan-out → LogQL/PromQL over
the STORED tables (the reference loop, reader/service/* over the
writer's tables)."""

import json

from pyspark.sql import functions as F

from gigapipe_spark.logql.compiler import query_range
from gigapipe_spark.promql.compiler import query as promql_query
from gigapipe_spark.sources import ingest
from gigapipe_spark.storage.query import (
    store_logql_context,
    store_promql_context,
)
from gigapipe_spark.storage.writer import Catalog, ingest_fanout

T0 = 1_700_000_000_000_000_000


def _seed(spark, tmp_path) -> Catalog:
    streams = [
        {
            "stream": {"app": "web"},
            # values triples: line+value → type 0 (log AND metric)
            "values": [
                [str(T0 + i * 10_000_000_000), f"hit {i}", float(i)]
                for i in range(6)
            ],
        },
        {
            "stream": {"app": "db"},
            "values": [[str(T0 + 5_000_000_000), "slow query"]],
        },
    ]
    raw = spark.createDataFrame(
        [(json.dumps({"streams": streams}),)], "payload string"
    )
    cat = Catalog(str(tmp_path / "store"))
    ingest_fanout(ingest.loki_push(raw), cat)
    return cat


def test_store_logql_selector_and_pipeline(spark, tmp_path):
    cat = _seed(spark, tmp_path)
    ctx = store_logql_context(spark, cat)
    res = query_range(ctx, '{app="web"}', direction="forward")
    rows = res.df.collect()
    assert [r["string"] for r in rows] == [f"hit {i}" for i in range(6)]
    # bare selector scans prune the series join (labels None by design);
    # the discovered service_name lives on the stored series dimension
    series = {
        r["labels"]["app"]: r["labels"] for r in cat.read_series(spark).collect()
    }
    assert series["web"]["service_name"] == "web"
    filtered = query_range(ctx, '{app="web"} |= "hit 3"').df.collect()
    assert len(filtered) == 1
    # selector miss via the stored GIN
    assert query_range(ctx, '{app="nope"}').df.count() == 0


def test_store_logql_time_bound_prunes_partitions(spark, tmp_path):
    cat = _seed(spark, tmp_path)
    ctx = store_logql_context(spark, cat)
    rows = query_range(
        ctx,
        '{app="web"}',
        start_ns=T0 + 20_000_000_000,
        end_ns=T0 + 40_000_000_000,
        direction="forward",
    ).df.collect()
    assert [r["string"] for r in rows] == ["hit 2", "hit 3"]
    # the raw-ts predicate must reach the stored parquet scan
    plan = ctx.samples()._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_store_promql_instant(spark, tmp_path):
    cat = _seed(spark, tmp_path)
    ctx = store_promql_context(
        spark, cat, start_ns=T0, end_ns=T0 + 60_000_000_000
    )
    # type-0 rows serve as metrics too (reference planners: type IN (0,2))
    df = promql_query(ctx, '{app="web"}')
    vals = {r["timestamp_ns"]: r["value"] for r in df.collect()}
    assert vals  # instant vector materialized from the store
    assert max(vals.values()) == 5.0  # last written sample value


def test_store_promql_rate_over_stored_counter(spark, tmp_path):
    cat = _seed(spark, tmp_path)
    ctx = store_promql_context(
        spark, cat, start_ns=T0 + 50_000_000_000, end_ns=T0 + 60_000_000_000,
        use_rollup=False,
    )
    df = promql_query(ctx, 'rate({app="web"}[50s])')
    vals = [r["value"] for r in df.collect()]
    assert vals
    # counter increases 1/10s → a fully-populated 50s window sees 0.08/s
    # ((last-first)/range with no resets); every window is non-negative
    assert max(vals) > 0 and all(v >= 0 for v in vals)


def test_store_traceql(spark, tmp_path):
    from gigapipe_spark.storage.query import store_traceql_context
    from gigapipe_spark.storage.writer import spans_fanout
    from gigapipe_spark.traceql.compiler import query as traceql_query

    payload = json.dumps(
        [
            {
                "id": "b1", "traceId": "a1", "name": "get /",
                "timestamp": 1700000000000000, "duration": 1500,
                "localEndpoint": {"serviceName": "web"},
                "tags": {"otel.status_code": "ERROR"},
            },
            {
                "id": "b2", "traceId": "a1", "parentId": "b1",
                "name": "select", "timestamp": 1700000000000100,
                "duration": 900, "localEndpoint": {"serviceName": "db"},
            },
        ]
    )
    cat = Catalog(str(tmp_path / "store"))
    spans_fanout(
        ingest.zipkin_spans(
            spark.createDataFrame([(payload,)], "payload string")
        ),
        cat,
    )
    ctx = store_traceql_context(spark, cat)
    err = traceql_query(ctx, "{ status = error }").collect()
    assert len(err) == 1 and err[0]["span_id"] == "b1".rjust(16, "0")
    # structural: ancestor-with-error >> descendant over the stored closure
    desc = traceql_query(ctx, "{ status = error } &>> { name = `select` }").collect()
    assert len(desc) == 1 and desc[0]["span_id"] == "b2".rjust(16, "0")
    # intrinsic-only fast path over the stored fact table
    dur = traceql_query(ctx, "{ duration > 1ms }").collect()
    assert {r["span_id"] for r in dur} == {"b1".rjust(16, "0")}
    # MIXED intrinsic+attr selector: the stored attr map has no name/
    # service.name entries, so intrinsics must resolve against spans
    # columns (returned 0 rows before round 12)
    mixed = traceql_query(
        ctx, '{ status = error && name = `get /` }'
    ).collect()
    assert {r["span_id"] for r in mixed} == {"b1".rjust(16, "0")}
    # ||-arm matched by an intrinsic ALONE must include spans with no
    # attr row at all (b2 carries zero tags)
    mixed_or = traceql_query(
        ctx, '{ status = error || name = `select` }'
    ).collect()
    assert {r["span_id"] for r in mixed_or} == {
        "b1".rjust(16, "0"), "b2".rjust(16, "0")
    }


def test_store_engine_endpoints(spark, tmp_path):
    """The endpoint facade over a written store: labels/values/series/
    query_range/index stats all read the fan-out tables."""
    from gigapipe_spark.storage.query import StoreEngine

    cat = _seed(spark, tmp_path)
    eng = StoreEngine(spark, cat.root, catalog=cat)
    keys = {r["key"] for r in eng.loki_labels().collect()}
    assert {"app", "service_name"} <= keys
    vals = {r["val"] for r in eng.loki_label_values("app").collect()}
    assert vals == {"web", "db"}
    assert eng.loki_series('{app="web"}').count() == 1
    rows = eng.loki_query_range('{app="web"}', limit=2).collect()
    assert len(rows) == 2
    st = eng.loki_index_stats().collect()[0]
    assert st["streams"] == 2 and st["entries"] == 7
    # prometheus over the same store: type-0 rows serve as metrics
    inst = eng.prom_query('{app="web"}')
    assert inst.count() >= 1
    # metadata comes from the STORED column (none ingested here → empty)
    assert eng.prom_metadata().count() == 0
    import pytest as _pytest

    # no profiles were ingested into this store → clear error, not a
    # silent fixture-view fallback
    with _pytest.raises(FileNotFoundError, match="profiles_folded"):
        eng.pyroscope_render()


def test_store_rollup_partials_merge_across_flushes(spark, tmp_path):
    """Two ingest flushes touching the SAME 15s cell store partials; the
    read-side merge reconstructs the exact cell (counter partials
    included) and PromQL's rollup path reads it."""
    cat = Catalog(str(tmp_path / "store"))
    for half in (range(0, 3), range(3, 6)):
        streams = [
            {
                "stream": {"app": "web"},
                "values": [
                    [str(T0 + i * 2_000_000_000), f"v{i}", float(i)]
                    for i in half
                ],
            }
        ]
        raw = spark.createDataFrame(
            [(json.dumps({"streams": streams}),)], "payload string"
        )
        ingest_fanout(ingest.loki_push(raw), cat)
    cells = cat.read_rollup(spark).collect()
    bucket0 = T0 - T0 % 15_000_000_000  # T0 sits 5s into its cell
    one = [c for c in cells if c["timestamp_ns"] == bucket0]
    assert len(one) == 1
    c = one[0]
    # samples 0..4 (at +0..+8s) land in the first cell, crossing the
    # flush boundary at sample 3 — the partials merged back exactly
    assert c["count"] == 5 and c["first"] == 0.0 and c["last"] == 4.0
    assert c["sum"] == 10.0 and c["resets"] == 0.0 and c["changes"] == 4.0
    nxt = [c for c in cells if c["timestamp_ns"] == bucket0 + 15_000_000_000]
    assert len(nxt) == 1 and nxt[0]["count"] == 1 and nxt[0]["last"] == 5.0
    ctx = store_promql_context(
        spark, cat, start_ns=T0, end_ns=T0 + 60_000_000_000
    )
    assert ctx.rollup().count() == len(cells)


def test_store_engine_tempo(spark, tmp_path):
    """tempo_search + trace-by-id through the StoreEngine read the
    spans_fanout tables."""
    from gigapipe_spark.storage.query import StoreEngine
    from gigapipe_spark.storage.writer import spans_fanout

    payload = json.dumps(
        [
            {"id": "b1", "traceId": "a1", "name": "root",
             "timestamp": 1700000000000000, "duration": 2000,
             "localEndpoint": {"serviceName": "web"},
             "tags": {"otel.status_code": "ERROR"}},
            {"id": "b2", "traceId": "a1", "parentId": "b1", "name": "leaf",
             "timestamp": 1700000000000500, "duration": 700,
             "localEndpoint": {"serviceName": "db"}},
        ]
    )
    cat = Catalog(str(tmp_path / "store"))
    spans_fanout(
        ingest.zipkin_spans(
            spark.createDataFrame([(payload,)], "payload string")
        ),
        cat,
    )
    eng = StoreEngine(spark, cat.root, catalog=cat)
    res = eng.tempo_search("{ status = error }").collect()
    assert len(res) == 1
    tid = res[0]["trace_id"]
    assert tid == "a1".rjust(32, "0")
    spans = eng.tempo_trace(tid).collect()
    assert [r["name"] for r in spans] == ["root", "leaf"]  # root first
    tags = {r["key"] for r in eng.tempo_tags().collect()}
    assert {"status", "name", "service.name"} <= tags


def _folded_profiles_seed(spark, tmp_path):
    """Two services × two envs of folded-stack profiles → profiles_fanout
    with the stored tree layout (profiles.sql:118-119)."""
    from gigapipe_spark.sources.ingest import folded_profiles_input
    from gigapipe_spark.storage.writer import profiles_fanout

    rows = []
    for i, (svc, env) in enumerate(
        [("api", "prod"), ("api", "dev"), ("worker", "prod")]
    ):
        pid = f"p{i}"
        for line, mult in [("main;handle 10", 1), ("main;handle;db 5", 1)]:
            stack, val = line.rsplit(" ", 1)
            rows.append(
                (
                    pid,
                    T0 + i * 1_000_000_000,
                    "process_cpu",
                    svc,
                    "cpu",
                    "nanoseconds",
                    {"env": env, "svc": svc},
                    1_000_000,
                    f"{stack} {int(val) * (i + 1)}",
                )
            )
    folded = spark.createDataFrame(
        rows,
        "profile_id string, timestamp_ns long, type string,"
        " service_name string, period_type string, period_unit string,"
        " tags map<string,string>, duration_ns long, line string",
    )
    batch = folded_profiles_input(folded, "cpu", "nanoseconds")
    cat = Catalog(str(tmp_path / "profstore"))
    profiles_fanout(batch.coalesce(1), cat)
    return cat


def test_store_pyroscope_selector_scoped_render(spark, tmp_path):
    """Round-5 gap closed: label-selector scoping through the stored
    profiles_series_gin + render from the stored tree layout
    (planner_selector.go:12 + planner_merge_raw.go:11)."""
    from gigapipe_spark.storage.query import StoreEngine

    cat = _folded_profiles_seed(spark, tmp_path)
    eng = StoreEngine(spark, cat.root, catalog=cat)

    def total(levels):
        return sum(d["total"] for d in levels[0]) if levels else 0

    # unscoped: all three profiles merge (10+5)*(1+2+3) at the root
    assert total(eng.pyroscope_render()) == 90
    # selector scoping via the stored GIN
    assert total(eng.pyroscope_render(selector='{env="prod"}')) == 60
    assert total(eng.pyroscope_render(selector='{env="dev"}')) == 30
    # global pseudo-label + kv matcher combined
    assert (
        total(
            eng.pyroscope_render(
                selector='{service_name="api", env="prod"}'
            )
        )
        == 15
    )
    # type id scopes series AND value slot; wrong type → empty
    tid = "process_cpu:cpu:nanoseconds:cpu:nanoseconds"
    assert total(eng.pyroscope_render(profile_type_id=tid)) == 90
    wrong = "process_cpu:alloc:bytes:cpu:nanoseconds"
    assert total(eng.pyroscope_render(profile_type_id=wrong)) == 0
    # combined type{selector} query string (detachTypeId, prof.go:686)
    assert total(eng.pyroscope_render(selector=tid + '{env="dev"}')) == 30
    # function names survive to the merged rows
    from gigapipe_spark.prof.tree import merge_trees, resolve_functions

    prof = eng._stored_profiles(None, '{env="prod"}', None)
    named = {
        r["fn_name"]
        for r in resolve_functions(merge_trees(prof), prof).collect()
    }
    assert named == {"main", "handle", "db"}
    # diff over the stored tree layout
    diff = {
        r["fn_id"]: r
        for r in eng.pyroscope_render_diff("api", "worker").collect()
    }
    assert len(diff) == 3


def test_store_pyroscope_pprof_end_to_end(spark, tmp_path):
    """pprof BYTES → pprof_folded → folded_profiles_input →
    profiles_fanout → selector-scoped store render."""
    import gzip

    from gigapipe_spark.sources import protowire as pw
    from gigapipe_spark.sources.ingest import folded_profiles_input
    from gigapipe_spark.storage.query import StoreEngine
    from gigapipe_spark.storage.writer import profiles_fanout

    # reuse the wire-level fixture builder shape from test_protowire
    strings = [b"", b"main", b"foo", b"bar"]
    funcs = [pw.pb_encode([(1, 0, i + 1), (2, 0, i + 1)]) for i in range(3)]
    locs = [
        pw.pb_encode([(1, 0, i + 1), (4, 2, pw.pb_encode([(1, 0, i + 1)]))])
        for i in range(3)
    ]
    s1 = pw.pb_encode([(1, 0, 2), (1, 0, 1), (2, 0, 5)])
    s2 = pw.pb_encode([(1, 0, 3), (1, 0, 2), (1, 0, 1), (2, 0, 7)])
    fields = [(2, 2, s1), (2, 2, s2)]
    fields += [(4, 2, l) for l in locs]
    fields += [(5, 2, f) for f in funcs]
    fields += [(6, 2, s) for s in strings]
    body = gzip.compress(pw.pb_encode(fields))

    raw = spark.createDataFrame(
        [("p1", bytearray(body))], "profile_id string, payload binary"
    )
    folded = pw.pprof_folded(raw).select(
        "profile_id",
        F.lit(T0).alias("timestamp_ns"),
        F.lit("process_cpu").alias("type"),
        F.lit("api").alias("service_name"),
        F.lit("cpu").alias("period_type"),
        F.lit("nanoseconds").alias("period_unit"),
        F.create_map(F.lit("env"), F.lit("prod")).alias("tags"),
        F.lit(0).cast("long").alias("duration_ns"),
        "line",
    )
    cat = Catalog(str(tmp_path / "pprofstore"))
    profiles_fanout(
        folded_profiles_input(folded, "cpu", "nanoseconds").coalesce(1), cat
    )
    eng = StoreEngine(spark, cat.root, catalog=cat)
    levels = eng.pyroscope_render(selector='{env="prod"}')
    by_name_total = sum(d["total"] for d in levels[0])
    assert by_name_total == 12  # main subtree: 5 + 7
    assert eng.pyroscope_render(selector='{env="staging"}') == []


def test_oid_multi_tenant_isolation(spark, tmp_path):
    """Reference parity: every stored table carries the org id and
    leads its partition spec with it (traces.sql:8,18-19; log.sql:22),
    so one store root serves isolated tenants."""
    root = str(tmp_path / "mt")

    def push(oid, app, line):
        payload = json.dumps(
            {
                "streams": [
                    {"stream": {"app": app}, "values": [[str(T0), line]]}
                ]
            }
        )
        raw = spark.createDataFrame([(payload,)], "payload string")
        cat = Catalog(root, oid=oid)
        ingest_fanout(ingest.loki_push(raw).coalesce(1), cat)
        return cat

    cat_a = push("0", "web", "tenant a line")
    cat_b = push("acme", "web", "tenant b line")

    # physical layout: oid leads the partition dirs
    import os

    assert sorted(
        n for n in os.listdir(cat_a.path("samples")) if n.startswith("oid=")
    ) == ["oid=0", "oid=acme"]

    # reads are tenant-scoped end-to-end
    ctx_a = store_logql_context(spark, cat_a)
    ctx_b = store_logql_context(spark, cat_b)
    rows_a = query_range(ctx_a, '{app="web"}').df.collect()
    rows_b = query_range(ctx_b, '{app="web"}').df.collect()
    assert [r["string"] for r in rows_a] == ["tenant a line"]
    assert [r["string"] for r in rows_b] == ["tenant b line"]
    assert cat_a.read_series(spark).count() == 1
    assert cat_b.read_series(spark).count() == 1
    # unknown tenant sees nothing
    assert Catalog(root, oid="ghost").read(spark, "samples").count() == 0


def test_oid_rotation_preserves_tenant_level(spark, tmp_path):
    """TTL rotation walks the oid-led layout and keeps the tenant level
    in tier moves."""
    import datetime
    import os

    from gigapipe_spark.storage.maintenance import (
        RotatePolicy,
        rotate,
        tier_root,
    )

    root = str(tmp_path / "rotstore")
    old_ns = int(
        datetime.datetime(
            2023, 1, 1, tzinfo=datetime.timezone.utc
        ).timestamp()
        * 1e9
    )
    for oid in ("0", "acme"):
        payload = json.dumps(
            {
                "streams": [
                    {"stream": {"app": "w"}, "values": [[str(old_ns), "x"]]}
                ]
            }
        )
        raw = spark.createDataFrame([(payload,)], "payload string")
        ingest_fanout(
            ingest.loki_push(raw).coalesce(1), Catalog(root, oid=oid)
        )
    cat = Catalog(root)
    res = rotate(
        spark,
        cat,
        drop_days=10_000,
        policies=(RotatePolicy(ttl_days=30, move_to="cold"),),
        tables=("samples",),
    )
    assert len(res["moved"]) == 2  # one date partition per tenant
    cold = os.path.join(tier_root(cat, "cold"), "samples")
    assert sorted(os.listdir(cold)) == ["oid=0", "oid=acme"]


def test_store_pyroscope_planner_endpoints(spark, tmp_path):
    """Round-6: the full querier.v1 planner surface over the STORED
    profiles tables (label names/values, select-series, series,
    profile-types, stats, analyze, merge, dot)."""
    from gigapipe_spark.storage.query import StoreEngine

    cat = _folded_profiles_seed(spark, tmp_path)
    eng = StoreEngine(spark, cat.root, catalog=cat)

    names = {r["key"] for r in eng.pyroscope_label_names().collect()}
    # series tags + the writer-appended service_name (profiles.sql:78)
    assert names == {"env", "svc", "service_name"}
    vals = {r["val"] for r in eng.pyroscope_label_values("env").collect()}
    assert vals == {"prod", "dev"}
    scoped = {
        r["val"]
        for r in eng.pyroscope_label_values(
            "env", ['{service_name="worker"}']
        ).collect()
    }
    assert scoped == {"prod"}

    rows = eng.pyroscope_series(['{env="prod"}']).collect()
    assert len(rows) == 2  # api+prod, worker+prod
    assert all(r["labels"]["env"] == "prod" for r in rows)

    ss = eng.pyroscope_select_series(
        '{env="prod"}', ["svc"], step_ns=10_000_000_000
    ).collect()
    assert {r["svc"] for r in ss} == {"api", "worker"}

    pt = eng.pyroscope_profile_types().collect()
    assert len(pt) == 1
    assert pt[0]["profile_type_id"] == (
        "process_cpu:cpu:nanoseconds:cpu:nanoseconds"
    )

    st = eng.pyroscope_profile_stats().collect()[0]
    assert st["data_ingested"] is True
    assert st["oldest_profile_time_ms"] == T0 // 1_000_000

    an = eng.pyroscope_analyze('{env="prod"}').collect()[0]
    assert an["fingerprint_count"] == 2
    assert an["profile_size"] > 0

    merged = {
        r["fn_id"]: r
        for r in eng.pyroscope_merge_profiles('{env="dev"}').collect()
    }
    assert len(merged) == 3  # main/handle/db of the dev profile only

    dot = eng.pyroscope_render_dot(selector='{env="dev"}')
    assert dot.startswith("digraph") and "handle" in dot


def test_store_patterns_side_channel_and_cross_flush_merge(spark, tmp_path):
    """ingest_fanout mines every pushed log line into the stored
    `patterns` table (controller.go:71,132-187); two separate flushes
    merge on read (planner_patterns.go:10). The ruler writeback path
    must NOT mine (the reference's ClusterLines hook sits in doParse,
    which recording_writeback bypasses)."""
    from gigapipe_spark.storage.query import StoreEngine

    cat = Catalog(str(tmp_path / "pstore"))

    def push(app, lines, t_off=0):
        payload = json.dumps({
            "streams": [{
                "stream": {"app": app},
                "values": [
                    [str(T0 + t_off + i * 1_000_000_000), ln]
                    for i, ln in enumerate(lines)
                ],
            }]
        })
        ingest_fanout(
            ingest.loki_push(
                spark.createDataFrame([(payload,)], "payload string")
            ).coalesce(1),
            cat,
        )

    push("web", ["login ok", "login ok", "logout done"])
    push("api", ["login ok"], t_off=3_000_000_000)  # second flush

    stored = cat.read(spark, "patterns")
    assert stored.count() >= 3  # per-flush clusters present
    assert {"tokens", "classes", "overall_cost", "generalized_cost",
            "samples_count", "pattern_id", "timestamp_10m"} <= set(
        stored.columns)

    eng = StoreEngine(spark, cat.root, catalog=cat)
    rows = eng.loki_patterns('{app=~"web|api"}').collect()
    # the reference HAVING drops single-occurrence patterns
    # (planner_patterns.go:45), so only 'login ok' (2 web + 1 api)
    assert [(r["pattern"], r["total"]) for r in rows] == [("login ok", 3)]
    # samples: (step-bucketed second, count) sorted — both flushes land
    # in the same 10m bucket here, so one merged cell of 3
    assert [(s["timestamp_s"], s["count"]) for s in rows[0]["samples"]] \
        == [(T0 // 1_000_000_000 - (T0 // 1_000_000_000) % 600, 3)]

    # selector scoping: web-only sees its own two, still over the gate
    rows = eng.loki_patterns('{app="web"}').collect()
    assert [(r["pattern"], r["total"]) for r in rows] == [("login ok", 2)]

    # metric-only flush adds no pattern rows
    n_before = cat.read(spark, "patterns").count()
    payload = json.dumps({
        "streams": [{
            "stream": {"app": "m"},
            "entries": [{"ts": str(T0), "value": 1.5}],
        }]
    })
    ingest_fanout(
        ingest.loki_push(
            spark.createDataFrame([(payload,)], "payload string")
        ).coalesce(1),
        cat,
    )
    assert cat.read(spark, "patterns").count() == n_before


def test_store_tail_poll_prunes_scan(spark, tmp_path):
    """Each tail poll after the first threads last_seen+1 into the
    store context, so the samples scan carries BOTH the raw-ts
    predicate and the (oid, date) partition filters — a year-deep
    store is never re-scanned per poll (query_range.go:670)."""
    from gigapipe_spark.streaming.ruler import Tailer

    cat = _seed(spark, tmp_path)
    created = []

    def factory():
        c = store_logql_context(spark, cat)
        created.append(c)
        return c

    t = Tailer(logctx_factory=factory, query='{app="web"}')
    first = t.poll()
    assert len(first) == 6 and t.last_ts_ns == T0 + 50_000_000_000
    assert t.poll() == []  # nothing new

    ctx2 = created[-1]
    assert ctx2.start_ns == t.last_ts_ns + 1
    plan = ctx2.samples()._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "timestamp_ns" in plan
    # the date partition filter is present (not an empty filter list)
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "date" in m.group(1)
