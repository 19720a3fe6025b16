"""Derived observability views over the driver-provided testdata.

The reference's store holds a unified log/metric fact table (samples), a
series dimension (time_series), a label inverted index (gin) and a span
store (ref: ctrl/qryn/sql/log.sql, traces.sql). The driver's testdata is a
TPC-H-ish star schema + an `events` stream (TESTDATA.md). This module maps
the testdata onto the observability model with DETERMINISTIC, pure-SQL
transforms so the DuckDB oracle can derive byte-identical inputs
(see sources/oracle.py for the matching SQL):

  events   → samples / time_series / gin   (logs + metrics)
  orders   → root spans   (one trace per order)
  lineitem → child spans  (one span per line item, parented to the root)

Mapping contract (keep in lockstep with oracle.py):
  fingerprint  = user_id * 8 + type_code(event_type)
  timestamp_ns = unix_micros(ts) * 1000
  labels       = {app: event_type, instance: 'u'||user_id,
                  level: 'error' if event_type='error' else 'info'}
  counter      = fmod(cumsum(value) over series, 1000)  # resets for rate tests

All ts columns are Int64 nanoseconds (SURVEY §1.1: never TimestampType).
Filters and projections on these views still reach the parquet scan —
they are plain column expressions, no UDFs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Some generations of the driver testdata store `ts` as
    # TIMESTAMP(NANOS), which Spark only reads (as Int64 ns) with this
    # legacy conf. It is session-scoped and runtime-settable; set it here
    # so the engine works under ANY SparkSession, not just ours
    # (the correctness driver builds its own session without it). With
    # TIMESTAMP(MICROS) files the conf is a no-op; _ts_ns() adapts.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _ts_ns(df: DataFrame, col: str = "ts"):
    """Nanosecond epoch from `ts` regardless of how the parquet stored it:
    Int64 ns (TIMESTAMP(NANOS) + nanosAsLong, truncated to µs because the
    DuckDB oracle reads the same column at µs precision) or a µs
    timestamp (TIMESTAMP(MICROS) → ntz; cast via session-UTC is lossless).
    """
    dtype = dict(df.dtypes)[col]
    if dtype in ("bigint", "long"):
        raw = F.col(col).cast("long")
        return raw - F.pmod(raw, F.lit(1000))
    return F.unix_micros(F.col(col).cast("timestamp")) * F.lit(1000)


def _type_code():
    c = F.when(F.col("event_type") == "click", F.lit(0))
    for i, t in enumerate(EVENT_TYPES[1:], start=1):
        c = c.when(F.col("event_type") == t, F.lit(i))
    return c.otherwise(F.lit(7))


def _labels_col():
    return F.create_map(
        F.lit("app"),
        F.col("event_type"),
        F.lit("instance"),
        F.concat(F.lit("u"), F.col("user_id").cast("string")),
        F.lit("level"),
        F.when(F.col("event_type") == "error", F.lit("error")).otherwise(F.lit("info")),
    )


def _raw_ts_bound(df: DataFrame, op: str, bound_ns: int):
    """Predicate on the RAW parquet `ts` column for a ns epoch bound —
    the form that reaches the scan as a parquet row-group filter
    (PushedFilters), unlike a predicate on the derived timestamp_ns.
    ±1µs slack covers the µs truncation of the derived column; exact
    trimming happens downstream on timestamp_ns. Ref: the reference
    emits raw `timestamp_ns >= / <` + date bounds in every planner
    (stream_select.go:76)."""
    dtype = dict(df.dtypes)["ts"]
    if dtype in ("bigint", "long"):
        lit = F.lit(bound_ns - 1000 if op == ">=" else bound_ns + 1000)
    else:
        us = bound_ns // 1000 + (-1 if op == ">=" else 2)
        lit = F.timestamp_micros(F.lit(us)).cast(dict(df.dtypes)["ts"])
    return F.col("ts") >= lit if op == ">=" else F.col("ts") < lit


def samples(
    spark: SparkSession,
    sf_dir: str,
    start_ns: int | None = None,
    end_ns: int | None = None,
) -> DataFrame:
    """Unified fact table (ref samples_v3, log.sql:25-32) from `events`.

    `string` carries the JSON props payload (the "log line"); `value` the
    numeric sample. type=1 (logs) — LogQL range aggregations turn these
    into metrics inside a query with no copy, like the reference.
    """
    ev = load_table(spark, sf_dir, "events")
    if start_ns is not None:
        ev = ev.filter(_raw_ts_bound(ev, ">=", start_ns))
    if end_ns is not None:
        ev = ev.filter(_raw_ts_bound(ev, "<", end_ns))
    return ev.select(
        (F.col("user_id") * 8 + _type_code()).alias("fingerprint"),
        _ts_ns(ev).alias("timestamp_ns"),
        F.col("value").cast("double").alias("value"),
        F.col("props").alias("string"),
        F.lit(1).cast("byte").alias("type"),
    )


def metric_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counter-shaped metric series (for PromQL rate/increase/resets tests).

    counter = fmod(running_sum(value), 1000) per fingerprint → monotone
    within a cycle with deliberate resets, exactly the shape the
    reference's counter logic handles (ref: promql planner counter.go).

    Session-cached as a FACT view (heap-gated like spans/attr_map):
    the running-sum window is VALUE SYNTHESIS — fixture plumbing
    standing in for the stored samples table's value column, which a
    deployment reads straight from parquet (the store-backed
    StorePromQLContext.metrics does exactly that) — and uncached it
    re-paid a full fact shuffle + sort + window on EVERY PromQL
    execution (measured r14: the whole-plan floor of
    promql_instant_sum_by). Under the cache-if-fits gate small heaps
    still stream the plan per query — slower, never fatal.

    GIGAPIPE_NO_METRIC_SAMPLES_CACHE=1 bypasses the cache (plan memo
    only): the A/B knob for the r14 in-bench datapipe-regression
    root-cause (VERDICT r15 task 1) — it isolates whether THIS cache's
    storage-memory footprint is what slows the untouched
    dedup_minhash_lsh / sim_cosine_topk entries mid-bench."""

    def build():
        w = (
            Window.partitionBy("fingerprint")
            .orderBy("timestamp_ns")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return samples(spark, sf_dir).select(
            "fingerprint",
            "timestamp_ns",
            (F.sum("value").over(w) % F.lit(1000.0)).alias("value"),
            F.lit("").alias("string"),
            F.lit(2).cast("byte").alias("type"),
        )

    if os.environ.get("GIGAPIPE_NO_METRIC_SAMPLES_CACHE"):
        memo = _dim_memo(spark)
        key = (sf_dir, "metric_samples")
        if key not in memo:
            memo[key] = build()  # plan memo, data streams per query
        return memo[key]
    return _cached(spark, sf_dir, "metric_samples", build, fact=True)


# Dimension cache: in the reference these are real stored tables
# (time_series / gin MVs); here they are derived from events, so cache
# the (small) result per session+sf_dir instead of re-shuffling the fact
# table for every query. Fact-table views are NOT cached — they must
# stream from parquet with pushdown.
#
# Keyed on the session OBJECT (not id(spark)) so id()-reuse can never
# alias a dead session's cache to a new one. Weak keying alone cannot
# evict — the cached DataFrames strongly reference their session,
# keeping the weak key alive (ADVICE r13) — so eviction is a
# stopped-session sweep on each access, which is what actually frees
# the top driver-heap offender in a long multi-session run.
import weakref as _weakref

_dim_cache_by_session: "_weakref.WeakKeyDictionary[SparkSession, dict]" = (
    _weakref.WeakKeyDictionary()
)


def _dim_memo(spark: SparkSession) -> dict:
    from gigapipe_spark.session import evict_stopped_sessions

    evict_stopped_sessions(_dim_cache_by_session)
    return _dim_cache_by_session.setdefault(spark, {})


# fact-sized caches need this much JVM heap to coexist with 32-wide
# execution; below it they stream from parquet instead (cache-if-fits)
_FACT_CACHE_MIN_HEAP = 4 * 1024**3


def _fact_cache_ok(spark: SparkSession, sf_dir: str) -> bool:
    """Cache-if-fits gate for FACT-sized session views (the exploded
    GIN, the attr map, the ancestor closure). In local mode storage and
    execution share ONE heap: materializing a multi-million-row
    columnar cache under a stock 1 GiB driver killed the JVM outright
    (sf0.1 vanilla sweep: OutOfMemoryError in the cache-build stage,
    32 task pages + batch builders + pinned storage). Real engines size
    caches to memory — under the floor the view streams from parquet
    per query: slower, never fatal. Dimension caches (a few MB,
    coalesce(16)) always cache, and small fixtures (≤ the driver-gate
    sf0.01 footprint) stay cached under any heap — their caches are
    kilobytes and the correctness driver runs exactly that shape."""
    try:
        jvm = spark.sparkContext._jvm
        if jvm.java.lang.Runtime.getRuntime().maxMemory() >= (
            _FACT_CACHE_MIN_HEAP
        ):
            return True
    except Exception:
        # FAIL CLOSED (ADVICE r13): an unreadable heap probe must mean
        # "stream from parquet", not "cache anyway" — caching on doubt
        # reproduces the exact OutOfMemoryError this gate prevents
        return False
    # small-heap fallback: cache only fixtures at-or-under the
    # driver-gate footprint. os.walk, not a top-level glob — the
    # fixture tables may be partitioned dataset DIRECTORIES, which a
    # flat '*.parquet' listing totals as ~0 bytes (ADVICE r13)
    try:
        total = 0
        for dirpath, _dirnames, filenames in os.walk(sf_dir):
            total += sum(
                os.path.getsize(os.path.join(dirpath, f))
                for f in filenames
                if f.endswith(".parquet")
            )
    except OSError:
        return False
    return total <= 8 * 1024 * 1024


def _cached(
    spark: SparkSession, sf_dir: str, name: str, build, fact: bool = False
) -> DataFrame:
    memo = _dim_memo(spark)
    key = (sf_dir, name)
    if key not in memo:
        # Dimension builds are compacted to a few fat partitions: a
        # build that ran through a shuffle inherits
        # spark.sql.shuffle.partitions (200 under a vanilla session),
        # and every later stage reading the cache would schedule one
        # task per ~300-row sliver — pure scheduler overhead. One
        # coalesce at build time fixes the read side for the session.
        #
        # FACT-sized views (spans / attr_map / span_attrs / the
        # ancestor closure — the fixture analogs of ingest-maintained
        # stored tables) must NOT collapse to 16 partitions: caching
        # then runs ~16-way no matter how many cores exist, and every
        # later scan of the cache is capped at 16 tasks (measured at
        # 30×: the span_attrs explode cached 112M rows through 16
        # slivers). They keep at least the session's parallelism.
        df = build()
        if fact:
            cores = spark.sparkContext.defaultParallelism
            if df.rdd.getNumPartitions() > 4 * cores:
                df = df.coalesce(2 * cores)
            if not _fact_cache_ok(spark, sf_dir):
                # memoize the PLAN (compile once) but stream the data:
                # under a small heap the cache build itself is fatal
                memo[key] = df
                return df
        else:
            df = df.coalesce(16)
        memo[key] = df.cache()
    return memo[key]


def time_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Series dimension (ref time_series, log.sql:16-23): fingerprint → labels.

    Small by construction (one row per distinct label set) — always the
    broadcast side of the samples join at scale.
    """

    def build():
        ev = load_table(spark, sf_dir, "events")
        return (
            ev.select("user_id", "event_type")
            .distinct()
            .select(
                (F.col("user_id") * 8 + _type_code()).alias("fingerprint"),
                _labels_col().alias("labels"),
                F.lit(1).cast("byte").alias("type"),
            )
        )

    return _cached(spark, sf_dir, "time_series", build)


def time_series_gin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label inverted index (ref time_series_gin, log.sql:62-80) =
    explode(time_series.labels)."""

    def build():
        ts = time_series(spark, sf_dir)
        return ts.select(
            "fingerprint", "type", F.explode("labels").alias("key", "val")
        ).select("key", "val", "fingerprint", "type")

    return _cached(spark, sf_dir, "time_series_gin", build)


def _lineitem_with_span_no(li: DataFrame) -> DataFrame:
    """lineitem + a deterministic unique span ordinal.

    The synthetic lineitem has duplicate (orderkey, linenumber) pairs
    (full rows ARE unique), so the span id needs a disambiguator:
    row_number over a total order of the remaining columns — identical
    in Spark and the DuckDB oracle.
    """
    w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
        "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
    )
    return li.withColumn("__sn", F.row_number().over(w))


def _li_span_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The windowed lineitem both span layouts consume, built ONCE per
    session: `spans` and `span_attr_map` each need the row_number
    disambiguation window, and before this was shared each paid its own
    full-lineitem sort+window (the dominant trace view-build cost —
    ~30s apiece at 30× sf0.1). Projected to the columns the two span
    layouts actually use before caching."""
    return _cached(
        spark,
        sf_dir,
        "lineitem_span_base",
        lambda: _lineitem_with_span_no(
            load_table(spark, sf_dir, "lineitem")
        ).select(
            "l_orderkey", "l_linenumber", "__sn", "l_shipdate",
            "l_extendedprice", "l_returnflag", "l_linestatus", "l_quantity",
        ),
        fact=True,
    )


def _span_id_col():
    return F.concat(
        F.lit("s"),
        F.col("l_orderkey").cast("string"),
        F.lit("_"),
        F.col("l_linenumber").cast("string"),
        F.lit("_"),
        F.col("__sn").cast("string"),
    )


def spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span fact table (ref tempo_traces, traces.sql:7-18).

    One trace per order: a root span from `orders`, child spans from
    `lineitem` parented to the root. Durations derived from prices
    (floor(price*1000) ns) so duration filters/histograms have spread.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = _li_span_base(spark, sf_dir)
    root = orders.select(
        F.concat(F.lit("t"), F.col("o_orderkey").cast("string")).alias("trace_id"),
        F.concat(F.lit("s"), F.col("o_orderkey").cast("string"), F.lit("_0")).alias(
            "span_id"
        ),
        F.lit("").alias("parent_id"),
        F.lit("order").alias("name"),
        (F.unix_micros(F.col("o_orderdate").cast("timestamp")) * 1000).alias("timestamp_ns"),
        F.floor(F.col("o_totalprice") * 1000).cast("long").alias("duration_ns"),
        F.concat(F.lit("svc-"), F.col("o_orderpriority")).alias("service_name"),
    )
    child = li.select(
        F.concat(F.lit("t"), F.col("l_orderkey").cast("string")).alias("trace_id"),
        _span_id_col().alias("span_id"),
        F.concat(F.lit("s"), F.col("l_orderkey").cast("string"), F.lit("_0")).alias(
            "parent_id"
        ),
        F.lit("item").alias("name"),
        (F.unix_micros(F.col("l_shipdate").cast("timestamp")) * 1000).alias("timestamp_ns"),
        F.floor(F.col("l_extendedprice") * 1000).cast("long").alias("duration_ns"),
        F.lit("svc-item").alias("service_name"),
    )
    # cached: the row_number disambiguation window would otherwise re-run
    # per query — a real deployment reads spans from a stored table
    return _cached(spark, sf_dir, "spans", lambda: root.unionByName(child), fact=True)


def span_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exploded span attribute index (ref tempo_traces_attrs_gin,
    traces.sql:21-31). Derived from the cached per-span map with ONE
    explode — the map and the GIN share a single underlying build, so a
    cold session pays the expensive row_number/union pass once, not once
    per layout (the old groupBy+collect_list rebuild of the map from the
    exploded form was the dominant cold-start cost of every TraceQL
    metrics entry)."""

    # ADAPTIVELY cached: the explode multiplies the attr map by
    # avg_attrs (~5×), so caching the exploded form of a LARGE corpus
    # (112M rows at 30× sf0.1) pins gigabytes of redundant rows and
    # costs a 30s+ one-time materialization, while deriving it per
    # consumer is one streaming pass over the cached map. At dimension
    # scale the cache is the right call (~0.2s/query measured at sf0.1);
    # past the threshold, derive. At real scale the exploded GIN is a
    # stored table (traces.sql:21-31), not a session cache — the store
    # context reads that instead.
    def build():
        return span_attr_map(spark, sf_dir).select(
            "trace_id",
            "span_id",
            "timestamp_ns",
            "duration",
            F.explode("attrs").alias("key", "val"),
        )

    memo = _dim_memo(spark)
    key = (sf_dir, "span_attrs_cacheable")
    if key not in memo:
        # one cheap count over the already-cached map decides the
        # layout for the session
        memo[key] = (
            span_attr_map(spark, sf_dir).count() <= 5_000_000
        )
    if memo[key]:
        return _cached(spark, sf_dir, "span_attrs", build, fact=True)
    return build()


def attr_stats(spark: SparkSession, sf_dir: str) -> dict | None:
    """Per-(key, val) attr-index row counts — the session twin of the
    index statistics every real engine keeps next to its GIN (the
    reference's complexity probe counts attr-index rows per query,
    complexity_evaluator.go:31-67; with stats the same upper bound is a
    dict lookup, zero Spark jobs per query).

    Built ONCE per (session, sf) with one explode+groupBy job over the
    cached attr map, then memoized driver-side. Returns None — and
    memoizes the refusal — when the distinct-pair cardinality exceeds
    the driver-safe cap (a corpus with unbounded attr values, e.g.
    per-request ids): callers fall back to the scan probe. At store
    scale this is a WRITER-maintained table, not a session derivation;
    the session build is fixture plumbing."""
    memo = _dim_memo(spark)
    key = (sf_dir, "attr_stats")
    if key not in memo:
        cap = 100_000
        rows = (
            span_attr_map(spark, sf_dir)
            .select(F.explode("attrs").alias("key", "val"))
            .groupBy("key", "val")
            .count()
            .limit(cap + 1)
            .collect()
        )
        memo[key] = (
            None
            if len(rows) > cap
            else {(r["key"], r["val"]): r["count"] for r in rows}
        )
    return memo[key]


def span_attr_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-span attribute map (trace_id, span_id, timestamp_ns, duration,
    attrs map<string,string>) — the row-oriented twin of the exploded
    span_attrs GIN. Selector evaluation over this layout is ONE cached
    scan with zero shuffle (map lookups replace the groupBy-bitmask
    collapse); the exploded index remains the layout for key/value
    enumeration (tag autocomplete, compare). Built directly from the
    base projections (shuffle-free) — at scale both layouts are stored
    tables maintained at ingest, exactly like the reference's paired
    tempo_traces / tempo_traces_attrs_gin (traces.sql:7-31)."""
    orders = load_table(spark, sf_dir, "orders")
    li = _li_span_base(spark, sf_dir)
    root = orders.select(
        F.concat(F.lit("t"), F.col("o_orderkey").cast("string")).alias("trace_id"),
        F.concat(F.lit("s"), F.col("o_orderkey").cast("string"), F.lit("_0")).alias(
            "span_id"
        ),
        (F.unix_micros(F.col("o_orderdate").cast("timestamp")) * 1000).alias("timestamp_ns"),
        F.floor(F.col("o_totalprice") * 1000).cast("long").alias("duration"),
        F.create_map(
            F.lit("name"), F.lit("order"),
            F.lit("service.name"), F.concat(F.lit("svc-"), F.col("o_orderpriority")),
            F.lit("status"), F.col("o_orderstatus"),
            F.lit("priority"), F.col("o_orderpriority"),
        ).alias("attrs"),
    )
    child = li.select(
        F.concat(F.lit("t"), F.col("l_orderkey").cast("string")).alias("trace_id"),
        _span_id_col().alias("span_id"),
        (F.unix_micros(F.col("l_shipdate").cast("timestamp")) * 1000).alias("timestamp_ns"),
        F.floor(F.col("l_extendedprice") * 1000).cast("long").alias("duration"),
        F.create_map(
            F.lit("name"), F.lit("item"),
            F.lit("service.name"), F.lit("svc-item"),
            F.lit("returnflag"), F.col("l_returnflag"),
            F.lit("linestatus"), F.col("l_linestatus"),
            F.lit("quantity"), F.col("l_quantity").cast("string"),
        ).alias("attrs"),
    )
    return _cached(spark, sf_dir, "span_attr_map", lambda: root.unionByName(child), fact=True)


ANCESTOR_DEPTH_CONF = "spark.gigapipe.traceql.maxAncestorDepth"


def span_ancestors(
    spark: SparkSession, sf_dir: str, max_depth: int | None = None
) -> DataFrame:
    """Transitive ancestor closure (trace_id, span_id, anc_id) of the
    span hierarchy, cached per session+sf like the other dimension
    indexes. Structural TraceQL ops (&>> <<& !>> <<~) resolve against
    this with ONE join instead of an iterative per-query parent walk —
    the closure is query-independent, so at scale it is a stored index
    (size = spans × avg depth) maintained at ingest, not recomputed per
    query. Depth capped like the reference's recursion guards; the cap
    is a session setting (``spark.gigapipe.traceql.maxAncestorDepth``)
    and truncation is COUNTED and logged, never silent (VERDICT r7
    watch item b).
    """
    if max_depth is None:
        max_depth = int(spark.conf.get(ANCESTOR_DEPTH_CONF, "8"))
    return _cached(
        spark,
        sf_dir,
        f"span_ancestors@{max_depth}",
        lambda: ancestors_from_spans(spans(spark, sf_dir), max_depth),
        fact=True,
    )


def ancestors_from_spans(sp: DataFrame, max_depth: int = 8) -> DataFrame:
    """Closure builder over any spans DataFrame with (trace_id, span_id,
    parent_id) — shared by the fixture view and the store-backed TraceQL
    context (tempo_traces table).

    FRONTIER-DOUBLING closure (r9; the r8 probe measured ~3 s of fixed
    per-level scheduling/persist overhead with one sequential join per
    depth level): each round composes the exact-depth-r frontier with
    the closure-so-far, yielding depths r+1..2r at once, so a depth-D
    hierarchy costs ⌈log₂ D⌉ joins instead of D−1. Because parent
    chains are FUNCTIONAL (single-valued parent per span), every pair
    at depth d > r decomposes uniquely into (first r steps, remaining
    d−r), so the compose join produces no duplicate pairs — the
    no-distinct contract below still holds.

    If the frontier is still live at depth ``max_depth``, the spans
    whose parent chains remain unresolved are counted into the
    ``ancestor_closure_truncated_spans`` telemetry counter and logged —
    a capped closure silently misses deep &>>/<<& matches otherwise.
    The probe job only runs in the capped case; shallow hierarchies
    (the common shape) drain the frontier and pay nothing.
    """
    sp = sp.select("trace_id", "span_id", "parent_id")
    edges = (
        sp.filter(F.col("parent_id") != "")
        .select(
            "trace_id",
            "span_id",
            F.col("parent_id").alias("anc_id"),
            F.lit(1).alias("depth"),
        )
    )
    closure = edges.persist()
    frontier = closure  # pairs at EXACT depth r
    r = 1
    rounds = 0
    capped = r >= max_depth
    while r < max_depth:
        # persist + a partial isEmpty probe is safe HERE (unlike
        # dedup_components): rounds are never unpersisted, so the final
        # union's full action fills each round's cache exactly once
        if frontier.isEmpty():
            capped = False
            break
        step = min(r, max_depth - r)
        # frontier(exact r) ∘ closure(1..step) → depths r+1 .. r+step
        ext = closure.filter(F.col("depth") <= step).select(
            "trace_id",
            F.col("span_id").alias("anc_id"),
            F.col("anc_id").alias("next_anc"),
            F.col("depth").alias("ext_depth"),
        )
        new = (
            frontier.join(ext, ["trace_id", "anc_id"], "inner")
            .select(
                "trace_id",
                "span_id",
                F.col("next_anc").alias("anc_id"),
                (F.col("depth") + F.col("ext_depth")).alias("depth"),
            )
            .persist()
        )
        r += step
        rounds += 1
        frontier = new.filter(F.col("depth") == r)
        closure = closure.unionByName(new)
        capped = True
    from gigapipe_spark.telemetry import TELEMETRY

    # observability for the doubling property: rounds == ⌈log₂ r⌉, the
    # number of compose joins actually planned (pinned by the plan test)
    TELEMETRY.inc(
        "ancestor_closure_rounds", {"max_depth": str(max_depth)}, float(rounds)
    )
    if capped:
        parents = sp.select(
            "trace_id",
            F.col("span_id").alias("anc_id"),
            F.col("parent_id").alias("next_anc"),
        )
        deeper = (
            closure.filter(F.col("depth") == max_depth)
            .join(parents, ["trace_id", "anc_id"], "inner")
            .filter(F.col("next_anc") != "")
        )
        n_trunc = deeper.select("span_id").distinct().count()
        if n_trunc:
            import logging

            TELEMETRY.inc(
                "ancestor_closure_truncated_spans",
                {"max_depth": str(max_depth)},
                float(n_trunc),
            )
            logging.getLogger(__name__).warning(
                "ancestor closure capped at depth %d: %d spans have "
                "unresolved parent chains (raise %s to extend)",
                max_depth,
                n_trunc,
                ANCESTOR_DEPTH_CONF,
            )
    out = closure.drop("depth")
    # no distinct: parent_id is single-valued per span, so each
    # (span, anc) pair arises from exactly one path, and every
    # consumer (compiler._ancestors semi-join, &>>/<<& distinct or
    # anti-join) is duplicate-insensitive anyway — a global shuffle
    # here bought nothing
    return out


def profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile fact table (ref profiles, profiles.sql:19-31) derived from
    orders/lineitem: one profile per order; call tree = root node (order
    total) + one child per distinct returnflag (summed item prices as
    self/total). Each node carries TWO named value slots — the pprof
    multi-sample-type shape (profiles.sql tree column:
    Array(Tuple(String, Int64, Int64)) values keyed "type:unit") —
    "cpu:nanoseconds" (price×1000) and "alloc_space:bytes" (price×100),
    so type-id-scoped merges (service/prof.go:135 strTypeID) have ≥2
    types to discriminate. Deterministic and oracle-expressible.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    flag_code = (
        F.when(F.col("l_returnflag") == "R", 1)
        .when(F.col("l_returnflag") == "A", 2)
        .otherwise(3)
    )
    per_flag = li.groupBy("l_orderkey", flag_code.alias("code")).agg(
        F.sum(F.floor(F.col("l_extendedprice") * 1000)).cast("long").alias("val"),
        F.sum(F.floor(F.col("l_extendedprice") * 100)).cast("long").alias("val_alloc"),
    )
    children = per_flag.groupBy("l_orderkey").agg(
        F.collect_list(
            F.struct(
                F.lit(0).cast("long").alias("parent"),
                F.col("code").cast("long").alias("id"),
                F.col("code").cast("long").alias("fn_id"),
                F.array(
                    F.struct(
                        F.lit("cpu:nanoseconds").alias("name"),
                        F.col("val").alias("self"),
                        F.col("val").alias("total"),
                    ),
                    F.struct(
                        F.lit("alloc_space:bytes").alias("name"),
                        F.col("val_alloc").alias("self"),
                        F.col("val_alloc").alias("total"),
                    ),
                ).alias("values"),
            )
        ).alias("kids")
    )
    root_node = F.struct(
        F.lit(0).cast("long").alias("parent"),
        F.lit(0).cast("long").alias("id"),
        F.lit(0).cast("long").alias("fn_id"),
        F.array(
            F.struct(
                F.lit("cpu:nanoseconds").alias("name"),
                F.lit(0).cast("long").alias("self"),
                F.floor(F.col("o_totalprice") * 1000).cast("long").alias("total"),
            ),
            F.struct(
                F.lit("alloc_space:bytes").alias("name"),
                F.lit(0).cast("long").alias("self"),
                F.floor(F.col("o_totalprice") * 100).cast("long").alias("total"),
            ),
        ).alias("values"),
    )
    fn_dict = F.array(
        *[
            F.struct(F.lit(i).cast("long").alias("id"), F.lit(n).alias("name"))
            for i, n in enumerate(["root", "flag_R", "flag_A", "flag_N"])
        ]
    )
    return (
        orders.join(children, orders.o_orderkey == children.l_orderkey, "inner")
        .select(
            (F.unix_micros(F.col("o_orderdate").cast("timestamp")) * 1000).alias(
                "timestamp_ns"
            ),
            F.col("o_orderkey").alias("fingerprint"),
            F.lit("process_cpu:cpu:nanoseconds").alias("type_id"),
            _sample_types_units().alias("sample_types_units"),
            F.concat(F.lit("svc-"), F.col("o_orderpriority")).alias("service_name"),
            F.floor(F.col("o_totalprice") * 1000).cast("long").alias("duration_ns"),
            F.concat(F.array(root_node), F.col("kids")).alias("tree"),
            fn_dict.alias("functions"),
        )
    )


def _sample_types_units():
    """profiles.sample_types_units (profiles.sql:23): the sample types
    this profile payload carries."""
    return F.array(
        F.struct(F.lit("cpu").alias("tp"), F.lit("nanoseconds").alias("unit")),
        F.struct(F.lit("alloc_space").alias("tp"), F.lit("bytes").alias("unit")),
    )


def rollup_15s(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The metrics_15s rollup as a cached derived table — at a real
    deployment this is the STORED table the always-on stream maintains
    (streaming/rollup.py); deriving it per session is fixture plumbing,
    same as the other dimension/index caches."""

    def build():
        from gigapipe_spark.streaming.rollup import rollup_15s_batch

        return rollup_15s_batch(metric_samples(spark, sf_dir))

    return _cached(spark, sf_dir, "rollup_15s", build)


def profiles_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profiles series dimension (ref profiles_series, profiles.sql:46-57):
    one row per profile fingerprint with the queryable columns the
    selector planners match globally (service_name, type_id) plus the
    tag map. Small (one row per order) — cached, always the broadcast
    side. Keep in lockstep with oracle.PROF_SERIES_CTE."""

    def build():
        orders = load_table(spark, sf_dir, "orders")
        return orders.select(
            F.col("o_orderkey").alias("fingerprint"),
            F.lit("process_cpu:cpu:nanoseconds").alias("type_id"),
            _sample_types_units().alias("sample_types_units"),
            F.concat(F.lit("svc-"), F.col("o_orderpriority")).alias("service_name"),
            F.create_map(
                F.lit("service_name"),
                F.concat(F.lit("svc-"), F.col("o_orderpriority")),
                F.lit("status"), F.col("o_orderstatus"),
                F.lit("priority"), F.col("o_orderpriority"),
            ).alias("labels"),
        )

    return _cached(spark, sf_dir, "profiles_series", build)


def profiles_gin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profiles label inverted index (ref profiles_series_gin,
    profiles.sql:60-71) = explode(profiles_series.labels)."""

    def build():
        return profiles_series(spark, sf_dir).select(
            "fingerprint", F.explode("labels").alias("key", "val")
        )

    return _cached(spark, sf_dir, "profiles_gin", build)


def documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")
