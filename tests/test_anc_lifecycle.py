"""Lifecycle of the stored ancestor-closure index (tempo_traces_anc):
rotation cascade, compaction, backfill-on-create coverage, and migration
of the r10 oid-only layout.

The reference expires every derived trace table with the same per-table
TTL clause (ctrl/qryn/sql/traces.sql); the Spark analog is the
(oid, date) partition layout + maintenance.rotate() walking ALL_TABLES.
Pairs are dated by their DESCENDANT span, so they expire in lockstep
with the span whose structural matches they serve."""

import json
import os
from datetime import date, datetime, timezone

from pyspark.sql import functions as F

from gigapipe_spark.sources import ingest
from gigapipe_spark.sources.views import ancestors_from_spans
from gigapipe_spark.storage.maintenance import ALL_TABLES, compact, rotate
from gigapipe_spark.storage.writer import (
    Catalog,
    anc_index_layout,
    spans_fanout,
)


def _day_us(d: str) -> int:
    return int(
        datetime.fromisoformat(d + "T12:00:00+00:00").timestamp()
    ) * 10**6


def _push(spark, cat, spans: list[dict]) -> None:
    payload = json.dumps(spans)
    spans_fanout(
        ingest.zipkin_spans(
            spark.createDataFrame([(payload,)], "payload string")
        ),
        cat,
    )


def _span(sid, tid, day, parent=None, svc="w"):
    s = {
        "id": sid,
        "traceId": tid,
        "name": "op",
        "timestamp": _day_us(day),
        "duration": 10,
        "localEndpoint": {"serviceName": svc},
    }
    if parent:
        s["parentId"] = parent
    return s


def _pairs(spark, cat):
    return {
        (r["trace_id"], r["span_id"], r["anc_id"])
        for r in cat.read(spark, "tempo_traces_anc")
        .select("trace_id", "span_id", "anc_id")
        .collect()
    }


def _scratch(spark, cat):
    return {
        (r["trace_id"], r["span_id"], r["anc_id"])
        for r in ancestors_from_spans(
            cat.read(spark, "tempo_traces").select(
                "trace_id", "span_id", "parent_id"
            ),
            8,
        ).collect()
    }


def test_anc_index_is_date_partitioned_and_in_all_tables(spark, tmp_path):
    cat = Catalog(str(tmp_path / "store"))
    _push(spark, cat, [_span("a0", "aa01", "2026-03-01"),
                       _span("b0", "aa01", "2026-03-01", parent="a0")])
    assert "tempo_traces_anc" in ALL_TABLES
    anc = cat.path("tempo_traces_anc")
    assert anc_index_layout(anc) == "new"
    assert os.path.isdir(os.path.join(anc, "oid=0", "date=2026-03-01"))


def test_rotate_expires_anc_pairs_with_their_spans(spark, tmp_path):
    """Expired dates disappear from the index like any other table, and
    structural answers over the retained store stay oracle-equal: the
    stored pairs, restricted to ancestors that still EXIST in the span
    scan (which is exactly the restriction every structural op applies
    via its selector semi-join), equal the closure rebuilt from the
    retained spans restricted the same way."""
    cat = Catalog(str(tmp_path / "store"))
    # old trace entirely on an expired date; a chain c->b->a where a,b
    # are old and c is recent (cross-date trace)
    _push(spark, cat, [
        _span("o0", "0ld1", "2026-01-01"),
        _span("o1", "0ld1", "2026-01-01", parent="o0"),
        _span("a0", "aa01", "2026-01-01"),
        _span("b0", "aa01", "2026-01-01", parent="a0"),
    ])
    _push(spark, cat, [
        _span("c0", "aa01", "2026-03-01", parent="b0"),
        _span("d0", "dd01", "2026-03-01"),
        _span("d1", "dd01", "2026-03-01", parent="d0"),
    ])
    res = rotate(
        spark, cat, drop_days=30, tables=ALL_TABLES,
        today=date.fromisoformat("2026-03-02"),
    )
    anc_dropped = [p for p in res["dropped"] if "tempo_traces_anc" in p]
    assert len(anc_dropped) == 1 and "date=2026-01-01" in anc_dropped[0]

    sid = lambda s: s.rjust(16, "0")
    retained_spans = {
        r["span_id"]
        for r in cat.read(spark, "tempo_traces").select("span_id").collect()
    }
    assert retained_spans == {sid("c0"), sid("d0"), sid("d1")}
    stored = {p for p in _pairs(spark, cat) if p[2] in retained_spans}
    scratch = {p for p in _scratch(spark, cat) if p[2] in retained_spans}
    assert stored == scratch
    assert (sid("d1"), sid("d0")) in {(s, a) for _, s, a in stored}


def test_compact_anc_merges_small_files(spark, tmp_path):
    cat = Catalog(str(tmp_path / "store"))
    for i in range(4):
        tid = f"aa{i:02d}"
        _push(spark, cat, [
            _span("a0", tid, "2026-03-01"),
            _span("b0", tid, "2026-03-01", parent="a0"),
        ])
    before = _pairs(spark, cat)
    part = os.path.join(
        cat.path("tempo_traces_anc"), "oid=0", "date=2026-03-01"
    )
    n_before = len([f for f in os.listdir(part) if f.endswith(".parquet")])
    assert n_before >= 4
    done = compact(spark, cat, "tempo_traces_anc")
    assert done == {"2026-03-01": n_before}
    n_after = len([f for f in os.listdir(part) if f.endswith(".parquet")])
    assert n_after == 1
    assert _pairs(spark, cat) == before


def test_backfill_covers_preindex_traces(spark, tmp_path):
    """ADVICE r10 (medium): a store written by a pre-index writer and
    then appended to must get a COMPLETE index — the first batch that
    creates the index directory backfills the closure of every stored
    trace, not just its own."""
    cat = Catalog(str(tmp_path / "store"))
    _push(spark, cat, [
        _span("a0", "aa01", "2026-03-01"),
        _span("b0", "aa01", "2026-03-01", parent="a0"),
        _span("c0", "aa01", "2026-03-01", parent="b0"),
    ])
    # simulate the pre-index writer: drop the index it built
    import shutil

    shutil.rmtree(cat.path("tempo_traces_anc"))
    # new writer appends an unrelated trace → index created via backfill
    _push(spark, cat, [
        _span("d0", "dd01", "2026-03-02"),
        _span("d1", "dd01", "2026-03-02", parent="d0"),
    ])
    assert _pairs(spark, cat) == _scratch(spark, cat)
    sid = lambda s: s.rjust(16, "0")
    anc_of_c0 = {a for _, s, a in _pairs(spark, cat) if s == sid("c0")}
    assert anc_of_c0 == {sid("b0"), sid("a0")}


def test_old_layout_ignored_by_reader_and_migrated_by_writer(spark, tmp_path):
    """An r10 oid-only index (no completeness guarantee) is never
    trusted by StoreTraceQLContext.ancestors() — it falls back to the
    on-the-fly closure — and the next spans batch rebuilds it into the
    dated layout with full coverage."""
    from gigapipe_spark.storage.query import store_traceql_context

    cat = Catalog(str(tmp_path / "store"))
    _push(spark, cat, [
        _span("a0", "aa01", "2026-03-01"),
        _span("b0", "aa01", "2026-03-01", parent="a0"),
    ])
    # rewrite the index in the r10 layout, PARTIAL on purpose (empty)
    import shutil

    anc = cat.path("tempo_traces_anc")
    shutil.rmtree(anc)
    spark.createDataFrame(
        [], "trace_id string, span_id string, anc_id string, oid string"
    ).write.partitionBy("oid").parquet(anc)
    # minting a parquet file under oid=0 to make it a real old layout
    spark.createDataFrame(
        [("x" * 32, "y" * 16, "z" * 16, "0")],
        "trace_id string, span_id string, anc_id string, oid string",
    ).write.mode("append").partitionBy("oid").parquet(anc)
    assert anc_index_layout(anc) == "old"

    sid = lambda s: s.rjust(16, "0")
    ctx = store_traceql_context(spark, cat)
    got = {(r["span_id"], r["anc_id"]) for r in ctx.ancestors().collect()}
    # reader ignored the bogus old-layout row and rebuilt on the fly
    assert got == {(sid("b0"), sid("a0"))}

    # writer migrates on the next batch: dated layout, full coverage,
    # bogus row gone
    _push(spark, cat, [
        _span("d0", "dd01", "2026-03-02"),
        _span("d1", "dd01", "2026-03-02", parent="d0"),
    ])
    assert anc_index_layout(anc) == "new"
    assert _pairs(spark, cat) == _scratch(spark, cat)
