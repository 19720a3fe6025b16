"""Ancestor-closure depth cap: configurable, counted, never silent
(VERDICT r7 task 5 / watch item b)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gigapipe_spark.sources.views import (
    ANCESTOR_DEPTH_CONF,
    ancestors_from_spans,
    span_ancestors,
)
from gigapipe_spark.telemetry import TELEMETRY


def _chain_spans(spark, depth: int):
    """One trace with a single parent chain s0 <- s1 <- ... <- s{d-1}."""
    rows = [("t1", f"s{i}", f"s{i-1}" if i else "") for i in range(depth)]
    return spark.createDataFrame(
        rows, "trace_id string, span_id string, parent_id string"
    )


def _counter(max_depth: int) -> float:
    key = (
        "ancestor_closure_truncated_spans",
        (("max_depth", str(max_depth)),),
    )
    return TELEMETRY._counters.get(key, 0.0)


def test_uncapped_chain_has_full_closure_and_no_counter(spark):
    before = _counter(8)
    out = ancestors_from_spans(_chain_spans(spark, 5), max_depth=8)
    # closure of a 5-chain: sum(1..4) = 10 pairs
    assert out.count() == 10
    assert _counter(8) == before


def test_capped_chain_fires_truncation_counter(spark):
    df = _chain_spans(spark, 12)
    before = _counter(4)
    out = ancestors_from_spans(df, max_depth=4)
    # every span gets at most 4 ancestors; deepest spans are truncated
    got = {
        (r["span_id"], r["anc_id"])
        for r in out.collect()
    }
    assert ("s11", "s7") in got       # depth-4 ancestor kept
    assert ("s11", "s6") not in got   # depth-5 ancestor truncated
    # spans s5..s11 have chains longer than 4 → 7 truncated spans
    assert _counter(4) - before == 7.0


def test_depth_cap_is_a_session_setting(spark):
    """span_ancestors resolves the cap from the session conf and caches
    per depth."""
    sf = "/root/testdata/sf0.001"
    default = span_ancestors(spark, sf)
    old = spark.conf.get(ANCESTOR_DEPTH_CONF, None)
    try:
        spark.conf.set(ANCESTOR_DEPTH_CONF, "3")
        shallow = span_ancestors(spark, sf)
        # fixture hierarchy is depth ≤ 2, so the closures agree — the
        # point is that the conf path resolves and caches separately
        assert shallow.count() == default.count()
    finally:
        if old is None:
            spark.conf.unset(ANCESTOR_DEPTH_CONF)
        else:
            spark.conf.set(ANCESTOR_DEPTH_CONF, old)


def test_closure_duplicate_insensitive_consumers(spark):
    """The closure intentionally skips a global distinct (single-parent
    hierarchies give path-unique pairs); duplicated span ROWS still
    yield correct structural results because consumers dedup."""
    df = _chain_spans(spark, 4)
    dup = df.unionByName(df)  # simulate a double-written store segment
    out = ancestors_from_spans(dup, max_depth=8)
    pairs = {(r["span_id"], r["anc_id"]) for r in out.collect()}
    want = {
        (f"s{i}", f"s{j}") for i in range(1, 4) for j in range(i)
    }
    assert pairs == want
