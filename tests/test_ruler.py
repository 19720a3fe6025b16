"""Ruler (recording rules) + live tail over the derived store."""

from gigapipe_spark.logql.compiler import LogQLContext
from gigapipe_spark.streaming.ruler import RecordingRule, Ruler, Tailer
from tests.conftest import SF_DIR


def test_ruler_evaluates_and_writes_back(spark):
    written = []
    ruler = Ruler(
        spark,
        logctx_factory=lambda: LogQLContext(spark, SF_DIR),
        sink=lambda df: written.append(df),
    )
    ruler.add_rule(
        RecordingRule(
            name="error_rate_1h",
            query='sum by (app) (rate({app="error"}[1h]))',
            interval_ns=60_000_000_000,
        )
    )
    evals = ruler.tick(now_ns=1_000_000_000_000)
    assert len(evals) == 1 and evals[0].rows > 0
    out = written[0]
    row = out.limit(1).collect()[0]
    assert row["labels"]["__name__"] == "error_rate_1h"
    assert row["type"] == 2  # writeback lands as metrics
    # not due again until interval elapses
    assert ruler.tick(now_ns=1_000_000_001_000) == []
    assert len(ruler.tick(now_ns=1_061_000_000_000)) == 1


def test_tailer_polls_incrementally(spark):
    tail = Tailer(
        logctx_factory=lambda: LogQLContext(spark, SF_DIR),
        query='{app="error"}',
        max_rows_per_poll=50,
    )
    first = tail.poll()
    assert len(first) == 50  # capped
    assert tail.dropped == 1
    second = tail.poll()
    # strictly newer rows only
    assert min(r["timestamp_ns"] for r in second) > max(
        r["timestamp_ns"] for r in first
    )
    # drain fully, then an empty poll
    while tail.poll():
        pass
    assert tail.poll() == []


def test_promql_recording_rule(spark):
    # PromQL rule kind: evaluated via the PromQL compiler, written back
    # with the rule name as __name__ like the LogQL kind
    from gigapipe_spark.logql.compiler import LogQLContext
    from gigapipe_spark.streaming.ruler import RecordingRule, Ruler

    written = []
    r = Ruler(
        spark,
        logctx_factory=lambda: LogQLContext(spark, SF_DIR),
        sink=written.append,
    )
    r.add_rule(
        RecordingRule(
            name="job:click:rate10m",
            query='rate({app="click"}[10m])',
            interval_ns=60_000_000_000,
            lang="promql",
        )
    )
    evs = r.tick(now_ns=1)
    assert len(evs) == 1 and evs[0].rows > 0
    row = written[0].first()
    assert row["labels"]["__name__"] == "job:click:rate10m"
    assert row["type"] == 2 and row["string"] == ""


def test_rule_store_yaml_roundtrip_and_loader(spark):
    from gigapipe_spark.logql.compiler import LogQLContext
    from gigapipe_spark.streaming.rules_store import (
        Rule,
        RuleGroup,
        RuleStore,
        load_into_ruler,
    )
    from gigapipe_spark.streaming.ruler import Ruler

    store = RuleStore()
    store.load_yaml(
        "team-a",
        """
groups:
  - name: g1
    interval: 5m
    rules:
      - record: job:click:count5m
        expr: count_over_time({app="click"}[5m])
        labels: {team: a}
      - alert: NeverEvaluated
        expr: count_over_time({app="error"}[5m]) > 100
      - record: job:click:rate10m
        expr: rate({app="click"}[10m])
        lang: promql
""",
    )
    # CRUD verbs (router.go:18-23)
    assert set(store.all_rules()) == {"team-a"}
    g = store.get_rule_group("team-a", "g1")
    assert g is not None and g.interval_ns() == 300_000_000_000
    assert len(g.rules) == 3
    # YAML round-trip preserves the groups
    text = store.to_yaml("team-a")
    store2 = RuleStore()
    store2.load_yaml("team-a", text)
    assert store2.get_rule_group("team-a", "g1").rules[0].record == "job:click:count5m"

    written = []
    ruler = Ruler(
        spark,
        logctx_factory=lambda: LogQLContext(spark, SF_DIR),
        sink=written.append,
    )
    # only the 2 recording rules are registered (manager.go:53)
    assert load_into_ruler(store, ruler) == 2
    evs = ruler.tick(now_ns=1)
    assert len(evs) == 2
    row = written[0].first()
    assert row["labels"]["__name__"] == "job:click:count5m"
    assert row["labels"]["team"] == "a"  # static rule label merged

    store.delete_rule_group("team-a", "g1")
    assert store.get_rule_group("team-a", "g1") is None


def test_prometheus_rules_listing_with_health(spark):
    from gigapipe_spark.logql.compiler import LogQLContext
    from gigapipe_spark.streaming.ruler import RecordingRule, Ruler

    r = Ruler(
        spark,
        logctx_factory=lambda: LogQLContext(spark, SF_DIR),
        sink=lambda df: None,
    )
    r.add_rule(RecordingRule("ok_rule", 'count_over_time({app="click"}[5m])', 60))
    r.add_rule(RecordingRule("bad_rule", "not a query {{{", 60))
    r.tick(now_ns=1)
    listing = {x["name"]: x for x in r.prometheus_rules()}
    assert listing["ok_rule"]["health"] == "ok"
    assert listing["ok_rule"]["type"] == "recording"
    assert listing["bad_rule"]["health"] == "err"
    assert listing["bad_rule"]["lastError"]
    # a failing rule must not starve the scheduler: it reran on schedule
    assert "bad_rule" in r.last_run_ns


def test_store_ruler_writeback_roundtrip(spark, tmp_path):
    """Round-6: the reference's full ruler loop over a written store
    (writeback.go:20-54) — a rule evaluates over the stored tables, its
    samples land back in the store through ingest_fanout, and queries
    over the store see the recorded series."""
    import json as _json

    from gigapipe_spark.promql.compiler import query as promql_query
    from gigapipe_spark.sources import ingest
    from gigapipe_spark.storage.query import store_promql_context
    from gigapipe_spark.storage.writer import Catalog, ingest_fanout
    from gigapipe_spark.streaming.ruler import (
        RecordingRule,
        store_ruler,
        store_tailer,
    )

    t0 = 1_700_000_000_000_000_000
    payload = _json.dumps(
        {
            "streams": [
                {
                    "stream": {"app": "web"},
                    "values": [
                        [str(t0 + i * 1_000_000_000), f"hit {i}"]
                        for i in range(5)
                    ],
                }
            ]
        }
    )
    raw = spark.createDataFrame([(payload,)], "payload string")
    cat = Catalog(str(tmp_path / "rulestore"))
    ingest_fanout(ingest.loki_push(raw).coalesce(1), cat)

    ruler = store_ruler(spark, cat)
    ruler.add_rule(
        RecordingRule(
            name="web:lines:count30s",
            query='sum by (app) (count_over_time({app="web"}[30s]))',
            interval_ns=60_000_000_000,
            static_labels={"team": "obs"},
        )
    )
    evals = ruler.tick(now_ns=t0 + 10_000_000_000)
    assert len(evals) == 1 and evals[0].rows > 0
    assert ruler.health["web:lines:count30s"]["health"] == "ok"

    # recorded series landed in the store as metric samples with the
    # rule labels, visible to a PromQL query over the store
    pctx = store_promql_context(
        spark, cat, start_ns=t0, end_ns=t0 + 60_000_000_000
    )
    got = promql_query(pctx, '{__name__="web:lines:count30s"}').collect()
    assert got and all(r["labels"]["team"] == "obs" for r in got)
    assert all(r["value"] > 0 for r in got)
    # per-type series rows: the recorded series is metric-typed (2)
    srows = cat.read_series(spark, types=(2,)).collect()
    assert any(
        r["labels"].get("__name__") == "web:lines:count30s" for r in srows
    )

    # store tail sees newly appended lines from the last-seen ts
    tail = store_tailer(spark, cat, '{app="web"}')
    first = tail.poll()
    assert len(first) == 5
    late = _json.dumps(
        {
            "streams": [
                {
                    "stream": {"app": "web"},
                    "values": [[str(t0 + 60_000_000_000), "late line"]],
                }
            ]
        }
    )
    ingest_fanout(
        ingest.loki_push(
            spark.createDataFrame([(late,)], "payload string")
        ).coalesce(1),
        cat,
    )
    nxt = tail.poll()
    assert [r["string"] for r in nxt] == ["late line"]
