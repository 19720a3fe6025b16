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
