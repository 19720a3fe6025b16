"""with(sample=) hint: trace-level sampling, deterministic seed."""

from gigapipe_spark.traceql.compiler import TraceQLContext, query
from gigapipe_spark.traceql.parser import parse
from tests.conftest import SF_DIR


def test_parse_with_hint():
    s = parse('{ name = "item" } with(sample=0.25)')
    assert s.sample == 0.25


def test_sample_reduces_traces(spark):
    c = TraceQLContext(spark, SF_DIR)
    full = query(c, '{ name = "item" }')
    sampled = query(c, '{ name = "item" } with(sample=0.2)')
    n_full = full.select("trace_id").distinct().count()
    n_sampled = sampled.select("trace_id").distinct().count()
    assert 0 < n_sampled < n_full
    # sampling keeps whole traces: every sampled span's trace appears in full
    assert (
        sampled.select("trace_id")
        .distinct()
        .join(full.select("trace_id").distinct(), "trace_id", "left_anti")
        .count()
        == 0
    )
    # note: .sample(seed=) is only reproducible for identical partition
    # layouts — plan-to-plan counts may differ slightly, so no strict
    # determinism assertion here; the fraction should hold approximately
    assert abs(n_sampled / n_full - 0.2) < 0.1
