"""Text-reachability net: every documented query construct must parse,
compile and analyze end-to-end from QUERY TEXT (schema resolution only —
no execution — so the whole surface stays cheap to check). Round 4
found deriv/predict_linear/holt_winters reachable only as library
calls; this file pins the full surface."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR

PROMQL = [
    'sum by (app) (rate({app=~".+"}[5m]))',
    'quantile by (level) (0.5, {app="click"})',
    '{app="click"} ^ 2 atan2 3',
    'holt_winters({app="click"}[1h], 0.3, 0.3)',
    'double_exponential_smoothing({app="click"}[1h], 0.3, 0.3)',
    'deriv({app="click"}[30m])',
    'predict_linear({app="click"}[30m], 120)',
    'histogram_quantile(0.9, sum by (le) (rate({app=~".+"}[1h])))',
    'label_replace({app="click"}, "x", "$1", "app", "(.*)")',
    'label_join({app="click"}, "x", "-", "app", "instance")',
    'absent({app="zzz"})',
    'absent_over_time({app="zzz"}[1h])',
    'asinh({app="click"})',
    'acosh(sgn({app="click"}) * 0 + 1)',
    'count_values("v", sgn({app=~".+"}))',
    'time() - {app="click"}',
    'vector(3) + vector(4)',
    'avg_over_time({app="click"}[10m:2m])',
    'rate({app="click"}[10m] offset 5m)',
    '{app="click"} @ 1600000000',
    'quantile(0.9, {app=~".+"})',
    'sum(irate({app="click"}[10m]))',
    'resets({app="click"}[1h]) unless {app="zzz"}',
]

LOGQL = [
    '{app="click"} |= "k" != "zz" |~ "\\\\d+"',
    '{app="click"} | json | k >= 10 | line_format "{{.k}}-x"',
    '{app="click"} | logfmt | drop level',
    '{app=~"c.+"} | regexp "(?P<num>\\\\d+)" | label_format n2=num',
    'topk(2, sum by (app) (count_over_time({app=~".+"} [10m])))',
    'quantile_over_time(0.5, {app="click"} | json | unwrap k [10m]) by (app)',
    'avg_over_time({app="click"} | unwrap_value [10m]) by (app)',
    'sum_over_time({app="click"} | json | label_format d="{{.k}}ms"'
    ' | unwrap duration(d) [10m])',
    'sum_over_time({app="click"} | json | label_format b="{{.k}}KiB"'
    ' | unwrap bytes(b) [10m])',
    'count_over_time({app="click"} [10m] offset 5m)',
    'absent_over_time({app="zzz"} [1h])',
    'bytes_rate({app="click"} [10m])',
    'count_over_time({app="click"}[5m]) > 2',
    'sum(count_over_time({app="click"}[5m]))'
    ' / sum(count_over_time({app=~".+"}[5m]))',
    '{app="click"} | keep app',
    'stddev_over_time({app="click"} | unwrap_value [10m])',
]

TRACEQL = [
    '{ name = "item" && duration > 50ms }',
    '{ returnflag = "R" || linestatus = "O" }',
    '{ priority = "1-URGENT" } &>> { returnflag = "R" }',
    '{ priority = "1-URGENT" } !>> { returnflag = "R" }',
    '{ returnflag = "R" } <<& { name = "order" }',
    '{ returnflag = "R" } ~ { returnflag = "A" }',
    '{} | count() > 40',
    '{ name = "item" } | avg(quantity) > 30',
    '{ name = "item" } | max(duration) < 400ms',
    '{ name = "item" } | rate() by (returnflag)',
    '{ name = "item" } | avg_over_time(quantity)',
    '{ name = "item" } | sum_over_time(quantity) by (linestatus)',
    '{ name = "item" } | quantile_over_time(duration, 0.9)',
    '{ name = "item" } | histogram_over_time(duration)',
    '{ name = "item" } | select(returnflag, quantity)',
    '{ name = "item" } | count_over_time() | topk(3)',
    '{ returnflag = "R" } | compare({ linestatus = "O" })',
    '{ name = "item" } with(sample=0.5)',
]


@pytest.mark.parametrize("q", PROMQL)
def test_promql_text_surface(spark, q):
    from gigapipe_spark.promql.compiler import PromQLContext, query

    assert query(PromQLContext(spark, SF_DIR), q).schema is not None


@pytest.mark.parametrize("q", LOGQL)
def test_logql_text_surface(spark, q):
    from gigapipe_spark.logql.compiler import LogQLContext, query

    assert query(LogQLContext(spark, SF_DIR), q).df.schema is not None


@pytest.mark.parametrize("q", TRACEQL)
def test_traceql_text_surface(spark, q):
    from gigapipe_spark.traceql.compiler import TraceQLContext
    from gigapipe_spark.traceql.compiler import query as tq

    assert tq(TraceQLContext(spark, SF_DIR), q).schema is not None
