r"""Reference-corpus conformance: every query string in the REFERENCE'S
OWN test suites must parse, compile, and schema-analyze here (no
execution — analysis proves the full pipeline resolves).

Sources (verbatim, placeholders substituted like the reference's test
driver does):
  LogQL  — reader/logql/logql_parser/parser_test.go:11-53 (TestParser),
           :86-90 (TestLineFilterBool), :135-190 (TestParserBinary)
  PromQL — reader/promql/promql_parser/parser_test.go:6 +
           promql_transpiler/{transpiler,vector_range,vector_agg,
           planner/fill_gaps}_test.go query literals
  TraceQL— reader/traceql/traceql_transpiler/clickhouse_transpiler/
           planner_test.go query literals

A query the reference's tests exercise that fails to plan here is a
coverage hole regardless of what SURVEY §2 says — this file is the
line-by-line receipt.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR

TID = "tid42"  # the reference substitutes ${testID} at runtime

# reader/logql/logql_parser/parser_test.go:11-53, verbatim order
LOGQL_PARSER_CORPUS = [
    '{test_id="${testID}"}',
    '{test_id="${testID}", freq="2"}',
    '{test_id="${testID}", freq="2"} |~ "2[0-9]$"',
    'rate({test_id="${testID}", freq="2"} |~ "2[0-9]$" [1s])',
    'sum by (test_id) (rate({test_id="${testID}"} |~ "2[0-9]$" [1s]))',
    '{test_id="${testID}_json"}|json',
    '{test_id="${testID}_json"}|json lbl_repl="new_lbl"',
    '{test_id="${testID}_json"}|json lbl_repl="new_lbl"|lbl_repl="new_val"',
    '{test_id="${testID}_json"}|json lbl_repl="new_lbl"|fmt="json"',
    '{test_id="${testID}_json"}|json|fmt=~"[jk]son"',
    '{test_id="${testID}_json"}|json|lbl_repl="REPL"',
    'sum_over_time({test_id="${testID}_json"}|json|lbl_repl="REPL"'
    "|unwrap int_lbl [3s]) by (test_id, lbl_repl)",
    'sum_over_time({test_id="${testID}_json"}|json lbl_int1="int_val"'
    '|lbl_repl="val_repl"|unwrap lbl_int1 [3s]) by (test_id, lbl_repl)',
    '{test_id="${testID}"}| line_format '
    '"{ \\"str\\":\\"{{_entry}}\\", \\"freq2\\": {{divide freq 2}} }"',
    'rate({test_id="${testID}"}| line_format '
    '"{ \\"str\\":\\"{{_entry}}\\", \\"freq2\\": {{divide freq 2}} }"'
    "| json|unwrap freq2 [1s]) by (test_id, freq2)",
    '{test_id="${testID}_json"}|json|json int_lbl2="int_val"',
    '{test_id="${testID}_json"}| line_format "{{ divide test_id 2  }}"',
    'rate({test_id="${testID}_json"}| line_format '
    '"{{ divide int_lbl 2  }}" | unwrap _entry [1s])',
    'sum(rate({test_id="${testID}_json"}| json [5s])) by (test_id)',
    'sum(rate({test_id="${testID}_json"}| json lbl_rrr="lbl_repl" [5s])) '
    "by (test_id, lbl_rrr)",
    'sum(sum_over_time({test_id="${testID}_json"}| json | unwrap int_val '
    "[10s]) by (test_id, str_id)) by (test_id)",
    'rate({test_id="${testID}"} [1s]) == 2',
    'sum(rate({test_id="${testID}"} [1s])) by (test_id) > 4',
    'sum(sum_over_time({test_id="${testID}_json"}| json | unwrap str_id '
    "[10s]) by (test_id, str_id)) by (test_id) > 1000",
    'rate({test_id="${testID}"} | line_format "12345" [1s]) == 2',
    '{test_id="${testID}"} | freq >= 4',
    '{test_id="${testID}_json"} | json sid="str_id" | sid >= 598',
    '{test_id="${testID}_json"} | json | str_id >= 598',
    '{test_id="${testID}"} | regexp "^(?<e>[^0-9]+)[0-9]+$"',
    '{test_id="${testID}"} | regexp "^[^0-9]+(?<e>[0-9])+$"',
    '{test_id="${testID}"} | regexp "^[^0-9]+([0-9]+(?<e>[0-9]))$"',
    'first_over_time({test_id="${testID}", freq="0.5"} | regexp '
    '"^[^0-9]+(?<e>[0-9]+)$" | unwrap e [1s]) by(test_id)',
    '{test_id="${testID}"} | freq > 1 and (freq="4" or freq==2 or freq > 0.5)',
    '{test_id="${testID}_json"} | json sid="str_id" | sid >= 598 or sid < 2 '
    "and sid > 0",
    '{test_id="${testID}_json"} | json | str_id < 2 or str_id >= 598 '
    "and str_id > 0",
    '{test_id="${testID}_json"} | json | drop a, b, __C__, d="e"',
    '{k8s_object_kind="Node", k8s_event_reason="ScaleDown", '
    'signoz_component="otel-deployment"} | keep k8s_object_kind',
    '{test_id="${testID}_json"} | json | keep level, method="GET"',
    '{k8s_object_kind="Node"} | line_format '
    "`{{.k8s_object_name}} - {{__line__}}`",
    'count_over_time({test_id="${testID}_json"} [1m] offset 1m)',
    # template_funcs_test.go:9,33 template anchors as full queries
    '{test_id="${testID}"} | line_format '
    "`{{ __timestamp__ | unixEpoch }}`",
]

# parser_test.go:86-90 (TestLineFilterBool)
LOGQL_LINEFILTER_CORPUS = [
    '{app="x"} |~ "POST" or "GET"',
    '{app="x"} |= "a" and "b"',
    '{app="x"} |= ("foo" or "bar") and "baz"',
]

# parser_test.go:135-190 (TestParserBinary)
LOGQL_BINARY_CORPUS = [
    '(rate({test_id="a"} [1s]))',
    '((sum by (test_id) (rate({test_id="a"} [1s]))))',
    '(sum by (test_id) (rate({test_id="a"} [1s])))',
    'rate({test_id="a"} [1s]) / rate({test_id="b"} [1s])',
    'rate({test_id="a"} [1s]) * 100',
    'sum by (test_id) (rate({test_id="a"} [1s])) / '
    'sum by (test_id) (rate({test_id="b"} [1s])) * 100',
    '(sum by (test_id) (rate({test_id="a"} [1s]))) / '
    '(sum by (test_id) (rate({test_id="b"} [1s])))',
    'rate({test_id="a"} [1s]) + rate({test_id="b"} [1s]) - '
    'rate({test_id="c"} [1s])',
]

# promql_parser/parser_test.go:6 + promql_transpiler/*_test.go literals
PROMQL_CORPUS = [
    'rate(http_requests_total{status="5xx"}[5m])',
    '(http_requests_total{job="myjob"})',
    'delta(some_gauge{job="myjob"}[5m])',
    'rate(x{job="j"}[1m])',
    'sum by (dc, job) (http_requests_total{job="myjob"})',
    'sum by (job) (rate(http_requests_total{job="myjob"}[5m]))',
    'sum without (pod) (http_requests_total{job="myjob"})',
    'sum(http_requests_total{job="myjob"})',
    'sum(sum by (a) (http_requests_total{job="j"}))',
    'sum_over_time(x{job="j"}[30d])',
    'sum_over_time(x{job="j"}[5m])',
]

# traceql_transpiler/clickhouse_transpiler/planner_test.go literals
TRACEQL_CORPUS = [
    '{.service.name="test"}',
    '{.randomContainer=~"admiring" && .randomFloat > 10}',
    '{.randomContainer=~"admiring" && .randomFloat > 10} | count() > 2 '
    '|| {.randomContainer=~"boring" && .randomFloat < 10}',
]


def _sub(q: str) -> str:
    return q.replace("${testID}", TID)


@pytest.mark.parametrize(
    "q",
    LOGQL_PARSER_CORPUS + LOGQL_LINEFILTER_CORPUS + LOGQL_BINARY_CORPUS,
)
def test_reference_logql_corpus_plans(spark, q):
    from gigapipe_spark.logql.compiler import LogQLContext, query

    res = query(LogQLContext(spark, SF_DIR), _sub(q))
    assert res.df.schema is not None  # analysis resolves end-to-end


@pytest.mark.parametrize("q", PROMQL_CORPUS)
def test_reference_promql_corpus_plans(spark, q):
    from gigapipe_spark.promql.compiler import PromQLContext, query

    df = query(PromQLContext(spark, SF_DIR), _sub(q))
    assert df.schema is not None


@pytest.mark.parametrize("q", TRACEQL_CORPUS)
def test_reference_traceql_corpus_plans(spark, q):
    from gigapipe_spark.traceql.compiler import TraceQLContext
    from gigapipe_spark.traceql.compiler import query as traceql_query

    df = traceql_query(TraceQLContext(spark, SF_DIR), _sub(q))
    assert df.schema is not None
