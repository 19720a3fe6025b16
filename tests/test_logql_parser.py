"""Parser tests over the reference's own query corpus
(ref: reader/logql/logql_parser/parser_test.go — same strategy as its
golden snapshot tests, asserting structural properties instead of
string snapshots)."""

import pytest

from gigapipe_spark.logql import parse
from gigapipe_spark.logql.ast import (
    BinOp,
    Drop,
    Keep,
    LabelFilter,
    LFNode,
    LineFilter,
    LogExpr,
    ParserStage,
    RangeAgg,
    Scalar,
    TopK,
    Unwrap,
    VectorAgg,
)

# the reference's TestParser corpus with ${testID} instantiated
CORPUS = [
    '{test_id="t1"}',
    '{test_id="t1", freq="2"}',
    '{test_id="t1", freq="2"} |~ "2[0-9]$"',
    'rate({test_id="t1", freq="2"} |~ "2[0-9]$" [1s])',
    'sum by (test_id) (rate({test_id="t1"} |~ "2[0-9]$" [1s]))',
    '{test_id="t1_json"}|json',
    '{test_id="t1_json"}|json lbl_repl="new_lbl"',
    '{test_id="t1_json"}|json lbl_repl="new_lbl"|lbl_repl="new_val"',
    '{test_id="t1_json"}|json lbl_repl="new_lbl"|fmt="json"',
    '{test_id="t1_json"}|json|fmt=~"[jk]son"',
    '{test_id="t1_json"}|json|lbl_repl="REPL"',
    'sum_over_time({test_id="t1_json"}|json|lbl_repl="REPL"|unwrap int_lbl [3s]) by (test_id, lbl_repl)',
    'sum_over_time({test_id="t1_json"}|json lbl_int1="int_val"|lbl_repl="val_repl"|unwrap lbl_int1 [3s]) by (test_id, lbl_repl)',
    '{test_id="t1"}| line_format "{ \\"str\\":\\"{{_entry}}\\", \\"freq2\\": {{divide freq 2}} }"',
    'rate({test_id="t1"}| line_format "{ \\"str\\":\\"{{_entry}}\\" }"| json|unwrap freq2 [1s]) by (test_id, freq2)',
    '{test_id="t1_json"}|json|json int_lbl2="int_val"',
    '{test_id="t1_json"}| line_format "{{ divide test_id 2  }}"',
    'rate({test_id="t1_json"}| line_format "{{ divide int_lbl 2  }}" | unwrap _entry [1s])',
    'sum(rate({test_id="t1_json"}| json [5s])) by (test_id)',
    'sum(rate({test_id="t1_json"}| json lbl_rrr="lbl_repl" [5s])) by (test_id, lbl_rrr)',
    'sum(sum_over_time({test_id="t1_json"}| json | unwrap int_val [10s]) by (test_id, str_id)) by (test_id)',
    'rate({test_id="t1"} [1s]) == 2',
    'sum(rate({test_id="t1"} [1s])) by (test_id) > 4',
    'sum(sum_over_time({test_id="t1_json"}| json | unwrap str_id [10s]) by (test_id, str_id)) by (test_id) > 1000',
    'rate({test_id="t1"} | line_format "12345" [1s]) == 2',
    '{test_id="t1"} | freq >= 4',
    '{test_id="t1_json"} | json sid="str_id" | sid >= 598',
    '{test_id="t1_json"} | json | str_id >= 598',
    '{test_id="t1"} | regexp "^(?<e>[^0-9]+)[0-9]+$"',
    '{test_id="t1"} | regexp "^[^0-9]+(?<e>[0-9])+$"',
    '{test_id="t1"} | regexp "^[^0-9]+([0-9]+(?<e>[0-9]))$"',
    'first_over_time({test_id="t1", freq="0.5"} | regexp "^[^0-9]+(?<e>[0-9]+)$" | unwrap e [1s]) by(test_id)',
    '{test_id="t1"} | freq > 1 and (freq="4" or freq==2 or freq > 0.5)',
    '{test_id="t1_json"} | json sid="str_id" | sid >= 598 or sid < 2 and sid > 0',
    '{test_id="t1_json"} | json | str_id < 2 or str_id >= 598 and str_id > 0',
    '{test_id="t1_json"} | json | drop a, b, __C__, d="e"',
    '{k8s_object_kind="Node", k8s_event_reason="ScaleDown", signoz_component="otel-deployment"} | keep k8s_object_kind',
    '{test_id="t1_json"} | json | keep level, method="GET"',
    '{k8s_object_kind="Node"} | line_format `{{.k8s_object_name}} - {{__line__}}`',
    'count_over_time({test_id="t1_json"} [1m] offset 1m)',
]

LINE_FILTER_BOOL = [
    '{app="x"} |~ "POST" or "GET"',
    '{app="x"} |= "a" and "b"',
    '{app="x"} |= ("foo" or "bar") and "baz"',
]


@pytest.mark.parametrize("q", CORPUS)
def test_corpus_parses(q):
    parse(q)


@pytest.mark.parametrize("q", LINE_FILTER_BOOL)
def test_line_filter_bool_parses(q):
    ast = parse(q)
    assert isinstance(ast, LogExpr)
    lf = ast.stages[0]
    assert isinstance(lf, LineFilter)
    assert isinstance(lf.expr, LFNode)


def test_selector_shape():
    ast = parse('{a="1", b=~"x.*", c!="y", d!~"z"}')
    assert isinstance(ast, LogExpr)
    ops = [m.op for m in ast.selector.matchers]
    assert ops == ["=", "=~", "!=", "!~"]


def test_range_agg_shape():
    ast = parse('sum by (test_id) (rate({test_id="x"} |~ "2[0-9]$" [1s]))')
    assert isinstance(ast, VectorAgg) and ast.by == ["test_id"]
    assert isinstance(ast.inner, RangeAgg)
    assert ast.inner.fn == "rate" and ast.inner.range_ns == 1_000_000_000


def test_offset():
    ast = parse('count_over_time({a="b"} [1m] offset 1m)')
    assert isinstance(ast, RangeAgg)
    assert ast.offset_ns == 60_000_000_000


def test_unwrap_grouping():
    ast = parse('sum_over_time({a="b"}|json|unwrap int_lbl [3s]) by (test_id, lbl_repl)')
    assert isinstance(ast, RangeAgg)
    assert ast.by == ["test_id", "lbl_repl"]
    assert isinstance(ast.inner.stages[-1], Unwrap)


def test_comparison_binop():
    ast = parse('rate({a="b"} [1s]) == 2')
    assert isinstance(ast, BinOp) and ast.op == "=="
    assert isinstance(ast.right, Scalar) and ast.right.value == 2


def test_quantile():
    ast = parse('quantile_over_time(0.95, {a="b"} | unwrap v [5m])')
    assert isinstance(ast, RangeAgg) and ast.param == 0.95


def test_topk():
    ast = parse('topk(3, sum by (app) (rate({a="b"} [1m])))')
    assert isinstance(ast, TopK) and ast.k == 3


def test_drop_keep():
    d = parse('{a="b"} | json | drop a, b, d="e"').stages[-1]
    assert isinstance(d, Drop) and d.params == [("a", None), ("b", None), ("d", "e")]
    k = parse('{a="b"} | keep level, method="GET"').stages[-1]
    assert isinstance(k, Keep)


def test_keep_requires_param():
    # ref: parser_test.go TestParserKeepRequiresParam
    with pytest.raises(ValueError):
        parse('{app="x"} | keep')


def test_label_filter_precedence():
    ast = parse('{a="b"} | x >= 598 or x < 2 and x > 0')
    lf = ast.stages[0]
    assert isinstance(lf, LabelFilter)
    # or(x>=598, and(x<2, x>0))
    assert lf.expr.op == "or"
    assert lf.expr.right.op == "and"


def test_json_params():
    p = parse('{a="b"}|json lbl_repl="new_lbl"').stages[0]
    assert isinstance(p, ParserStage) and p.params == {"lbl_repl": "new_lbl"}
