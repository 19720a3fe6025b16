"""Parser error labels (__error__/__error_details__) and empty-string
label-filter semantics (ref: shared/parser_errors.go,
clickhouse_planner/sql_misc.go sqlParserError, planner_label_filter.go
makeErrorLabelCond, planner_keep.go)."""

import pyspark.sql.functions as F

from gigapipe_spark.logql import ast as A
from gigapipe_spark.logql.compiler import _apply_drop_keep, _apply_parser, _label_col


def _df(spark):
    rows = [
        (1, '{"k": "5", "who": "alice"}', {"app": "web"}),
        (2, "plain text, not json", {"app": "web"}),
        (3, "[1, 2, 3]", {"app": "web"}),  # valid JSON, not an object
    ]
    return spark.createDataFrame(rows, "id long, string string, labels map<string,string>")


def test_json_parser_injects_error_labels(spark):
    out = _apply_parser(_df(spark), A.ParserStage("json", {}))
    rows = {r.id: dict(r.labels) for r in out.collect()}
    assert rows[1] == {"app": "web", "k": "5", "who": "alice"}
    for bad in (2, 3):
        assert rows[bad]["__error__"] == "JSONParserErr"
        assert rows[bad]["__error_details__"] == "line is not a valid json object"
        assert "k" not in rows[bad]


def test_json_parameterized_also_flags_errors(spark):
    out = _apply_parser(_df(spark), A.ParserStage("json", {"kk": "k"}))
    rows = {r.id: dict(r.labels) for r in out.collect()}
    assert rows[1]["kk"] == "5"
    assert rows[2]["__error__"] == "JSONParserErr"


def test_error_filter_idioms(spark):
    parsed = _apply_parser(_df(spark), A.ParserStage("json", {}))
    clean = parsed.filter(_label_col(A.LabelCmp("__error__", "=", "")))
    assert {r.id for r in clean.collect()} == {1}
    errored = parsed.filter(_label_col(A.LabelCmp("__error__", "!=", "")))
    assert {r.id for r in errored.collect()} == {2, 3}
    # no other error value is ever produced
    none = parsed.filter(_label_col(A.LabelCmp("__error__", "=", "Other")))
    assert none.count() == 0


def test_missing_label_compares_as_empty_string(spark):
    d = _df(spark)
    # labels['nope'] behaves as '' (ClickHouse map-access semantics)
    assert d.filter(_label_col(A.LabelCmp("nope", "=", ""))).count() == 3
    assert d.filter(_label_col(A.LabelCmp("nope", "!=", ""))).count() == 0
    assert d.filter(_label_col(A.LabelCmp("nope", "=~", ".*"))).count() == 3
    assert d.filter(_label_col(A.LabelCmp("nope", "=~", ".+"))).count() == 0


def test_keep_preserves_error_labels_drop_removes(spark):
    parsed = _apply_parser(_df(spark), A.ParserStage("json", {}))
    kept = _apply_drop_keep(parsed, A.Keep([("who", None)]))
    rows = {r.id: dict(r.labels) for r in kept.collect()}
    assert rows[1] == {"who": "alice"}
    assert rows[2]["__error__"] == "JSONParserErr"  # kept unconditionally
    dropped = _apply_drop_keep(parsed, A.Drop([("__error__", None), ("__error_details__", None)]))
    rows = {r.id: dict(r.labels) for r in dropped.collect()}
    assert "__error__" not in rows[2] and "__error_details__" not in rows[2]


def test_logfmt_quoted_values_and_sanitization(spark):
    """kr/logfmt semantics: quoted values unescape, keys sanitize,
    last duplicate wins, broken quotes flag LogfmtParserErr."""
    rows = [
        (1, 'a=1 b="two words" c="say \\"hi\\"" d=', {}),
        (2, "foo.bar=x foo:baz=y", {}),
        (3, "a=1 a=2", {}),
        (4, 'k="unterminated value', {}),
    ]
    d = spark.createDataFrame(rows, "id long, string string, labels map<string,string>")
    out = _apply_parser(d, A.ParserStage("logfmt"))
    got = {r.id: dict(r.labels) for r in out.collect()}
    assert got[1] == {"a": "1", "b": "two words", "c": 'say "hi"', "d": ""}
    assert got[2] == {"foo_bar": "x", "foo_baz": "y"}
    assert got[3] == {"a": "2"}
    assert got[4]["__error__"] == "LogfmtParserErr"


def test_logfmt_dedup_on_sanitized_keys(spark):
    """Raw keys that collide only AFTER sanitization still dedup
    last-wins on the sanitized name: the r14 fold hoists sanitize out
    of the dedup fold (once per pair, not per fold step), which is
    only equivalent because the dedup key stays the SANITIZED one."""
    rows = [
        (1, "foo.x=1 foo:x=2", {}),          # collide post-sanitize
        (2, "a.b=1 c=q a:b=2 a;b=3", {}),    # three-way collision
    ]
    d = spark.createDataFrame(rows, "id long, string string, labels map<string,string>")
    out = _apply_parser(d, A.ParserStage("logfmt"))
    got = {r.id: dict(r.labels) for r in out.collect()}
    assert got[1] == {"foo_x": "2"}
    assert got[2] == {"a_b": "3", "c": "q"}


def test_logfmt_parameterized(spark):
    """`| logfmt key1, lbl="key2"`: only requested keys merge, emitted
    under the sanitized logfmt-key name (the alias is ignored —
    parameterLogfmtHelper.HandleLogfmt keys by _key)."""
    d = spark.createDataFrame(
        [(1, 'a=1 b="two words" foo.bar=z', {"app": "w"})],
        "id long, string string, labels map<string,string>",
    )
    out = _apply_parser(d, A.ParserStage("logfmt", {"b": "b", "x": "foo.bar"}))
    got = dict(out.collect()[0].labels)
    assert got == {"app": "w", "b": "two words", "foo_bar": "z"}


def test_logfmt_parameterized_parses(spark):
    from gigapipe_spark.logql.parser import parse

    e = parse('{app="x"} | logfmt b, x="foo.bar"')
    st = [s for s in e.stages if isinstance(s, A.ParserStage)][0]
    assert st.kind == "logfmt" and st.params == {"b": "b", "x": "foo.bar"}
    # bare logfmt still parses
    e2 = parse('{app="x"} | logfmt | b="two words"')
    st2 = [s for s in e2.stages if isinstance(s, A.ParserStage)][0]
    assert st2.params == {}


def test_logfmt_roundtrip_fuzz(spark):
    """Random label maps -> Go-style logfmt encoding -> `| logfmt`
    recovers exactly the original values."""
    import random

    rng = random.Random(777)
    chars = "abc XYZ_09"
    rows, want = [], {}
    for i in range(40):
        n = rng.randint(1, 5)
        d = {}
        for j in range(n):
            k = f"k{j}"
            v = "".join(rng.choice(chars + '"\\=') for _ in range(rng.randint(0, 8)))
            d[k] = v
        parts = []
        for k, v in d.items():
            if any(c in v for c in ' "=\\') or v == "":
                q = v.replace("\\", "\\\\").replace('"', '\\"')
                parts.append(f'{k}="{q}"')
            else:
                parts.append(f"{k}={v}")
        rows.append((i, " ".join(parts), {}))
        want[i] = d
    df = spark.createDataFrame(rows, "id long, string string, labels map<string,string>")
    out = _apply_parser(df, A.ParserStage("logfmt"))
    got = {r.id: dict(r.labels) for r in out.collect()}
    for i, d in want.items():
        assert got[i] == d, (i, rows[i][1], got[i], d)
