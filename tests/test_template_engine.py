r"""Template-engine semantics (logql/template.py) — pure Python, no
Spark session.

The two anchor cases reproduce the REFERENCE'S own tests verbatim
(reader/logql/logql_transpiler/shared/template_funcs_test.go:9-52);
the rest pin the registered function set of template_funcs.go:29-66
with hand-computed expectations.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from gigapipe_spark.logql.template import render_template


def r(tpl, line="original log line", labels=None, ts_ns=None):
    return render_template(tpl, line, labels or {}, ts_ns)


def test_reference_builtins_case():
    # template_funcs_test.go:9-31 verbatim
    out = r(
        "{{.k8s_object_name}} - {{__line__}}",
        labels={"k8s_object_name": "worker-1"},
    )
    assert out == "worker-1 - original log line"


def test_reference_timestamp_unixepoch_case():
    # template_funcs_test.go:33-52 verbatim
    ts = datetime(2024, 6, 1, 12, 34, 56, tzinfo=timezone.utc)
    ts_ns = int(ts.timestamp() * 1e9)
    assert r("{{ __timestamp__ | unixEpoch }}", ts_ns=ts_ns) == str(
        int(ts.timestamp())
    )


def test_timestamp_renders_go_style():
    ts = datetime(2024, 6, 1, 12, 0, 0, tzinfo=timezone.utc)
    out = r("{{ __timestamp__ }}", ts_ns=int(ts.timestamp() * 1e9))
    assert out == "2024-06-01 12:00:00 +0000 UTC"


def test_date_go_layout():
    ts = datetime(2024, 6, 1, 12, 34, 56, tzinfo=timezone.utc)
    out = r(
        '{{ date "2006-01-02 15:04" __timestamp__ }}',
        ts_ns=int(ts.timestamp() * 1e9),
    )
    assert out == "2024-06-01 12:34"


def test_pipelines_chain_left_to_right():
    assert r('{{ .app | upper | trunc 3 }}', labels={"app": "purchase"}) == "PUR"
    assert r('{{ .app | hasPrefix "pur" }}', labels={"app": "purchase"}) == "true"


def test_sprig_string_fns():
    labels = {"s": "  padded  ", "w": "hello world"}
    assert r("{{ trim .s }}", labels=labels) == "padded"
    assert r('{{ trimAll "$" "$5.00$" }}') == "5.00"
    assert r('{{ trimPrefix "he" .w }}', labels=labels) == "llo world"
    assert r('{{ trimSuffix "ld" .w }}', labels=labels) == "hello wor"
    assert r("{{ title .w }}", labels=labels) == "Hello World"
    # strings.Title: a letter after ANY non-letter starts a word
    assert r('{{ title "foo-bar baz" }}') == "Foo-Bar Baz"
    assert r('{{ title "fOO" }}') == "FOO"  # inner letters untouched
    assert r('{{ repeat 3 "ab" }}') == "ababab"
    assert r('{{ contains "lo w" .w }}', labels=labels) == "true"
    assert r('{{ hasSuffix "rld" .w }}', labels=labels) == "true"
    assert r('{{ replace "o" "0" .w }}', labels=labels) == "hell0 w0rld"
    assert r('{{ indent 2 "a\nb" }}') == "  a\n  b"
    assert r('{{ nindent 2 "a" }}') == "\n  a"
    assert r("{{ len .w }}", labels=labels) == "11"


def test_sprig_math_fns():
    assert r("{{ add 1 2 3 }}") == "6"
    assert r("{{ sub 10 3 }}") == "7"
    assert r("{{ mul 2 3 4 }}") == "24"
    assert r("{{ mod 10 3 }}") == "1"
    assert r("{{ mod -7 2 }}") == "-1"  # Go %: truncated toward zero
    assert r("{{ max 1 5 3 }}") == "5"
    assert r("{{ min 4 2 9 }}") == "2"
    assert r("{{ maxf 1.5 2.5 }}") == "2.5"
    assert r("{{ ceil 1.1 }}") == "2"
    assert r("{{ floor 1.9 }}") == "1"
    assert r("{{ round 123.5555 3 }}") == "123.556"
    assert r("{{ int \"42\" }}") == "42"
    assert r("{{ int \"4.2\" }}") == "0"  # sprig toInt64 on non-int → 0
    assert r("{{ float64 \"4.5\" }}") == "4.5"


def test_duration_fns():
    assert r("{{ duration 95 }}") == "1m35s"
    assert r("{{ duration 3695 }}") == "1h1m35s"
    # Go time.Duration.String(): zero LOWER units are always printed
    # once a higher unit appears
    assert r("{{ duration 3600 }}") == "1h0m0s"
    assert r("{{ duration 60 }}") == "1m0s"
    assert r("{{ duration 0 }}") == "0s"
    assert r("{{ duration -3600 }}") == "-1h0m0s"
    assert r('{{ duration_seconds "1m35s" }}') == "95"


def test_regex_replace_literal_and_dollar():
    labels = {"x": "u42 u7"}
    assert (
        r('{{ regexReplaceAll "u(\\d+)" .x "id=$1" }}', labels=labels)
        == "id=42 id=7"
    )
    # Literal variant: no $ expansion
    assert (
        r('{{ regexReplaceAllLiteral "u(\\d+)" .x "id=$1" }}', labels=labels)
        == "id=$1 id=$1"
    )


def test_fromjson_and_logic():
    assert r('{{ fromJson "[1,2,3]" | len }}') == "3"
    assert r('{{ eq .a .b }}', labels={"a": "x", "b": "x"}) == "true"
    assert r('{{ ne .a .b }}', labels={"a": "x", "b": "y"}) == "true"
    assert r('{{ not "" }}') == "true"


def test_missing_label_renders_empty():
    # missingkey=zero (PrepareLineFormatTemplate)
    assert r("a{{.nope}}b") == "ab"


def test_divide_by_zero_still_errors():
    with pytest.raises(ValueError, match="divide by zero"):
        r("{{ divide 4 0 }}")


def test_go_builtins_subject_first():
    # template_funcs.go:31-39 registers strings.* DIRECTLY: Go
    # signatures, subject string FIRST (sprig lowercase twins keep
    # sprig's subject-last order — both pinned here)
    labels = {"s": "AbCbA", "w": "hello world"}
    assert r('{{ Trim .s "A" }}', labels=labels) == "bCb"
    assert r('{{ TrimLeft .s "Ab" }}', labels=labels) == "CbA"
    assert r('{{ TrimRight .s "Ab" }}', labels=labels) == "AbC"
    assert r('{{ TrimPrefix .s "Ab" }}', labels=labels) == "CbA"
    assert r('{{ TrimSuffix .s "bA" }}', labels=labels) == "AbC"
    assert r('{{ trimAll "A" .s }}', labels=labels) == "bCb"
    assert r('{{ trimPrefix "Ab" .s }}', labels=labels) == "CbA"


def test_go_replace_requires_and_honors_count():
    # strings.Replace(s, old, new, n): n is REQUIRED; n=1 replaces only
    # the first occurrence, n<0 replaces all
    assert r('{{ Replace "aaa" "a" "b" 1 }}') == "baa"
    assert r('{{ Replace "aaa" "a" "b" 2 }}') == "bba"
    assert r('{{ Replace "aaa" "a" "b" -1 }}') == "bbb"
    assert r('{{ Replace "aaa" "a" "b" 0 }}') == "aaa"
    with pytest.raises(ValueError, match="wrong number of args"):
        r('{{ Replace "aaa" "a" "b" }}')


def test_unknown_function_errors_like_reference_parse():
    # sprig `default` is NOT in the reference's allowlist
    # (template_funcs.go:50-55) — text/template Parse fails there, so
    # the template must error here instead of silently evaluating
    with pytest.raises(ValueError, match="not defined"):
        r('{{ default "none" .missing }}')
    with pytest.raises(ValueError, match="not defined"):
        r("{{ .x | nosuchfn }}", labels={"x": "v"})


def test_unixepoch_rejects_non_time():
    # sprig unixEpoch takes time.Time; a string arg is an execute error
    # in the reference, not a coercion
    with pytest.raises(ValueError, match="unixEpoch"):
        r('{{ unixEpoch "12345" }}')


def test_parenthesized_subexpressions():
    assert r('{{ trunc 2 (upper .app) }}', labels={"app": "view"}) == "VI"


def test_label_format_exotic_template_falls_back(spark):
    """label_format shares the full template surface with line_format
    (BaseTemplateFuncs registers one set for both) — an exotic template
    routes through the Arrow fallback instead of failing."""
    from gigapipe_spark.logql.compiler import LogQLContext, query
    from tests.conftest import SF_DIR

    res = query(
        LogQLContext(spark, SF_DIR),
        '{app="click"} | label_format shout=`{{ .app | upper | trunc 2 }}`',
    )
    row = res.df.select("labels").first()
    assert row["labels"]["shout"] == "CL"
