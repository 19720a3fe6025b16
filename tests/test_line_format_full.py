"""line_format: compiled column path for the common subset, Arrow-UDF
fallback for the full template function library
(ref: shared/template_funcs.go)."""

from gigapipe_spark.logql.compiler import LogQLContext, query
from tests.conftest import SF_DIR
from tests.oracle_utils import assert_match
import pytest


def test_compiled_subset_matches_oracle(spark):
    # {{.label}} + arithmetic compile to concat/cast columns (no UDF)
    res = query(
        LogQLContext(spark, SF_DIR),
        '{app="click"} | json | line_format "k={{.k}} app={{.app}}"',
    )
    assert_match(
        res.df.select("fingerprint", "timestamp_ns", "string"),
        "SELECT user_id*8 AS fingerprint, epoch_ns(ts) AS timestamp_ns,"
        " 'k=' || json_extract_string(props, '$.k') || ' app=click' AS string"
        " FROM events WHERE event_type='click'",
        SF_DIR,
    )


def test_udf_fallback_matches_oracle(spark):
    # trunc isn't in the column compiler → Pandas UDF path
    res = query(
        LogQLContext(spark, SF_DIR),
        '{app="purchase"} | line_format "{{ trunc 2 .instance }}:{{ToUpper .app}}"',
    )
    assert_match(
        res.df.select("fingerprint", "timestamp_ns", "string"),
        "SELECT user_id*8+2 AS fingerprint, epoch_ns(ts) AS timestamp_ns,"
        " substring('u' || CAST(user_id AS VARCHAR), 1, 2) || ':PURCHASE' AS string"
        " FROM events WHERE event_type='purchase'",
        SF_DIR,
    )


def test_udf_fallback_function_surface(spark):
    cases = [
        # Go strings.* builtins: SUBJECT FIRST (template_funcs.go:31-39
        # registers strings.TrimPrefix / strings.Replace directly)
        ('{{ TrimPrefix .instance "u" }}', lambda uid: str(uid)),
        ('{{ Replace .instance "u" "user-" -1 }}', lambda uid: f"user-{uid}"),
        ('{{ Replace .instance "u" "user-" 0 }}', lambda uid: f"u{uid}"),
        # reference arg order: (regex, subject, replacement) —
        # template_funcs.go:40 func(regex, s, repl), same as Loki docs
        ('{{ regexReplaceAll "u(\\d+)" .instance "id=$1" }}', lambda uid: f"id={uid}"),
    ]
    ctx = LogQLContext(spark, SF_DIR)
    for tpl, expect in cases:
        # backtick string: templates contain inner double quotes
        res = query(ctx, f'{{app="signup"}} | line_format `{tpl}`')
        row = res.df.selectExpr(
            "string", "cast(fingerprint / 8 as long) AS uid"
        ).limit(1).collect()[0]
        assert row["string"] == expect(row["uid"]), tpl


def test_sprig_integer_arithmetic_semantics(spark):
    """add/sub/mul/div/divide are sprig's INTEGER functions (ref:
    template_funcs.go BaseTemplateFuncs): float strings and missing
    labels coerce to 0, division truncates toward zero; the addf/subf/
    mulf/divf variants do float math with Go's ±Inf/NaN division."""
    import pyspark.sql.functions as F

    from gigapipe_spark.logql.compiler import _template_col, _template_udf

    d = spark.createDataFrame(
        [("line1", {"i": "7", "neg": "-7", "f": "2.5", "junk": "x"})],
        "string string, labels map<string,string>",
    )
    cases = {
        "{{divide i 2}}": "3",          # 7/2 truncates
        "{{divide neg 2}}": "-3",       # toward zero, not -inf
        "{{add f 1}}": "1",             # "2.5" -> toInt64 0
        "{{add junk 5}}": "5",
        "{{mul i 3}}": "21",
        "{{sub missing 2}}": "-2",      # missing label -> 0
        "{{addf f 1}}": "3.5",
        "{{mulf f 2}}": "5",            # 5.0 prints as 5
        "{{divf i 2}}": "3.5",
        "{{divf i 0}}": "+Inf",
        "{{divf neg 0}}": "-Inf",
    }
    for tpl, want in cases.items():
        fast = d.select(_template_col(tpl).alias("s")).collect()[0]["s"]
        slow = d.select(_template_udf(tpl).alias("s")).collect()[0]["s"]
        assert fast == want, (tpl, fast, want)
        assert slow == want, (tpl, slow, want)


@pytest.mark.slow
def test_template_paths_differential_fuzz(spark):
    """Random templates from the shared subset must render identically
    through the compiled column path and the Arrow-UDF fallback."""
    import random

    from gigapipe_spark.logql.compiler import _template_col, _template_udf

    rng = random.Random(80_000)
    labels = {"i": "7", "j": "03", "neg": "-2", "f": "1.5", "s": "AbC", "e": ""}
    d = spark.createDataFrame(
        [("the line", labels)], "string string, labels map<string,string>"
    )
    lbls = list(labels) + ["missing"]
    int_ops, float_ops = ["add", "sub", "mul", "divide"], ["addf", "subf", "mulf", "divf"]
    for case in range(60):
        parts = []
        for _ in range(rng.randint(1, 4)):
            kind = rng.randrange(6)
            if kind == 0:
                parts.append(rng.choice(["txt ", "-", "| ", "x="]))
            elif kind == 1:
                parts.append("{{." + rng.choice(lbls) + "}}")
            elif kind == 2:
                parts.append("{{_entry}}")
            elif kind == 3:
                op = rng.choice(int_ops)
                a, b = rng.choice(lbls + ["4", "10"]), rng.choice(["2", "3", "i"])
                parts.append(f"{{{{{op} {a} {b}}}}}")
            elif kind == 4:
                op = rng.choice(float_ops)
                a, b = rng.choice(lbls + ["4.5"]), rng.choice(["2", "0.5", "f", "neg"])
                parts.append(f"{{{{{op} {a} {b}}}}}")
            else:
                parts.append(
                    rng.choice(
                        [
                            "{{ToLower .s}}",
                            "{{ToUpper .s}}",
                            "{{trunc 2 .s}}",
                            "{{trunc -2 .s}}",
                            "{{substr 1 3 .s}}",
                            "{{TrimSpace .s}}",
                            '{{TrimPrefix .s "Ab"}}',
                            '{{TrimSuffix .s "bC"}}',
                            '{{Replace .s "b" "__" -1}}',
                            '{{Trim .s "A"}}',
                            '{{TrimLeft .s "Ab"}}',
                            '{{TrimRight .s "Cc"}}',
                        ]
                    )
                )
        tpl = "".join(parts)
        fast = d.select(_template_col(tpl).alias("x")).collect()[0]["x"]
        slow = d.select(_template_udf(tpl).alias("x")).collect()[0]["x"]
        assert fast == slow, (case, tpl, fast, slow)
