"""line_format: compiled column path for the common subset, Arrow-UDF
fallback for the full template function library
(ref: shared/template_funcs.go)."""

from gigapipe_spark.logql.compiler import LogQLContext, query
from tests.conftest import SF_DIR
from tests.oracle_utils import assert_match


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
        ('{{ TrimPrefix "u" .instance }}', lambda uid: str(uid)),
        ('{{ Replace "u" "user-" .instance }}', lambda uid: f"user-{uid}"),
        ('{{ default "none" .missing }}', lambda uid: "none"),
        ('{{ regexReplaceAll "u(\\d+)" "id=$1" .instance }}', lambda uid: f"id={uid}"),
    ]
    ctx = LogQLContext(spark, SF_DIR)
    for tpl, expect in cases:
        # backtick string: templates contain inner double quotes
        res = query(ctx, f'{{app="signup"}} | line_format `{tpl}`')
        row = res.df.selectExpr(
            "string", "cast(fingerprint / 8 as long) AS uid"
        ).limit(1).collect()[0]
        assert row["string"] == expect(row["uid"]), tpl
