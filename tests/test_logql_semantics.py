"""Semantic golden tests: LogQL queries vs the DuckDB oracle.

Strategy per SURVEY §5: run each operator on the derived samples view and
hash-compare results against equivalent ANSI SQL over the same parquet —
the cross-engine replacement for the reference's SQL-string golden tests.
"""

from pyspark.sql import functions as F

from gigapipe_spark.logql.compiler import LogQLContext, query
from tests.conftest import SF_DIR
from tests.oracle_utils import assert_match

BUCKET = "(timestamp_ns - timestamp_ns % {r})"


def ctx(spark):
    return LogQLContext(spark, SF_DIR)


def streams_out(res):
    return res.df.select("fingerprint", "timestamp_ns", "string")


def matrix_out(res, *label_cols):
    cols = [F.col("labels").getItem(c).alias(c) for c in label_cols]
    return res.df.select(
        *cols, "timestamp_ns", F.round("value", 6).alias("value")
    )


def test_stream_selector(spark):
    res = query(ctx(spark), '{app="error"}')
    assert res.kind == "streams"
    assert_match(
        streams_out(res),
        "WITH s AS (SELECT user_id*8+4 AS fingerprint, epoch_ns(ts) AS timestamp_ns,"
        " props AS string FROM events WHERE event_type='error')"
        " SELECT * FROM s",
        SF_DIR,
    )


def test_multi_matcher_bitmask(spark):
    res = query(ctx(spark), '{app="error", level="error"}')
    assert_match(
        streams_out(res),
        "SELECT user_id*8+4 AS fingerprint, epoch_ns(ts) AS timestamp_ns,"
        " props AS string FROM events WHERE event_type='error'",
        SF_DIR,
    )


def test_negative_matcher(spark):
    res = query(ctx(spark), '{level="info", app!="click"}')
    assert_match(
        streams_out(res),
        "SELECT user_id*8 + CASE event_type WHEN 'view' THEN 1 WHEN 'purchase'"
        " THEN 2 WHEN 'signup' THEN 3 END AS fingerprint,"
        " epoch_ns(ts) AS timestamp_ns, props AS string FROM events"
        " WHERE event_type NOT IN ('click','error')",
        SF_DIR,
    )


def test_regex_matcher(spark):
    res = query(ctx(spark), '{app=~"cl.*|si.*"}')
    assert_match(
        streams_out(res),
        "SELECT user_id*8 + CASE event_type WHEN 'click' THEN 0 WHEN 'signup' THEN 3 END"
        " AS fingerprint, epoch_ns(ts) AS timestamp_ns, props AS string"
        " FROM events WHERE event_type IN ('click','signup')",
        SF_DIR,
    )


def test_line_filter_regex(spark):
    res = query(ctx(spark), '{app="click"} |~ "8[0-9]\\\\}"')
    assert_match(
        streams_out(res),
        "SELECT user_id*8 AS fingerprint, epoch_ns(ts) AS timestamp_ns,"
        " props AS string FROM events WHERE event_type='click'"
        " AND regexp_matches(props, '8[0-9]\\}')",
        SF_DIR,
    )


def test_line_filter_and_or(spark):
    res = query(ctx(spark), '{app="view"} |= ("1" or "2") and "k"')
    assert_match(
        streams_out(res),
        "SELECT user_id*8+1 AS fingerprint, epoch_ns(ts) AS timestamp_ns,"
        " props AS string FROM events WHERE event_type='view'"
        " AND (contains(props,'1') OR contains(props,'2')) AND contains(props,'k')",
        SF_DIR,
    )


def test_rate(spark):
    res = query(ctx(spark), 'rate({app="click"}[1m])')
    r = 60_000_000_000
    assert_match(
        res.df.select("fingerprint", "timestamp_ns", F.round("value", 6).alias("value")),
        f"SELECT user_id*8 AS fingerprint, (epoch_ns(ts) - epoch_ns(ts) % {r})"
        " AS timestamp_ns, round(count(*)/60.0, 6) AS value FROM events"
        " WHERE event_type='click' GROUP BY 1, 2",
        SF_DIR,
    )


def test_json_parser_label_filter(spark):
    res = query(ctx(spark), '{app="view"} | json | k > 50')
    assert_match(
        streams_out(res),
        "SELECT user_id*8+1 AS fingerprint, epoch_ns(ts) AS timestamp_ns,"
        " props AS string FROM events WHERE event_type='view'"
        " AND CAST(json_extract_string(props, '$.k') AS DOUBLE) > 50",
        SF_DIR,
    )


def test_json_param_parser(spark):
    res = query(ctx(spark), '{app="view"} | json kk="k" | kk <= 10')
    assert_match(
        streams_out(res),
        "SELECT user_id*8+1 AS fingerprint, epoch_ns(ts) AS timestamp_ns,"
        " props AS string FROM events WHERE event_type='view'"
        " AND CAST(json_extract_string(props, '$.k') AS DOUBLE) <= 10",
        SF_DIR,
    )


def test_sum_by_count_over_time(spark):
    res = query(ctx(spark), 'sum by (app) (count_over_time({level="info"}[5m]))')
    r = 300_000_000_000
    assert_match(
        matrix_out(res, "app"),
        f"SELECT event_type AS app, (epoch_ns(ts) - epoch_ns(ts) % {r}) AS timestamp_ns,"
        " round(CAST(count(*) AS DOUBLE), 6) AS value FROM events"
        " WHERE event_type != 'error' GROUP BY 1, 2",
        SF_DIR,
    )


def test_unwrap_sum_over_time(spark):
    res = query(
        ctx(spark), 'sum_over_time({app="purchase"} | json | unwrap k [10m]) by (app)'
    )
    r = 600_000_000_000
    assert_match(
        matrix_out(res, "app"),
        f"SELECT 'purchase' AS app, (epoch_ns(ts) - epoch_ns(ts) % {r}) AS timestamp_ns,"
        " round(sum(CAST(json_extract_string(props,'$.k') AS DOUBLE)), 6) AS value"
        " FROM events WHERE event_type='purchase' GROUP BY 2",
        SF_DIR,
    )


def test_comparison_filter(spark):
    res = query(ctx(spark), 'count_over_time({app="signup"}[5m]) > 2')
    r = 300_000_000_000
    assert_match(
        res.df.select("fingerprint", "timestamp_ns", F.round("value", 6).alias("value")),
        f"SELECT user_id*8+3 AS fingerprint, (epoch_ns(ts) - epoch_ns(ts) % {r})"
        " AS timestamp_ns, round(CAST(count(*) AS DOUBLE),6) AS value FROM events"
        " WHERE event_type='signup' GROUP BY 1,2 HAVING count(*) > 2",
        SF_DIR,
    )


def test_scalar_arithmetic(spark):
    res = query(ctx(spark), 'rate({app="error"}[1m]) * 60')
    r = 60_000_000_000
    assert_match(
        res.df.select("fingerprint", "timestamp_ns", F.round("value", 6).alias("value")),
        f"SELECT user_id*8+4 AS fingerprint, (epoch_ns(ts) - epoch_ns(ts) % {r})"
        " AS timestamp_ns, round(count(*)/60.0*60, 6) AS value FROM events"
        " WHERE event_type='error' GROUP BY 1,2",
        SF_DIR,
    )


def test_topk(spark):
    res = query(ctx(spark), 'topk(2, sum by (app) (count_over_time({level="info"}[1h])))')
    r = 3_600_000_000_000
    assert_match(
        matrix_out(res, "app"),
        f"""
        WITH m AS (
          SELECT event_type AS app, (epoch_ns(ts) - epoch_ns(ts) % {r}) AS timestamp_ns,
                 CAST(count(*) AS DOUBLE) AS value
          FROM events WHERE event_type != 'error' GROUP BY 1, 2
        ), r AS (
          SELECT app, timestamp_ns, value,
                 row_number() OVER (PARTITION BY timestamp_ns ORDER BY value DESC, 'app=' || app) AS rn
          FROM m
        ) SELECT app, timestamp_ns, round(value, 6) AS value FROM r WHERE rn <= 2
        """,
        SF_DIR,
    )


def test_drop_keep_labels(spark):
    res = query(ctx(spark), '{app="error"} | keep app, level')
    keys = res.df.select(F.explode(F.map_keys("labels")).alias("k")).distinct()
    assert {r["k"] for r in keys.collect()} == {"app", "level"}
    res2 = query(ctx(spark), '{app="error"} | drop instance')
    keys2 = res2.df.select(F.explode(F.map_keys("labels")).alias("k")).distinct()
    assert {r["k"] for r in keys2.collect()} == {"app", "level"}


# ------------------------------------------------- matcher normalization


def _fps(spark, sel_text):
    from gigapipe_spark.logql.compiler import LogQLContext, fingerprints
    from gigapipe_spark.logql.parser import parse

    ctx = LogQLContext(spark, SF_DIR)
    return fingerprints(ctx, parse(sel_text).selector)


def test_trivial_regex_matcher_pruned(spark):
    all_n = _fps(spark, '{app=~".*"}').count()
    from gigapipe_spark.sources import views

    assert all_n == views.time_series(spark, SF_DIR).count()
    # pruning composes with real matchers
    assert (
        _fps(spark, '{level=~".*", app="click"}').count()
        == _fps(spark, '{app="click"}').count()
    )


def test_match_nothing_negated_trivial(spark):
    assert _fps(spark, '{app!~".*"}').count() == 0


def test_empty_value_matchers(spark):
    # every series carries app/level/instance: `=""` (absent) matches
    # nothing, `!=""` (present) matches everything, and an unknown label
    # is absent everywhere
    all_n = _fps(spark, '{app=~".*"}').count()
    assert _fps(spark, '{app=""}').count() == 0
    assert _fps(spark, '{app!=""}').count() == all_n
    assert _fps(spark, '{nosuch=""}').count() == all_n
    assert _fps(spark, '{nosuch!=""}').count() == 0


# ---------------------------------------------------- agg/range commute


def test_sum_by_count_over_time_commutes_to_one_shuffle(spark):
    from gigapipe_spark.logql.compiler import LogQLContext, query

    import dataclasses

    from gigapipe_spark.logql.compiler import _regroup, compile_range_agg
    from gigapipe_spark.logql.parser import parse

    ctx = LogQLContext(spark, SF_DIR)
    e = parse('sum by (app) (count_over_time({app=~".+"}[1h]))')
    commuted = query(ctx, 'sum by (app) (count_over_time({app=~".+"}[1h]))').df
    uncommuted = _regroup(
        compile_range_agg(ctx, e.inner), e.by, e.without, "sum"
    ).df

    def n_exchanges(df):
        return df._jdf.queryExecution().executedPlan().toString().count(
            "Exchange hashpartitioning"
        )

    # the commute saves the per-stream shuffle: strictly fewer exchanges
    assert n_exchanges(commuted) < n_exchanges(uncommuted)


def test_commute_matches_uncommuted_result(spark):
    import dataclasses

    from gigapipe_spark.logql import ast as A
    from gigapipe_spark.logql.compiler import (
        LogQLContext,
        _regroup,
        compile_expr,
        compile_range_agg,
    )
    from gigapipe_spark.logql.parser import parse

    ctx = LogQLContext(spark, SF_DIR)
    e = parse('sum by (level) (rate({app=~".+"}[1h]))')
    commuted = compile_expr(ctx, e).df
    # force the per-stream + regroup path
    inner = compile_range_agg(ctx, e.inner)
    uncommuted = _regroup(inner, e.by, e.without, "sum").df
    a = {(r["timestamp_ns"], r["labels"]["level"]): round(r["value"], 6)
         for r in commuted.collect()}
    b = {(r["timestamp_ns"], r["labels"]["level"]): round(r["value"], 6)
         for r in uncommuted.collect()}
    assert a == b


def test_json_logfmt_adjacent_pair_cancels(spark):
    """Mirror of the reference's cancelJsonAndLogFmt quirk: the pair is
    REMOVED, so the pipeline behaves as if neither parser ran."""
    c = LogQLContext(spark, SF_DIR)
    cancelled = query(c, '{app="click"} | json | logfmt').df
    plain = query(c, '{app="click"}').df
    assert cancelled.count() == plain.count()
    # non-adjacent / reversed order does NOT cancel
    parsed = query(c, '{app="click"} | logfmt | json').df
    assert parsed.columns == cancelled.columns


def test_go_duration_seconds_anchored(spark):
    """time.ParseDuration fidelity: malformed values are dropped (NULL),
    not partially parsed; a leading sign negates the total."""
    from gigapipe_spark.logql.compiler import _go_duration_seconds

    cases = [
        ("1h30m", 5400.0),
        ("250ms", 0.25),
        ("1.5s", 1.5),
        ("-1h30m", -5400.0),
        ("abc5mxx", None),   # was 300 before anchoring — must be NULL
        ("5m garbage", None),
        ("", None),
        ("5", None),          # bare number without unit is invalid
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], "v string")
    got = {
        r["v"]: r["secs"]
        for r in df.withColumn("secs", _go_duration_seconds(F.col("v"))).collect()
    }
    for s, want in cases:
        assert got[s] == want, (s, got[s], want)
