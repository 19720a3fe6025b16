"""PromQL semantic tests vs the DuckDB oracle.

Counter semantics follow the REFERENCE formula (planner/counter.go):
increase = last - first + Σ(prev where prev > cur), not upstream
Prometheus extrapolation — SURVEY §7.4 risk 2 says match the reference.
"""

from pyspark.sql import functions as F

from gigapipe_spark.promql.compiler import PromQLContext, gap_fill, query
from gigapipe_spark.sources.oracle import METRIC_SAMPLES_CTE
from tests.conftest import SF_DIR
from tests.oracle_utils import assert_match


def ctx(spark, step_ns=60_000_000_000):
    return PromQLContext(spark, SF_DIR, step_ns=step_ns)


def out(df):
    return df.select("fingerprint", "timestamp_ns", F.round("value", 6).alias("value"))


def counter_cte(rng_ns: int, where: str) -> str:
    return f"""
    WITH {METRIC_SAMPLES_CTE}, d AS (
      SELECT fingerprint, timestamp_ns, value,
             (timestamp_ns - timestamp_ns % {rng_ns}) AS bucket,
             lag(value) OVER (PARTITION BY fingerprint, (timestamp_ns - timestamp_ns % {rng_ns})
                              ORDER BY timestamp_ns) AS prev
      FROM metric_samples WHERE {where}
    )
    """


def test_rate_with_resets(spark):
    rng = 600_000_000_000
    res = query(ctx(spark), 'rate({app="click"}[10m])')
    sql = counter_cte(rng, "app='click'") + f"""
    SELECT fingerprint, bucket AS timestamp_ns,
           round((max_by(value, timestamp_ns) - min_by(value, timestamp_ns)
                  + sum(CASE WHEN prev > value THEN prev ELSE 0 END)) / {rng/1e9}, 6) AS value
    FROM d GROUP BY 1, 2
    """
    assert_match(out(res), sql, SF_DIR)


def test_increase(spark):
    rng = 3_600_000_000_000
    res = query(ctx(spark), 'increase({app="view"}[1h])')
    sql = counter_cte(rng, "app='view'") + """
    SELECT fingerprint, bucket AS timestamp_ns,
           round(max_by(value, timestamp_ns) - min_by(value, timestamp_ns)
                 + sum(CASE WHEN prev > value THEN prev ELSE 0 END), 6) AS value
    FROM d GROUP BY 1, 2
    """
    assert_match(out(res), sql, SF_DIR)


def test_delta(spark):
    rng = 3_600_000_000_000
    res = query(ctx(spark), 'delta({app="purchase"}[1h])')
    sql = counter_cte(rng, "app='purchase'") + """
    SELECT fingerprint, bucket AS timestamp_ns,
           round(max_by(value, timestamp_ns) - min_by(value, timestamp_ns), 6) AS value
    FROM d GROUP BY 1, 2
    """
    assert_match(out(res), sql, SF_DIR)


def test_resets_and_changes(spark):
    rng = 3_600_000_000_000
    res = query(ctx(spark), 'resets({app="click"}[1h])')
    sql = counter_cte(rng, "app='click'") + """
    SELECT fingerprint, bucket AS timestamp_ns,
           round(CAST(sum(CASE WHEN prev IS NOT NULL AND prev > value THEN 1 ELSE 0 END) AS DOUBLE), 6) AS value
    FROM d GROUP BY 1, 2
    """
    assert_match(out(res), sql, SF_DIR)
    res2 = query(ctx(spark), 'changes({app="click"}[1h])')
    sql2 = counter_cte(rng, "app='click'") + """
    SELECT fingerprint, bucket AS timestamp_ns,
           round(CAST(sum(CASE WHEN prev IS NOT NULL AND prev != value THEN 1 ELSE 0 END) AS DOUBLE), 6) AS value
    FROM d GROUP BY 1, 2
    """
    assert_match(out(res2), sql2, SF_DIR)


def test_avg_over_time(spark):
    rng = 1_800_000_000_000
    res = query(ctx(spark), 'avg_over_time({app="signup"}[30m])')
    sql = f"""
    WITH {METRIC_SAMPLES_CTE}
    SELECT fingerprint, (timestamp_ns - timestamp_ns % {rng}) AS timestamp_ns,
           round(avg(value), 6) AS value
    FROM metric_samples WHERE app='signup' GROUP BY 1, 2
    """
    assert_match(out(res), sql, SF_DIR)


def test_instant_vector_sum_by(spark):
    step = 60_000_000_000
    res = query(ctx(spark, step), 'sum by (app) ({level="info"})')
    sql = f"""
    WITH {METRIC_SAMPLES_CTE}, inst AS (
      SELECT fingerprint, app, (timestamp_ns - timestamp_ns % {step}) AS bucket,
             max_by(value, timestamp_ns) AS value
      FROM metric_samples WHERE level='info' GROUP BY 1, 2, 3
    )
    SELECT app, bucket AS timestamp_ns, round(sum(value), 6) AS value
    FROM inst GROUP BY 1, 2
    """
    assert_match(
        res.select(
            F.col("labels").getItem("app").alias("app"),
            "timestamp_ns",
            F.round("value", 6).alias("value"),
        ),
        sql,
        SF_DIR,
    )


def test_comparison_filter_and_bool(spark):
    rng = 3_600_000_000_000
    res = query(ctx(spark), 'increase({app="error"}[1h]) > 500')
    sql = counter_cte(rng, "app='error'") + """
    , m AS (
      SELECT fingerprint, bucket AS timestamp_ns,
             max_by(value, timestamp_ns) - min_by(value, timestamp_ns)
             + sum(CASE WHEN prev > value THEN prev ELSE 0 END) AS value
      FROM d GROUP BY 1, 2
    ) SELECT fingerprint, timestamp_ns, round(value, 6) AS value FROM m WHERE value > 500
    """
    assert_match(out(res), sql, SF_DIR)


def test_scalar_fn_and_arith(spark):
    rng = 3_600_000_000_000
    res = query(ctx(spark), 'delta({app="view"}[1h]) * -1')
    resabs = query(ctx(spark), 'abs(delta({app="view"}[1h]) * -1)')
    sql = counter_cte(rng, "app='view'") + """
    SELECT fingerprint, bucket AS timestamp_ns,
           round(abs(max_by(value, timestamp_ns) - min_by(value, timestamp_ns)), 6) AS value
    FROM d GROUP BY 1, 2
    """
    assert_match(out(resabs), sql, SF_DIR)
    neg = res.select(F.sum(F.when(F.col("value") > 0, 1).otherwise(0)).alias("n")).collect()[0]["n"]
    pos = resabs.select(F.sum(F.when(F.col("value") < 0, 1).otherwise(0)).alias("n")).collect()[0]["n"]
    assert pos == 0  # abs() leaves nothing negative


def test_vector_and_unless(spark):
    c = ctx(spark)
    a = query(c, 'increase({app="click"}[1h]) and increase({app="click"}[1h])')
    b = query(c, 'increase({app="click"}[1h])')
    assert a.count() == b.count()
    u = query(c, 'increase({app="click"}[1h]) unless increase({app="click"}[1h])')
    assert u.count() == 0


def test_gap_fill(spark):
    c = ctx(spark, step_ns=60_000_000_000)
    m = query(c, 'sum by (app) (increase({app="click"}[10m]))')
    filled = gap_fill(c, m, lookback_ns=10 * 60 * 1_000_000_000)
    # the grid is denser than the 10m buckets: at least as many rows,
    # every original point preserved
    assert filled.count() >= m.count()
    orig = m.select("fingerprint", "timestamp_ns").distinct()
    joined = orig.join(filled, ["fingerprint", "timestamp_ns"], "left_semi")
    assert joined.count() == orig.count()


def test_agg_range_commute_matches_regroup(spark):
    """sum by (app)(count_over_time(x[1h])) via the commuted single-agg
    path must equal grouping the per-series matrix after the fact."""
    from gigapipe_spark.promql.compiler import PromQLContext, _range_fn, query
    from gigapipe_spark.promql import parser as P

    c = PromQLContext(spark, SF_DIR)
    commuted = query(c, 'sum by (app) (count_over_time({app=~".+"}[1h]))')
    per_series = _range_fn(
        c, P.parse('count_over_time({app=~".+"}[1h])')
    )
    expected = (
        per_series.groupBy(F.col("labels")["app"].alias("app"), "timestamp_ns")
        .agg(F.sum("value").alias("value"))
    )
    a = {(r["labels"]["app"], r["timestamp_ns"]): r["value"] for r in commuted.collect()}
    b = {(r["app"], r["timestamp_ns"]): r["value"] for r in expected.collect()}
    assert a == b


def test_mad_over_time_matches_oracle(spark):
    q = 'mad_over_time({app="purchase"}[30m])'
    sql = f"""
    WITH {METRIC_SAMPLES_CTE}, m AS (
      SELECT fingerprint,
             (timestamp_ns - timestamp_ns % 1800000000000) AS ts, value,
             median(value) OVER (
               PARTITION BY fingerprint,
                            (timestamp_ns - timestamp_ns % 1800000000000)
             ) AS med
      FROM metric_samples WHERE app = 'purchase'
    )
    SELECT fingerprint, ts AS timestamp_ns,
           round(quantile_cont(abs(value - med), 0.5), 6) AS value
    FROM m GROUP BY 1, 2
    """
    assert_match(out(query(ctx(spark), q)), sql, SF_DIR)


def test_mad_over_time_single_exchange(spark):
    """The window median and the groupBy share (fingerprint, bucket)
    partitioning — the MAD plan must not add a second exchange after
    the window's."""
    plan = query(
        ctx(spark), 'mad_over_time({app="view"}[1h])'
    )._jdf.queryExecution().executedPlan().toString()
    import re as _re

    after_window = plan.split("Window", 1)[0]
    # exchanges above the window node: only AQE/result-stage shuffles
    # introduced by the final projection would show; the aggregation
    # itself must reuse the window's hashpartitioning
    n_exchange_above_agg = len(
        _re.findall(r"Exchange hashpartitioning", after_window)
    )
    assert n_exchange_above_agg == 0, plan


def test_unimplemented_experimental_fn_clear_error(spark):
    # every KNOWN experimental fn is native now (r9); the allowlist
    # guard stays armed for future upstream names
    import pytest as _pytest

    from gigapipe_spark.logql.parser import LogQLSyntaxError
    from gigapipe_spark.promql import parser as PP

    PP.EXPERIMENTAL_FNS.add("info")  # e.g. upstream's experimental info()
    try:
        with _pytest.raises(LogQLSyntaxError, match="experimental"):
            query(ctx(spark), 'info({app="view"})')
        # a plain metric that HAPPENS to be named like an experimental
        # fn (no parens) still parses as a selector
        query(ctx(spark), "info")
    finally:
        PP.EXPERIMENTAL_FNS.discard("info")
    # limitk/limit_ratio are aggregation KEYWORDS now (upstream reserves
    # aggregation operator names too) — bare use is a parse error
    with _pytest.raises(LogQLSyntaxError):
        query(ctx(spark), "limitk")
