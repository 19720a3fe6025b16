"""PromQL subqueries: expr[range:step] re-evaluated on the step grid."""

from pyspark.sql import functions as F

from gigapipe_spark.promql import parser as P
from gigapipe_spark.promql.compiler import PromQLContext, query
from gigapipe_spark.sources.oracle import METRIC_SAMPLES_CTE
from tests.conftest import SF_DIR
from tests.oracle_utils import assert_match


def test_parse_subquery():
    e = P.parse("max_over_time(sum by (app) ({level=\"info\"})[1h:1m])")
    sq = e.args[0]
    assert isinstance(sq, P.Subquery)
    assert sq.range_ns == 3_600_000_000_000 and sq.step_ns == 60_000_000_000
    # plain selector range still binds to the selector
    e2 = P.parse('rate({app="x"}[5m])')
    assert e2.args[0].range_ns == 300_000_000_000


def test_subquery_matches_oracle(spark):
    res = query(
        PromQLContext(spark, SF_DIR),
        'max_over_time(sum by (app) ({app="click"})[1h:1m])',
    )
    sql = f"""
    WITH {METRIC_SAMPLES_CTE}, inst AS (
      SELECT fingerprint, app, (timestamp_ns - timestamp_ns % 60000000000) AS step_b,
             max_by(value, timestamp_ns) AS value
      FROM metric_samples WHERE app='click' GROUP BY 1, 2, 3
    ), summed AS (
      SELECT app, step_b, sum(value) AS value FROM inst GROUP BY 1, 2
    )
    SELECT app, (step_b - step_b % 3600000000000) AS timestamp_ns,
           round(max(value), 6) AS value
    FROM summed GROUP BY 1, 2
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


def test_rate_over_subquery(spark):
    """rate(max_over_time(x[10m:])[1h:10m]): counter math over the inner
    expression's step-grid points."""
    c = PromQLContext(spark, SF_DIR)
    out = query(c, 'rate(max_over_time({app="click"}[10m])[1h:10m])')
    rows = out.limit(5).collect()
    assert rows and all(r["value"] is not None for r in rows)
    # resets over a subquery: counts are non-negative integers
    res = query(c, 'resets(max_over_time({app="click"}[10m])[1h:10m])')
    vals = [r["value"] for r in res.collect()]
    assert vals and all(v >= 0 and v == int(v) for v in vals)
