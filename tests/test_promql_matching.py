"""Vector matching on()/ignoring() with group_left — the classic
share-of-total ratio."""

from pyspark.sql import functions as F

from gigapipe_spark.promql.compiler import PromQLContext, query
from gigapipe_spark.sources.oracle import METRIC_SAMPLES_CTE
from tests.conftest import SF_DIR
from tests.oracle_utils import assert_match


def test_share_of_total_group_left(spark):
    res = query(
        PromQLContext(spark, SF_DIR),
        'sum by (app) (count_over_time({level="info"}[1h]))'
        " / on() group_left sum(count_over_time({level=\"info\"}[1h]))",
    )
    sql = f"""
    WITH {METRIC_SAMPLES_CTE}, per_app AS (
      SELECT app, (timestamp_ns - timestamp_ns % 3600000000000) AS b,
             CAST(count(*) AS DOUBLE) AS v
      FROM metric_samples WHERE level='info' GROUP BY 1, 2
    ), total AS (
      SELECT b, sum(v) AS t FROM per_app GROUP BY 1
    )
    SELECT p.app, p.b AS timestamp_ns, round(p.v / t.t, 6) AS value
    FROM per_app p JOIN total t ON p.b = t.b
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


def test_on_specific_label(spark):
    # matching on (app): per-(app,instance)-free join key
    res = query(
        PromQLContext(spark, SF_DIR),
        'sum by (app) (count_over_time({app="click"}[1h]))'
        ' + on(app) sum by (app) (count_over_time({app="click"}[1h]))',
    )
    sql = f"""
    WITH {METRIC_SAMPLES_CTE}
    SELECT app, (timestamp_ns - timestamp_ns % 3600000000000) AS timestamp_ns,
           round(CAST(count(*) AS DOUBLE) * 2, 6) AS value
    FROM metric_samples WHERE app='click' GROUP BY 1, 2
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


def test_group_left_copies_labels_from_one_side(spark):
    """x / on(app) group_left(level) y: result rows keep the many side's
    identity plus the `level` label copied from the one side."""
    q = (
        'sum by (app, instance) (count_over_time({level="info"}[1h]))'
        ' / on(app) group_left(level)'
        ' sum by (app, level) (count_over_time({level="info"}[1h]))'
    )
    out = query(PromQLContext(spark, SF_DIR), q)
    rows = out.limit(10).collect()
    assert rows
    for r in rows:
        assert r["labels"]["level"] == "info"  # copied from one side
        assert "instance" in r["labels"]  # many-side identity kept
        assert abs(r["value"]) <= 1.0 + 1e-9  # share of total per app
