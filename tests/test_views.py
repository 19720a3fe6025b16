"""Views layer: Spark derivations must match the oracle CTEs exactly."""

from gigapipe_spark.sources import oracle, views
from tests.conftest import SF_DIR
from tests.oracle_utils import assert_match


def test_samples_matches_oracle(spark):
    df = views.samples(spark, SF_DIR).select(
        "fingerprint", "timestamp_ns", "value", "string"
    )
    sql = oracle.with_samples(
        "SELECT fingerprint, timestamp_ns, value, string FROM samples"
    )
    assert_match(df, sql, SF_DIR)


def test_metric_samples_matches_oracle(spark):
    df = views.metric_samples(spark, SF_DIR).select(
        "fingerprint", "timestamp_ns", "value"
    )
    sql = oracle.with_metric_samples(
        "SELECT fingerprint, timestamp_ns, round(value, 6) AS value FROM metric_samples"
    )
    # round spark side too (float accumulation order differs)
    from pyspark.sql import functions as F

    df = df.select("fingerprint", "timestamp_ns", F.round("value", 6).alias("value"))
    assert_match(df, sql, SF_DIR)


def test_spans_matches_oracle(spark):
    df = views.spans(spark, SF_DIR).select(
        "trace_id", "span_id", "parent_id", "name", "timestamp_ns", "duration_ns"
    )
    sql = oracle.with_spans(
        "SELECT trace_id, span_id, parent_id, name, timestamp_ns, duration_ns FROM spans"
    )
    assert_match(df, sql, SF_DIR)


def test_time_series_fingerprints_consistent(spark):
    ts = views.time_series(spark, SF_DIR)
    s = views.samples(spark, SF_DIR)
    # every sample fingerprint resolves to exactly one series row
    joined = s.select("fingerprint").distinct().join(ts, "fingerprint", "left_anti")
    assert joined.count() == 0
    assert ts.groupBy("fingerprint").count().filter("count > 1").count() == 0


def test_gin_explodes_labels(spark):
    gin = views.time_series_gin(spark, SF_DIR)
    keys = {r["key"] for r in gin.select("key").distinct().collect()}
    assert keys == {"app", "instance", "level"}
