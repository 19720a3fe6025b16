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


def test_fact_cache_gate_fails_closed_and_walks_partitions(tmp_path):
    """ADVICE r13 low: an unreadable heap probe must mean 'stream from
    parquet' (caching on doubt reproduces the OOM the gate prevents),
    and the small-heap fallback must size partitioned dataset
    DIRECTORIES, which a flat '*.parquet' listing totals as ~0 bytes."""
    import os

    from gigapipe_spark.sources.views import _fact_cache_ok

    class _Boom:
        @property
        def sparkContext(self):
            raise RuntimeError("no jvm")

    assert _fact_cache_ok(_Boom(), str(tmp_path)) is False

    class _SmallHeap:
        class sparkContext:  # noqa: N801 — stand-in attribute shape
            class _jvm:  # noqa: N801
                class java:  # noqa: N801
                    class lang:  # noqa: N801
                        class Runtime:  # noqa: N801
                            @staticmethod
                            def getRuntime():
                                class _R:
                                    @staticmethod
                                    def maxMemory():
                                        return 1 * 1024**3  # 1 GiB

                                return _R()

    # nested partitioned layout: 9 MB lives two levels down
    part = tmp_path / "events.parquet" / "oid=0" / "date=2024-01-01"
    part.mkdir(parents=True)
    (part / "part-0.parquet").write_bytes(b"\0" * (9 * 1024 * 1024))
    assert _fact_cache_ok(_SmallHeap(), str(tmp_path)) is False
    os.remove(part / "part-0.parquet")
    (part / "part-0.parquet").write_bytes(b"\0" * 1024)
    assert _fact_cache_ok(_SmallHeap(), str(tmp_path)) is True
