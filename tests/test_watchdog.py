"""Writer watchdog analog (ref: writer/watchdog/watchdog.go)."""

import time

import pytest

from gigapipe_spark.streaming import health


def _start_noop_stream(spark, tmp_path, name):
    df = spark.createDataFrame([(1,)], "v long")
    src = str(tmp_path / f"src_{name}")
    df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    return (
        stream.writeStream.format("noop")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
        .start()
    )


def test_check_healthy_and_missing(spark, tmp_path):
    q = _start_noop_stream(spark, tmp_path, "wd_sink")
    try:
        active = health.check(spark, expected=["wd_sink"])
        assert "wd_sink" in active
        with pytest.raises(health.WatchdogError, match="not running"):
            health.check(spark, expected=["wd_sink", "ghost_sink"])
    finally:
        q.stop()
    # after stop, the expected query is gone → watchdog fails fast
    q.awaitTermination(10)
    with pytest.raises(health.WatchdogError, match="not running"):
        health.check(spark, expected=["wd_sink"])


def test_periodic_watchdog_detects_stop(spark, tmp_path):
    q = _start_noop_stream(spark, tmp_path, "wd_periodic")
    wd = health.Watchdog(spark, expected=["wd_periodic"], interval_s=0.2).start()
    try:
        deadline = time.time() + 10
        while wd.checks == 0 and time.time() < deadline:
            time.sleep(0.05)
        assert wd.checks > 0 and wd.error is None
        q.stop()
        q.awaitTermination(10)
        deadline = time.time() + 10
        while wd.error is None and time.time() < deadline:
            time.sleep(0.05)
        assert wd.error is not None  # fail-fast like the reference
    finally:
        wd.stop()
        if q.isActive:
            q.stop()
