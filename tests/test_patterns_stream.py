"""Streaming pattern mining through foreachBatch (ref: controller.go)."""

from gigapipe_spark.patterns.cluster import read_patterns, stream_mine_patterns


def test_stream_mining(spark, tmp_path):
    rows = [
        (1, 1_300_000_000_000, "user 17 logged in from 10.0.0.1"),
        (1, 1_350_000_000_000, "user 42 logged in from 10.0.0.9"),
        (1, 1_400_000_000_000, "disk full on /dev/sda1"),
    ]
    df = spark.createDataFrame(rows, "fingerprint long, timestamp_ns long, string string")
    src = str(tmp_path / "src")
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = str(tmp_path / "patterns")
    q = stream_mine_patterns(stream, out, str(tmp_path / "ck"))
    try:
        # drain the available data then stop
        import time

        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            if q.lastProgress and q.lastProgress["numInputRows"] == 0 and q.recentProgress:
                break
            time.sleep(2)
    finally:
        q.stop()
    pats = spark.read.parquet(out)
    agg = read_patterns(pats).collect()
    by_pattern = {r["pattern"]: r["samples_count"] for r in agg}
    assert by_pattern.get("user <_> logged in from <_>") == 2
    assert "disk full on /dev/sda1" in by_pattern
