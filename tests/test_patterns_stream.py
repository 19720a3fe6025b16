"""Streaming pattern mining through foreachBatch (ref: controller.go)."""

from gigapipe_spark.patterns.cluster import read_patterns, stream_mine_patterns
import pytest


@pytest.mark.slow
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


def test_stateful_mine_patterns_cross_batch(spark, tmp_path):
    """State persists across micro-batches: the same line shape arriving
    in two separate files (maxFilesPerTrigger=1 → two batches) merges
    into ONE cluster whose count spans both batches."""
    from gigapipe_spark.patterns.cluster import stateful_mine_patterns

    schema = "fingerprint long, timestamp_ns long, value double, string string, type tinyint"
    src = str(tmp_path / "src")
    b1 = [(1, 1_000, 0.0, "login user alice from 10.0.0.1", 1)]
    b2 = [(1, 2_000, 0.0, "login user bob from 10.0.0.2", 1)]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stateful_mine_patterns(stream, similarity=0.6)
    q = (
        out.writeStream.format("memory")
        .queryName("stateful_patterns")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT * FROM stateful_patterns ORDER BY samples_count"
    ).collect()
    assert rows, "no output emitted"
    final = rows[-1]
    # the two lines generalized into one pattern with both samples counted
    assert final["samples_count"] == 2
    assert "<_>" in final["pattern"] and final["pattern"].startswith("login user")


def test_stateful_patterns_idle_eviction_bounds_state(spark, tmp_path):
    """State bytes are BOUNDED: clusters idle past the event-time
    horizon are dropped, mirroring the reference controller's cleanup
    (controller.go:118-131 RunCleanup + pattern.go:306-313 5m idle
    evict). Three single-file batches: shape A at t0, shape B at
    t0+10m (pushes the high-water past A's horizon -> A evicted), then
    shape A again — if A had survived, its count would continue at 2;
    a fresh count of 1 proves the old cluster left the state."""
    from gigapipe_spark.patterns.cluster import stateful_mine_patterns

    schema = (
        "fingerprint long, timestamp_ns long, value double, "
        "string string, type tinyint"
    )
    t0 = 1_000_000_000_000
    m10 = 600_000_000_000
    src = str(tmp_path / "src")
    batches = [
        [(1, t0, 0.0, "login user alice from 10.0.0.1", 1)],
        [(2, t0 + m10, 0.0, "disk full on /dev/sda1", 1)],
        [(1, t0 + m10 + 1_000, 0.0, "login user bob from 10.0.0.2", 1)],
    ]
    for b in batches:
        spark.createDataFrame(b, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stateful_mine_patterns(stream, similarity=0.6)
    q = (
        out.writeStream.format("memory")
        .queryName("stateful_evict")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM stateful_evict").collect()
    login_counts = sorted(
        r["samples_count"] for r in rows if r["pattern"].startswith("login")
    )
    # batch 1 emits count 1; batch 3 emits count 1 AGAIN (fresh cluster
    # — the t0 cluster was evicted when the high-water hit t0+10m).
    # Without eviction batch 3 would merge and emit count 2.
    assert login_counts == [1, 1], login_counts


def test_stateful_patterns_restart_recovers_state(spark, tmp_path):
    """Kill-and-resume for the stateful online twin (VERDICT r10 task
    6): run one micro-batch, stop, restart from the SAME checkpoint
    with a new file present — the restarted query's emission must merge
    the new line into the cluster recovered from checkpointed state
    (samples_count spans both runs), equal to what a single batch
    recompute over both lines produces."""
    from gigapipe_spark.patterns.cluster import stateful_mine_patterns

    schema = (
        "fingerprint long, timestamp_ns long, value double, "
        "string string, type tinyint"
    )
    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    b1 = [(1, 1_000, 0.0, "login user alice from 10.0.0.1", 1)]
    b2 = [(1, 2_000, 0.0, "login user bob from 10.0.0.2", 1)]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    def run():
        # memory sink can't recover from a checkpoint; foreachBatch can
        emitted: list = []
        stream = spark.readStream.schema(schema).parquet(src)
        out = stateful_mine_patterns(stream, similarity=0.6)
        q = (
            out.writeStream.foreachBatch(
                lambda df, _bid: emitted.extend(df.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return emitted

    rows1 = run()
    assert rows1 and rows1[-1]["samples_count"] == 1

    spark.createDataFrame(b2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    rows2 = sorted(run(), key=lambda r: r["samples_count"])
    assert rows2, "restarted query emitted nothing"
    final = rows2[-1]
    # count 2 = one line from the pre-restart state + the new line:
    # the cluster survived the restart and generalized
    assert final["samples_count"] == 2
    assert final["pattern"].startswith("login user") and "<_>" in final["pattern"]


def test_stream_patterns_replayed_batch_overwrites_itself(spark, tmp_path):
    """Exactly-once for the standalone streaming patterns sink: a
    replayed micro-batch (same batch id after a crash-before-commit)
    overwrites its own __batch partition instead of double-appending,
    while a new batch id lands additively."""
    from gigapipe_spark.patterns import cluster as pc

    out = str(tmp_path / "patterns_out")
    schema = (
        "fingerprint long, timestamp_ns long, value double, "
        "string string, type tinyint"
    )
    batch = spark.createDataFrame(
        [(1, 1_000, 0.0, "login user alice", 1)], schema
    )
    # drive the sink body directly with explicit batch ids, exactly as
    # stream_mine_patterns builds it
    from pyspark.sql import functions as F

    def sink(batch_df, batch_id):
        (
            pc.mine_patterns(batch_df, 0.6, 600_000_000_000)
            .withColumn("__batch", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch")
            .parquet(out)
        )

    sink(batch, 3)
    n1 = spark.read.parquet(out).count()
    sink(batch, 3)  # replay: same batch id
    assert spark.read.parquet(out).count() == n1
    sink(batch, 4)  # new batch id: additive
    assert spark.read.parquet(out).count() == 2 * n1
    got = pc.read_patterns(spark.read.parquet(out)).collect()
    assert got[0]["samples_count"] == 2  # one per batch, merged on read
