"""Streaming corpus curation: exact dedup with bounded watermark state
plus the stateless quality/scrub stages composing on a stream."""

from pyspark.sql import functions as F

from gigapipe_spark.streaming.curation import curate_stream, dedup_exact_stream


def _doc_rows():
    base = 1_700_000_000_000
    rows = []
    for i in range(40):
        text = f"document body number {i % 10} with several words here"
        rows.append((i, text, base + i * 1000))
    rows.append((100, "a b", base + 50_000))  # fails the word floor? (3 words min -> 2 words drops)
    rows.append((101, "mail me at a@b.com maybe twice a@b.com", base + 51_000))
    return rows


def test_streaming_dedup_and_curation(spark, tmp_path):
    rows = _doc_rows()
    df = spark.createDataFrame(rows, "doc_id long, text string, ts_ms long").withColumn(
        "ts", F.timestamp_millis(F.col("ts_ms"))
    ).drop("ts_ms")
    src = str(tmp_path / "src")
    df.repartition(3).write.parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    out = curate_stream(stream, delay="0 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("curated")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT doc_id, text FROM curated").collect()
    texts = [r["text"] for r in got]
    # 10 distinct bodies survive dedup; the 2-word doc is filtered; the
    # email doc survives scrubbed
    assert len(got) == 11
    assert sum(1 for t in texts if t.startswith("document body")) == 10
    assert len({t for t in texts if t.startswith("document body")}) == 10
    scrubbed = [t for t in texts if "mail me" in t][0]
    assert "a@b.com" not in scrubbed and scrubbed.count("<EMAIL>") == 2


def test_streaming_dedup_state_is_digest_only(spark, tmp_path):
    """dropDuplicatesWithinWatermark keys on the digest column only —
    one state row per distinct content, not per doc."""
    df = spark.createDataFrame(
        [(i, "same text everywhere", 1_700_000_000_000 + i) for i in range(25)],
        "doc_id long, text string, ts_ms long",
    ).withColumn("ts", F.timestamp_millis(F.col("ts_ms"))).drop("ts_ms")
    src = str(tmp_path / "src2")
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = dedup_exact_stream(stream, delay="0 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("dd_only")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.sql("SELECT count(*) c FROM dd_only").collect()[0]["c"] == 1
