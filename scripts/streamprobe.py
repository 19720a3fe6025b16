"""Streaming-path scale probe (VERDICT r7 task 6).

Drives the three Structured-Streaming paths end-to-end over the 1x and
Fx (default 30x) samples corpora and records wall time, input rows, and
STATE-STORE size from the query progress — the number the batch probes
can't see. Multi-batch (maxFilesPerTrigger) so cross-batch state is
actually exercised, not a single-batch drain.

Paths:
  rollup_stream    — rollup_15s_stream windowed agg (watermark state)
  patterns_state   — stateful_mine_patterns applyInPandasWithState
  curation_stream  — curate_stream dropDuplicatesWithinWatermark

Usage: python scripts/streamprobe.py [factor] [sf_dir]
Reuses /tmp/gigapipe_scaleprobe_{factor}x (built by scaleprobe.py) when
present. Prints one JSON line per (path, scale).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _prep_samples(spark, sf_dir: str, out: str, n_files: int) -> None:
    """Materialize the samples view as an n_files parquet dir (the
    stream source; file count drives batch count via
    maxFilesPerTrigger)."""
    if os.path.isdir(out):
        return
    from gigapipe_spark.sources import views

    views.samples(spark, sf_dir).repartition(n_files).write.parquet(out)


def _drain(spark, stream_df, out_mode: str, name: str):
    """Run to completion with availableNow over ~4 batches; return
    (seconds, progress list)."""
    q = (
        stream_df.writeStream.format("noop")
        .outputMode(out_mode)
        .option(
            "checkpointLocation",
            tempfile.mkdtemp(prefix=f"streamprobe_ckpt_{name}_"),
        )
        .trigger(availableNow=True)
        .start()
    )
    t0 = time.monotonic()
    q.awaitTermination()
    sec = round(time.monotonic() - t0, 2)
    return sec, list(q.recentProgress)


def _state_stats(progress) -> dict:
    rows = 0
    mem = 0
    inputs = 0
    batches = 0
    for p in progress:
        if p is None:
            continue
        inputs += int(p.get("numInputRows", 0))
        batches += 1
        for so in p.get("stateOperators", []) or []:
            rows = max(rows, int(so.get("numRowsTotal", 0)))
            mem = max(mem, int(so.get("memoryUsedBytes", 0)))
    return {
        "input_rows": inputs,
        "batches": batches,
        "state_rows": rows,
        "state_mb": round(mem / 1e6, 1),
    }


def probe_rollup(spark, src: str, files_per_trigger: int) -> dict:
    from gigapipe_spark.streaming.rollup import rollup_15s_stream

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(src)
    )
    sec, prog = _drain(spark, rollup_15s_stream(stream), "append", "rollup")
    return {"path": "rollup_stream", "sec": sec, **_state_stats(prog)}


def probe_patterns(spark, src: str, files_per_trigger: int) -> dict:
    from gigapipe_spark.patterns.cluster import stateful_mine_patterns

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(src)
    )
    logs = stream.filter(F.col("type").isin(0, 1))
    sec, prog = _drain(
        spark, stateful_mine_patterns(logs), "update", "patterns"
    )
    return {"path": "patterns_state", "sec": sec, **_state_stats(prog)}


def probe_curation(spark, src: str, files_per_trigger: int) -> dict:
    from gigapipe_spark.streaming.curation import curate_stream

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(src)
    )
    docs = stream.select(
        F.col("fingerprint").alias("doc_id"),
        F.col("string").alias("text"),
        F.timestamp_micros((F.col("timestamp_ns") / 1000).cast("long")).alias(
            "ts"
        ),
    )
    sec, prog = _drain(spark, curate_stream(docs), "append", "curation")
    return {"path": "curation_stream", "sec": sec, **_state_stats(prog)}


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    big_dir = f"/tmp/gigapipe_scaleprobe_{factor}x"

    from gigapipe_spark.session import get_spark

    spark = get_spark("streamprobe")
    if not os.path.isdir(os.path.join(big_dir, "events.parquet")):
        from scaleprobe import replicate

        replicate(spark, sf_dir, big_dir, factor)

    src_1x = "/tmp/gigapipe_streamprobe_samples_1x"
    src_fx = f"/tmp/gigapipe_streamprobe_samples_{factor}x"
    _prep_samples(spark, sf_dir, src_1x, 8)
    _prep_samples(spark, big_dir, src_fx, 8 * factor)

    probes = [probe_rollup, probe_patterns, probe_curation]
    results = []
    for fn in probes:
        fn(spark, src_1x, 2)  # warm JIT/codegen, throwaway
        r1 = fn(spark, src_1x, 2)  # 4 batches at 1x
        rf = fn(spark, src_fx, 2 * factor)  # 4 batches at Fx
        row = {
            "query": r1["path"],
            "factor": factor,
            "sec_1x": r1["sec"],
            "sec_Fx": rf["sec"],
            "ratio": round(rf["sec"] / max(r1["sec"], 1e-9), 1),
            "rows_1x": r1["input_rows"],
            "rows_Fx": rf["input_rows"],
            "state_rows_1x": r1["state_rows"],
            "state_rows_Fx": rf["state_rows"],
            "state_mb_1x": r1["state_mb"],
            "state_mb_Fx": rf["state_mb"],
        }
        results.append(row)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
