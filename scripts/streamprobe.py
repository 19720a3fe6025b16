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


def probe_patterns_churn(spark, windows: int, series_per_window: int) -> dict:
    """Series-CHURN probe for the stateful patterns stream (VERDICT r9
    task 2): every 10-minute window brings a FRESH set of fingerprints,
    streamed in time order (one file per window). Without idle eviction
    the state grows linearly with windows (every key ever seen); with
    the 5m-idle eviction mirroring the reference controller's cleanup
    (controller.go:118-131) it plateaus at ~one window's live set. The
    plateau is the receipt that state tracks the LIVE horizon, not
    lifetime cardinality."""
    import glob

    from gigapipe_spark.patterns.cluster import stateful_mine_patterns

    src = tempfile.mkdtemp(prefix="streamprobe_churn_")
    w_ns = 600_000_000_000
    t0 = 1_700_000_000 * 1_000_000_000
    for w in range(windows):
        df = spark.range(series_per_window).select(
            (F.lit(w * series_per_window) + F.col("id")).alias("fingerprint"),
            (F.lit(t0 + w * w_ns) + F.col("id") * 1000).alias("timestamp_ns"),
            F.lit(0.0).alias("value"),
            F.concat(
                F.lit("login user u"), F.col("id").cast("string"),
                F.lit(" from 10.0.0.1 window "), F.lit(str(w)),
            ).alias("string"),
            F.lit(1).cast("tinyint").alias("type"),
        )
        df.coalesce(1).write.mode("append").parquet(src)
    # one file per trigger → one 10m window per micro-batch, time order
    files = sorted(glob.glob(os.path.join(src, "part-*.parquet")))
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    sec, prog = _drain(
        spark, stateful_mine_patterns(stream), "update", "patterns_churn"
    )
    mems = [
        int(so.get("memoryUsedBytes", 0))
        for p in prog
        if p
        for so in (p.get("stateOperators", []) or [])
    ]
    shutil.rmtree(src, ignore_errors=True)
    half = len(mems) // 2 or 1
    return {
        "path": "patterns_churn",
        "sec": sec,
        "windows": windows,
        "series_per_window": series_per_window,
        "files": len(files),
        "state_mb_per_batch": [round(m / 1e6, 2) for m in mems],
        "state_mb_peak": round(max(mems) / 1e6, 2) if mems else 0.0,
        # plateau verdict: the second half's peak must not exceed the
        # first half's peak by more than 30% (linear growth would ~2x)
        "plateau": bool(
            mems
            and max(mems[half:] or [0])
            <= 1.3 * max(mems[:half] or [1])
        ),
    }


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

    # churn probe is self-synthesizing (no replicated corpus needed):
    # 12 ten-minute windows × 20k fresh series each = 240k lifetime
    # keys, live set 20k — state must plateau, not grow 12×
    churn = probe_patterns_churn(spark, windows=12, series_per_window=20_000)
    print(json.dumps(churn), flush=True)

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
