"""Ancestor-index maintenance cost probe (round-10 stored index).

The claim in storage/writer._maintain_ancestor_index: per-batch cost is
O(spans of touched traces x log depth), INDEPENDENT of table size —
trace-scoped recompute + anti-join, partition-pruned lookups. This
probe appends N batches of fresh traces to one store and records the
per-batch spans_fanout wall time alongside the growing table size; a
flat per-batch series is the receipt, a rising one falsifies the claim.

Usage: python scripts/ancestorindexprobe.py [batches] [traces_per_batch]
Prints one JSON line per batch and a summary verdict line.
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


def _span_batch(spark, batch_idx: int, traces: int, depth: int = 4):
    """traces x depth spans: chains t{batch}_{i}: s0 <- s1 <- ... with
    hex ids, the zipkin-decoder output shape spans_fanout consumes."""
    base_ts = 1_700_000_000_000_000_000 + batch_idx * 1_000_000_000
    df = (
        spark.range(traces)
        .withColumn("lvl", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))))
        .select(
            F.lpad(
                F.concat(
                    F.lit(format(batch_idx, "x")),
                    F.lit("a"),
                    F.conv(F.col("id").cast("string"), 10, 16),
                ),
                32, "0",
            ).alias("trace_id"),
            F.lpad(
                F.concat(
                    F.conv(F.col("id").cast("string"), 10, 16),
                    F.lit("b"),
                    F.conv(F.col("lvl").cast("string"), 10, 16),
                ),
                16, "0",
            ).alias("span_id"),
            F.when(
                F.col("lvl") == 0, F.lit("")
            ).otherwise(
                F.lpad(
                    F.concat(
                        F.conv(F.col("id").cast("string"), 10, 16),
                        F.lit("b"),
                        F.conv((F.col("lvl") - 1).cast("string"), 10, 16),
                    ),
                    16, "0",
                )
            ).alias("parent_id"),
            F.concat(F.lit("op"), F.col("lvl").cast("string")).alias("name"),
            (F.lit(base_ts) + F.col("id") * 1000 + F.col("lvl")).alias(
                "timestamp_ns"
            ),
            F.lit(1000).cast("long").alias("duration_ns"),
            F.lit("svc").alias("service_name"),
            F.lit("probe").alias("payload_type"),
            F.lit("").alias("payload"),
            F.create_map(F.lit("k"), F.lit("v")).alias("attrs"),
        )
    )
    return df


def main() -> None:
    batches = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    traces = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000

    from gigapipe_spark.session import get_spark
    from gigapipe_spark.storage.writer import Catalog, spans_fanout

    spark = get_spark("ancestorindexprobe")
    root = tempfile.mkdtemp(prefix="ancidxprobe_") + "/store"
    cat = Catalog(root)

    # warm-up batch (JIT, codegen, writer init) — not recorded
    spans_fanout(_span_batch(spark, 99, 200), cat)

    rows = []
    for b in range(batches):
        t0 = time.monotonic()
        spans_fanout(_span_batch(spark, b, traces), cat)
        sec = round(time.monotonic() - t0, 2)
        table_rows = spark.read.parquet(
            os.path.join(root, "tempo_traces")
        ).count()
        idx_rows = spark.read.parquet(
            os.path.join(root, "tempo_traces_anc")
        ).count()
        row = {
            "batch": b,
            "sec": sec,
            "table_spans": table_rows,
            "index_pairs": idx_rows,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    half = len(rows) // 2 or 1
    first = sum(r["sec"] for r in rows[:half]) / half
    second = sum(r["sec"] for r in rows[half:]) / max(len(rows) - half, 1)
    print(
        json.dumps(
            {
                "verdict": "flat" if second <= 1.3 * first else "rising",
                "first_half_mean_sec": round(first, 2),
                "second_half_mean_sec": round(second, 2),
                "final_table_spans": rows[-1]["table_spans"],
                "final_index_pairs": rows[-1]["index_pairs"],
            }
        ),
        flush=True,
    )
    shutil.rmtree(os.path.dirname(root), ignore_errors=True)


if __name__ == "__main__":
    main()
