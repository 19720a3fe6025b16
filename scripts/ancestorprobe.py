"""Deep-hierarchy ancestor-closure probe (VERDICT r8 task 6).

The testdata span hierarchy is shallow (order → item, depth 2), so the
depth-cap machinery (sources/views.py ancestors_from_spans: configurable
``spark.gigapipe.traceql.maxAncestorDepth``, counted truncation) never
fires on the stock corpus. This probe builds synthetic parent CHAINS
deeper than the default cap (depth 16 > cap 8) at 1× and Fx trace
counts and records, per (scale, max_depth):

  sec        — closure build + count wall time
  rows       — closure pairs produced
  truncated  — ancestor_closure_truncated_spans counter delta
               (spans whose parent chains were cut by the cap)

so SCALE.md can state the measured cost of RAISING the cap vs the
measured truncation of keeping it.

Usage: python scripts/ancestorprobe.py [factor] [depth]
Prints one JSON line per (scale, max_depth).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def chain_spans(spark, n_traces: int, depth: int):
    """n_traces independent parent chains: s{t}_0 <- s{t}_1 <- … ."""
    return (
        spark.range(n_traces)
        .select(
            F.col("id").alias("t"),
            F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("i"),
        )
        .select(
            F.concat(F.lit("t"), F.col("t")).alias("trace_id"),
            F.concat(
                F.lit("s"), F.col("t"), F.lit("_"), F.col("i")
            ).alias("span_id"),
            F.when(F.col("i") == 0, F.lit("")).otherwise(
                F.concat(
                    F.lit("s"), F.col("t"), F.lit("_"), F.col("i") - 1
                )
            ).alias("parent_id"),
        )
    )


def _truncation_counter(max_depth: int) -> float:
    from gigapipe_spark.telemetry import TELEMETRY

    key = (
        "ancestor_closure_truncated_spans",
        (("max_depth", str(max_depth)),),
    )
    return TELEMETRY._counters.get(key, 0.0)


def probe(spark, n_traces: int, depth: int, max_depth: int) -> dict:
    from gigapipe_spark.sources.views import ancestors_from_spans

    sp = chain_spans(spark, n_traces, depth)
    # materialize the input once so the probe times the CLOSURE, not
    # the synthetic generator
    sp = sp.localCheckpoint()
    before = _truncation_counter(max_depth)
    t0 = time.monotonic()
    rows = ancestors_from_spans(sp, max_depth=max_depth).count()
    sec = round(time.monotonic() - t0, 2)
    return {
        "n_traces": n_traces,
        "chain_depth": depth,
        "max_depth": max_depth,
        "sec": sec,
        "rows": rows,
        "truncated_spans": int(_truncation_counter(max_depth) - before),
    }


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    base_traces = 10_000

    from gigapipe_spark.session import get_spark

    spark = get_spark("ancestorprobe")
    # warm JIT/codegen with BOTH plan shapes (capped + full-depth),
    # throwaway — the deep plan compiles ~2× the codegen stages
    probe(spark, 1_000, depth, 8)
    probe(spark, 1_000, depth, depth * 2)
    for n in (base_traces, base_traces * factor):
        for max_depth in (8, depth, depth * 2):
            r = probe(spark, n, depth, max_depth)
            r["factor"] = 1 if n == base_traces else factor
            print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
