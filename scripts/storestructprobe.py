"""Store-path structural TraceQL scale probe (VERDICT r11 task 3).

The session-view structural numbers in SCALE.md measure the fixture
path (frontier-doubling closure build + semi-join); production resolves
descendant/ancestor/sibling against the STORED `tempo_traces_anc`
closure index written by spans_fanout. This probe is the missing
query-side receipt for that claim: write a store at 1x and Fx via the
real fan-out (same batches the ingest path produces, so the anc index
is built incrementally the way production builds it), then time the
structural operators through StoreTraceQLContext at both sizes.

A warm ratio ~<= F/linear-share (flat per-row cost) says the index-scan
plan holds; a super-linear ratio falsifies it.

Usage: python scripts/storestructprobe.py [factor] [base_traces]
Prints one JSON line per (query, size) and a summary verdict.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _span_batch(spark, batch_idx: int, traces: int, depth: int = 4):
    """traces x depth chain spans in the zipkin-decoder output shape,
    with selector-relevant attrs: root spans carry priority (20%
    1-URGENT), leaves carry returnflag (1/3 R) — so the structural
    queries below select real subsets, like the bench fixtures."""
    base_ts = 1_700_000_000_000_000_000 + batch_idx * 1_000_000_000
    hexid = lambda c: F.conv(c.cast("string"), 10, 16)  # noqa: E731
    return (
        spark.range(traces)
        .withColumn("lvl", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))))
        .select(
            F.lpad(
                F.concat(F.lit(format(batch_idx, "x")), F.lit("a"),
                         hexid(F.col("id"))),
                32, "0",
            ).alias("trace_id"),
            F.lpad(
                F.concat(hexid(F.col("id")), F.lit("b"),
                         hexid(F.col("lvl"))),
                16, "0",
            ).alias("span_id"),
            F.when(F.col("lvl") == 0, F.lit("")).otherwise(
                F.lpad(
                    F.concat(hexid(F.col("id")), F.lit("b"),
                             hexid(F.col("lvl") - 1)),
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
            F.map_filter(
                F.create_map(
                    F.lit("priority"),
                    F.when((F.col("lvl") == 0) & (F.col("id") % 5 == 0),
                           F.lit("1-URGENT")),
                    F.lit("returnflag"),
                    F.when((F.col("lvl") == 3) & (F.col("id") % 3 == 0),
                           F.lit("R")),
                ),
                lambda k, v: v.isNotNull(),
            ).alias("attrs"),
        )
    )


QUERIES = [
    ("descendant", '{ priority = "1-URGENT" } &>> { returnflag = "R" }'),
    ("ancestor", '{ returnflag = "R" } <<& { priority = "1-URGENT" }'),
    ("sibling", '{ name = "op1" } ~ { name = "op1" }'),
    ("bitmask_and", '{ priority = "1-URGENT" && name = "op0" }'),
]


def _build_store(spark, root: str, traces_per_batch: int, batches: int = 4):
    from gigapipe_spark.storage.writer import Catalog, spans_fanout

    cat = Catalog(root)
    for b in range(batches):
        spans_fanout(_span_batch(spark, b, traces_per_batch), cat)
    return cat


def _time_queries(spark, cat) -> dict[str, dict]:
    from gigapipe_spark.storage.query import store_traceql_context
    from gigapipe_spark.traceql.compiler import query

    out = {}
    for name, expr in QUERIES:
        ctx = store_traceql_context(spark, cat)
        t0 = time.monotonic()
        n = query(ctx, expr).count()
        cold = time.monotonic() - t0
        t0 = time.monotonic()
        query(store_traceql_context(spark, cat), expr).count()
        warm = time.monotonic() - t0
        out[name] = {"cold": round(cold, 2), "warm": round(warm, 2),
                     "rows": n}
    return out


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    base_traces = int(sys.argv[2]) if len(sys.argv) > 2 else 2_500

    from gigapipe_spark.session import get_spark

    spark = get_spark("storestructprobe")
    tmp = tempfile.mkdtemp(prefix="storestruct_")

    t0 = time.monotonic()
    cat1 = _build_store(spark, tmp + "/store1x", base_traces)
    build1 = round(time.monotonic() - t0, 1)
    t0 = time.monotonic()
    catf = _build_store(spark, tmp + "/storeFx", base_traces * factor)
    buildf = round(time.monotonic() - t0, 1)
    n1 = spark.read.parquet(cat1.path("tempo_traces")).count()
    nf = spark.read.parquet(catf.path("tempo_traces")).count()
    print(json.dumps({"build_1x_sec": build1, "build_fx_sec": buildf,
                      "spans_1x": n1, "spans_fx": nf}), flush=True)

    r1 = _time_queries(spark, cat1)
    rf = _time_queries(spark, catf)
    summary = {}
    for name, _ in QUERIES:
        ratio = round(rf[name]["warm"] / max(r1[name]["warm"], 1e-3), 1)
        row = {"query": name, "sec_1x": r1[name], f"sec_{factor}x": rf[name],
               "warm_ratio": ratio}
        summary[name] = ratio
        print(json.dumps(row), flush=True)
    worst = max(summary.values())
    print(json.dumps({
        "factor": factor,
        "warm_ratios": summary,
        "verdict": "scales" if worst <= factor / 2 else "check",
    }), flush=True)


if __name__ == "__main__":
    main()
