"""Ingest-writer throughput probe: decode + MV fan-out at 1× vs Fx.

The reference's writer half is a batching insert service per table
(writer/service/*.go); the Spark analog is ``loki_push`` decode →
``ingest_fanout`` (samples + time_series + gin + patterns side-channel).
The batch probes in SCALE.md cover query operators; this one measures
the WRITE path: wall time and lines/s for a synthetic Loki push batch
at 1× and Fx line counts (distinct streams scale with the factor too,
so the series/GIN dimension writes grow, not just the fact append).

Usage: python scripts/ingestprobe.py [factor] [base_lines]
Prints one JSON line per (scale, patterns_on).
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


def synth_push(spark, n_streams: int, lines_per_stream: int):
    """n_streams Loki push payloads of lines_per_stream lines each —
    generated distributed (one payload row per stream), realistic label
    churn (app × instance) and log-line shapes the pattern miner can
    chew on."""
    t0 = 1_700_000_000_000_000_000
    line = (
        'login user u{} from 10.0.{}.{} took {}ms'
    )
    return spark.range(n_streams).select(
        F.concat(
            F.lit('{"streams":[{"stream":{"app":"svc'),
            (F.col("id") % 17).cast("string"),
            F.lit('","instance":"i'),
            F.col("id").cast("string"),
            F.lit('"},"values":['),
            F.concat_ws(
                ",",
                F.transform(
                    F.sequence(F.lit(0), F.lit(lines_per_stream - 1)),
                    lambda i: F.concat(
                        F.lit('["'),
                        (F.lit(t0) + (F.col("id") * lines_per_stream + i) * 1_000_000).cast("string"),
                        F.lit('","'),
                        F.format_string(
                            line.replace("{}", "%s"),
                            (F.col("id") % 100).cast("string"),
                            (i % 256).cast("string"),
                            ((F.col("id") + i) % 256).cast("string"),
                            ((i * 7) % 900 + 10).cast("string"),
                        ),
                        F.lit('"]'),
                    ),
                ),
            ),
            F.lit("]}]}"),
        ).alias("payload")
    )


def probe(spark, n_streams: int, lines_per_stream: int, mine: bool) -> dict:
    from gigapipe_spark.sources.ingest import loki_push
    from gigapipe_spark.storage.writer import Catalog, ingest_fanout

    root = tempfile.mkdtemp(prefix="ingestprobe_")
    payloads = synth_push(spark, n_streams, lines_per_stream).localCheckpoint()
    total = n_streams * lines_per_stream
    t0 = time.monotonic()
    ingest_fanout(loki_push(payloads), Catalog(root), mine_patterns=mine)
    sec = round(time.monotonic() - t0, 2)
    # verify the write landed (and time only the fan-out above)
    n = spark.read.parquet(os.path.join(root, "samples")).count()
    shutil.rmtree(root, ignore_errors=True)
    return {
        "streams": n_streams,
        "lines": total,
        "written": n,
        "patterns": mine,
        "sec": sec,
        "lines_per_sec": int(total / sec) if sec else None,
    }


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    base_lines = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    lines_per_stream = 100
    base_streams = base_lines // lines_per_stream

    from gigapipe_spark.session import get_spark

    spark = get_spark("ingestprobe")
    # warm JIT + both miner strategies (throwaway): the shape-gated
    # multi branch (patterns/cluster.JVM_FOLD_CAP) runs the JVM fold on
    # small corpora and mapInPandas past the cap — a cold Python worker
    # pool would otherwise bill ~3s of spin-up to the first big run
    probe(spark, 10, lines_per_stream, True)
    from gigapipe_spark.patterns.cluster import JVM_FOLD_CAP

    probe(
        spark,
        JVM_FOLD_CAP // lines_per_stream + 10,
        lines_per_stream,
        True,
    )
    for mine in (True, False):
        r1 = probe(spark, base_streams, lines_per_stream, mine)
        rf = probe(spark, base_streams * factor, lines_per_stream, mine)
        print(
            json.dumps(
                {
                    "query": "ingest_fanout"
                    + ("" if mine else "_nopatterns"),
                    "factor": factor,
                    "sec_1x": r1["sec"],
                    "sec_Fx": rf["sec"],
                    "ratio": round(rf["sec"] / max(r1["sec"], 1e-9), 1),
                    "lines_1x": r1["lines"],
                    "lines_Fx": rf["lines"],
                    "lps_1x": r1["lines_per_sec"],
                    "lps_Fx": rf["lines_per_sec"],
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
