"""Regenerate gigapipe_spark/storage/table_schemas.json — the canonical
table-schema registry (the parquet-lake analog of the reference's DDL,
ctrl/qryn/sql/*.sql): run every fan-out writer against a throwaway
store and record each table's inferred schema, partition columns
included. Run after changing any fan-out's output columns; the drift
test (tests/test_table_schemas.py) fails until this is re-run."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = 1_700_000_000_000_000_000

_PROFILE_SCHEMA = (
    "timestamp_ns long, type string, service_name string,"
    " sample_types_units array<struct<name: string, unit: string>>,"
    " period_type string, period_unit string, tags map<string,string>,"
    " duration_ns long, payload_type string, payload string,"
    " values_agg array<struct<fn: string, total: long, self: int>>"
)


def populate_min_store(spark, cat) -> None:
    """One minimal batch through every fan-out writer (logs with a
    metric value → samples/time_series/gin/metrics_15s/patterns; a
    parented trace → all five tempo tables incl. the ancestor index;
    a profile + a folded stack → the profiles layer)."""
    from gigapipe_spark.sources import ingest
    from gigapipe_spark.storage.writer import (
        folded_fanout,
        ingest_fanout,
        profiles_fanout,
        spans_fanout,
    )

    loki = json.dumps(
        {"streams": [{"stream": {"app": "a"},
                      "values": [[str(T0), "line", 1.5], [str(T0 + 1), "plain"]]}]}
    )
    ingest_fanout(
        ingest.loki_push(spark.createDataFrame([(loki,)], "payload string")), cat
    )
    zipk = json.dumps(
        [
            {"id": "b1", "traceId": "a1", "name": "s",
             "timestamp": T0 // 1000, "duration": 5,
             "localEndpoint": {"serviceName": "w"}, "tags": {"k": "v"}},
            {"id": "b2", "traceId": "a1", "parentId": "b1", "name": "c",
             "timestamp": T0 // 1000 + 1, "duration": 3,
             "localEndpoint": {"serviceName": "w"}},
        ]
    )
    spans_fanout(
        ingest.zipkin_spans(spark.createDataFrame([(zipk,)], "payload string")),
        cat,
    )
    prows = [
        (T0, "memory", "api", [("alloc_space", "bytes")], "space", "bytes",
         {"env": "prod"}, 10_000_000_000, "0", "payload-a", [("main", 100, 40)])
    ]
    profiles_fanout(spark.createDataFrame(prows, _PROFILE_SCHEMA), cat)
    frows = [(T0, "web", "memory:space:bytes", "p3", "main;alloc 7")]
    folded_fanout(
        spark.createDataFrame(
            frows,
            "timestamp_ns long, service_name string, type_id string,"
            " profile_id string, line string",
        ),
        cat,
    )


def collect_schemas(spark, root: str) -> dict:
    out = {}
    for t in sorted(os.listdir(root)):
        p = os.path.join(root, t)
        if not os.path.isdir(p) or t.startswith("_") or t.startswith("."):
            continue
        out[t] = spark.read.parquet(p).schema.jsonValue()
    return out


def main() -> None:
    import tempfile

    from gigapipe_spark.session import get_spark
    from gigapipe_spark.storage.writer import Catalog

    spark = get_spark("schemagen", cpus=4)
    root = tempfile.mkdtemp() + "/store"
    populate_min_store(spark, Catalog(root))
    out = collect_schemas(spark, root)
    dest = os.path.join(
        os.path.dirname(__file__), "..", "gigapipe_spark", "storage",
        "table_schemas.json",
    )
    with open(dest, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print("TABLES:", sorted(out))


if __name__ == "__main__":
    main()
