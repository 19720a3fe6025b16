"""Canonical table schemas for the engine.

Mirrors the reference's ClickHouse DDL (ref: ctrl/qryn/sql/log.sql,
traces.sql, profiles.sql) mapped to Spark types per SURVEY §1.2:

  - timestamps are Int64 **nanoseconds** (LongType) end-to-end; Spark's
    TimestampType is µs so we never convert except at window boundaries;
  - labels are MapType(String,String) instead of a JSON string column —
    the GIN inverted index becomes a derived exploded table;
  - Array(Tuple(...)) becomes ArrayType(StructType).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ref: ctrl/qryn/sql/log.sql:25-32 (samples_v3) — unified log/metric fact
# table; `type` discriminates (0=both, 1=logs, 2=metrics), per
# reader/logql/logql_transpiler/shared/types.go:12-14.
SAMPLES = T.StructType(
    [
        T.StructField("oid", T.StringType(), False),  # org id, default '0'
        T.StructField("fingerprint", T.LongType(), False),
        T.StructField("timestamp_ns", T.LongType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("string", T.StringType(), True),
        T.StructField("type", T.ByteType(), False),
    ]
)

# ref: ctrl/qryn/sql/log.sql:16-23 (time_series) — series dimension.
TIME_SERIES = T.StructType(
    [
        T.StructField("oid", T.StringType(), False),
        T.StructField("date", T.DateType(), False),
        T.StructField("fingerprint", T.LongType(), False),
        T.StructField("labels", T.MapType(T.StringType(), T.StringType()), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("type", T.ByteType(), False),
    ]
)

# ref: ctrl/qryn/sql/log.sql:62-80 (time_series_gin) — label inverted index.
TIME_SERIES_GIN = T.StructType(
    [
        T.StructField("oid", T.StringType(), False),
        T.StructField("date", T.DateType(), False),
        T.StructField("key", T.StringType(), False),
        T.StructField("val", T.StringType(), False),
        T.StructField("fingerprint", T.LongType(), False),
        T.StructField("type", T.ByteType(), False),
    ]
)

# ref: ctrl/qryn/sql/log.sql:83-107 (metrics_15s) — 15-second rollup with
# re-aggregable partials (AggregateFunction states become plain columns).
METRICS_15S = T.StructType(
    [
        T.StructField("oid", T.StringType(), False),
        T.StructField("fingerprint", T.LongType(), False),
        T.StructField("timestamp_ns", T.LongType(), False),
        T.StructField("last", T.DoubleType(), True),
        T.StructField("max", T.DoubleType(), True),
        T.StructField("min", T.DoubleType(), True),
        T.StructField("count", T.LongType(), True),
        T.StructField("sum", T.DoubleType(), True),
        T.StructField("bytes", T.DoubleType(), True),
        T.StructField("type", T.ByteType(), False),
    ]
)

# ref: ctrl/qryn/sql/traces.sql:7-18 (tempo_traces) — span fact table.
# trace_id/span_id kept as hex strings (FixedString → String per §1.2).
SPANS = T.StructType(
    [
        T.StructField("oid", T.StringType(), False),
        T.StructField("trace_id", T.StringType(), False),
        T.StructField("span_id", T.StringType(), False),
        T.StructField("parent_id", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("timestamp_ns", T.LongType(), False),
        T.StructField("duration_ns", T.LongType(), False),
        T.StructField("service_name", T.StringType(), True),
        T.StructField("payload_type", T.ByteType(), True),
        T.StructField("payload", T.StringType(), True),
    ]
)

# ref: ctrl/qryn/sql/traces.sql:21-31 (tempo_traces_attrs_gin).
SPAN_ATTRS = T.StructType(
    [
        T.StructField("date", T.DateType(), False),
        T.StructField("key", T.StringType(), False),
        T.StructField("val", T.StringType(), False),
        T.StructField("trace_id", T.StringType(), False),
        T.StructField("span_id", T.StringType(), False),
        T.StructField("timestamp_ns", T.LongType(), False),
        T.StructField("duration", T.LongType(), False),
    ]
)

# ref: ctrl/qryn/sql/profiles.sql:19-31 — profile fact with call trees.
PROFILE_TREE_NODE = T.StructType(
    [
        T.StructField("parent", T.LongType(), False),
        T.StructField("id", T.LongType(), False),
        T.StructField("fn_id", T.LongType(), False),
        T.StructField(
            "values",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType(), False),
                        T.StructField("self", T.LongType(), False),
                        T.StructField("total", T.LongType(), False),
                    ]
                )
            ),
            False,
        ),
    ]
)

PROFILES = T.StructType(
    [
        T.StructField("timestamp_ns", T.LongType(), False),
        T.StructField("fingerprint", T.LongType(), False),
        T.StructField("type_id", T.StringType(), False),
        T.StructField("service_name", T.StringType(), True),
        T.StructField("duration_ns", T.LongType(), True),
        T.StructField("tree", T.ArrayType(PROFILE_TREE_NODE), True),
        T.StructField(
            "functions",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.LongType(), False),
                        T.StructField("name", T.StringType(), False),
                    ]
                )
            ),
            True,
        ),
    ]
)

# ref: ctrl/qryn/sql/log.sql:174-187 (patterns) — Drain-style clusters.
PATTERNS = T.StructType(
    [
        T.StructField("timestamp_10m", T.LongType(), False),
        T.StructField("fingerprint", T.LongType(), False),
        T.StructField("tokens", T.ArrayType(T.StringType()), False),
        T.StructField("classes", T.ArrayType(T.IntegerType()), False),
        T.StructField("overall_cost", T.IntegerType(), False),
        T.StructField("generalized_cost", T.IntegerType(), False),
        T.StructField("samples_count", T.LongType(), False),
        T.StructField("pattern_id", T.LongType(), False),
    ]
)

SAMPLES_TYPE_BOTH = 0
SAMPLES_TYPE_LOGS = 1
SAMPLES_TYPE_METRICS = 2
