"""gigapipe_spark — a PySpark-native observability analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
metrico/gigapipe (qryn): LogQL / PromQL / TraceQL query languages over a
unified columnar log/metric/trace store, re-expressed Spark-first.

Reference architecture (studied, not copied): gigapipe parses each query
language to an AST, plans it into a chain of composable planner objects,
and compiles to one SQL string pushed to ClickHouse; post-processing runs
as Go streaming operators. Here the store is Parquet/Delta, the planner
chain compiles straight to DataFrame transformations, and Catalyst +
Tungsten pick the physical strategy.

Modules:
  model/      schemas + fingerprinting (ref: writer/utils/fingerprint.go)
  sources/    table readers + the derived-view layer (the "MV" layer)
  logql/      LogQL lexer/parser/compiler (ref: reader/logql/)
  promql/     PromQL planner (ref: reader/promql/)
  traceql/    TraceQL planner (ref: reader/traceql/)
  functions/  time-series primitives (bucketing, counters, gap fill)
  streaming/  Structured Streaming rollups (ref: ClickHouse MVs)
  datapipe/   LLM-data-pipeline operators (dedup, similarity, text)
"""

__version__ = "0.1.0"
