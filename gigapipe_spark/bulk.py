"""Bulk ingest buffer — the reference writer's batching core.

The reference writer NEVER runs one insert per HTTP push: every push
route appends its decoded rows to an in-memory buffer and a timer
service flushes the buffer to ClickHouse every BULK_MAX_AGE_MS (default
100) or when it reaches BULK_MAX_SIZE_BYTES (writer/service — the
TimerService/bulk pattern behind writer/router/insert.go; env surface
docs/configuration.md "Write Settings"). That batching is what makes a
thousand tiny agent pushes cost one insert instead of a thousand.

Spark-native twin, shifted one step earlier: buffering RAW payloads
per (route kind, params) and flushing each group as ONE decode + ONE
MV fan-out. The decode is a Spark job and the fan-out is a set of
appends+journal — per-push both dominate wall clock, so coalescing N
pushes into one of each is the same ~N× win the reference gets
(receipt in docs/SCALE.md).

Ack semantics are the reference's: the route acks after ENQUEUE, and a
process crash between ack and flush loses that window (the reference
acks after appending to the in-memory bulk too). The store itself
stays consistent — each flush is one journaled batch — so the exposure
is bounded by max_age_ms of acked-but-unflushed pushes, exactly like
the reference's insert window. Deployments that need a synchronous ack
leave bulk off (the default): every push then runs its own fan-out
before the response, a STRONGER contract than the reference's.

Per-kind params that change decode semantics (elastic target, cf
ddsource) key the buffer, so only identical-parameter payloads merge.
"""

from __future__ import annotations

import logging
import threading
import time

log = logging.getLogger(__name__)

# route kind → (payload column type, decoder factory, fanout name)
# decoder factory: (spark, payload_df, params) -> decoded batch DF
_STRING = "string"
_BINARY = "binary"


def _dec_loki_json(spark, df, p):
    from gigapipe_spark.sources import ingest

    return ingest.loki_push(df)


def _dec_loki_pb(spark, df, p):
    from gigapipe_spark.sources.protowire import loki_push_pb

    return loki_push_pb(df)


def _dec_remote_write(spark, df, p):
    from gigapipe_spark.sources.protowire import remote_write

    return remote_write(df)


def _dec_otlp_logs_json(spark, df, p):
    from gigapipe_spark.sources import ingest

    return ingest.otlp_logs(df)


def _dec_otlp_logs_pb(spark, df, p):
    from gigapipe_spark.sources.protowire import otlp_logs_pb

    return otlp_logs_pb(df)


def _dec_datadog_logs(spark, df, p):
    from gigapipe_spark.sources import ingest

    return ingest.datadog_logs(df)


def _dec_datadog_metrics(spark, df, p):
    from gigapipe_spark.sources import ingest

    # receive-time stamp at FLUSH time (within max_age_ms of the
    # request) — a per-request now_ns would key every push into its own
    # group and defeat the batching entirely
    now_ns = int(p["now_ns"]) if "now_ns" in p else time.time_ns()
    return ingest.datadog_metrics(df, now_ns=now_ns)


def _dec_influx(spark, df, p):
    from gigapipe_spark.sources import ingest

    return ingest.influx_line(df)


def _dec_elastic_bulk(spark, df, p):
    from gigapipe_spark.sources import ingest

    return ingest.elastic_bulk(df, target=p.get("target", "unknown"))


def _dec_zipkin_json(spark, df, p):
    from gigapipe_spark.sources import ingest

    return ingest.zipkin_spans(df)


def _dec_zipkin_ndjson(spark, df, p):
    from gigapipe_spark.sources import ingest

    return ingest.zipkin_ndjson(df)


def _dec_otlp_traces_json(spark, df, p):
    from gigapipe_spark.sources import ingest

    return ingest.otlp_traces(df)


def _dec_otlp_traces_pb(spark, df, p):
    from gigapipe_spark.sources.protowire import otlp_traces_pb

    return otlp_traces_pb(df)


KINDS: dict[str, tuple[str, object, str]] = {
    "loki_json": (_STRING, _dec_loki_json, "ingest"),
    "loki_pb": (_BINARY, _dec_loki_pb, "ingest"),
    "remote_write": (_BINARY, _dec_remote_write, "ingest"),
    "otlp_logs_json": (_STRING, _dec_otlp_logs_json, "ingest"),
    "otlp_logs_pb": (_BINARY, _dec_otlp_logs_pb, "ingest"),
    "datadog_logs": (_STRING, _dec_datadog_logs, "ingest"),
    "datadog_metrics": (_STRING, _dec_datadog_metrics, "ingest"),
    "influx": (_STRING, _dec_influx, "ingest"),
    "elastic_bulk": (_STRING, _dec_elastic_bulk, "ingest"),
    "zipkin_json": (_STRING, _dec_zipkin_json, "spans"),
    "zipkin_ndjson": (_STRING, _dec_zipkin_ndjson, "spans"),
    "otlp_traces_json": (_STRING, _dec_otlp_traces_json, "spans"),
    "otlp_traces_pb": (_BINARY, _dec_otlp_traces_pb, "spans"),
}


class BulkWriter:
    """In-memory push buffer + flusher thread over one StoreEngine."""

    def __init__(
        self,
        engine,
        max_age_ms: float = 100.0,
        max_size_bytes: int = 16 * 1024 * 1024,
    ):
        self.engine = engine
        # floor at 10ms: age 0 ("flush asap") must not busy-spin the
        # flusher thread between flushes
        self.max_age_s = max(max_age_ms, 10.0) / 1000.0
        self.max_size = max_size_bytes
        self._buf: dict[tuple, list[bytes]] = {}
        self._size = 0
        self._lock = threading.Lock()
        self._wake = threading.Event()
        self._stop = threading.Event()
        self.flushes = 0  # flush cycles that wrote at least one group
        self.errors = 0
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------ api
    def submit(self, kind: str, payload: bytes, **params) -> None:
        """Enqueue one push. Params that alter decode semantics become
        part of the buffer key (only identical groups merge)."""
        key = (kind, tuple(sorted(params.items())))
        with self._lock:
            self._buf.setdefault(key, []).append(payload)
            self._size += len(payload)
            if self._size >= self.max_size:
                self._wake.set()  # size-triggered early flush

    def stop(self) -> None:
        """Drain and stop (gateway shutdown): pending acked pushes are
        flushed before the thread exits."""
        self._stop.set()
        self._wake.set()
        self._thread.join(timeout=60)

    # ------------------------------------------------------- internals
    def _loop(self) -> None:
        while True:
            self._wake.wait(self.max_age_s)
            self._wake.clear()
            self.flush_now()
            if self._stop.is_set():
                self.flush_now()  # anything enqueued during the flush
                return

    def flush_now(self) -> None:
        with self._lock:
            batch, self._buf = self._buf, {}
            self._size = 0
        if not batch:
            return
        wrote = False
        for (kind, params_t), payloads in batch.items():
            try:
                self._flush_group(kind, dict(params_t), payloads)
                wrote = True
            except Exception:
                # one bad group must not poison the others; decoders
                # already drop bad ROWS — this catches whole-group
                # failures (schema bugs, store errors)
                self.errors += 1
                log.exception(
                    "bulk flush failed for %s (%d payloads dropped)",
                    kind, len(payloads),
                )
        if wrote:
            self.flushes += 1
            # same freshness hook the synchronous push path triggers
            # (httpd._invalidate_contexts): refresh() on store engines,
            # else drop the memoized contexts directly
            if hasattr(self.engine, "refresh"):
                self.engine.refresh()
            else:
                for attr in ("_logctx", "_promctx", "_tracectx"):
                    if hasattr(self.engine, attr):
                        setattr(self.engine, attr, None)

    def _flush_group(self, kind: str, params: dict, payloads: list[bytes]) -> None:
        from gigapipe_spark.storage.writer import ingest_fanout, spans_fanout

        col_type, decoder, fanout = KINDS[kind]
        spark = self.engine.spark
        if col_type == _BINARY:
            df = spark.createDataFrame(
                [(bytearray(p),) for p in payloads], "payload binary"
            )
        else:
            df = spark.createDataFrame(
                [(p.decode("utf-8", "replace"),) for p in payloads],
                "payload string",
            )
        decoded = decoder(spark, df, params)
        # per-group X-Ttl-Days (the header keys the group, so every
        # payload here shares this TTL)
        ttl = int(params.get("ttl_days", 0))
        if fanout == "spans":
            if ttl > 0 and "ttl_days" in decoded.columns:
                from pyspark.sql import functions as F

                decoded = decoded.withColumn(
                    "ttl_days",
                    F.lit(ttl).cast(dict(decoded.dtypes)["ttl_days"]),
                )
            spans_fanout(decoded, self.engine.catalog)
        else:
            ingest_fanout(decoded, self.engine.catalog, ttl_days=ttl)
