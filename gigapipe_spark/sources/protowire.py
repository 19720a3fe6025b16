"""Binary wire-format ingestion: protobuf + snappy without native deps.

The reference's writer accepts snappy-compressed protobuf for Prometheus
remote-write (ref: writer/utils/unmarshal/metrics_protobuf.go:16), OTLP
protobuf for traces/logs (ref: otlp.go:76, otlplogs.go), and gzipped pprof
for Pyroscope ingest (ref: go_pprof.go:82). This container has neither
`python-snappy` nor `protobuf`, so this module implements the two wire
formats directly:

  * a raw-snappy block-format decompressor (the remote-write framing),
  * a minimal protobuf wire reader (varint / fixed / length-delimited)
    plus per-message decoders for exactly the fields the engine stores.

Decoding runs distributed via `mapInPandas` over a binary payload column —
one Arrow batch of HTTP bodies in, normalized rows out — so the decode
cost parallelizes across executors exactly like the reference's per-request
Go decoders. Fingerprints are NOT computed here: callers attach
`fingerprint_col(labels)` afterwards so the hash stays JVM-side and
identical to every other ingest path.
"""

from __future__ import annotations

import gzip
import json
import re
import struct
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gigapipe_spark.model.fingerprint import fingerprint_col
from gigapipe_spark.telemetry import TELEMETRY
from gigapipe_spark.sources.ingest import sanitize_labels

# ---------------------------------------------------------------------------
# snappy block format (https://github.com/google/snappy/blob/main/format_description.txt)
# ---------------------------------------------------------------------------


def snappy_uncompress(data: bytes) -> bytes:
    """Decompress raw-snappy block format (the remote-write framing)."""
    n, i = _uvarint(data, 0)
    out = bytearray()
    ln = len(data)
    while i < ln:
        tag = data[i]
        i += 1
        kind = tag & 3
        if kind == 0:  # literal
            size = tag >> 2
            if size >= 60:
                nbytes = size - 59
                size = int.from_bytes(data[i : i + nbytes], "little")
                i += nbytes
            size += 1
            out += data[i : i + size]
            i += size
            continue
        if kind == 1:  # copy, 1-byte offset
            size = ((tag >> 2) & 7) + 4
            offset = ((tag >> 5) << 8) | data[i]
            i += 1
        elif kind == 2:  # copy, 2-byte offset
            size = (tag >> 2) + 1
            offset = int.from_bytes(data[i : i + 2], "little")
            i += 2
        else:  # copy, 4-byte offset
            size = (tag >> 2) + 1
            offset = int.from_bytes(data[i : i + 4], "little")
            i += 4
        if offset == 0 or offset > len(out):
            raise ValueError("snappy: corrupt copy offset")
        # copies may overlap forward (RLE-style): re-slice per round so the
        # bytes just appended become part of the source window
        while size > 0:
            chunk = out[-offset:]
            take = min(size, len(chunk))
            out += chunk[:take]
            size -= take
    if len(out) != n:
        raise ValueError(f"snappy: length mismatch {len(out)} != {n}")
    return bytes(out)


def snappy_compress(data: bytes) -> bytes:
    """All-literal snappy encoding (valid, uncompressed-size output).

    Exists so tests and fixtures can produce payloads the decompressor —
    and any spec-compliant snappy — accepts; the engine only ever
    *decompresses* on ingest.
    """
    out = bytearray(_uvarint_encode(len(data)))
    i = 0
    while i < len(data):
        chunk = data[i : i + 65536]
        size = len(chunk) - 1
        if size < 60:
            out.append(size << 2)
        elif size < 1 << 8:
            out.append(60 << 2)
            out.append(size)
        elif size < 1 << 16:
            out.append(61 << 2)
            out += size.to_bytes(2, "little")
        else:
            out.append(62 << 2)
            out += size.to_bytes(3, "little")
        out += chunk
        i += len(chunk)
    return bytes(out)


def _uvarint(buf: bytes, i: int) -> tuple[int, int]:
    shift = result = 0
    while True:
        b = buf[i]
        i += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, i
        shift += 7


def _uvarint_encode(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


# ---------------------------------------------------------------------------
# protobuf wire reader
# ---------------------------------------------------------------------------


def pb_fields(buf: bytes) -> Iterator[tuple[int, int, object]]:
    """Yield (field_no, wire_type, value); value is int (varint), bytes
    (len-delimited) or raw 4/8-byte little-endian bytes (fixed)."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _uvarint(buf, i)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _uvarint(buf, i)
        elif wt == 1:
            v = buf[i : i + 8]
            i += 8
        elif wt == 2:
            ln, i = _uvarint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wt == 5:
            v = buf[i : i + 4]
            i += 4
        else:
            raise ValueError(f"protobuf: unsupported wire type {wt}")
        yield fno, wt, v


def _i64(v: int) -> int:
    """Two's-complement int64 view of a varint."""
    return v - (1 << 64) if v >= (1 << 63) else v


def _packed_uvarints(v: object) -> list[int]:
    """A repeated varint field arrives packed (bytes) or singly (int)."""
    if isinstance(v, int):
        return [v]
    out, i = [], 0
    while i < len(v):  # type: ignore[arg-type]
        x, i = _uvarint(v, i)  # type: ignore[arg-type]
        out.append(x)
    return out


def pb_encode(fields_: Iterable[tuple[int, int, object]]) -> bytes:
    """Tiny encoder (tests/fixtures): same triple shape pb_fields yields."""
    out = bytearray()
    for fno, wt, v in fields_:
        out += _uvarint_encode((fno << 3) | wt)
        if wt == 0:
            out += _uvarint_encode(v & 0xFFFFFFFFFFFFFFFF)  # type: ignore[operator]
        elif wt in (1, 5):
            out += v  # type: ignore[operator]
        else:
            out += _uvarint_encode(len(v))  # type: ignore[arg-type]
            out += v  # type: ignore[operator]
    return bytes(out)


# ---------------------------------------------------------------------------
# Prometheus remote-write (prompb.WriteRequest)
# ---------------------------------------------------------------------------


def decode_write_request(data: bytes) -> Iterator[tuple[dict, int, float]]:
    """WriteRequest{timeseries=1: {labels=1: {name=1,value=2},
    samples=2: {value=1 fixed64, timestamp=2 ms}}} → (labels, ts_ns, value)
    (ref: writer/utils/unmarshal/metrics_protobuf.go:16)."""
    for fno, _, ts_msg in pb_fields(data):
        if fno != 1:
            continue
        labels: dict[str, str] = {}
        samples: list[tuple[int, float]] = []
        for f2, _, v2 in pb_fields(ts_msg):  # type: ignore[arg-type]
            if f2 == 1:  # Label
                name = value = ""
                for f3, _, v3 in pb_fields(v2):  # type: ignore[arg-type]
                    if f3 == 1:
                        name = v3.decode()  # type: ignore[union-attr]
                    elif f3 == 2:
                        value = v3.decode()  # type: ignore[union-attr]
                labels[name] = value
            elif f2 == 2:  # Sample
                val, ts_ms = 0.0, 0
                for f3, _, v3 in pb_fields(v2):  # type: ignore[arg-type]
                    if f3 == 1:
                        val = struct.unpack("<d", v3)[0]  # type: ignore[arg-type]
                    elif f3 == 2:
                        ts_ms = _i64(v3)  # type: ignore[arg-type]
                samples.append((ts_ms, val))
        for ts_ms, val in samples:
            ts_ns = ts_ms * 1_000_000
            # a hostile/garbage timestamp past int64-ns must not poison
            # the whole Arrow batch at serialization time (numpy infers
            # uint64 from large varints; the safe cast to the schema's
            # int64 then fails for EVERY row in the batch) — drop the
            # sample like any other malformed field
            if not -(2**63) <= ts_ns < 2**63:
                continue
            yield labels, ts_ns, val


_SAMPLES_OUT = (
    "labels map<string,string>, timestamp_ns long, value double,"
    " string string, type tinyint"
)

# Per-body decode failure modes on malformed/truncated input: bad varints
# and framing raise ValueError/IndexError, short fixed-width reads raise
# struct.error, bad gzip raises (gzip.BadGzipFile is an OSError subclass).
_DECODE_ERRORS = (ValueError, IndexError, KeyError, struct.error, OSError)


def remote_write(raw: DataFrame, payload_col: str = "payload",
                 compressed: bool = True) -> DataFrame:
    """Snappy+protobuf remote-write bodies → metric samples rows.

    Distributed decode: each Arrow batch of bodies is decoded in one
    Python task; fingerprints attach JVM-side afterwards.
    """

    acc = TELEMETRY.decode_error_acc(raw.sparkSession)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for body in pdf[payload_col]:
                # One malformed HTTP body must not fail the whole Spark
                # task — the reference rejects only the offending request.
                try:
                    buf = snappy_uncompress(bytes(body)) if compressed else bytes(body)
                    for labels, ts_ns, val in decode_write_request(buf):
                        rows.append((labels, ts_ns, val, "", 2))
                except _DECODE_ERRORS:
                    acc.add(1)
                    continue
            yield pd.DataFrame(
                rows, columns=["labels", "timestamp_ns", "value", "string", "type"]
            )

    decoded = raw.mapInPandas(decode, schema=_SAMPLES_OUT)
    san = sanitize_labels(F.col("labels"))
    return decoded.select(
        fingerprint_col(san).alias("fingerprint"),
        san.alias("labels"),
        "timestamp_ns", "value", "string", "type",
    )


# ---------------------------------------------------------------------------
# Loki push protobuf (logproto.PushRequest)
# ---------------------------------------------------------------------------

_LOKI_LABEL_RE = re.compile(r'([A-Za-z_][A-Za-z0-9_]*)\s*=\s*"((?:[^"\\]|\\.)*)"')
_UNESCAPES = {"\\\\": "\\", '\\"': '"', "\\n": "\n", "\\t": "\t", "\\r": "\r"}


def parse_loki_labels(s: str) -> dict[str, str]:
    """Loki label-string `{a="b", c="d"}` → dict
    (ref: parseLabelsLokiFormat, unmarshal.go:313-351)."""
    s = s.strip()
    if not (s.startswith("{") and s.endswith("}")):
        raise ValueError(f"loki labels: unknown input: {s!r}")
    out: dict[str, str] = {}
    for m in _LOKI_LABEL_RE.finditer(s):
        val = m.group(2)
        for esc, ch in _UNESCAPES.items():
            val = val.replace(esc, ch)
        out[m.group(1)] = val
    return out


def decode_loki_push(data: bytes) -> Iterator[tuple[dict, int, str]]:
    """logproto.PushRequest{streams=1: {labels=1 string (Loki format),
    entries=2: {timestamp=1 {seconds=1,nanos=2}, line=2}}} →
    (labels, ts_ns, line) (ref: logs_protobuf.go:14-39)."""
    for fno, _, stream in pb_fields(data):
        if fno != 1:
            continue
        labels: dict[str, str] = {}
        entries: list[tuple[int, str]] = []
        for f2, _, v2 in pb_fields(stream):  # type: ignore[arg-type]
            if f2 == 1:
                labels = parse_loki_labels(v2.decode())  # type: ignore[union-attr]
            elif f2 == 2:  # EntryAdapter
                ts_ns, line = 0, ""
                for f3, _, v3 in pb_fields(v2):  # type: ignore[arg-type]
                    if f3 == 1:  # google.protobuf.Timestamp
                        secs = nanos = 0
                        for f4, _, v4 in pb_fields(v3):  # type: ignore[arg-type]
                            if f4 == 1:
                                secs = _i64(v4)  # type: ignore[arg-type]
                            elif f4 == 2:
                                nanos = _i64(v4)  # type: ignore[arg-type]
                        ts_ns = secs * 1_000_000_000 + nanos
                    elif f3 == 2:
                        line = v3.decode()  # type: ignore[union-attr]
                entries.append((ts_ns, line))
        for ts_ns, line in entries:
            yield labels, ts_ns, line


def loki_push_pb(raw: DataFrame, payload_col: str = "payload",
                 compressed: bool = True) -> DataFrame:
    """Snappy+protobuf Loki push bodies → log samples rows — the protobuf
    twin of ingest.loki_push (ref: UnmarshalProtoV2, logs_protobuf.go:45)."""

    acc = TELEMETRY.decode_error_acc(raw.sparkSession)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for body in pdf[payload_col]:
                try:
                    buf = snappy_uncompress(bytes(body)) if compressed else bytes(body)
                    for labels, ts_ns, line in decode_loki_push(buf):
                        rows.append((labels, ts_ns, 0.0, line, 1))
                except _DECODE_ERRORS:
                    acc.add(1)
                    continue
            yield pd.DataFrame(
                rows, columns=["labels", "timestamp_ns", "value", "string", "type"]
            )

    decoded = raw.mapInPandas(decode, schema=_SAMPLES_OUT)
    san = sanitize_labels(F.col("labels"))
    return decoded.select(
        fingerprint_col(san).alias("fingerprint"),
        san.alias("labels"),
        "timestamp_ns", "value", "string", "type",
    )


# ---------------------------------------------------------------------------
# OTLP protobuf (traces + logs)
# ---------------------------------------------------------------------------


def _any_value(buf: bytes) -> str:
    """AnyValue{string=1,bool=2,int=3,double=4,array=5,kvlist=6,bytes=7}
    → string form. Scalars render like the reference; arrays/kvlists get a
    JSON-ish rendering (used for log BODIES — attr maps flatten these with
    dotted prefixes instead, see _flatten_attr / ref otlp.go:135-154)."""
    for fno, wt, v in pb_fields(buf):
        if fno == 1:
            return v.decode()  # type: ignore[union-attr]
        if fno == 2:
            return "true" if v else "false"
        if fno == 3:
            return str(_i64(v))  # type: ignore[arg-type]
        if fno == 4:
            return repr(struct.unpack("<d", v)[0])  # type: ignore[arg-type]
        if fno == 5:  # ArrayValue{values=1}
            vals = [_any_value(v2) for f2, _, v2 in pb_fields(v) if f2 == 1]  # type: ignore[arg-type]
            return "[" + ",".join(vals) + "]"
        if fno == 6:  # KeyValueList{values=1}
            parts = []
            for f2, _, kv in pb_fields(v):  # type: ignore[arg-type]
                if f2 == 1:
                    k, val = _kv_pair(kv)  # type: ignore[arg-type]
                    parts.append(f"{k}:{_any_value(val) if val is not None else ''}")
            return "{" + ",".join(parts) + "}"
        if fno == 7:
            return v.hex()  # type: ignore[union-attr]
    return ""


def _kv_pair(msg: bytes) -> tuple[str, bytes | None]:
    """KeyValue{key=1, value=2} → (key, raw AnyValue buf)."""
    key: str = ""
    val: bytes | None = None
    for fno, _, v in pb_fields(msg):
        if fno == 1:
            key = v.decode()  # type: ignore[union-attr]
        elif fno == 2:
            val = v  # type: ignore[assignment]
    return key, val


def _flatten_attr(key: str, buf: bytes | None, prefix: str, out: dict[str, str]) -> None:
    """Recursive attr flattening, matching the reference's writeAttrValue
    (otlp.go:135-154): arrays → key.0, key.1, ...; kvlists → key.subkey."""
    if buf is None:
        out[prefix + key] = ""
        return
    for fno, _, v in pb_fields(buf):
        if fno == 5:  # ArrayValue → indexed dotted keys
            i = 0
            for f2, _, v2 in pb_fields(v):  # type: ignore[arg-type]
                if f2 == 1:
                    _flatten_attr(str(i), v2, prefix + key + ".", out)  # type: ignore[arg-type]
                    i += 1
            return
        if fno == 6:  # KeyValueList → dotted sub-keys
            for f2, _, kv in pb_fields(v):  # type: ignore[arg-type]
                if f2 == 1:
                    k2, v2 = _kv_pair(kv)  # type: ignore[arg-type]
                    _flatten_attr(k2, v2, prefix + key + ".", out)
            return
        if fno == 4:  # double: writeAttrValue uses %f (otlp.go:142),
            # unlike the logs path's minimal-digit FormatFloat
            out[prefix + key] = "%f" % struct.unpack("<d", v)[0]
            return
    out[prefix + key] = _any_value(buf)


def _sanitize_key_py(key: str) -> str:
    """SanitizeKey (otlplogs.go:104-115): non-[a-zA-Z0-9_] → '_', leading
    digit (or empty) gets a '_' PREFIX."""
    out = re.sub(r"[^a-zA-Z0-9_]", "_", key)
    if not out or out[0].isdigit():
        out = "_" + out
    return out


def _go_float_str(v: float) -> str:
    """strconv.FormatFloat(v, 'f', -1, 64): shortest round-trip digits,
    never exponent notation."""
    r = repr(v)
    if "e" not in r and "E" not in r:
        return r
    from decimal import Decimal

    return format(Decimal(r), "f")


def _sanitize_value_pb(buf: bytes | None) -> str:
    """SanitizeValue (otlplogs.go:117-145) over a raw AnyValue buffer:
    scalars stringify (bytes → base64), arrays → JSON array of
    stringified items, kvlists → JSON object with sanitized sorted keys.
    The LOGS attr algebra — unlike the traces path, nothing flattens."""
    import base64

    if buf is None:
        return ""
    for fno, _, v in pb_fields(buf):
        if fno == 1:
            return v.decode()  # type: ignore[union-attr]
        if fno == 2:
            return "true" if v else "false"
        if fno == 3:
            return str(_i64(v))  # type: ignore[arg-type]
        if fno == 4:
            return _go_float_str(struct.unpack("<d", v)[0])  # type: ignore[arg-type]
        if fno == 7:
            return base64.b64encode(v).decode()  # type: ignore[arg-type]
        if fno == 5:  # ArrayValue{values=1}
            items = [
                _sanitize_value_pb(v2)
                for f2, _, v2 in pb_fields(v)  # type: ignore[arg-type]
                if f2 == 1
            ]
            return json.dumps(items, separators=(",", ":"), ensure_ascii=False)
        if fno == 6:  # KeyValueList{values=1}
            kv_map = {}
            for f2, _, kv in pb_fields(v):  # type: ignore[arg-type]
                if f2 == 1:
                    k2, v2 = _kv_pair(kv)  # type: ignore[arg-type]
                    kv_map[_sanitize_key_py(k2)] = _sanitize_value_pb(v2)
            return json.dumps(
                kv_map, sort_keys=True, separators=(",", ":"), ensure_ascii=False
            )
    return ""


def _log_attrs(msgs: list[bytes]) -> dict[str, str]:
    """KeyValue list → {SanitizeKey(k): SanitizeValue(v)} — the logs-path
    attr map (otlplogs.go writeAttrValue :99-101; NO dotted flatten)."""
    out: dict[str, str] = {}
    for m in msgs:
        key, val = _kv_pair(m)
        out[_sanitize_key_py(key)] = _sanitize_value_pb(val)
    return out


def _kv_attrs(msgs: list[bytes]) -> dict[str, str]:
    out: dict[str, str] = {}
    for m in msgs:
        key, val = _kv_pair(m)
        _flatten_attr(key, val, "", out)
    return out


def _fixed64(v: object) -> int:
    if isinstance(v, bytes):
        return int.from_bytes(v, "little")
    return int(v)


_OTLP_SVC_LOCAL = [
    "peer.service", "service.name", "faas.name", "k8s.deployment.name",
    "process.executable.name",
]
_OTLP_KIND = {2: "server", 3: "client", 4: "producer", 5: "consumer"}


def decode_otlp_traces(data: bytes) -> Iterator[dict]:
    """ExportTraceServiceRequest → span dicts (ref: unmarshal/otlp.go:76-130).
    Span: trace_id=1, span_id=2, parent=4, name=5, kind=3 varint,
    start=7, end=8, attrs=9, status=15{code=3 varint}.

    Matches the JSON path's reference algebra: resource attrs overwrite
    span attrs in the final map (write order), service-name lookups scan
    span-then-resource (first match), populateServiceNames fills
    service.name / remoteService.name when absent, and name/status/kind
    always land as attrs."""
    for fno, _, rs in pb_fields(data):
        if fno != 1:
            continue
        res_attrs: dict[str, str] = {}
        res_kvs: list[bytes] = []
        scope_spans: list[bytes] = []
        for f2, _, v2 in pb_fields(rs):  # type: ignore[arg-type]
            if f2 == 1:  # Resource{attributes=1}
                res_kvs = [v for f3, _, v in pb_fields(v2) if f3 == 1]  # type: ignore[arg-type]
                res_attrs = _kv_attrs(res_kvs)
            elif f2 == 2:
                scope_spans.append(v2)  # type: ignore[arg-type]
        for ss in scope_spans:
            for f3, _, span in pb_fields(ss):
                if f3 != 2:
                    continue
                rec = {
                    "trace_id": "", "span_id": "", "parent_id": "",
                    "name": "", "start": 0, "end": 0,
                }
                span_attrs: dict[str, str] = {}
                span_kvs: list[bytes] = []
                kind_code = 0
                status_code = 0
                for f4, _, v4 in pb_fields(span):  # type: ignore[arg-type]
                    if f4 == 1:
                        rec["trace_id"] = v4.hex()  # type: ignore[union-attr]
                    elif f4 == 2:
                        rec["span_id"] = v4.hex()  # type: ignore[union-attr]
                    elif f4 == 4:
                        rec["parent_id"] = v4.hex()  # type: ignore[union-attr]
                    elif f4 == 5:
                        rec["name"] = v4.decode()  # type: ignore[union-attr]
                    elif f4 == 3:
                        kind_code = int(v4)  # type: ignore[arg-type]
                    elif f4 == 7:
                        rec["start"] = _fixed64(v4)
                    elif f4 == 8:
                        rec["end"] = _fixed64(v4)
                    elif f4 == 9:
                        span_kvs.append(v4)  # type: ignore[arg-type]
                        span_attrs.update(_kv_attrs([v4]))  # type: ignore[list-item]
                    elif f4 == 15:  # Status{code=3}
                        for f5, _, v5 in pb_fields(v4):  # type: ignore[arg-type]
                            if f5 == 3:
                                status_code = int(v5)  # type: ignore[arg-type]

                # getOtlpAttr analog (otlp.go:18-25): FIRST top-level
                # KeyValue with the key, span attrs then resource, with
                # GetStringValue semantics — non-string values read ""
                top_pairs: list[tuple[str, str]] = []
                for kv in span_kvs + res_kvs:
                    k, vbuf = _kv_pair(kv)
                    sval = ""
                    if vbuf is not None:
                        for f5, _, v5 in pb_fields(vbuf):
                            if f5 == 1:
                                sval = v5.decode()  # type: ignore[union-attr]
                            break
                    top_pairs.append((k, sval))

                def lookup(key: str) -> str:
                    for k, v in top_pairs:
                        if k == key:
                            return v
                    return ""

                local = next(
                    (v for v in (lookup(k) for k in _OTLP_SVC_LOCAL) if v),
                    "OTLPResourceNoServiceName",
                )
                remote = next(
                    (v for v in (lookup(k) for k in _OTLP_SVC_LOCAL[1:]) if v), ""
                )
                attrs = dict(span_attrs)
                attrs.update(res_attrs)  # resource overwrites (write order)
                top_keys = {k for k, _ in top_pairs}
                if "service.name" not in top_keys:
                    attrs["service.name"] = local
                if "remoteService.name" not in top_keys:
                    attrs["remoteService.name"] = remote
                attrs["name"] = rec["name"]
                attrs["status"] = {2: "error", 1: "ok"}.get(status_code, "unset")
                attrs["kind"] = _OTLP_KIND.get(kind_code, "internal")
                rec["attrs"] = attrs
                yield rec


_SPANS_OUT = (
    "trace_id string, span_id string, parent_id string, name string,"
    " timestamp_ns long, duration_ns long, service_name string,"
    " payload_type tinyint, payload string, attrs map<string,string>"
)


def _span_payload_json(s: dict) -> str:
    """OTLP-JSON rendering of a decoded span, field-compatible with the
    JSON path's `to_json(span)` payload so trace-by-id reconstruction can
    read either ingest path's rows interchangeably."""
    return json.dumps(
        {
            "traceId": s["trace_id"],
            "spanId": s["span_id"],
            "parentSpanId": s["parent_id"],
            "name": s["name"],
            "startTimeUnixNano": str(s["start"]),
            "endTimeUnixNano": str(s["end"]),
            "attributes": [
                {"key": k, "value": {"stringValue": v}}
                for k, v in s["attrs"].items()
            ],
        },
        separators=(",", ":"),
    )


def otlp_traces_pb(raw: DataFrame, payload_col: str = "payload") -> DataFrame:
    """OTLP protobuf trace bodies → spans rows (+ attrs map for the GIN).
    The JSON path (ingest.otlp_traces) emits the same 10-column shape."""

    acc = TELEMETRY.decode_error_acc(raw.sparkSession)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for body in pdf[payload_col]:
                try:
                    spans = list(decode_otlp_traces(bytes(body)))
                except _DECODE_ERRORS:
                    acc.add(1)
                    continue
                for s in spans:
                    rows.append(
                        (
                            s["trace_id"], s["span_id"], s["parent_id"],
                            s["name"], s["start"], s["end"] - s["start"],
                            s["attrs"].get("service.name", ""), 2,
                            _span_payload_json(s),
                            s["attrs"],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "trace_id", "span_id", "parent_id", "name",
                    "timestamp_ns", "duration_ns", "service_name",
                    "payload_type", "payload", "attrs",
                ],
            )

    return raw.mapInPandas(decode, schema=_SPANS_OUT)


def decode_otlp_logs(data: bytes) -> Iterator[tuple[dict, int, str]]:
    """ExportLogsServiceRequest → (labels, ts_ns, body) (ref:
    otlplogs.go:22-101). LogRecord: time=1 fixed64, severity_text=3,
    body=5, attrs=6, trace_id=9, span_id=10, observed_time=11 fixed64.
    severity_text lands as the `level` label when non-empty (:49-51);
    non-zero trace/span ids become trace_id/span_id labels (:52-58);
    time falls back to observed_time (:69-75)."""
    for fno, _, rl in pb_fields(data):
        if fno != 1:
            continue
        res_attrs: dict[str, str] = {}
        scope_logs: list[bytes] = []
        for f2, _, v2 in pb_fields(rl):  # type: ignore[arg-type]
            if f2 == 1:
                res_attrs = _log_attrs(
                    [v for f3, _, v in pb_fields(v2) if f3 == 1]  # type: ignore[arg-type]
                )
            elif f2 == 2:
                scope_logs.append(v2)  # type: ignore[arg-type]
        for sl in scope_logs:
            scope_attrs: dict[str, str] = {}
            for f3, _, v3 in pb_fields(sl):
                if f3 == 1:  # InstrumentationScope{attributes=3}
                    scope_attrs = _log_attrs(
                        [v for f4, _, v in pb_fields(v3) if f4 == 3]  # type: ignore[arg-type]
                    )
            for f3, _, rec in pb_fields(sl):
                if f3 != 2:
                    continue
                ts, obs_ts, sev, body = 0, 0, "", ""
                tid = sid = b""
                labels = dict(res_attrs)
                labels.update(scope_attrs)
                for f4, _, v4 in pb_fields(rec):  # type: ignore[arg-type]
                    if f4 == 1:
                        ts = _fixed64(v4)
                    elif f4 == 11:
                        obs_ts = _fixed64(v4)
                    elif f4 == 3:
                        sev = v4.decode()  # type: ignore[union-attr]
                    elif f4 == 5:
                        body = _sanitize_value_pb(v4)  # type: ignore[arg-type]
                    elif f4 == 6:
                        labels.update(_log_attrs([v4]))  # type: ignore[list-item]
                    elif f4 == 9:
                        tid = v4  # type: ignore[assignment]
                    elif f4 == 10:
                        sid = v4  # type: ignore[assignment]
                if sev:
                    labels["level"] = sev
                if len(tid) == 16 and any(tid):
                    labels["trace_id"] = tid.hex()
                if len(sid) == 8 and any(sid):
                    labels["span_id"] = sid.hex()
                yield labels, ts or obs_ts, body


def otlp_logs_pb(raw: DataFrame, payload_col: str = "payload") -> DataFrame:
    """OTLP protobuf log bodies → log samples rows."""

    acc = TELEMETRY.decode_error_acc(raw.sparkSession)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for body in pdf[payload_col]:
                try:
                    recs = list(decode_otlp_logs(bytes(body)))
                except _DECODE_ERRORS:
                    acc.add(1)
                    continue
                for labels, ts, line in recs:
                    rows.append((labels, ts, 0.0, line, 1))
            yield pd.DataFrame(
                rows, columns=["labels", "timestamp_ns", "value", "string", "type"]
            )

    decoded = raw.mapInPandas(decode, schema=_SAMPLES_OUT)
    san = sanitize_labels(F.col("labels"))
    return decoded.select(
        fingerprint_col(san).alias("fingerprint"),
        san.alias("labels"),
        "timestamp_ns", "value", "string", "type",
    )


# ---------------------------------------------------------------------------
# pprof (Pyroscope /ingest) — gzipped profile.proto
# ---------------------------------------------------------------------------


def decode_pprof(data: bytes) -> list[tuple[str, int]]:
    """pprof Profile → folded stacks [(root;..;leaf, value)], first sample
    type (ref: go_pprof.go:82; profile.proto: sample=2{location_id=1,
    value=2}, location=4{id=1, line=4{function_id=1}}, function=5{id=1,
    name=2}, string_table=6). Location ids are leaf-first → reversed."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    strings: list[str] = []
    samples: list[tuple[list[int], int]] = []
    loc_fn: dict[int, int] = {}
    fn_name: dict[int, int] = {}
    for fno, wt, v in pb_fields(data):
        if fno == 2:  # Sample
            locs: list[int] = []
            vals: list[int] = []
            for f2, _, v2 in pb_fields(v):  # type: ignore[arg-type]
                if f2 == 1:
                    locs += _packed_uvarints(v2)
                elif f2 == 2:
                    vals += [_i64(x) for x in _packed_uvarints(v2)]
            if locs and vals:
                samples.append((locs, vals[0]))
        elif fno == 4:  # Location
            lid, fid = 0, 0
            for f2, _, v2 in pb_fields(v):  # type: ignore[arg-type]
                if f2 == 1:
                    lid = v2  # type: ignore[assignment]
                elif f2 == 4 and fid == 0:  # first Line's function_id
                    for f3, _, v3 in pb_fields(v2):  # type: ignore[arg-type]
                        if f3 == 1:
                            fid = v3  # type: ignore[assignment]
                            break
            loc_fn[lid] = fid
        elif fno == 5:  # Function
            fid, nidx = 0, 0
            for f2, _, v2 in pb_fields(v):  # type: ignore[arg-type]
                if f2 == 1:
                    fid = v2  # type: ignore[assignment]
                elif f2 == 2:
                    nidx = v2  # type: ignore[assignment]
            fn_name[fid] = nidx
        elif fno == 6:  # string_table
            strings.append(v.decode())  # type: ignore[union-attr]

    def name(loc: int) -> str:
        # Sentinel None (not 0) defaults: string-table index 0 is the
        # reserved empty string, so a missing mapping must fall through to
        # the loc_{id} fallback instead of resolving to "".
        fid = loc_fn.get(loc)
        idx = fn_name.get(fid) if fid is not None else None
        if idx and 0 < idx < len(strings):
            return strings[idx]
        return f"loc_{loc}"

    return [
        (";".join(name(l) for l in reversed(locs)), val)
        for locs, val in samples
    ]


def decode_otlp_profiles(data: bytes) -> Iterator[dict]:
    """OTLP profiles (v1development, dictionary+stack-table revision —
    the layout the reference consumes via pdata/pprofile, ref:
    otlp_profile.go buildOTLPTree/frameName/extractOTLPMeta) → one dict
    per profile: {service_name, type_id, folded: [(stack, value)]}.

    Wire layout targeted (profiles.proto v1development):
      ProfilesData{resource_profiles=1, dictionary=2}
      ProfilesDictionary{mapping_table=1, location_table=2,
        function_table=3, link_table=4, string_table=5,
        attribute_table=6, stack_table=7}
      ResourceProfiles{resource=1, scope_profiles=2}
      ScopeProfiles{scope=1, profiles=2}
      Profile{sample_type=1, sample=2, time_nanos=3, duration_nanos=4,
        period_type=5}
      Sample{stack_index=1, values=2}  Stack{location_indices=1}
      Location{mapping_index=1, address=2, line=3}
      Line{function_index=1}  Function{name_strindex=1}
      ValueType{type_strindex=1, unit_strindex=2}
    Frame naming mirrors frameName (otlp_profile.go:294): Lines[0] →
    function → string table, else "+0x<address>"; per-sample value =
    sum(values) like buildOTLPTree (otlp_profile.go:326-333).
    """
    strings: list[str] = []
    functions: list[int] = []  # name_strindex per function
    locations: list[tuple[int, int]] = []  # (first function_index or -1, address)
    stacks: list[list[int]] = []  # location index lists
    resource_profiles: list[bytes] = []
    for fno, _, v in pb_fields(data):
        if fno == 1:
            resource_profiles.append(v)  # type: ignore[arg-type]
        elif fno == 2:  # ProfilesDictionary
            for f2, _, v2 in pb_fields(v):  # type: ignore[arg-type]
                if f2 == 2:  # Location
                    fn_idx, addr = -1, 0
                    for f3, _, v3 in pb_fields(v2):  # type: ignore[arg-type]
                        if f3 == 2:
                            addr = v3 if isinstance(v3, int) else _fixed64(v3)
                        elif f3 == 3 and fn_idx < 0:  # first Line
                            for f4, _, v4 in pb_fields(v3):  # type: ignore[arg-type]
                                if f4 == 1:
                                    fn_idx = int(v4)  # type: ignore[arg-type]
                                    break
                    locations.append((fn_idx, addr))
                elif f2 == 3:  # Function{name_strindex=1}
                    nidx = 0
                    for f3, _, v3 in pb_fields(v2):  # type: ignore[arg-type]
                        if f3 == 1:
                            nidx = int(v3)  # type: ignore[arg-type]
                    functions.append(nidx)
                elif f2 == 5:  # string_table
                    strings.append(v2.decode())  # type: ignore[union-attr]
                elif f2 == 7:  # Stack{location_indices=1}
                    li: list[int] = []
                    for f3, _, v3 in pb_fields(v2):  # type: ignore[arg-type]
                        if f3 == 1:
                            li += _packed_uvarints(v3)
                    stacks.append(li)

    def s_at(i: int) -> str:
        return strings[i] if 0 <= i < len(strings) else ""

    def frame(loc_idx: int) -> str:
        if 0 <= loc_idx < len(locations):
            fn_idx, addr = locations[loc_idx]
            if 0 <= fn_idx < len(functions):
                name = s_at(functions[fn_idx])
                if name:
                    return name
            return f"+0x{addr:x}"
        return "n/a"

    for rp in resource_profiles:
        service = "unknown_service"
        scope_profiles: list[bytes] = []
        for f2, _, v2 in pb_fields(rp):
            if f2 == 1:  # Resource{attributes=1}
                attrs = _kv_attrs(
                    [v for f3, _, v in pb_fields(v2) if f3 == 1]  # type: ignore[arg-type]
                )
                service = attrs.get("service.name", service)
            elif f2 == 2:
                scope_profiles.append(v2)  # type: ignore[arg-type]
        for sp in scope_profiles:
            for f3, _, prof in pb_fields(sp):
                if f3 != 2:
                    continue
                type_s = unit_s = ""
                folded: list[tuple[str, int]] = []
                for f4, _, v4 in pb_fields(prof):  # type: ignore[arg-type]
                    if f4 == 1:  # ValueType
                        for f5, _, v5 in pb_fields(v4):  # type: ignore[arg-type]
                            if f5 == 1:
                                type_s = s_at(int(v5))  # type: ignore[arg-type]
                            elif f5 == 2:
                                unit_s = s_at(int(v5))  # type: ignore[arg-type]
                    elif f4 == 2:  # Sample{stack_index=1, values=2}
                        st_idx, vals = -1, []
                        for f5, _, v5 in pb_fields(v4):  # type: ignore[arg-type]
                            if f5 == 1:
                                st_idx = int(v5)  # type: ignore[arg-type]
                            elif f5 == 2:
                                vals += [_i64(x) for x in _packed_uvarints(v5)]
                        if 0 <= st_idx < len(stacks):
                            li = stacks[st_idx]
                            stack = ";".join(frame(i) for i in reversed(li))
                            folded.append((stack, sum(vals)))
                yield {
                    "service_name": service,
                    "type_id": f"{type_s}:{unit_s}",
                    "folded": folded,
                }


def otlp_profiles_pb(raw: DataFrame, payload_col: str = "payload",
                     profile_col: str = "profile_id") -> DataFrame:
    """OTLP profile bodies → folded-stack lines (compose with
    ingest.collapsed_stacks for tree rows, like pprof_folded)."""

    acc = TELEMETRY.decode_error_acc(raw.sparkSession)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for pid, body in zip(pdf[profile_col], pdf[payload_col]):
                try:
                    profs = list(decode_otlp_profiles(bytes(body)))
                except _DECODE_ERRORS:
                    acc.add(1)
                    continue
                for p in profs:
                    for stack, val in p["folded"]:
                        rows.append(
                            (pid, p["service_name"], p["type_id"], f"{stack} {val}")
                        )
            yield pd.DataFrame(
                rows,
                columns=["profile_id", "service_name", "type_id", "line"],
            )

    return raw.mapInPandas(
        decode,
        schema="profile_id string, service_name string, type_id string, line string",
    )


def pprof_folded(raw: DataFrame, payload_col: str = "payload",
                 profile_col: str = "profile_id") -> DataFrame:
    """pprof bodies → folded-stack lines; compose with
    `ingest.collapsed_stacks` for tree rows (one shared tree builder)."""

    acc = TELEMETRY.decode_error_acc(raw.sparkSession)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for pid, body in zip(pdf[profile_col], pdf[payload_col]):
                try:
                    stacks = decode_pprof(bytes(body))
                except _DECODE_ERRORS:
                    acc.add(1)
                    continue
                for stack, val in stacks:
                    rows.append((pid, f"{stack} {val}"))
            yield pd.DataFrame(rows, columns=["profile_id", "line"])

    return raw.mapInPandas(decode, schema="profile_id string, line string")
