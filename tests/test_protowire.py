"""Binary wire-format ingestion: snappy + protobuf decode paths.

Fixtures are hand-encoded with protowire.pb_encode / snappy_compress —
no protobuf or snappy runtime exists in this image, which is the point
of the module.
"""

from __future__ import annotations

import gzip
import struct

from gigapipe_spark.sources import protowire as pw


def _label(name: str, value: str) -> bytes:
    return pw.pb_encode([(1, 2, name.encode()), (2, 2, value.encode())])


def _sample(value: float, ts_ms: int) -> bytes:
    return pw.pb_encode([(1, 1, struct.pack("<d", value)), (2, 0, ts_ms)])


def _write_request() -> bytes:
    ts1 = pw.pb_encode(
        [
            (1, 2, _label("__name__", "http_total")),
            (1, 2, _label("job", "api")),
            (2, 2, _sample(1.5, 1_000)),
            (2, 2, _sample(2.5, 16_000)),
        ]
    )
    ts2 = pw.pb_encode(
        [
            (1, 2, _label("__name__", "http_total")),
            (1, 2, _label("job", "web")),
            (2, 2, _sample(7.0, 1_000)),
        ]
    )
    return pw.pb_encode([(1, 2, ts1), (1, 2, ts2)])


def test_snappy_roundtrip_and_copies():
    data = b"abcdefgh" * 500 + b"tail"
    assert pw.snappy_uncompress(pw.snappy_compress(data)) == data
    # hand-built stream with an overlapping copy: literal "ab" + copy
    # (offset=2, len=8) = RLE expansion "ab"*5
    stream = bytes([10]) + bytes([1 << 2]) + b"ab" + bytes([(8 - 4) << 2 | 1, 2])
    assert pw.snappy_uncompress(stream) == b"ab" * 5


def test_remote_write_decode_py():
    rows = list(pw.decode_write_request(_write_request()))
    assert len(rows) == 3
    labels, ts_ns, val = rows[0]
    assert labels == {"__name__": "http_total", "job": "api"}
    assert ts_ns == 1_000 * 1_000_000 and val == 1.5


def test_remote_write_spark(spark):
    body = pw.snappy_compress(_write_request())
    raw = spark.createDataFrame([(bytearray(body),)], "payload binary")
    out = pw.remote_write(raw).orderBy("timestamp_ns", "value").collect()
    assert len(out) == 3
    assert out[0]["labels"]["job"] == "api" and out[0]["value"] == 1.5
    assert out[0]["type"] == 2 and out[0]["string"] == ""
    # fingerprint equals the JVM-side fingerprint of the same map → joins
    # against series built by any other ingest path line up
    from gigapipe_spark.model.fingerprint import fingerprint_col
    from pyspark.sql import functions as F

    fp = (
        spark.createDataFrame(
            [({"__name__": "http_total", "job": "api"},)], "m map<string,string>"
        )
        .select(fingerprint_col(F.col("m")).alias("fp"))
        .head()["fp"]
    )
    assert out[0]["fingerprint"] == fp


def _anyval(s: str) -> bytes:
    return pw.pb_encode([(1, 2, s.encode())])


def _kv(k: str, v: str) -> bytes:
    return pw.pb_encode([(1, 2, k.encode()), (2, 2, _anyval(v))])


def test_otlp_traces_pb(spark):
    span = pw.pb_encode(
        [
            (1, 2, bytes.fromhex("aa" * 16)),
            (2, 2, bytes.fromhex("bb" * 8)),
            (4, 2, bytes.fromhex("cc" * 8)),
            (5, 2, b"GET /x"),
            (7, 1, struct.pack("<Q", 1_000_000_000)),
            (8, 1, struct.pack("<Q", 1_500_000_000)),
            (9, 2, _kv("http.status", "200")),
        ]
    )
    scope = pw.pb_encode([(2, 2, span)])
    resource = pw.pb_encode([(1, 2, _kv("service.name", "api"))])
    rs = pw.pb_encode([(1, 2, resource), (2, 2, scope)])
    body = pw.pb_encode([(1, 2, rs)])
    raw = spark.createDataFrame([(bytearray(body),)], "payload binary")
    rows = pw.otlp_traces_pb(raw).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["trace_id"] == "aa" * 16 and r["parent_id"] == "cc" * 8
    assert r["name"] == "GET /x" and r["duration_ns"] == 500_000_000
    assert r["service_name"] == "api" and r["attrs"]["http.status"] == "200"


def test_otlp_logs_pb(spark):
    rec = pw.pb_encode(
        [
            (1, 1, struct.pack("<Q", 2_000_000_000)),
            (3, 2, b"ERROR"),
            (5, 2, _anyval("boom happened")),
            (6, 2, _kv("app", "worker")),
        ]
    )
    scope = pw.pb_encode([(2, 2, rec)])
    resource = pw.pb_encode([(1, 2, _kv("service.name", "api"))])
    rl = pw.pb_encode([(1, 2, resource), (2, 2, scope)])
    body = pw.pb_encode([(1, 2, rl)])
    raw = spark.createDataFrame([(bytearray(body),)], "payload binary")
    rows = pw.otlp_logs_pb(raw).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["string"] == "boom happened" and r["timestamp_ns"] == 2_000_000_000
    # label names pass the shared sanitize step (ref sanitizeLabels /
    # SanitizeKey): '.' is not [a-zA-Z0-9_] so service.name → service_name
    assert r["labels"] == {
        "service_name": "api", "app": "worker", "level": "ERROR"
    }
    assert r["type"] == 1


def _pprof() -> bytes:
    # strings: 0 reserved "", 1 main, 2 foo, 3 bar
    strings = [b"", b"main", b"foo", b"bar"]
    funcs = [
        pw.pb_encode([(1, 0, i + 1), (2, 0, i + 1)]) for i in range(3)
    ]
    locs = [
        pw.pb_encode([(1, 0, i + 1), (4, 2, pw.pb_encode([(1, 0, i + 1)]))])
        for i in range(3)
    ]
    # stacks leaf-first: [foo, main] value 5; [bar, foo, main] value 7
    s1 = pw.pb_encode([(1, 0, 2), (1, 0, 1), (2, 0, 5)])
    s2 = pw.pb_encode([(1, 0, 3), (1, 0, 2), (1, 0, 1), (2, 0, 7)])
    fields = [(2, 2, s1), (2, 2, s2)]
    fields += [(4, 2, l) for l in locs]
    fields += [(5, 2, f) for f in funcs]
    fields += [(6, 2, s) for s in strings]
    return pw.pb_encode(fields)


def test_pprof_decode_py():
    folded = pw.decode_pprof(gzip.compress(_pprof()))
    assert folded == [("main;foo", 5), ("main;foo;bar", 7)]


def test_pprof_to_tree(spark):
    from gigapipe_spark.sources.ingest import collapsed_stacks

    raw = spark.createDataFrame(
        [("p1", bytearray(gzip.compress(_pprof())))],
        "profile_id string, payload binary",
    )
    tree = collapsed_stacks(pw.pprof_folded(raw)).collect()
    by_fn = {r["fn_name"]: r for r in tree}
    assert by_fn["main"]["total"] == 12 and by_fn["main"]["self"] == 0
    assert by_fn["foo"]["total"] == 12 and by_fn["foo"]["self"] == 5
    assert by_fn["bar"]["total"] == 7 and by_fn["bar"]["self"] == 7


def test_packed_varints():
    # packed repeated location ids (wire type 2) decode identically
    packed = pw.pb_encode([(1, 2, b"\x02\x01"), (2, 0, 5)])
    strings = [b"", b"main", b"foo"]
    fields = [(2, 2, packed)]
    fields += [
        (4, 2, pw.pb_encode([(1, 0, i + 1), (4, 2, pw.pb_encode([(1, 0, i + 1)]))]))
        for i in range(2)
    ]
    fields += [(5, 2, pw.pb_encode([(1, 0, i + 1), (2, 0, i + 1)])) for i in range(2)]
    fields += [(6, 2, s) for s in strings]
    assert pw.decode_pprof(pw.pb_encode(fields)) == [("main;foo", 5)]


def test_loki_push_pb(spark):
    def entry(secs, nanos, line):
        ts = pw.pb_encode([(1, 0, secs), (2, 0, nanos)])
        return pw.pb_encode([(1, 2, ts), (2, 2, line)])

    stream = pw.pb_encode(
        [
            (1, 2, b'{app="api", level="error"}'),
            (2, 2, entry(3, 7, b"boom")),
        ]
    )
    body = pw.snappy_compress(pw.pb_encode([(1, 2, stream)]))
    raw = spark.createDataFrame(
        [(bytearray(body),), (bytearray(b"\xffjunk"),)], "payload binary"
    )
    rows = pw.loki_push_pb(raw).collect()
    assert len(rows) == 1  # malformed body skipped, not task-fatal
    r = rows[0]
    assert r["labels"] == {"app": "api", "level": "error"}
    assert r["timestamp_ns"] == 3_000_000_007 and r["string"] == "boom"
    assert r["type"] == 1 and r["fingerprint"] is not None


def test_parse_loki_labels():
    assert pw.parse_loki_labels('{a="b", c="d\\"e"}') == {"a": "b", "c": 'd"e'}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        pw.parse_loki_labels('a="b"')


def test_anyvalue_nested_kinds():
    # kvlist flattens with dotted prefixes, arrays with indexed keys
    # (ref: otlp.go:135-154 writeAttrValue)
    def anyval_str(s):
        return pw.pb_encode([(1, 2, s)])

    def kv(k, vbuf):
        return pw.pb_encode([(1, 2, k), (2, 2, vbuf)])

    kvlist = pw.pb_encode([(6, 2, pw.pb_encode([(1, 2, kv(b"user", anyval_str(b"alice")))]))])
    arr = pw.pb_encode(
        [(5, 2, pw.pb_encode([(1, 2, anyval_str(b"a")), (1, 2, anyval_str(b"b"))]))]
    )
    attrs = pw._kv_attrs([kv(b"ctx", kvlist), kv(b"tags", arr)])
    assert attrs == {"ctx.user": "alice", "tags.0": "a", "tags.1": "b"}
    # log-body rendering of the same kinds stays a single string
    assert pw._any_value(kvlist) == "{user:alice}"
    assert pw._any_value(arr) == "[a,b]"
    assert pw._any_value(pw.pb_encode([(7, 2, b"\x01\x02")])) == "0102"


def test_pprof_unmapped_location_fallback():
    prof = pw.pb_encode(
        [
            (6, 2, b""),  # string table: only the reserved empty string
            (2, 2, pw.pb_encode([(1, 0, 7), (2, 0, 5)])),
        ]
    )
    assert pw.decode_pprof(prof) == [("loc_7", 5)]


def _otlp_profile_body() -> bytes:
    # dictionary: strings ["", "cpu", "ns", "main", "work"]
    strings = [b"", b"cpu", b"ns", b"main", b"work"]
    functions = [
        pw.pb_encode([(1, 0, 3)]),  # fn0 -> "main"
        pw.pb_encode([(1, 0, 4)]),  # fn1 -> "work"
    ]
    locations = [
        pw.pb_encode([(2, 0, 0x10), (3, 2, pw.pb_encode([(1, 0, 0)]))]),  # loc0 -> fn0
        pw.pb_encode([(2, 0, 0x20), (3, 2, pw.pb_encode([(1, 0, 1)]))]),  # loc1 -> fn1
        pw.pb_encode([(2, 0, 0xFF)]),  # loc2: no line -> "+0xff"
    ]
    stacks = [
        pw.pb_encode([(1, 2, b"\x01\x00")]),  # leaf-first [loc1, loc0] -> main;work
        pw.pb_encode([(1, 2, b"\x02\x00")]),  # [loc2, loc0] -> main;+0xff
    ]
    dict_fields = []
    dict_fields += [(5, 2, s) for s in strings]
    dict_fields += [(3, 2, f) for f in functions]
    dict_fields += [(2, 2, l) for l in locations]
    dict_fields += [(7, 2, s) for s in stacks]
    dictionary = pw.pb_encode(dict_fields)
    sample_type = pw.pb_encode([(1, 0, 1), (2, 0, 2)])  # cpu:ns
    samples = [
        pw.pb_encode([(1, 0, 0), (2, 2, b"\x05")]),       # stack0, value 5
        pw.pb_encode([(1, 0, 1), (2, 2, b"\x03")]),       # stack1, value 3
    ]
    profile = pw.pb_encode([(1, 2, sample_type)] + [(2, 2, s) for s in samples])
    scope_profiles = pw.pb_encode([(2, 2, profile)])
    resource = pw.pb_encode([(1, 2, _kv("service.name", "api"))])
    rp = pw.pb_encode([(1, 2, resource), (2, 2, scope_profiles)])
    return pw.pb_encode([(1, 2, rp), (2, 2, dictionary)])


def test_otlp_profiles_decode_py():
    profs = list(pw.decode_otlp_profiles(_otlp_profile_body()))
    assert len(profs) == 1
    p = profs[0]
    assert p["service_name"] == "api" and p["type_id"] == "cpu:ns"
    assert p["folded"] == [("main;work", 5), ("main;+0xff", 3)]


def test_otlp_profiles_to_tree(spark):
    from gigapipe_spark.sources.ingest import collapsed_stacks

    raw = spark.createDataFrame(
        [("p1", bytearray(_otlp_profile_body()))],
        "profile_id string, payload binary",
    )
    folded = pw.otlp_profiles_pb(raw)
    tree = collapsed_stacks(folded.select("profile_id", "line")).collect()
    by_fn = {r["fn_name"]: r for r in tree}
    assert by_fn["main"]["total"] == 8 and by_fn["main"]["self"] == 0
    assert by_fn["work"]["total"] == 5 and by_fn["work"]["self"] == 5
    assert by_fn["+0xff"]["self"] == 3


def test_otlp_traces_pb_json_schema_parity(spark):
    # the pb and JSON OTLP trace paths must stay union-compatible:
    # same columns, same types, same values for the same logical span
    import json

    from gigapipe_spark.sources.ingest import otlp_traces

    span = pw.pb_encode(
        [
            (1, 2, bytes.fromhex("aa" * 16)),
            (2, 2, bytes.fromhex("bb" * 8)),
            (4, 2, bytes.fromhex("cc" * 8)),
            (5, 2, b"GET /x"),
            (7, 1, struct.pack("<Q", 1_000_000_000)),
            (8, 1, struct.pack("<Q", 1_500_000_000)),
            (9, 2, _kv("http.status", "200")),
        ]
    )
    scope = pw.pb_encode([(2, 2, span)])
    resource = pw.pb_encode([(1, 2, _kv("service.name", "api"))])
    rs = pw.pb_encode([(1, 2, resource), (2, 2, scope)])
    body = pw.pb_encode([(1, 2, rs)])
    pb_df = pw.otlp_traces_pb(
        spark.createDataFrame([(bytearray(body),)], "payload binary")
    )
    payload = json.dumps(
        {
            "resourceSpans": [
                {
                    "resource": {
                        "attributes": [
                            {"key": "service.name", "value": {"stringValue": "api"}}
                        ]
                    },
                    "scopeSpans": [
                        {
                            "spans": [
                                {
                                    "traceId": "aa" * 16,
                                    "spanId": "bb" * 8,
                                    "parentSpanId": "cc" * 8,
                                    "name": "GET /x",
                                    "startTimeUnixNano": "1000000000",
                                    "endTimeUnixNano": "1500000000",
                                    "attributes": [
                                        {
                                            "key": "http.status",
                                            "value": {"stringValue": "200"},
                                        }
                                    ],
                                }
                            ]
                        }
                    ],
                }
            ]
        }
    )
    json_df = otlp_traces(spark.createDataFrame([(payload,)], "payload string"))
    # union-compatible: same names and types (nullability may differ —
    # literal columns are non-nullable)
    assert [(f.name, f.dataType) for f in pb_df.schema.fields] == [
        (f.name, f.dataType) for f in json_df.schema.fields
    ]
    merged = pb_df.unionByName(json_df)
    cols = [
        "trace_id", "span_id", "parent_id", "name",
        "timestamp_ns", "duration_ns", "service_name", "attrs",
    ]
    a, b = [r.asDict() for r in merged.select(*cols).collect()]
    assert a == b
