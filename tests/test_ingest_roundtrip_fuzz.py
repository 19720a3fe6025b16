"""Decoder round-trip fuzz: randomly generated payloads are ENCODED by
the test (following each protocol's public spec) and decoded by the real
ingest path; the decoded rows must reproduce the generator's truth
exactly. Hostile content — unicode, quotes, backslashes, newlines,
emoji — rides in every batch. Seeded: failures replay exactly."""

import json
import random
import struct

from gigapipe_spark.sources import ingest
from gigapipe_spark.sources import protowire as pw

NASTY = [
    "plain",
    'with "quotes"',
    "back\\slash",
    "new\nline",
    "tab\tsep",
    "emoji \U0001f680\U0001f40d",
    "ünïcødé αβγ 中文",
    "{not json}",
    " leading and trailing ",
    "",
]


def _rand_labels(rng: random.Random) -> dict[str, str]:
    n = rng.randrange(1, 4)
    out = {}
    for i in range(n):
        out[f"l{i}_{rng.randrange(10)}"] = rng.choice(NASTY[:-1]) or "v"
    out["app"] = rng.choice(["a", "b", "c"])
    return out


def test_loki_push_json_roundtrip_fuzz(spark):
    rng = random.Random(1234)
    truth = set()
    payloads = []
    for _ in range(30):
        streams = []
        for _s in range(rng.randrange(1, 3)):
            labels = _rand_labels(rng)
            values = []
            for _v in range(rng.randrange(1, 4)):
                ts = rng.randrange(1, 2**62)
                line = rng.choice(NASTY)
                values.append([str(ts), line])
                truth.add((tuple(sorted(labels.items())), ts, line))
            streams.append({"stream": labels, "values": values})
        payloads.append((json.dumps({"streams": streams}),))
    raw = spark.createDataFrame(payloads, "payload string")
    rows = ingest.loki_push(raw).collect()
    got = {
        (tuple(sorted(r["labels"].items())), r["timestamp_ns"], r["string"])
        for r in rows
    }
    assert got == truth


def _influx_escape_tag(s: str) -> str:
    return s.replace("\\", "\\\\").replace(",", "\\,").replace(" ", "\\ ").replace("=", "\\=")


def test_influx_line_roundtrip_fuzz(spark):
    """Escaped tags per the line-protocol spec; simple field keys and
    float values (the decoder's contract)."""
    rng = random.Random(99)
    truth = set()
    lines = []
    for i in range(40):
        meas = rng.choice(["cpu", "mem", "disk_io"])
        tagk, tagv = "host", rng.choice(["a b", "x,y", "p=q", "plain", "back\\slash"])
        fieldk = rng.choice(["usage", "value"])
        val = round(rng.uniform(0, 100), 3)
        ts = rng.randrange(1, 2**60)
        lines.append((f"{meas},{tagk}={_influx_escape_tag(tagv)} {fieldk}={val} {ts}",))
        # reference shape (influx.go:54,88): measurement is its own label,
        # __name__ is the bare field key
        truth.add((meas, fieldk, tagv, float(val), ts))
    raw = spark.createDataFrame(lines, "line string")
    rows = ingest.influx_line(raw).collect()
    got = {
        (r["labels"]["measurement"], r["labels"]["__name__"], r["labels"]["host"],
         r["value"], r["timestamp_ns"])
        for r in rows
    }
    assert got == truth


def test_remote_write_pb_roundtrip_fuzz(spark):
    rng = random.Random(7)

    def lbl(n: str, v: str) -> bytes:
        return pw.pb_encode([(1, 2, n.encode()), (2, 2, v.encode())])

    def smp(val: float, ts_ms: int) -> bytes:
        return pw.pb_encode([(1, 1, struct.pack("<d", val)), (2, 0, ts_ms)])

    truth = set()
    serieses = []
    for i in range(25):
        name = f"m{rng.randrange(5)}"
        job = rng.choice(NASTY[:7]) or "j"
        fields = [(1, 2, lbl("__name__", name)), (1, 2, lbl("job", job))]
        for _ in range(rng.randrange(1, 4)):
            v = round(rng.uniform(-1e6, 1e6), 4)
            ts_ms = rng.randrange(1, 4 * 10**12)  # int64-ns-safe ms range
            fields.append((2, 2, smp(v, ts_ms)))
            truth.add((name, job, v, ts_ms * 1_000_000))
        serieses.append((1, 2, pw.pb_encode(fields)))
    payload = pw.snappy_compress(pw.pb_encode(serieses))
    raw = spark.createDataFrame([(bytearray(payload),)], "payload binary")
    rows = pw.remote_write(raw).collect()
    got = {
        (
            r["labels"]["__name__"],
            r["labels"]["job"],
            r["value"],
            r["timestamp_ns"],
        )
        for r in rows
    }
    assert got == truth


def test_remote_write_overflow_ts_dropped_not_fatal(spark):
    """A timestamp past int64-ns must drop that sample, not poison the
    Arrow batch (numpy infers uint64 and the safe int64 cast fails for
    every row in the batch otherwise)."""

    def lbl(n, v):
        return pw.pb_encode([(1, 2, n.encode()), (2, 2, v.encode())])

    def smp(val, ts_ms):
        return pw.pb_encode([(1, 1, struct.pack("<d", val)), (2, 0, ts_ms)])

    ts1 = pw.pb_encode(
        [(1, 2, lbl("__name__", "ok")), (2, 2, smp(1.0, 1000)),
         (2, 2, smp(2.0, 10**15))]  # second sample overflows int64 ns
    )
    payload = pw.snappy_compress(pw.pb_encode([(1, 2, ts1)]))
    raw = spark.createDataFrame([(bytearray(payload),)], "payload binary")
    rows = pw.remote_write(raw).collect()
    assert [(r["value"], r["timestamp_ns"]) for r in rows] == [(1.0, 10**9)]


def test_zipkin_spans_roundtrip_fuzz(spark):
    rng = random.Random(55)
    truth = set()
    payloads = []
    for _ in range(10):
        spans = []
        for _s in range(rng.randrange(1, 4)):
            tid = f"{rng.randrange(16**16):016x}"
            sid = f"{rng.randrange(16**16):016x}"
            name = rng.choice(NASTY[:7]) or "op"
            ts_us = rng.randrange(1, 2**52)
            dur_us = rng.randrange(1, 10**9)
            svc = rng.choice(["a", "b", "üñî"])
            spans.append(
                {
                    "traceId": tid,
                    "id": sid,
                    "name": name,
                    "timestamp": ts_us,
                    "duration": dur_us,
                    "localEndpoint": {"serviceName": svc},
                }
            )
            # decodeHexStr pads 16-char trace ids to 32 (zipkin_json.go:221)
            truth.add((tid.rjust(32, "0"), sid, name, ts_us * 1000, dur_us * 1000, svc))
        payloads.append((json.dumps(spans),))
    raw = spark.createDataFrame(payloads, "payload string")
    rows = ingest.zipkin_spans(raw).collect()
    got = {
        (r["trace_id"], r["span_id"], r["name"], r["timestamp_ns"],
         r["duration_ns"], r["service_name"])
        for r in rows
    }
    assert got == truth
    # NDJSON variant decodes the same spans (valid JSON has no raw newlines)
    nd = "\n".join(json.dumps(s) for p in payloads for s in json.loads(p[0]))
    nd_rows = ingest.zipkin_ndjson(
        spark.createDataFrame([(nd,)], "payload string")
    ).collect()
    assert {
        (r["trace_id"], r["span_id"], r["name"], r["timestamp_ns"],
         r["duration_ns"], r["service_name"])
        for r in nd_rows
    } == truth


def test_datadog_logs_roundtrip_fuzz(spark):
    rng = random.Random(77)
    truth = set()
    payloads = []
    for _ in range(12):
        logs = []
        for _l in range(rng.randrange(1, 4)):
            msg = rng.choice(NASTY)
            svc = rng.choice(["api", "web"])
            ts_ms = rng.randrange(1, 4 * 10**12)
            logs.append(
                {"message": msg, "service": svc, "status": "info",
                 "ddtags": "env:prod,team:x y", "timestamp": ts_ms}
            )
            # tagPattern drops "team:x y" (space can't appear in a tag
            # value and the value must run to ',' or end) — only env:prod
            # survives, per datadog_json.go:26.
            truth.add((msg, svc, "prod", ts_ms * 1_000_000))
        payloads.append((json.dumps(logs),))
    raw = spark.createDataFrame(payloads, "payload string")
    rows = ingest.datadog_logs(raw).collect()
    assert all("team" not in r["labels"] for r in rows)
    got = {
        (r["string"], r["labels"]["service"], r["labels"]["env"],
         r["timestamp_ns"])
        for r in rows
    }
    assert got == truth


def test_loki_push_shapes_roundtrip_fuzz(spark):
    """All four unmarshal.go stream shapes, randomly mixed; truth computed
    by an independent Python model of the reference's rules (type
    algebra, labels-string parse, ts handling)."""
    rng = random.Random(4242)
    truth = set()
    payloads = []
    for _ in range(25):
        streams = []
        for _s in range(rng.randrange(1, 3)):
            st = {}
            labels = {}
            mode = rng.choice(["stream", "labels", "both"])
            if mode in ("stream", "both"):
                st["stream"] = {"app": rng.choice(["a", "b"]),
                                "env": rng.choice(["p", "q"])}
                labels.update(st["stream"])
            if mode in ("labels", "both"):
                lv = rng.choice(["x", "y"])
                st["labels"] = f'{{job="{lv}", env="z"}}'
                labels.update({"job": lv, "env": "z"})  # labels pairs win
            key = tuple(sorted(labels.items()))
            if rng.random() < 0.5:
                vals = []
                for _v in range(rng.randrange(1, 3)):
                    ts = rng.randrange(1, 2**61)
                    line = rng.choice(NASTY[:7])
                    draw = rng.random()
                    if draw < 0.3:
                        num = round(rng.uniform(-10, 10), 3)
                        vals.append([str(ts), line, num])
                        truth.add((key, ts, line, num, 0))  # tp 3 → 0
                    elif draw < 0.5:
                        # NON-Number third element: the reference only
                        # sets the METRIC bit for a JSON Number token
                        # (decodeStreamValue jx.Number) — strings/bools
                        # stay LOG-only
                        vals.append(
                            [str(ts), line,
                             rng.choice(["5", "x", True, False])]
                        )
                        truth.add((key, ts, line, 0.0, 1))
                    else:
                        vals.append([str(ts), line])
                        truth.add((key, ts, line, 0.0, 1))
                st["values"] = vals
            else:
                ents = []
                for _v in range(rng.randrange(1, 3)):
                    ts = rng.randrange(1, 2**61)
                    if rng.random() < 0.3:
                        v = round(rng.uniform(0, 5), 2)
                        ents.append({"ts": str(ts), "value": v})
                        truth.add((key, ts, "", v, 2))
                    else:
                        line = rng.choice(NASTY[:7])
                        ents.append({"timestamp": str(ts), "line": line})
                        truth.add((key, ts, line, 0.0, 1))
                st["entries"] = ents
            streams.append(st)
        payloads.append((json.dumps({"streams": streams}),))
    raw = spark.createDataFrame(payloads, "payload string")
    rows = ingest.loki_push(raw).collect()
    got = {
        (tuple(sorted(r["labels"].items())), r["timestamp_ns"], r["string"],
         r["value"], r["type"])
        for r in rows
    }
    assert got == truth


def test_otlp_traces_json_pb_parity_fuzz(spark):
    """Randomized spans encoded BOTH as OTLP-JSON and protobuf must
    decode to identical rows through the two independent paths — the
    attr algebra (service-name candidates, resource-overwrites-span,
    dotted array/kvlist flatten, %f doubles, status/kind) has no
    divergence budget."""
    from gigapipe_spark.sources.ingest import otlp_traces

    rng = random.Random(31337)

    def rand_scalar():
        kind = rng.choice(["s", "b", "i", "d"])
        if kind == "s":
            v = rng.choice(["x", "with space", "ünï"])
            return {"stringValue": v}, pw.pb_encode([(1, 2, v.encode())])
        if kind == "b":
            v = rng.random() < 0.5
            return {"boolValue": v}, pw.pb_encode([(2, 0, 1 if v else 0)])
        if kind == "i":
            v = rng.randrange(-1000, 1000)
            return {"intValue": str(v)}, pw.pb_encode([(3, 0, v & (2**64 - 1))])
        v = round(rng.uniform(-100, 100), 3)
        return {"doubleValue": v}, pw.pb_encode(
            [(4, 1, struct.pack("<d", v))]
        )

    def rand_value():
        shape = rng.choice(["scalar", "scalar", "array", "kvlist"])
        if shape == "scalar":
            return rand_scalar()
        if shape == "array":
            items = [rand_scalar() for _ in range(rng.randrange(1, 3))]
            jv = {"arrayValue": {"values": [j for j, _ in items]}}
            pv = pw.pb_encode(
                [(5, 2, pw.pb_encode([(1, 2, p) for _, p in items]))]
            )
            return jv, pv
        items = [(f"k{i}", rand_scalar()) for i in range(rng.randrange(1, 3))]
        jv = {
            "kvlistValue": {
                "values": [{"key": k, "value": j} for k, (j, _) in items]
            }
        }
        pv = pw.pb_encode(
            [
                (
                    6,
                    2,
                    pw.pb_encode(
                        [
                            (1, 2, pw.pb_encode([(1, 2, k.encode()), (2, 2, p)]))
                            for k, (_, p) in items
                        ]
                    ),
                )
            ]
        )
        return jv, pv

    json_spans, pb_rs = [], []
    for i in range(15):
        tid, sid = f"{rng.randrange(16**32):032x}", f"{rng.randrange(16**16):016x}"
        n_attrs = rng.randrange(0, 3)
        attrs = []
        for j in range(n_attrs):
            key = rng.choice(["a.b", "peer.service", "faas.name", "plain"])
            attrs.append((key, rand_value()))
        res_attrs = []
        if rng.random() < 0.7:
            res_attrs.append(
                ("service.name", ({"stringValue": "svc"}, pw.pb_encode([(1, 2, b"svc")])))
            )
        kind = rng.choice([0, 1, 2, 3, 4, 5])
        status = rng.choice([0, 1, 2])
        start = rng.randrange(1, 2**60)
        dur = rng.randrange(1, 10**9)
        json_spans.append(
            {
                "resource": {
                    "attributes": [
                        {"key": k, "value": j} for k, (j, _) in res_attrs
                    ]
                },
                "span": {
                    "traceId": tid,
                    "spanId": sid,
                    "name": f"op{i}",
                    "kind": str(kind),
                    "status": {"code": str(status)},
                    "startTimeUnixNano": str(start),
                    "endTimeUnixNano": str(start + dur),
                    "attributes": [
                        {"key": k, "value": j} for k, (j, _) in attrs
                    ],
                },
            }
        )
        span_pb = pw.pb_encode(
            [
                (1, 2, bytes.fromhex(tid)),
                (2, 2, bytes.fromhex(sid)),
                (5, 2, f"op{i}".encode()),
                (3, 0, kind),
                (7, 1, struct.pack("<Q", start)),
                (8, 1, struct.pack("<Q", start + dur)),
                *[(9, 2, pw.pb_encode([(1, 2, k.encode()), (2, 2, p)]))
                  for k, (_, p) in attrs],
                (15, 2, pw.pb_encode([(3, 0, status)])),
            ]
        )
        scope = pw.pb_encode([(2, 2, span_pb)])
        resource = pw.pb_encode(
            [(1, 2, pw.pb_encode([(1, 2, k.encode()), (2, 2, p)]))
             for k, (_, p) in res_attrs]
        )
        pb_rs.append((1, 2, pw.pb_encode([(1, 2, resource), (2, 2, scope)])))

    payload = json.dumps(
        {
            "resourceSpans": [
                {
                    "resource": sp["resource"],
                    "scopeSpans": [{"spans": [sp["span"]]}],
                }
                for sp in json_spans
            ]
        }
    )
    json_rows = otlp_traces(
        spark.createDataFrame([(payload,)], "payload string")
    ).collect()
    pb_rows = pw.otlp_traces_pb(
        spark.createDataFrame(
            [(bytearray(pw.pb_encode(pb_rs)),)], "payload binary"
        )
    ).collect()

    def norm(rows):
        return sorted(
            (r["trace_id"], r["span_id"], r["name"], r["timestamp_ns"],
             r["duration_ns"], r["service_name"],
             tuple(sorted(r["attrs"].items())))
            for r in rows
        )

    assert norm(json_rows) == norm(pb_rows)


def test_otlp_logs_json_pb_parity_fuzz(spark):
    """Randomized log records encoded as OTLP-JSON and protobuf decode to
    identical rows: SanitizeKey/SanitizeValue algebra, level label, trace
    context, observed-time fallback."""
    from gigapipe_spark.sources.ingest import otlp_logs

    rng = random.Random(2718)

    def rand_scalar():
        kind = rng.choice(["s", "b", "i", "d"])
        if kind == "s":
            v = rng.choice(["x", "sp ace", "üñî"])
            return {"stringValue": v}, pw.pb_encode([(1, 2, v.encode())])
        if kind == "b":
            v = rng.random() < 0.5
            return {"boolValue": v}, pw.pb_encode([(2, 0, 1 if v else 0)])
        if kind == "i":
            v = rng.randrange(-10**6, 10**6)
            return {"intValue": str(v)}, pw.pb_encode([(3, 0, v & (2**64 - 1))])
        v = round(rng.uniform(-1000, 1000), 4)
        return {"doubleValue": v}, pw.pb_encode([(4, 1, struct.pack("<d", v))])

    def rand_value():
        shape = rng.choice(["scalar", "scalar", "array", "kvlist"])
        if shape == "scalar":
            return rand_scalar()
        if shape == "array":
            items = [rand_scalar() for _ in range(rng.randrange(1, 3))]
            return (
                {"arrayValue": {"values": [j for j, _ in items]}},
                pw.pb_encode([(5, 2, pw.pb_encode([(1, 2, p) for _, p in items]))]),
            )
        items = [(f"9k.{i}", rand_scalar()) for i in range(rng.randrange(1, 3))]
        return (
            {"kvlistValue": {"values": [{"key": k, "value": j} for k, (j, _) in items]}},
            pw.pb_encode(
                [(6, 2, pw.pb_encode(
                    [(1, 2, pw.pb_encode([(1, 2, k.encode()), (2, 2, p)]))
                     for k, (_, p) in items]))]
            ),
        )

    json_rls, pb_rls = [], []
    for i in range(12):
        attrs = [
            (rng.choice(["a.b", "9lead", "plain"]), rand_value())
            for _ in range(rng.randrange(0, 3))
        ]
        body_j, body_p = rand_value()
        sev = rng.choice(["", "ERROR", "warn"])
        ts = rng.randrange(1, 2**60)
        tid = f"{rng.randrange(1, 16**32):032x}"
        sid = f"{rng.randrange(1, 16**16):016x}"
        rec_j = {
            "timeUnixNano": str(ts),
            "severityText": sev,
            "traceId": tid,
            "spanId": sid,
            "body": body_j,
            "attributes": [{"key": k, "value": j} for k, (j, _) in attrs],
        }
        rec_p = pw.pb_encode(
            [
                (1, 1, struct.pack("<Q", ts)),
                (3, 2, sev.encode()),
                (9, 2, bytes.fromhex(tid)),
                (10, 2, bytes.fromhex(sid)),
                (5, 2, body_p),
                *[(6, 2, pw.pb_encode([(1, 2, k.encode()), (2, 2, p)]))
                  for k, (_, p) in attrs],
            ]
        )
        res = [("service.name", ({"stringValue": "api"},
                pw.pb_encode([(1, 2, b"api")])))]
        json_rls.append(
            {
                "resource": {
                    "attributes": [{"key": k, "value": j} for k, (j, _) in res]
                },
                "scopeLogs": [{"logRecords": [rec_j]}],
            }
        )
        resource = pw.pb_encode(
            [(1, 2, pw.pb_encode([(1, 2, k.encode()), (2, 2, p)]))
             for k, (_, p) in res]
        )
        scope = pw.pb_encode([(2, 2, rec_p)])
        pb_rls.append((1, 2, pw.pb_encode([(1, 2, resource), (2, 2, scope)])))

    json_rows = otlp_logs(
        spark.createDataFrame(
            [(json.dumps({"resourceLogs": json_rls}),)], "payload string"
        )
    ).collect()
    pb_rows = pw.otlp_logs_pb(
        spark.createDataFrame(
            [(bytearray(pw.pb_encode(pb_rls)),)], "payload binary"
        )
    ).collect()

    def norm(rows):
        return sorted(
            (r["timestamp_ns"], r["string"], tuple(sorted(r["labels"].items())))
            for r in rows
        )

    assert norm(json_rows) == norm(pb_rows)


def test_elastic_bulk_state_machine_fuzz(spark):
    """Random action/doc/delete/update line sequences vs an independent
    Python model of elastic.go's per-line state machine."""
    rng = random.Random(909)
    bodies, truth = [], set()
    for _p in range(15):
        lines = []
        state = None  # None = no live labels
        for _l in range(rng.randrange(2, 10)):
            r = rng.random()
            if r < 0.3:
                idx = rng.choice(["logs", "audit", "app"])
                doc_id = str(rng.randrange(100))
                lines.append(
                    json.dumps({"index": {"_index": idx, "_id": doc_id}})
                )
                state = {"type": "elastic", "_index": idx, "_id": doc_id}
            elif r < 0.4:
                lines.append(json.dumps({"delete": {"_index": "x"}}))
                state = None
            elif r < 0.5:
                lines.append(json.dumps({"update": {"_id": "9"}}))
                state = None
            else:
                doc = json.dumps({"m": rng.choice(NASTY[:7])})
                lines.append(doc)
                if state is not None:
                    truth.add(
                        (doc, state["_index"], state["_id"], "elastic")
                    )
        bodies.append(("\n".join(lines),))
    raw = spark.createDataFrame(bodies, "payload string")
    rows = ingest.elastic_bulk(raw).collect()
    got = {
        (r["string"], r["labels"].get("_index"), r["labels"].get("_id"),
         r["labels"]["type"])
        for r in rows
    }
    assert got == truth


def test_datadog_metrics_point_state_fuzz(spark):
    """Random point sequences with missing fields vs a Python model of
    the decoder's loop-carried (timestamp, value) state."""
    rng = random.Random(606)
    payloads, truth = [], set()
    for p in range(12):
        series = []
        for s in range(rng.randrange(1, 3)):
            metric = f"m{p}_{s}"
            pts = []
            ts_state, val_state = 7777, 0.0  # now_ns=7777 below
            for _ in range(rng.randrange(1, 5)):
                pt = {}
                if rng.random() < 0.7:
                    t = rng.randrange(1, 2**30)
                    pt["timestamp"] = t
                    ts_state = t * 10**9
                if rng.random() < 0.7:
                    v = round(rng.uniform(-50, 50), 3)
                    pt["value"] = v
                    val_state = v
                pts.append(pt)
                truth.add((metric, ts_state, val_state))
            series.append({"metric": metric, "points": pts})
        payloads.append((json.dumps({"series": series}),))
    raw = spark.createDataFrame(payloads, "payload string")
    rows = ingest.datadog_metrics(raw, now_ns=7777).collect()
    got = {
        (r["labels"]["__name__"], r["timestamp_ns"], r["value"]) for r in rows
    }
    assert got == truth


def test_influx_message_logfmt_fuzz(spark):
    """Random message+field lines vs a Python logfmt model (sorted
    non-message keys, reference quoting rules)."""
    rng = random.Random(303)

    def logfmt_val(v: str) -> str:
        if v == "" or any(c in v for c in ' ="'):
            return '"' + v.replace("\\", "\\\\").replace('"', '\\"') + '"'
        return v

    lines, truth = [], set()
    for i in range(25):
        msg = rng.choice(["plain", "two words", 'q"uote', "a=b"])
        extras = {}
        for j in range(rng.randrange(0, 3)):
            k = f"k{j}"
            kind = rng.choice(["i", "f", "b", "s"])
            if kind == "i":
                n = rng.randrange(-99, 99)
                extras[k] = (f"{n}i", str(n))
            elif kind == "f":
                f_ = round(rng.uniform(0, 9), 2)
                extras[k] = (repr(f_), repr(f_))
            elif kind == "b":
                extras[k] = ("true", "true")
            else:
                extras[k] = ('"str val"', "str val")
        enc_msg = '"' + msg.replace("\\", "\\\\").replace('"', '\\"') + '"'
        fields = ",".join(
            [f"message={enc_msg}"] + [f"{k}={raw}" for k, (raw, _) in extras.items()]
        )
        ts = 1_000_000_000 + i
        lines.append((f"app,env=t {fields} {ts}",))
        if not extras:
            expected = msg
        else:
            parts = [f"message={logfmt_val(msg)}"] + [
                f"{k}={logfmt_val(disp)}"
                for k, (_, disp) in sorted(extras.items())
            ]
            expected = " ".join(parts)
        truth.add((expected, ts))
    raw = spark.createDataFrame(lines, "line string")
    rows = ingest.influx_line(raw).collect()
    assert {(r["string"], r["timestamp_ns"]) for r in rows} == truth
