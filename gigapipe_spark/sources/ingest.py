"""Ingestion decoders: wire formats → the unified samples/time_series
model (ref: writer/utils/unmarshal/*).

Each decoder is a DataFrame → DataFrame transform over a column of raw
payload strings (one HTTP body or line per row), built on from_json /
regexp — JVM-side, streaming-compatible (the same transforms run under
readStream). Protobuf variants of these endpoints decode to the same
shapes; JSON is the wire format exercised here.

  loki_push       ref: unmarshal.go:36        {"streams":[{"stream":{..},"values":[[ts,line],..]}]}
  influx_line     ref: influx.go:42           measurement,tag=v field=1.5 ts
  elastic_bulk    ref: elastic.go:29,56       NDJSON doc lines
  zipkin_spans    ref: zipkin_json.go:42      Zipkin v2 JSON arrays
  otlp_logs       ref: otlplogs.go + otlp.go:135-154 (dotted-prefix attr flattening)

All decoders end in the same normalized tuple the reference funnels into
fingerprinting: (labels map, timestamp_ns, string|value).
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gigapipe_spark.model.fingerprint import fingerprint_col
from gigapipe_spark.planutil import nonpushable

_LOKI_SCHEMA = (
    "struct<streams: array<struct<stream: map<string,string>,"
    " labels: string,"
    " values: array<array<variant>>,"
    " entries: array<struct<ts: string, timestamp: string,"
    " line: string, value: double>>>>>"
)

# parseLabelsLokiFormat (unmarshal.go:313-351): {ident="value",...} —
# idents are Go scanner idents, values are quoted strings with escapes.
_LOKI_LABELS_PAT = r'([A-Za-z_][A-Za-z0-9_]*)\s*=\s*"((?:[^"\\]|\\.)*)"'


def sanitize_labels(labels: Column) -> Column:
    """Reference's sanitizeLabels (unmarshal.go:272-283), JVM-side: label
    names keep only [a-zA-Z0-9_] (offending chars → '_', plus a leading
    digit → '_'); values longer than 100 chars truncate to 100 + '...'.
    Shared by every ingest path so all wire formats produce the same
    series for the same logical labels. (Pathological payloads whose keys
    collide only after sanitization raise under Spark's default duplicate-
    map-key policy — the reference keeps the first pair.)"""
    fixed = F.transform_keys(
        labels,
        lambda k, v: F.regexp_replace(
            F.regexp_replace(k, "[^a-zA-Z0-9_]", "_"), "^[^a-zA-Z_]", "_"
        ),
    )
    return F.transform_values(
        fixed,
        lambda k, v: F.when(
            F.length(v) > 100, F.concat(F.substring(v, 1, 100), F.lit("..."))
        ).otherwise(v),
    )


def _normalize(labels: Column, ts_ns: Column, line: Column, value: Column, typ: int) -> list[Column]:
    labels = sanitize_labels(labels)
    return [
        fingerprint_col(labels).alias("fingerprint"),
        labels.alias("labels"),
        ts_ns.cast("long").alias("timestamp_ns"),
        value.cast("double").alias("value"),
        line.cast("string").alias("string"),
        F.lit(typ).cast("byte").alias("type"),
    ]


# Service-name discovery candidates, in the reference's source order
# (builder.go:270-284).
_SERVICE_NAME_CANDIDATES = [
    "service",
    "app",
    "application",
    "app_name",
    "name",
    "app_kubernetes_io_name",
    "container",
    "container_name",
    "k8s_container_name",
    "component",
    "workload",
    "job",
    "k8s_job_name",
]

_METADATA_LABELS = ("__metric_type__", "__metric_help__", "__metric_unit__")


def finalize_entries(df: DataFrame, ttl_days: int = 0) -> DataFrame:
    """Writer-side shared post-decode stage (ref: builder.go onEntries
    :304-380 + discoverServiceName :286-302): every wire format funnels
    through this before the fan-out writer.

    - `__metric_type__`/`__metric_help__`/`__metric_unit__` labels are
      peeled into a `metadata` JSON column (empty string when none set,
      matching Entry.ToJSON) and removed from the label set.
    - `__ttl_days__` overrides the batch TTL when the writer-level
      ttl_days is 0 and the value parses as a small int; the label is
      removed ONLY in that ttl_days == 0 case — with a nonzero
      writer-level TTL the reference keeps it in the label set and the
      fingerprint (builder.go onEntries: the `continue` that drops the
      label sits inside the `ttlDays == 0` branch).
    - service_name discovery: when no service_name label exists, the
      first present candidate label (reference order; the reference takes
      the last match in label append order, unobservable on a map) is
      copied to service_name, falling back to "unknown" when no candidate
      matches — every stored series has a service_name. A candidate
      present with an EMPTY value suppresses the label entirely
      (serviceName != "" check in the reference).
    - fingerprint is recomputed over the filtered labels, so special
      labels never split series.
    """
    lbl = F.col("labels")
    has_meta = F.lit(False)
    for k in _METADATA_LABELS:
        has_meta = has_meta | lbl.getItem(k).isNotNull()
    meta_json = F.when(
        has_meta,
        F.to_json(
            F.struct(
                F.coalesce(lbl.getItem("__metric_type__"), F.lit("")).alias("type"),
                F.coalesce(lbl.getItem("__metric_help__"), F.lit("")).alias("help"),
                F.coalesce(lbl.getItem("__metric_unit__"), F.lit("")).alias("unit"),
            )
        ),
    ).otherwise(F.lit(""))
    parsed_ttl = F.expr("try_cast(labels['__ttl_days__'] as smallint)")
    # ttl_days is a PYTHON constant: branch here, not in the plan —
    # F.when(F.lit(ttl_days) == 0, ...) built a literal '0 == 0'
    # predicate that log4j warned about on every single flush
    ttl = (
        F.coalesce(parsed_ttl, F.lit(0)) if ttl_days == 0 else F.lit(ttl_days)
    ).cast("int")
    special = set(_METADATA_LABELS) | (
        {"__ttl_days__"} if ttl_days == 0 else set()
    )
    filtered = F.map_filter(lbl, lambda k, v: ~k.isin(*special))
    cand = F.coalesce(
        *[lbl.getItem(k) for k in _SERVICE_NAME_CANDIDATES], F.lit("unknown")
    )
    filtered = F.when(
        lbl.getItem("service_name").isNotNull() | (cand == ""), filtered
    ).otherwise(
        F.map_concat(filtered, F.create_map(F.lit("service_name"), cand))
    )
    # metadata/ttl extract against the ORIGINAL labels, then the map is
    # replaced; fingerprint recomputes over the filtered map.
    out = df.select(
        "labels",
        "timestamp_ns",
        "value",
        "string",
        "type",
        meta_json.alias("metadata"),
        ttl.alias("ttl_days"),
    ).withColumn("labels", filtered)
    return out.select(
        fingerprint_col(F.col("labels")).alias("fingerprint"),
        "labels",
        "timestamp_ns",
        "value",
        "string",
        "type",
        "metadata",
        "ttl_days",
    )


def _unquote(raw: Column) -> Column:
    """JSON-unescape a raw (already-matched) quoted-string body, JVM-side:
    wrap it back into a one-element JSON array and let the parser handle
    \\n, \\", \\\\, \\uXXXX — the same escapes strconv.Unquote resolves
    in the reference."""
    return F.get(
        F.from_json(F.concat(F.lit('["'), raw, F.lit('"]')), "array<string>"), 0
    )


def loki_push(raw: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Loki push API JSON → samples rows (ref: unmarshal.go:36-236).

    All four reference stream shapes decode:
      - `stream` label map and/or legacy `labels` string
        (parseLabelsLokiFormat, unmarshal.go:313) — both feed one label
        set, later pairs winning;
      - `values` triples [ts_ns, line, numeric?]: the optional third
        element sets the METRIC bit with its value
        (decodeStreamValue:127-165);
      - `entries` objects {ts|timestamp, line, value} with RFC3339 or
        integer-ns timestamps (decodeStreamEntry:185-230, parseTime:284).
    Type algebra is the reference's: line → LOG(1), value → METRIC(2),
    both → 0 ("tp == 3 → 0"). Rows whose timestamp fails to parse drop
    (per-row isolation; the reference 400s the whole payload).
    """
    parsed = raw.select(F.from_json(F.col(payload_col), _LOKI_SCHEMA).alias("p"))
    streams = parsed.select(F.explode("p.streams").alias("s"))

    entry_t = "array<struct<key: string, value: string>>"
    stream_entries = F.map_entries(
        F.coalesce(F.col("s.stream"), F.expr("map()"))
    ).cast(entry_t)
    lbl_str = F.coalesce(F.col("s.labels"), F.lit(""))
    label_entries = F.zip_with(
        F.regexp_extract_all(lbl_str, F.lit(_LOKI_LABELS_PAT), 1),
        F.transform(
            F.regexp_extract_all(lbl_str, F.lit(_LOKI_LABELS_PAT), 2), _unquote
        ),
        lambda k, v: F.struct(k.alias("key"), v.alias("value")),
    ).cast(entry_t)
    labels = _entries_map(F.concat(stream_entries, label_entries))

    # values parse as array<array<variant>> so the third element's raw
    # JSON token type survives from_json: the reference sets the METRIC
    # bit only for a JSON Number (decodeStreamValue: `d.Next() !=
    # jx.Number` → Skip), so ["ts","line","5"] must stay a LOG-only row
    # while ["ts","line",5] is LOG+METRIC — indistinguishable under the
    # old array<string> schema.
    def _vstr(e: Column) -> Column:
        return F.try_variant_get(e, "$", "string")

    def _is_number(e: Column) -> Column:
        return F.coalesce(
            F.schema_of_variant(e).rlike(
                "^(BIGINT|DOUBLE|FLOAT|DECIMAL|INT|SMALLINT|TINYINT)"
            ),
            F.lit(False),
        )

    row_t = "array<struct<ts: bigint, line: string, val: double, tp: int>>"
    v_rows = F.transform(
        F.coalesce(F.col("s.values"), F.array()),
        lambda v: F.struct(
            _vstr(F.try_element_at(v, F.lit(1))).try_cast("long").alias("ts"),
            F.coalesce(_vstr(F.try_element_at(v, F.lit(2))), F.lit("")).alias(
                "line"
            ),
            F.coalesce(
                F.when(
                    _is_number(F.try_element_at(v, F.lit(3))),
                    F.try_variant_get(
                        F.try_element_at(v, F.lit(3)), "$", "double"
                    ),
                ),
                F.lit(0.0),
            ).alias("val"),
            (
                F.when(F.size(v) >= 2, F.lit(1)).otherwise(F.lit(0))
                + F.when(
                    _is_number(F.try_element_at(v, F.lit(3))), F.lit(2)
                ).otherwise(F.lit(0))
            ).alias("tp"),
        ),
    ).cast(row_t)

    def _parse_time(c: Column) -> Column:
        return F.when(
            c.rlike("[:\\-TZ]"),
            F.unix_micros(F.try_to_timestamp(c)) * 1000,
        ).otherwise(c.try_cast("long"))

    e_rows = F.transform(
        F.coalesce(F.col("s.entries"), F.array()),
        lambda e: F.struct(
            _parse_time(F.coalesce(e["ts"], e["timestamp"])).alias("ts"),
            F.coalesce(e["line"], F.lit("")).alias("line"),
            F.coalesce(e["value"], F.lit(0.0)).alias("val"),
            (
                F.when(e["line"].isNotNull(), F.lit(1)).otherwise(F.lit(0))
                + F.when(e["value"].isNotNull(), F.lit(2)).otherwise(F.lit(0))
            ).alias("tp"),
        ),
    ).cast(row_t)

    rows = streams.select(
        labels.alias("labels"), F.explode(F.concat(v_rows, e_rows)).alias("r")
    ).filter(F.col("r.ts").isNotNull())
    tp = F.when(F.col("r.tp") == 3, F.lit(0)).otherwise(F.col("r.tp"))
    san = sanitize_labels(F.col("labels"))
    return rows.select(
        fingerprint_col(san).alias("fingerprint"),
        san.alias("labels"),
        F.col("r.ts").alias("timestamp_ns"),
        F.col("r.val").alias("value"),
        F.col("r.line").alias("string"),
        tp.cast("byte").alias("type"),
    )


_INFLUX_PRECISION_NS = {"ns": 1, "n": 1, "us": 10**3, "u": 10**3,
                        "ms": 10**6, "s": 10**9}


def _logfmt_value(v: Column) -> Column:
    """logfmt value encoding (go-logfmt EncodeKeyvals): quote when the
    value contains a space, '=', '"' or is empty; escape backslash and
    quote inside."""
    needs = (v == "") | v.rlike('[ ="]')
    esc = F.regexp_replace(F.regexp_replace(v, r"\\", r"\\\\"), '"', '\\\\"')
    return F.when(needs, F.concat(F.lit('"'), esc, F.lit('"'))).otherwise(v)


def influx_line(
    raw: DataFrame, line_col: str = "line", precision: str = "ns",
    now_ns: int = 0,
) -> DataFrame:
    """InfluxDB line protocol → samples (ref: influx.go:42-96).

    measurement[,tag=v...] field=value[,field2=v2...] [timestamp]

    Reference semantics, not the common composite-name shorthand:
      - labels carry `measurement` as its OWN label plus the tags;
        each numeric field emits a metric sample with `__name__` =
        sanitizeMetricName(field key) (influx.go:54,75-90) — NOT
        measurement_field;
      - only int64 (`42i`) and float fields become metrics; string and
        bool fields are skipped (influx.go:80-86);
      - a `message` field switches the whole point to ONE log row
        (influx.go:62-73): the line is the bare message when it is the
        only field, else logfmt `message=... k=v ...` (getMessage:15-35;
        the reference's field order after message is Go map order —
        unobservable — so the remaining keys encode sorted here);
      - `precision` scales epoch timestamps like the telegraf parser's
        SetTimePrecision (influx.go:44); absent timestamps stamp
        `now_ns` (reference uses wall clock).
    Escape-aware tokenization (`\\,` `\\ ` `\\=` `\\\\`) stays in JVM
    regex expressions.
    """
    # Escape-aware tokenization (the reference parses with the official
    # telegraf parser, which honors `\,` `\ ` `\=` `\\` in identifiers —
    # influx.go:9): an "atom" is any char except the delimiter set, or a
    # backslash-escaped char, so escaped delimiters never split.
    line = F.col(line_col)
    # token atom: a quoted string (may contain raw spaces/commas) or an
    # unescaped-space-free char; `\"...\"` strings in the field section
    # keep their spaces without escaping in line protocol
    atom_sp = r'(?:"(?:[^"\\]|\\.)*"|[^ \\]|\\.)'
    sec1 = F.regexp_extract(line, rf"^({atom_sp}+) ", 1)  # measurement,tags
    fields_tok = F.regexp_extract(line, rf"^{atom_sp}+ ({atom_sp}+)", 1)

    def unescape(c):
        return F.regexp_replace(c, r"\\([,= \\])", "$1")

    measurement = unescape(F.regexp_extract(sec1, r"^((?:[^,\\]|\\.)+)", 1))
    tags_str = F.regexp_extract(sec1, r"^(?:[^,\\]|\\.)+,(.*)$", 1)
    tag_pairs = F.regexp_extract_all(tags_str, F.lit(r"((?:[^,\\]|\\.)+)"), 1)
    tags = F.map_from_entries(
        F.transform(
            tag_pairs,
            lambda p: F.struct(
                unescape(F.regexp_extract(p, r"^((?:[^=\\]|\\.)+)=", 1)).alias("k"),
                unescape(
                    F.regexp_extract(p, r"^(?:[^=\\]|\\.)+=(.*)$", 1)
                ).alias("v"),
            ),
        )
    )
    ts = F.nullif(
        F.regexp_extract(line, r" (\d+)\s*$", 1), F.lit("")
    ).try_cast("long")
    field_pairs = F.regexp_extract_all(
        fields_tok, F.lit(r'((?:"(?:[^"\\]|\\.)*"|[^,\\]|\\.)+)'), 1
    )
    fields = F.map_from_entries(
        F.transform(
            field_pairs,
            lambda p: F.struct(
                unescape(F.regexp_extract(p, r"^((?:[^=\\]|\\.)+)=", 1)).alias("k"),
                F.regexp_extract(p, r"^(?:[^=\\]|\\.)+=(.*)$", 1).alias("v"),
            ),
        )
    )
    mult = _INFLUX_PRECISION_NS.get(precision, 1)
    ts_ns = F.coalesce(ts * F.lit(mult), F.lit(now_ns))

    # Both consumers below FILTER on fields-derived predicates
    # (message-present, numeric-value). Those filters can never prune
    # at the scan — fields is per-row extraction output — but pushdown
    # substitutes the whole tokenize/extract chain into each Filter
    # condition (dupescan: 29–41 regexp_extract in-Filter per entry)
    # while the projection re-runs it for survivors. The nonpushable
    # barrier materializes the fields map once per row and keeps the
    # filters above it (mechanism: planutil.nonpushable).
    parsed = raw.select(
        measurement.alias("meas"), tags.alias("tags"), ts_ns.alias("ts"),
        nonpushable(fields).alias("fields"),
    )

    def decoded_str(v: Column) -> Column:
        # "quoted" string token → content with \" \\ unescaped
        inner = F.regexp_extract(v, r'^"(.*)"$', 1)
        return F.regexp_replace(inner, r'\\(["\\])', "$1")

    def display_val(v: Column) -> Column:
        # typed token → the string logfmt would print for it
        return (
            F.when(v.rlike('^".*"$'), decoded_str(v))
            .when(v.rlike("^-?\\d+i$"), F.regexp_replace(v, "i$", ""))
            .when(v.rlike("^(t|T|true|True|TRUE)$"), F.lit("true"))
            .when(v.rlike("^(f|F|false|False|FALSE)$"), F.lit("false"))
            .otherwise(v)
        )

    base_labels = F.map_concat(
        F.create_map(F.lit("measurement"), F.col("meas")), F.col("tags")
    )

    # --- log path: a `message` field present (influx.go:62-73)
    msg_raw = F.col("fields").getItem("message")
    others = F.array_sort(
        F.filter(F.map_keys(F.col("fields")), lambda k: k != "message")
    )
    logfmt_line = F.concat_ws(
        " ",
        F.concat(F.lit("message="), _logfmt_value(display_val(msg_raw))),
        F.concat_ws(
            " ",
            F.transform(
                others,
                lambda k: F.concat(
                    k,
                    F.lit("="),
                    _logfmt_value(display_val(F.col("fields").getItem(k))),
                ),
            ),
        ),
    )
    log_line = F.when(
        F.size(F.col("fields")) == 1, display_val(msg_raw)
    ).otherwise(logfmt_line)
    log_rows = parsed.filter(msg_raw.isNotNull()).select(
        *_normalize(base_labels, F.col("ts"), log_line, F.lit(0.0), 1)
    )

    # --- metric path: one sample per int/float field (influx.go:75-90)
    exploded = parsed.filter(msg_raw.isNull()).select(
        "meas", "tags", "ts", F.explode("fields").alias("fkey", "fval")
    )
    numeric = F.col("fval").rlike(r"^-?\d+i$") | F.col("fval").rlike(
        r"^-?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?$"
    )
    name = F.regexp_replace(
        F.col("fkey"), "(^[^a-zA-Z_]|[^a-zA-Z0-9_])", "_"
    )
    labels = F.map_concat(
        F.create_map(F.lit("measurement"), F.col("meas")),
        F.col("tags"),
        F.create_map(F.lit("__name__"), name),
    )
    value = F.regexp_replace(F.col("fval"), r"i$", "").try_cast("double")
    metric_rows = exploded.filter(numeric).select(
        *_normalize(labels, F.col("ts"), F.lit(""), value, 2)
    )
    return metric_rows.unionByName(log_rows)


_ELASTIC_ACTION_SCHEMA = (
    "struct<`index`: map<string,string>, `create`: map<string,string>,"
    " `delete`: map<string,string>, `update`: map<string,string>>"
)


def elastic_bulk(
    raw: DataFrame,
    payload_col: str = "payload",
    target: str = "",
    now_ns: int = 0,
) -> DataFrame:
    """Elastic `_bulk` NDJSON → log samples (ref: elastic.go:56-137).

    The reference decoder is STATEFUL across lines: an `index`/`create`
    action line sets the label state — {type: elastic} plus `_index`
    from the route target when set, plus the action object's own string
    fields (skipping `type`, and `_index` when the target already
    provided it, decodeCreateObj:116-137) — and every following DOC line
    emits one log row whose string is the RAW LINE (the document is
    stored verbatim; its fields do NOT become labels) stamped at ingest
    time (`now_ns` here). `delete`/`update` actions clear the state, so
    their payload lines emit nothing; doc lines before any action are
    dropped (decodeLine:105-108).

    Input is one `_bulk` body per row; line order is preserved via
    posexplode, and the label state propagates with a per-payload
    last(ignoreNulls) window — the Spark expression of the reference's
    line-scan state machine. Non-JSON-object doc lines drop (per-line
    isolation; the reference fails the whole payload).
    """
    from pyspark.sql import Window

    # payload id assigned BEFORE the explode (inside the same select it
    # would evaluate once per exploded row and break the state window)
    lines = (
        raw.select(
            F.monotonically_increasing_id().alias("__pid"),
            F.col(payload_col).alias("__body"),
        )
        .select(
            "__pid",
            F.posexplode(F.split(F.col("__body"), "\n")).alias("__lno", "line"),
        )
        .filter(F.length("line") > 0)
    )
    # ONE action parse per line, materialized: the state-marker CASE
    # below references the parsed struct ~6x across its conditions and
    # branch values, and branch values are excluded from codegen
    # subexpression elimination — inlining the from_json here re-parsed
    # the action line per reference.
    act = F.col("__act")
    entry_t = "array<struct<key: string, value: string>>"
    base = [
        F.struct(F.lit("type").alias("key"), F.lit("elastic").alias("value"))
    ]
    if target:
        base.append(
            F.struct(F.lit("_index").alias("key"), F.lit(target).alias("value"))
        )

    def action_entries(obj: Column) -> Column:
        skip = ["type"] + (["_index"] if target else [])
        return F.concat(
            F.array(*base).cast(entry_t),
            F.filter(
                F.map_entries(obj), lambda e: ~e["key"].isin(*skip)
            ).cast(entry_t),
        )

    create_obj = F.coalesce(act["index"], act["create"])
    # state marker: entries for index/create, empty array for
    # delete/update (reset), null for doc lines (no state change)
    marker = (
        F.when(create_obj.isNotNull(), action_entries(create_obj))
        .when(
            act["delete"].isNotNull() | act["update"].isNotNull(),
            F.array().cast(entry_t),
        )
        .otherwise(F.lit(None).cast(entry_t))
    )
    classified = lines.select(
        "__pid",
        "__lno",
        "line",
        F.from_json(F.col("line"), _ELASTIC_ACTION_SCHEMA).alias("__act"),
    ).select("__pid", "__lno", "line", marker.alias("__marker"))
    w = (
        Window.partitionBy("__pid")
        .orderBy("__lno")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    state = F.last("__marker", ignorenulls=True).over(w)
    docs = (
        classified.withColumn("__state", state)
        .filter(F.col("__marker").isNull())  # doc lines only
        .filter(F.size(F.col("__state")) > 0)  # need a live action state
        # doc must be a JSON object (the reference errors otherwise)
        .filter(F.from_json(F.col("line"), "map<string,string>").isNotNull())
    )
    return docs.select(
        *_normalize(
            _entries_map(F.col("__state")),
            F.lit(now_ns),
            F.col("line"),
            F.lit(0.0),
            1,
        )
    )


def elastic_doc(
    raw: DataFrame,
    payload_col: str = "payload",
    target_col: str = "target",
    id_col: str | None = "doc_id",
    ingest_ts_col: str = "ingest_ts_ns",
) -> DataFrame:
    """Elastic single-document routes /{target}/_doc[/{id}] and
    /{target}/_create/{id} (ref: elastic.go:9-14 + ElasticUnmarshal
    elastic.go:29-36): the WHOLE body is the log line; labels are
    {type: elastic, _index: target} plus _id when the route carries one.
    The reference stamps arrival time; deterministic here via an
    ingest-time column the HTTP layer fills."""
    labels = F.create_map(
        F.lit("type"), F.lit("elastic"), F.lit("_index"), F.col(target_col)
    )
    if id_col is not None and id_col in raw.columns:
        with_id = F.map_concat(
            labels, F.create_map(F.lit("_id"), F.col(id_col).cast("string"))
        )
        labels = F.when(F.col(id_col).isNotNull(), with_id).otherwise(labels)
    return raw.select(
        *_normalize(labels, F.col(ingest_ts_col), F.col(payload_col), F.lit(0.0), 1)
    )


_ZIPKIN_SCHEMA = (
    "array<struct<id: string, traceId: string, parentId: string, name: string,"
    " timestamp: string, duration: string, kind: string,"
    " localEndpoint: struct<serviceName: string>,"
    " remoteEndpoint: struct<serviceName: string>,"
    " tags: map<string,string>>>"
)


def _zipkin_hex(c: Column, length: int) -> Column:
    """decodeHexStr (zipkin_json.go:221-241): left-pad with '0' to
    `length` hex chars, truncate beyond, reject non-hex (→ NULL → the row
    drops; the reference 400s the payload)."""
    padded = F.substring(F.lpad(c, length, "0"), 1, length)
    return F.when(
        (F.length(c) > 0) & padded.rlike("^[0-9a-fA-F]+$"), F.lower(padded)
    )


def zipkin_spans(raw: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Zipkin v2 JSON span arrays → spans rows (ref: zipkin_json.go:42-167).

    Reference fidelity notes:
      - trace/span/parent ids normalize through decodeHexStr (left-pad,
        truncate, hex-validate); timestamps/durations accept JSON number
        or string (stringOrInt64 :169-182), µs → ns;
      - span attrs collect exactly the reference's key/val pairs: `name`,
        lowercased `kind`, string-valued tags, local/remote
        `_endpoint_service_name`, the final `service.name`, and the
        otel.status_code → `status` (error/ok) mapping TraceQL queries
        against (:148-164);
      - the remoteEndpoint quirk is preserved: its serviceName only
        replaces a non-empty local one (:120-127) — a span with ONLY a
        remoteEndpoint keeps service_name "".
    """
    spans = raw.select(
        F.explode(F.from_json(F.col(payload_col), _ZIPKIN_SCHEMA)).alias("s")
    )
    local = F.coalesce(F.col("s.localEndpoint.serviceName"), F.lit(""))
    remote = F.coalesce(F.col("s.remoteEndpoint.serviceName"), F.lit(""))
    service = F.when(
        (local != "") & F.col("s.remoteEndpoint").isNotNull(), remote
    ).otherwise(local)
    status_code = F.col("s.tags").getItem("otel.status_code")
    status = F.when(status_code == "ERROR", F.lit("error")).when(
        status_code == "OK", F.lit("ok")
    )
    attrs = F.map_filter(
        F.map_concat(
            F.coalesce(F.col("s.tags"), F.expr("map()")),
            F.map_filter(
                F.create_map(
                    F.lit("name"), F.col("s.name"),
                    F.lit("kind"), F.lower(F.col("s.kind")),
                    F.lit("local_endpoint_service_name"),
                    F.col("s.localEndpoint.serviceName"),
                    F.lit("remote_endpoint_service_name"),
                    F.col("s.remoteEndpoint.serviceName"),
                    F.lit("status"), status,
                ),
                lambda k, v: v.isNotNull(),
            ),
            F.create_map(F.lit("service.name"), service),
        ),
        lambda k, v: v.isNotNull(),
    )
    return spans.select(
        _zipkin_hex(F.col("s.traceId"), 32).alias("trace_id"),
        _zipkin_hex(F.col("s.id"), 16).alias("span_id"),
        F.coalesce(_zipkin_hex(F.col("s.parentId"), 16), F.lit("")).alias(
            "parent_id"
        ),
        F.col("s.name").alias("name"),
        (F.col("s.timestamp").try_cast("long") * 1000).alias("timestamp_ns"),
        (F.col("s.duration").try_cast("long") * 1000).alias("duration_ns"),
        service.alias("service_name"),
        F.lit(1).cast("byte").alias("payload_type"),
        F.to_json(F.col("s")).alias("payload"),
        attrs.alias("attrs"),
    ).filter(F.col("trace_id").isNotNull() & F.col("span_id").isNotNull())


def zipkin_ndjson(raw: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Zipkin NDJSON bodies — one span object per line — → spans rows
    (ref: UnmarshalZipkinNDJSONV2, the `/tempo/spans` ndjson content
    type, writer/controller/tempo.go:21). Splits lines JVM-side and
    re-wraps each as a 1-element array to reuse the array decoder."""
    lines = (
        raw.select(F.explode(F.split(F.col(payload_col), "\n")).alias("line"))
        .filter(F.trim("line") != "")
    )
    return zipkin_spans(
        lines.select(
            F.concat(F.lit("["), F.col("line"), F.lit("]")).alias(payload_col)
        ),
        payload_col,
    )


_DATADOG_LOGS_SCHEMA = (
    "array<struct<message: string, status: string, hostname: string,"
    " service: string, ddsource: string, ddtags: string, timestamp: long,"
    " source_type: string>>"
)

# The reference's ddtags tagPattern (datadog_json.go:26): keys start with a
# letter then letters/digits/_-./\ ; values additionally allow ':' and must
# run to a ',' or end-of-string. Pairs that don't match are DROPPED, not
# guessed at (e.g. "team:x y" yields no tag).
_DD_TAG_PAT = r"([\p{L}][\p{L}_0-9\-.\\/]*):([\p{L}_0-9\-.\\/:]+)(,|$)"


def _entries_map(entries: Column) -> Column:
    """array<struct<key,value>> → map, duplicate keys last-wins (the
    reference appends label pairs to a list; the stored model keeps the
    last write). map_from_entries alone would throw under Spark's default
    EXCEPTION dedup policy, so drop earlier duplicates first."""
    deduped = F.filter(
        entries,
        lambda e, i: ~F.exists(
            F.slice(entries, i + F.lit(2), F.greatest(F.size(entries), F.lit(1))),
            lambda later: later["key"] == e["key"],
        ),
    )
    return F.map_from_entries(deduped)


def datadog_logs(
    raw: DataFrame, payload_col: str = "payload", now_ns: int = 0
) -> DataFrame:
    """Datadog v2 logs JSON arrays → samples (ref: datadog_json.go:32-97,
    routed at /api/v2/logs, insert.go:13).

    ddtags parse with the reference's tagPattern (malformed pairs drop);
    then ddsource / service / hostname / source_type append when non-empty
    plus the constant type=datadog. Unknown fields (e.g. status) are
    skipped, exactly like the reference's decoder. timestamp is epoch ms;
    0/absent stamps `now_ns` (the reference uses wall clock — a parameter
    keeps the pipeline deterministic and replayable)."""
    logs = raw.select(
        F.explode(F.from_json(F.col(payload_col), _DATADOG_LOGS_SCHEMA)).alias("l")
    )
    ddtags = F.coalesce(F.col("l.ddtags"), F.lit(""))
    tag_entries = F.zip_with(
        F.regexp_extract_all(ddtags, F.lit(_DD_TAG_PAT), 1),
        F.regexp_extract_all(ddtags, F.lit(_DD_TAG_PAT), 2),
        lambda k, v: F.struct(k.alias("key"), v.alias("value")),
    )

    def _opt(key: str, val: Column) -> Column:
        return F.struct(F.lit(key).alias("key"), val.alias("value"))

    extra = F.filter(
        F.array(
            _opt("ddsource", F.col("l.ddsource")),
            _opt("service", F.col("l.service")),
            _opt("hostname", F.col("l.hostname")),
            _opt("source_type", F.col("l.source_type")),
            _opt("type", F.lit("datadog")),
        ),
        lambda e: e["value"].isNotNull() & (e["value"] != ""),
    )
    labels = _entries_map(F.concat(tag_entries, extra))
    ts_ms = F.coalesce(F.col("l.timestamp"), F.lit(0))
    ts_ns = F.when(ts_ms != 0, ts_ms * 1_000_000).otherwise(F.lit(now_ns))
    return logs.select(
        *_normalize(labels, ts_ns, F.col("l.message"), F.lit(0.0), 1)
    )


_DATADOG_METRICS_SCHEMA = (
    "struct<series: array<struct<metric: string,"
    " resources: array<map<string,string>>,"
    " points: array<struct<timestamp: long, value: double>>>>>"
)


_DATADOG_CF_SCHEMA = (
    "struct<EventType: string, Outcome: string, ScriptName: string,"
    " EventTimestampMs: long, `When`: long, ActionResult: boolean,"
    " ActionType: string, ActorType: string, ResourceType: string>"
)


def datadog_cf(raw: DataFrame, line_col: str = "line",
               ddsource: str = "cloudflare", now_ns: int = 0) -> DataFrame:
    """Cloudflare-via-Datadog NDJSON lines → log samples
    (ref: datadog_cf_json.go:30-141).

    Labels keep the reference's original key casing (ScriptName, Outcome,
    EventType, ActionResult, ActionType, ActorType, ResourceType) plus
    ddsource, dropping empty values; timestamp comes from EventTimestampMs
    (ms → ns) or `When` (already ns); the log line is the raw JSON text.
    """
    parsed = raw.select(
        F.col(line_col).alias("line"),
        F.from_json(F.col(line_col), _DATADOG_CF_SCHEMA).alias("e"),
    )
    # a line with NEITHER timestamp stamps receive time, like the
    # reference's time.Now() fallback (datadog_cf_json.go:41-44)
    ts_ns = F.coalesce(
        F.col("e.EventTimestampMs") * 1_000_000,
        F.col("e.When"),
        F.lit(now_ns),
    )
    labels = F.map_filter(
        F.create_map(
            F.lit("ddsource"), F.lit(ddsource),
            F.lit("ScriptName"), F.col("e.ScriptName"),
            F.lit("Outcome"), F.col("e.Outcome"),
            F.lit("EventType"), F.col("e.EventType"),
            F.lit("ActionResult"), F.col("e.ActionResult").cast("string"),
            F.lit("ActionType"), F.col("e.ActionType"),
            F.lit("ActorType"), F.col("e.ActorType"),
            F.lit("ResourceType"), F.col("e.ResourceType"),
        ),
        lambda k, v: v.isNotNull() & (v != ""),
    )
    return parsed.select(*_normalize(labels, ts_ns, F.col("line"), F.lit(0.0), 1))


def datadog_metrics(
    raw: DataFrame, payload_col: str = "payload", now_ns: int = 0
) -> DataFrame:
    """Datadog v2 metrics JSON → metric samples (ref:
    datadog_metrics_json.go:25-110, routed at /api/v2/series, insert.go:12).

    series[].metric → __name__; resources[i] objects contribute one label
    per key named resource{i+1}_{key} (DecodeSeriesItem "resources");
    points are {timestamp (epoch s → ns), value} objects. The reference
    decoder holds (tsNs, val) in loop-carried state, so a point missing a
    field inherits the PREVIOUS point's value (or now / 0.0 before any
    point set them) — mirrored here with an array fold. Tags and host are
    NOT parsed — the reference skips every other key."""
    series = raw.select(
        F.explode(
            F.from_json(F.col(payload_col), _DATADOG_METRICS_SCHEMA)["series"]
        ).alias("s")
    )
    entry_t = "array<struct<key: string, value: string>>"
    res_entries = F.flatten(
        F.transform(
            F.coalesce(F.col("s.resources"), F.array()),
            lambda m, i: F.transform(
                F.map_entries(m),
                lambda e: F.struct(
                    F.concat(
                        F.lit("resource"),
                        (i + 1).cast("string"),
                        F.lit("_"),
                        e["key"],
                    ).alias("key"),
                    e["value"].alias("value"),
                ),
            ).cast(entry_t),
        )
    )
    name_entry = F.struct(
        F.lit("__name__").alias("key"),
        F.coalesce(F.col("s.metric"), F.lit("")).alias("value"),
    )
    labels = _entries_map(
        F.concat(F.array(name_entry).cast(entry_t), res_entries)
    )
    acc0 = F.struct(
        F.lit(now_ns).cast("long").alias("ts"),
        F.lit(0.0).alias("val"),
        F.array().cast("array<struct<ts: long, val: double>>").alias("out"),
    )
    pts = F.aggregate(
        F.coalesce(F.col("s.points"), F.array()),
        acc0,
        lambda acc, p: F.struct(
            F.coalesce(p["timestamp"] * 1_000_000_000, acc["ts"]).alias("ts"),
            F.coalesce(p["value"], acc["val"]).alias("val"),
            F.concat(
                acc["out"],
                F.array(
                    F.struct(
                        F.coalesce(
                            p["timestamp"] * 1_000_000_000, acc["ts"]
                        ).alias("ts"),
                        F.coalesce(p["value"], acc["val"]).alias("val"),
                    )
                ),
            ).alias("out"),
        ),
    )["out"]
    rows = series.select(labels.alias("labels"), F.explode(pts).alias("p"))
    return rows.select(
        *_normalize(F.col("labels"), F.col("p.ts"), F.lit(""), F.col("p.val"), 2)
    )


def collapsed_stacks(raw: DataFrame, line_col: str = "line",
                     profile_col: str = "profile_id") -> DataFrame:
    """Folded-stack profiles ("main;foo;bar 42" per line — the format
    flamegraph tooling exchanges; the reference ingests binary pprof,
    ref: writer/utils/unmarshal/go_pprof.go:82) → per-node tree rows
    compatible with prof.tree.merge_trees's exploded shape.

    Node identity = xxhash64 of the frame path, parent = hash of the
    prefix path; self = sample value on exact-path lines, total = Σ over
    all lines passing through the node. Pure explode + groupBy.
    """
    line = F.col(line_col)
    raw_value = F.regexp_extract(line, r" (\d+)\s*$", 1)
    # malformed lines (no trailing count) extract "" — ANSI cast would
    # throw, so gate the cast and drop them
    value = F.when(raw_value != "", raw_value.cast("long"))
    stack = F.split(F.regexp_extract(line, r"^(.*) \d+\s*$", 1), ";")
    # both filters read per-row extraction output and can never prune
    # at the scan; without the barrier pushdown clones the
    # regexp_extract/split chain into each Filter condition
    # (mechanism: planutil.nonpushable)
    parsed = (
        raw.select(
            F.col(profile_col),
            nonpushable(stack).alias("stack"),
            nonpushable(value).alias("value"),
        )
        .filter(F.col("value").isNotNull())
        .filter(F.size("stack") > 0)
    )
    # explode each prefix of the stack: node at depth i covers value
    depths = F.sequence(F.lit(1), F.size("stack"))
    nodes = parsed.select(
        profile_col,
        "stack",
        "value",
        F.explode(depths).alias("depth"),
    ).select(
        profile_col,
        "value",
        F.slice("stack", 1, F.col("depth")).alias("path"),
        (F.col("depth") == F.size("stack")).alias("is_leaf"),
        F.element_at("stack", F.col("depth")).alias("fn_name"),
    )
    path_id = F.xxhash64(F.concat_ws(";", F.col("path")))
    parent_id = F.when(
        F.size("path") > 1,
        F.xxhash64(F.concat_ws(";", F.slice("path", 1, F.size("path") - 1))),
    ).otherwise(F.lit(0))
    return (
        nodes.groupBy(
            F.col(profile_col),
            path_id.alias("id"),
            parent_id.alias("parent"),
            F.col("fn_name"),
        )
        .agg(
            F.sum(F.when(F.col("is_leaf"), F.col("value")).otherwise(0)).alias("self"),
            F.sum("value").alias("total"),
        )
        .withColumn("fn_id", F.xxhash64("fn_name"))
    )


def folded_profiles_input(
    folded: DataFrame,
    sample_type: str = "cpu",
    sample_unit: str = "nanoseconds",
) -> DataFrame:
    """Folded-stack lines → profiles_input rows WITH the stored tree
    layout (ref: ctrl/qryn/sql/profiles.sql:5-17 input columns; the
    :118-119 ALTER adds `tree`/`functions` to the stored table and the
    :126-144 MV carries them from profiles_input — the layout
    planner_merge_raw.go:11 merges from).

    Input: one row per folded line with per-profile metadata columns
    (profile_id, timestamp_ns, type, service_name, period_type,
    period_unit, tags map, duration_ns, line). Output: ONE row per
    profile_id shaped for storage.writer.profiles_fanout, the tree
    built by the shared collapsed_stacks builder, each node carrying a
    single named value slot f"{sample_type}:{sample_unit}".

    Scale shape: collapsed_stacks is explode + one (profile, node)
    groupBy; the reassembly here is one more groupBy(profile_id) —
    tree size is bounded by a single profile's stack count, never the
    corpus.
    """
    stu = f"{sample_type}:{sample_unit}"
    nodes = collapsed_stacks(folded)
    tree_nodes = nodes.groupBy("profile_id").agg(
        F.collect_list(
            F.struct(
                F.col("parent").alias("parent"),
                F.col("id").alias("id"),
                F.col("fn_id").alias("fn_id"),
                F.array(
                    F.struct(
                        F.lit(stu).alias("name"),
                        F.col("self").alias("self"),
                        F.col("total").alias("total"),
                    )
                ).alias("values"),
            )
        ).alias("tree"),
        F.array_distinct(
            F.collect_list(
                F.struct(
                    F.col("fn_id").alias("id"), F.col("fn_name").alias("name")
                )
            )
        ).alias("functions"),
        F.sum(F.when(F.col("parent") == 0, F.col("total")).otherwise(0)).alias(
            "__root_total"
        ),
    )
    meta = folded.select(
        "profile_id",
        "timestamp_ns",
        "type",
        "service_name",
        "period_type",
        "period_unit",
        "tags",
        "duration_ns",
    ).dropDuplicates(["profile_id"])
    return meta.join(tree_nodes, "profile_id", "inner").select(
        "timestamp_ns",
        "type",
        "service_name",
        F.array(
            F.struct(
                F.lit(sample_type).alias("name"), F.lit(sample_unit).alias("unit")
            )
        ).alias("sample_types_units"),
        "period_type",
        "period_unit",
        "tags",
        "duration_ns",
        F.lit("folded").alias("payload_type"),
        F.lit("").cast("binary").alias("payload"),
        # values_agg (profiles.sql:16): (name, total, count) per sample
        # type over the whole profile
        F.array(
            F.struct(
                F.lit(stu).alias("name"),
                F.col("__root_total").alias("value"),
                F.size("tree").cast("int").alias("count"),
            )
        ).alias("values_agg"),
        "tree",
        "functions",
    )


def _otlp_traces_schema() -> str:
    # late-bound: _OTLP_ATTRS is defined further down in the module
    return f"""
struct<resourceSpans: array<struct<
  resource: struct<attributes: {_OTLP_ATTRS}>,
  scopeSpans: array<struct<spans: array<struct<
    traceId: string, spanId: string, parentSpanId: string, name: string,
    startTimeUnixNano: string, endTimeUnixNano: string, kind: string,
    status: struct<code: string>,
    attributes: {_OTLP_ATTRS}
  >>>>
>>>
"""


# Local service-name candidates in priority order (otlp.go:27-57);
# the remote list is the same minus peer.service.
_OTLP_SVC_CANDIDATES = [
    "peer.service",
    "service.name",
    "faas.name",
    "k8s.deployment.name",
    "process.executable.name",
]

_OTLP_ENTRY_T = "array<struct<key: string, value: string>>"


def _otlp_trace_scalar(v: Column) -> Column:
    """writeAttrValue formatting (otlp.go:135-154): bool %v, double %f
    (six decimals), int %d, string as-is. Distinct from the logs path's
    SanitizeValue (no bytes/base64; %f not minimal-digits)."""
    return (
        F.when(v["stringValue"].isNotNull(), v["stringValue"])
        .when(v["boolValue"].isNotNull(), v["boolValue"].cast("string"))
        .when(
            v["doubleValue"].isNotNull(),
            F.format_string("%f", v["doubleValue"]),
        )
        .when(v["intValue"].isNotNull(), v["intValue"])
    )


def _otlp_trace_attr_entries(attrs: Column) -> Column:
    """KeyValue list → flat (key, value) entries with the reference's
    dotted flattening: arrays become key.0, key.1, ...; kvlists become
    key.subkey (otlp.go:144-151)."""
    empty = F.array().cast(_OTLP_ENTRY_T)

    def entry(k: Column, val: Column) -> Column:
        return F.struct(k.alias("key"), val.alias("value"))

    return F.flatten(
        F.transform(
            F.coalesce(attrs, F.array()),
            lambda a: F.coalesce(
                F.when(
                    _otlp_trace_scalar(a["value"]).isNotNull(),
                    F.array(entry(a["key"], _otlp_trace_scalar(a["value"]))).cast(
                        _OTLP_ENTRY_T
                    ),
                ),
                F.when(
                    a["value"]["arrayValue"].isNotNull(),
                    F.transform(
                        F.coalesce(a["value"]["arrayValue"]["values"], F.array()),
                        lambda item, i: entry(
                            F.concat(a["key"], F.lit("."), i.cast("string")),
                            F.coalesce(_otlp_trace_scalar(item), F.lit("")),
                        ),
                    ).cast(_OTLP_ENTRY_T),
                ),
                F.when(
                    a["value"]["kvlistValue"].isNotNull(),
                    F.transform(
                        F.coalesce(a["value"]["kvlistValue"]["values"], F.array()),
                        lambda e: entry(
                            F.concat(a["key"], F.lit("."), e["key"]),
                            F.coalesce(_otlp_trace_scalar(e["value"]), F.lit("")),
                        ),
                    ).cast(_OTLP_ENTRY_T),
                ),
                empty,
            ),
        )
    )


def _entries_first(entries: Column, key: str) -> Column:
    """getOtlpAttr analog: value of the FIRST entry with `key`."""
    return F.get(F.filter(entries, lambda e: e["key"] == key), 0)["value"]


def otlp_traces(raw: DataFrame, payload_col: str = "payload") -> DataFrame:
    """OTLP/JSON traces → spans rows (ref: unmarshal/otlp.go:76-130).

    Reference semantics:
      - resource attrs append AFTER span attrs; service-name resolution
        (populateServiceNames :59-74) scans span-then-resource for the
        first non-empty candidate — local falls back to
        "OTLPResourceNoServiceName", remote (no peer.service) to "" —
        and only fills service.name / remoteService.name when absent;
      - the final attr map is built by iterating span-then-resource, so
        RESOURCE values overwrite span values on key clash (:83-85 —
        note the opposite precedence from the lookup);
      - name, status (error/ok/unset) and kind
        (server/client/producer/consumer/internal) always land as attrs
        (:89-110), accepting both JSON enum-string and int encodings;
      - attr values flatten with dotted array/kvlist suffixes and the
        %f/%d/%v formatting of writeAttrValue.
    """
    parsed = raw.select(
        F.from_json(F.col(payload_col), _otlp_traces_schema()).alias("p")
    )
    def top_str_entries(attrs: Column) -> Column:
        return F.transform(
            F.coalesce(attrs, F.array()),
            lambda a: F.struct(
                a["key"].alias("key"),
                F.coalesce(a["value"]["stringValue"], F.lit("")).alias("value"),
            ),
        ).cast(_OTLP_ENTRY_T)

    spans = (
        parsed.select(F.explode("p.resourceSpans").alias("rs"))
        .select(
            _otlp_trace_attr_entries(F.col("rs.resource.attributes")).alias(
                "__res"
            ),
            top_str_entries(F.col("rs.resource.attributes")).alias("__res_top"),
            F.explode("rs.scopeSpans").alias("ss"),
        )
        .select("__res", "__res_top", F.explode("ss.spans").alias("s"))
    )
    span_entries = _otlp_trace_attr_entries(F.col("s.attributes"))

    # candidate/presence lookups run over the TOP-LEVEL KeyValue lists
    # (getOtlpAttr, otlp.go:18-25), span attrs first then resource, and
    # GetStringValue() semantics: a non-string candidate value reads as
    # "" and is skipped (otlpGetServiceNames :27-57)
    top = F.concat(top_str_entries(F.col("s.attributes")), F.col("__res_top"))

    def first_nonempty(keys: list[str]) -> Column:
        return F.coalesce(
            *[F.nullif(_entries_first(top, k), F.lit("")) for k in keys]
        )

    local = F.coalesce(
        first_nonempty(_OTLP_SVC_CANDIDATES), F.lit("OTLPResourceNoServiceName")
    )
    remote = F.coalesce(first_nonempty(_OTLP_SVC_CANDIDATES[1:]), F.lit(""))

    def fill_absent(key: str, val: Column) -> Column:
        e = F.struct(F.lit(key).alias("key"), val.alias("value"))
        return F.when(
            _entries_first(top, key).isNull(), F.array(e)
        ).otherwise(F.array().cast(_OTLP_ENTRY_T))

    status_code = F.coalesce(F.col("s.status.code"), F.lit(""))
    status = (
        F.when(status_code.isin("STATUS_CODE_ERROR", "2"), F.lit("error"))
        .when(status_code.isin("STATUS_CODE_OK", "1"), F.lit("ok"))
        .otherwise(F.lit("unset"))
    )
    kind_raw = F.coalesce(F.col("s.kind"), F.lit(""))
    kind = (
        F.when(kind_raw.isin("SPAN_KIND_SERVER", "2"), F.lit("server"))
        .when(kind_raw.isin("SPAN_KIND_CLIENT", "3"), F.lit("client"))
        .when(kind_raw.isin("SPAN_KIND_PRODUCER", "4"), F.lit("producer"))
        .when(kind_raw.isin("SPAN_KIND_CONSUMER", "5"), F.lit("consumer"))
        .otherwise(F.lit("internal"))
    )

    def const_entry(key: str, val: Column) -> Column:
        return F.array(F.struct(F.lit(key).alias("key"), val.alias("value")))

    # last-wins assembly mirrors the reference's write order: span attrs,
    # then resource attrs (overwrite), then the populated service names
    # (only when absent), then name/status/kind (always overwrite)
    all_entries = F.concat(
        span_entries,
        F.col("__res"),
        fill_absent("service.name", local),
        fill_absent("remoteService.name", remote),
        const_entry("name", F.coalesce(F.col("s.name"), F.lit(""))),
        const_entry("status", status),
        const_entry("kind", kind),
    )
    attrs = _entries_map(all_entries)
    start = F.col("s.startTimeUnixNano").try_cast("long")
    end = F.col("s.endTimeUnixNano").try_cast("long")
    return spans.select(
        F.col("s.traceId").alias("trace_id"),
        F.col("s.spanId").alias("span_id"),
        F.coalesce(F.col("s.parentSpanId"), F.lit("")).alias("parent_id"),
        F.col("s.name").alias("name"),
        start.alias("timestamp_ns"),
        (end - start).alias("duration_ns"),
        attrs.getItem("service.name").alias("service_name"),
        F.lit(2).cast("byte").alias("payload_type"),
        F.to_json(F.col("s")).alias("payload"),
        attrs.alias("attrs"),
    )


# Full AnyValue shape, one nesting level for array/kvlist values (the
# reference recurses without bound via SanitizeValue; JSON schemas can't
# recurse, and >1-deep attribute values don't occur in practice — deeper
# levels stringify to "").
_OTLP_ANYVAL_LEAF = (
    "struct<stringValue: string, boolValue: boolean, intValue: string,"
    " doubleValue: double, bytesValue: string>"
)
_OTLP_ANYVAL = (
    "struct<stringValue: string, boolValue: boolean, intValue: string,"
    " doubleValue: double, bytesValue: string,"
    f" arrayValue: struct<values: array<{_OTLP_ANYVAL_LEAF}>>,"
    f" kvlistValue: struct<values: array<struct<key: string,"
    f" value: {_OTLP_ANYVAL_LEAF}>>>>"
)
_OTLP_ATTRS = f"array<struct<key: string, value: {_OTLP_ANYVAL}>>"

_OTLP_LOGS_SCHEMA = f"""
struct<resourceLogs: array<struct<
  resource: struct<attributes: {_OTLP_ATTRS}>,
  scopeLogs: array<struct<
    scope: struct<attributes: {_OTLP_ATTRS}>,
    logRecords: array<struct<
      timeUnixNano: string, observedTimeUnixNano: string,
      severityText: string, traceId: string, spanId: string,
      body: {_OTLP_ANYVAL},
      attributes: {_OTLP_ATTRS}
    >>>>
>>>
"""


def _otlp_key(k: Column) -> Column:
    """SanitizeKey (otlplogs.go:104-115): non-[a-zA-Z0-9_] → '_', and a
    leading digit (or empty key) gets a '_' PREFIX — unlike the loki-path
    sanitizer which replaces the offending leading char."""
    s = F.regexp_replace(k, "[^a-zA-Z0-9_]", "_")
    return F.when(s.rlike("^[0-9]") | (s == ""), F.concat(F.lit("_"), s)).otherwise(s)


def _otlp_scalar(v: Column) -> Column:
    # doubles: Spark's cast renders scientific notation outside
    # ~[1e-4, 1e16) where Go's FormatFloat('f', -1) never does — a
    # documented divergence at the extremes of the double range
    return (
        F.when(v["stringValue"].isNotNull(), v["stringValue"])
        .when(v["boolValue"].isNotNull(), v["boolValue"].cast("string"))
        .when(v["intValue"].isNotNull(), v["intValue"])
        .when(v["doubleValue"].isNotNull(), v["doubleValue"].cast("string"))
        .when(v["bytesValue"].isNotNull(), v["bytesValue"])
    )


def _otlp_value(v: Column) -> Column:
    """SanitizeValue (otlplogs.go:117-145): scalars stringify; arrays →
    JSON array of stringified items; kvlists → JSON object with sanitized
    keys (sorted, as Go's json.Marshal of a map sorts keys)."""
    arr = F.when(
        v["arrayValue"].isNotNull(),
        F.to_json(
            F.transform(
                F.coalesce(v["arrayValue"]["values"], F.array()),
                lambda i: F.coalesce(_otlp_scalar(i), F.lit("")),
            )
        ),
    )
    kvl = F.when(
        v["kvlistValue"].isNotNull(),
        F.to_json(
            F.map_from_entries(
                F.array_sort(
                    F.transform(
                        F.coalesce(v["kvlistValue"]["values"], F.array()),
                        lambda e: F.struct(
                            _otlp_key(e["key"]).alias("key"),
                            F.coalesce(_otlp_scalar(e["value"]), F.lit("")).alias(
                                "value"
                            ),
                        ),
                    )
                )
            )
        ),
    )
    return F.coalesce(_otlp_scalar(v), arr, kvl, F.lit(""))


def otlp_logs(
    raw: DataFrame, payload_col: str = "payload", now_ns: int = 0
) -> DataFrame:
    """OTLP/JSON logs → samples (ref: otlplogs.go:22-101).

    Resource, scope and record attributes merge in that order (later
    wins); values stringify through the SanitizeValue algebra including
    bool/int/double/bytes and one level of array/kvlist. severity_text
    lands as the `level` label when non-empty (:49-51); valid non-zero
    traceId/spanId become trace_id/span_id labels overriding same-named
    attributes (:52-58); timestamp falls back timeUnixNano →
    observedTimeUnixNano → `now_ns` (:69-75); the body is any AnyValue,
    not only a string."""
    parsed = raw.select(F.from_json(F.col(payload_col), _OTLP_LOGS_SCHEMA).alias("p"))
    entry_t = "array<struct<key: string, value: string>>"

    def attr_entries(attrs: Column) -> Column:
        return F.transform(
            F.coalesce(attrs, F.array()),
            lambda a: F.struct(
                _otlp_key(a["key"]).alias("key"),
                _otlp_value(a["value"]).alias("value"),
            ),
        ).cast(entry_t)

    recs = (
        parsed.select(F.explode("p.resourceLogs").alias("rl"))
        .select(
            attr_entries(F.col("rl.resource.attributes")).alias("__res"),
            F.explode("rl.scopeLogs").alias("sl"),
        )
        .select(
            "__res",
            attr_entries(F.col("sl.scope.attributes")).alias("__scope"),
            F.explode("sl.logRecords").alias("r"),
        )
    )

    def _lbl(key: str, val: Column, cond: Column) -> Column:
        e = F.struct(F.lit(key).alias("key"), val.alias("value"))
        return F.when(cond, F.array(e)).otherwise(F.array().cast(entry_t))

    sev = F.coalesce(F.col("r.severityText"), F.lit(""))
    tid = F.lower(F.coalesce(F.col("r.traceId"), F.lit("")))
    sid = F.lower(F.coalesce(F.col("r.spanId"), F.lit("")))
    entries = F.concat(
        F.col("__res"),
        F.col("__scope"),
        attr_entries(F.col("r.attributes")),
        _lbl("level", sev, sev != ""),
        _lbl("trace_id", tid, tid.rlike("^[0-9a-f]{32}$") & (~tid.rlike("^0+$"))),
        _lbl("span_id", sid, sid.rlike("^[0-9a-f]{16}$") & (~sid.rlike("^0+$"))),
    )
    ts = F.coalesce(
        F.nullif(F.coalesce(F.col("r.timeUnixNano"), F.lit("0")), F.lit("0")).try_cast(
            "long"
        ),
        F.nullif(
            F.coalesce(F.col("r.observedTimeUnixNano"), F.lit("0")), F.lit("0")
        ).try_cast("long"),
        F.lit(now_ns),
    )
    body = F.when(F.col("r.body").isNotNull(), _otlp_value(F.col("r.body"))).otherwise(
        F.lit("")
    )
    return recs.select(*_normalize(_entries_map(entries), ts, body, F.lit(0.0), 1))


def parse_pyroscope_name(name: str) -> tuple[str, dict[str, str]]:
    """Pyroscope /ingest `name` query param: `service{k=v,k2=v2}` →
    (service, tags) (ref: go_pprof.go:98-120 — the reference splits the
    {...} body on '=' and ',' with no quoting, erroring on an odd word
    count; mirrored exactly, quirks included)."""
    i = name.find("{")
    if i < 0:
        return name, {}
    body = name[i + 1 : len(name) - 1]
    if not body:
        return name[:i], {}
    words = [w for w in _re.split(r"[=,]", body) if w != ""]
    if not words or len(words) % 2 != 0:
        raise ValueError("failed to compile labels")
    return name[:i], dict(zip(words[::2], words[1::2]))


def pyroscope_ingest_ns(timestamp: int) -> int:
    """Normalize a /ingest from/until value to nanoseconds
    (ref: binary_pprof.go:19-24: multiply by 10 until ns scale)."""
    ts = int(timestamp)
    if ts <= 0:
        return ts
    while ts < 1_000_000_000_000_000_000:
        ts *= 10
    return ts
