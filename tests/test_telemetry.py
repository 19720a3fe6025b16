"""Self-telemetry: sent_rows/sent_bytes via Observation on the write
jobs, decode-error accumulators, Prometheus text rendering
(ref: writer/metric/variabels.go, /metrics in writer/router)."""

import json

from gigapipe_spark.sources import ingest, protowire
from gigapipe_spark.storage.writer import Catalog, ingest_fanout
from gigapipe_spark.telemetry import TELEMETRY, Telemetry


def test_render_counters_and_histogram():
    t = Telemetry()
    t.inc("sent_rows", {"service": "samples"}, 5)
    t.inc("sent_rows", {"service": "gin"}, 2)
    t.inc("json_parse_errors_count", None, 1)
    t.observe_tx_ms(150.0)
    t.observe_tx_ms(20000.0)
    text = t.render()
    assert 'sent_rows{service="samples"} 5' in text
    assert 'sent_rows{service="gin"} 2' in text
    assert "json_parse_errors_count 1" in text
    assert 'tx_close_time_ms_bucket{le="200"} 1' in text
    assert 'tx_close_time_ms_bucket{le="+Inf"} 2' in text
    assert "tx_close_time_ms_count 2" in text
    assert "# TYPE sent_rows counter" in text


def test_fanout_accounts_rows_and_bytes(spark, tmp_path):
    payload = json.dumps(
        {"streams": [{"stream": {"app": "web"},
                      "values": [["1700000000000000000", "hello"],
                                 ["1700000001000000000", "world!"]]}]}
    )
    raw = spark.createDataFrame([(payload,)], "payload string")
    before = dict(TELEMETRY._counters)
    ingest_fanout(ingest.loki_push(raw), Catalog(str(tmp_path / "store")))
    rows_key = ("sent_rows", (("service", "samples"),))
    bytes_key = ("sent_bytes", (("service", "samples"),))
    assert TELEMETRY._counters[rows_key] - before.get(rows_key, 0) == 2
    # "hello" + "world!" = 11 line bytes
    assert TELEMETRY._counters[bytes_key] - before.get(bytes_key, 0) == 11
    gin_key = ("sent_rows", (("service", "gin"),))
    assert TELEMETRY._counters[gin_key] - before.get(gin_key, 0) >= 1
    assert TELEMETRY._tx_count >= 3


def test_decode_errors_accumulate(spark):
    """One malformed snappy body among good ones lands in the
    accumulator, not in an exception — and metrics() renders it."""
    from gigapipe_spark.sources import protowire as pw
    from tests.test_protowire import _write_request

    good = pw.snappy_compress(_write_request())
    bad = b"\x00not-snappy-at-all"
    raw = spark.createDataFrame([(good,), (bad,)], "payload binary")
    acc = TELEMETRY.decode_error_acc(spark)
    v0 = int(acc.value)
    out = pw.remote_write(raw)
    assert out.count() == 3  # the good request decodes fully
    assert TELEMETRY.sync_decode_errors(spark) >= v0 + 1
    assert "json_parse_errors_count" in TELEMETRY.render()
