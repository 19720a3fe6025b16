"""Writer-side shared post-decode stage (ref: builder.go onEntries
:304-380 + discoverServiceName :286-302): special-label extraction,
service_name discovery, and their flow into the fan-out writer."""

import json

from pyspark.sql import functions as F

from gigapipe_spark.sources import ingest
from gigapipe_spark.storage.writer import Catalog, ingest_fanout


def _decoded(spark, stream, line="hello", ts="1700000000000000000"):
    payload = json.dumps(
        {"streams": [{"stream": stream, "values": [[ts, line]]}]}
    )
    raw = spark.createDataFrame([(payload,)], "payload string")
    return ingest.loki_push(raw)


def test_metadata_labels_extracted(spark):
    df = ingest.finalize_entries(
        _decoded(
            spark,
            {
                "app": "web",
                "__metric_type__": "counter",
                "__metric_help__": "requests served",
            },
        )
    )
    r = df.collect()[0]
    meta = json.loads(r["metadata"])
    # Entry marshals all three fields, empties included (parser.go:52-61)
    assert meta == {"type": "counter", "help": "requests served", "unit": ""}
    assert "__metric_type__" not in r["labels"]
    assert "__metric_help__" not in r["labels"]
    assert r["labels"]["app"] == "web"


def test_metadata_empty_when_unset(spark):
    r = ingest.finalize_entries(_decoded(spark, {"app": "web"})).collect()[0]
    assert r["metadata"] == ""  # ToJSON returns "" on zero Entry


def test_ttl_days_label(spark):
    r = ingest.finalize_entries(
        _decoded(spark, {"app": "web", "__ttl_days__": "14"})
    ).collect()[0]
    assert r["ttl_days"] == 14
    assert "__ttl_days__" not in r["labels"]
    # writer-level ttl wins when set (builder.go:318 "if not already set")
    r2 = ingest.finalize_entries(
        _decoded(spark, {"app": "web", "__ttl_days__": "14"}), ttl_days=30
    ).collect()[0]
    assert r2["ttl_days"] == 30
    # unparseable → default
    r3 = ingest.finalize_entries(
        _decoded(spark, {"app": "web", "__ttl_days__": "xx"})
    ).collect()[0]
    assert r3["ttl_days"] == 0


def test_special_labels_do_not_split_series(spark):
    """Fingerprint is computed AFTER filtering special labels, so the
    same logical series with/without metadata labels coincides."""
    plain = ingest.finalize_entries(_decoded(spark, {"app": "web"}))
    tagged = ingest.finalize_entries(
        _decoded(spark, {"app": "web", "__metric_type__": "gauge"})
    )
    assert (
        plain.collect()[0]["fingerprint"] == tagged.collect()[0]["fingerprint"]
    )


def test_service_name_discovery(spark):
    # candidate → copied
    r = ingest.finalize_entries(_decoded(spark, {"container": "c1"})).collect()[0]
    assert r["labels"]["service_name"] == "c1"
    # no candidate → "unknown" (builder.go:288 initial value)
    r = ingest.finalize_entries(_decoded(spark, {"region": "eu"})).collect()[0]
    assert r["labels"]["service_name"] == "unknown"
    # existing service_name wins untouched
    r = ingest.finalize_entries(
        _decoded(spark, {"service_name": "svc", "app": "other"})
    ).collect()[0]
    assert r["labels"]["service_name"] == "svc"
    # empty candidate value suppresses the label (serviceName != "" check)
    r = ingest.finalize_entries(_decoded(spark, {"job": ""})).collect()[0]
    assert "service_name" not in r["labels"]


def test_fanout_carries_metadata_and_ttl(spark, tmp_path):
    decoded = _decoded(
        spark,
        {"app": "web", "__metric_type__": "counter", "__ttl_days__": "7"},
    )
    cat = Catalog(str(tmp_path / "store"))
    ingest_fanout(decoded, cat)
    series = cat.read_series(spark).collect()
    assert len(series) == 1
    assert json.loads(series[0]["metadata"])["type"] == "counter"
    assert series[0]["ttl_days"] == 7
    samples = cat.read(spark, "samples")
    assert samples.collect()[0]["ttl_days"] == 7
    # special labels never reach the gin index
    gin_keys = {
        r["key"] for r in cat.read(spark, "gin").select("key").distinct().collect()
    }
    assert "__metric_type__" not in gin_keys and "__ttl_days__" not in gin_keys
    assert "service_name" in gin_keys


def test_catalog_metadata_endpoint(spark, tmp_path):
    """metadata.go:24-63: one newest entry per metric by default,
    limit_per_metric returns several, metric filter is exact."""
    cat = Catalog(str(tmp_path / "store"))
    for day, (name, typ, help_) in [
        ("2023-11-01", ("http_requests_total", "counter", "Total requests")),
        ("2023-11-02", ("latency_seconds", "histogram", "Latency v1")),
        ("2023-11-03", ("latency_seconds", "histogram", "Latency v2")),
    ]:
        decoded = _decoded(
            spark,
            {
                "__name__": name,
                "day": day,  # distinct labels → distinct fingerprints
                "__metric_type__": typ,
                "__metric_help__": help_,
            },
            ts=str(
                int(
                    __import__("datetime")
                    .datetime.fromisoformat(day + "T00:00:00+00:00")
                    .timestamp()
                )
                * 10**9
            ),
        )
        ingest_fanout(decoded, cat)
    one = cat.metadata(spark).collect()
    assert {r["metric_name"] for r in one} == {
        "http_requests_total",
        "latency_seconds",
    }
    lat = [r for r in one if r["metric_name"] == "latency_seconds"]
    assert len(lat) == 1  # default limit-per-metric = 1
    assert json.loads(lat[0]["metadata_json"])["help"] == "Latency v2"  # newest
    both = cat.metadata(spark, limit_per_metric=5)
    assert both.filter(F.col("metric_name") == "latency_seconds").count() == 2
    only = cat.metadata(spark, metric_filter="http_requests_total").collect()
    assert len(only) == 1 and only[0]["metric_name"] == "http_requests_total"
    assert cat.metadata(spark, limit=1).count() == 1
