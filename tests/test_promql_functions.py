"""PromQL long-tail functions: deriv/predict_linear vs DuckDB regr_*,
histogram_quantile on a constructed bucket series, label ops, absent,
holt_winters fallback."""

import math

from pyspark.sql import functions as F

from gigapipe_spark.promql import functions as PF
from gigapipe_spark.sources import views
from gigapipe_spark.sources.oracle import METRIC_SAMPLES_CTE
from tests.conftest import SF_DIR
from tests.oracle_utils import assert_match


def metric(spark):
    return views.metric_samples(spark, SF_DIR).join(
        F.broadcast(views.time_series(spark, SF_DIR).select("fingerprint", "labels")),
        "fingerprint",
        "left",
    )


def test_deriv_matches_regr_slope(spark):
    rng = 3_600_000_000_000
    df = PF.deriv(metric(spark), rng).select(
        "fingerprint", "timestamp_ns", F.round("value", 6).alias("value")
    )
    sql = f"""
    WITH {METRIC_SAMPLES_CTE}
    SELECT fingerprint, (timestamp_ns - timestamp_ns % {rng}) AS timestamp_ns,
           round(regr_slope(value, timestamp_ns / 1e9), 6) AS value
    FROM metric_samples GROUP BY 1, 2
    """
    assert_match(df, sql, SF_DIR)


def test_predict_linear_matches_oracle(spark):
    rng = 3_600_000_000_000
    df = PF.predict_linear(metric(spark), rng, 300.0).select(
        "fingerprint", "timestamp_ns", F.round("value", 4).alias("value")
    )
    sql = f"""
    WITH {METRIC_SAMPLES_CTE}
    SELECT fingerprint, (timestamp_ns - timestamp_ns % {rng}) AS timestamp_ns,
           round(regr_intercept(value, timestamp_ns / 1e9)
                 + regr_slope(value, timestamp_ns / 1e9)
                   * (max(timestamp_ns / 1e9) + 300.0), 4) AS value
    FROM metric_samples GROUP BY 1, 2
    """
    assert_match(df, sql, SF_DIR)


def test_histogram_quantile(spark):
    # constructed cumulative le-buckets: 10 obs ≤1, 30 ≤2, 60 ≤4, 100 ≤+Inf
    rows = []
    for le, cum in [("1", 10.0), ("2", 30.0), ("4", 60.0), ("+Inf", 100.0)]:
        rows.append((1, {"job": "x", "le": le}, 0, cum))
    df = spark.createDataFrame(
        rows, "fingerprint long, labels map<string,string>, timestamp_ns long, value double"
    )
    out = PF.histogram_quantile(df, 0.5).collect()
    assert len(out) == 1
    # rank = 50 falls in the (2,4] bucket: 2 + 2*(50-30)/(60-30) = 3.333…
    assert math.isclose(out[0]["value"], 2 + 2 * (50 - 30) / 30, rel_tol=1e-9)
    assert out[0]["labels"] == {"job": "x"}
    # q=0.95 → rank 95 in +Inf bucket → returns lower bound (4)
    out95 = PF.histogram_quantile(df, 0.95).collect()
    assert out95[0]["value"] == 4.0


def test_label_replace_and_join(spark):
    df = spark.createDataFrame(
        [(1, {"app": "web-1", "env": "prod"}, 0, 1.0)],
        "fingerprint long, labels map<string,string>, timestamp_ns long, value double",
    )
    out = PF.label_replace(df, "svc", "$1", "app", "(\\w+)-\\d+").collect()[0]
    assert out["labels"]["svc"] == "web"
    # non-matching regex leaves labels untouched
    out2 = PF.label_replace(df, "svc", "$1", "app", "nope-(\\d+)").collect()[0]
    assert "svc" not in out2["labels"]
    out3 = PF.label_join(df, "combo", "/", "env", "app").collect()[0]
    assert out3["labels"]["combo"] == "prod/web-1"


def test_absent(spark):
    df = spark.createDataFrame(
        [(1, {"a": "b"}, 100, 1.0), (1, {"a": "b"}, 300, 1.0)],
        "fingerprint long, labels map<string,string>, timestamp_ns long, value double",
    )
    out = PF.absent(df, spark, 100, 400, 100).collect()
    missing = {r["timestamp_ns"] for r in out}
    assert missing == {200, 400}
    assert all(r["value"] == 1.0 for r in out)


def test_holt_winters_fallback(spark):
    # linear series: smoothed value tracks the trend closely
    rows = [(1, i * 1_000_000_000, float(i)) for i in range(20)]
    df = spark.createDataFrame(rows, "fingerprint long, timestamp_ns long, value double")
    out = PF.holt_winters(df, sf=0.5, tf=0.5, range_ns=60_000_000_000).collect()
    assert len(out) == 1
    assert abs(out[0]["value"] - 19.0) < 1.0


# ---------------------------------------------------------- new long tail


def _q(spark, text):
    from gigapipe_spark.promql.compiler import PromQLContext, query

    return query(PromQLContext(spark, SF_DIR), text)


def test_sgn_and_trig(spark):
    base = _q(spark, 'last_over_time({app="click"}[1h])')
    sgn = _q(spark, 'sgn(last_over_time({app="click"}[1h]))')
    assert sgn.count() == base.count()
    assert {r["value"] for r in sgn.select("value").distinct().collect()} <= {-1.0, 0.0, 1.0}
    sin = _q(spark, 'sin(last_over_time({app="click"}[1h]))').select("value").first()
    assert -1.0 <= sin["value"] <= 1.0


def test_clamp_two_bounds(spark):
    out = _q(spark, 'clamp(last_over_time({app="click"}[1h]), 10, 20)')
    vals = [r["value"] for r in out.select("value").collect()]
    assert vals and all(10.0 <= v <= 20.0 for v in vals)


def test_timestamp_and_time_extractors(spark):
    ts = _q(spark, 'timestamp(last_over_time({app="click"}[1h]))').first()
    assert ts["value"] == ts["timestamp_ns"] / 1e9
    # hour(v) interprets the VALUE as unix seconds; counters stay <1000
    # so hour=0 (1970-01-01T00:xx), minute in [0, 16]
    hr = _q(spark, 'hour(last_over_time({app="click"}[1h]))')
    assert {r["value"] for r in hr.select("value").distinct().collect()} == {0.0}
    dow = _q(spark, 'day_of_week(last_over_time({app="click"}[1h]))')
    assert {r["value"] for r in dow.select("value").distinct().collect()} == {4.0}  # 1970-01-01 = Thursday
    dim = _q(spark, 'days_in_month(last_over_time({app="click"}[1h]))')
    assert {r["value"] for r in dim.select("value").distinct().collect()} == {31.0}


def test_sort_desc(spark):
    out = _q(spark, 'sort_desc(sum by (app) (last_over_time({app=~".+"}[1h])))')
    rows = out.collect()
    by_ts = {}
    for r in rows:
        by_ts.setdefault(r["timestamp_ns"], []).append(r["value"])
    assert all(vs == sorted(vs, reverse=True) for vs in by_ts.values())


def test_count_values(spark):
    out = _q(spark, 'count_values("v", sgn(last_over_time({app=~".+"}[1h])))')
    rows = out.collect()
    assert rows
    # every row carries the value label; counts sum to the input rows
    assert all("v" in r["labels"] for r in rows)
    base_n = _q(spark, 'sgn(last_over_time({app=~".+"}[1h]))').count()
    assert sum(r["value"] for r in rows) == base_n
    # labels otherwise preserved (default keeps all labels)
    assert all("app" in r["labels"] for r in rows)


def test_label_replace_and_join_from_text(spark):
    out = _q(
        spark,
        'label_replace(last_over_time({app="click"}[1h]), "svc", "svc-$1", "app", "(.+)")',
    )
    assert all(r["labels"]["svc"] == "svc-click" for r in out.limit(5).collect())
    joined = _q(
        spark,
        'label_join(last_over_time({app="click"}[1h]), "ai", "/", "app", "instance")',
    )
    r = joined.first()
    assert r["labels"]["ai"] == r["labels"]["app"] + "/" + r["labels"]["instance"]


def test_absent_from_text(spark):
    # a selector that matches nothing -> 1 at every grid step
    out = _q(spark, 'absent(last_over_time({app="nosuch"}[1h]))')
    rows = out.collect()
    assert rows and all(r["value"] == 1.0 for r in rows)
    # a matching selector: absent only on steps with no data, so the
    # match-nothing grid is a strict superset
    n_all = _q(spark, 'absent({app=~".+"})').count()
    assert 0 < n_all < len(rows)


def test_histogram_quantile_from_text(spark):
    # synthetic le-buckets via count_values is overkill; drive the text
    # path with label_replace to fabricate an le label per series
    out = _q(
        spark,
        'histogram_quantile(0.5, label_replace(count_over_time({app=~".+"}[1h]),'
        ' "le", "+Inf", "app", ".*"))',
    )
    assert out.count() > 0


def test_absent_over_time(spark):
    # no matching series: every range bucket fires
    out = _q(spark, 'absent_over_time({app="nosuch"}[1h])')
    rows = out.collect()
    assert rows and all(r["value"] == 1.0 for r in rows)
    assert all(r["timestamp_ns"] % 3_600_000_000_000 == 0 for r in rows)
    # matching everywhere-dense selector: strictly fewer absent buckets
    n = _q(spark, 'absent_over_time({app=~".+"}[1h])').count()
    assert n < len(rows)


def test_time_vector_scalar_pi(spark):
    import math

    # time() - timestamp(v) == 0 for every sample (both are the step ts)
    out = _q(spark, 'time() - timestamp(last_over_time({app="click"}[1h]))')
    assert {r["value"] for r in out.select("value").distinct().collect()} == {0.0}
    # vector(1): label-less constant series on the step grid
    v = _q(spark, 'vector(1)')
    assert {r["value"] for r in v.select("value").distinct().collect()} == {1.0}
    assert v.first()["labels"] == {}
    # pi() folds to a scalar usable in arithmetic
    p = _q(spark, 'sgn(last_over_time({app="click"}[1h])) * pi()')
    vals = {round(r["value"], 6) for r in p.select("value").distinct().collect()}
    assert vals <= {round(math.pi, 6), 0.0, round(-math.pi, 6)}


def test_scalar_fn(spark):
    # scalar over a 1-series vector: usable as a per-step scalar operand
    q = (
        'sum by (app) (count_over_time({level="info"}[1h]))'
        ' / scalar(sum(count_over_time({level="info"}[1h])))'
    )
    out = _q(spark, q)
    rows = out.collect()
    assert rows and all(0.0 <= r["value"] <= 1.0 + 1e-9 for r in rows)
    # scalar of a multi-series vector -> NaN (daily buckets are dense:
    # every day has several apps)
    import math as m

    bad = _q(spark, 'scalar(sum by (app) (count_over_time({level="info"}[1d])))')
    assert all(m.isnan(r["value"]) for r in bad.collect())


def test_inverse_hyperbolic_fns(spark):
    import math

    # asinh is total; verify against math.asinh on a known sample
    row = _q(spark, 'asinh(sgn(last_over_time({app="click"}[1h])))').select("value").first()
    assert min(
        abs(row["value"] - x) for x in (0.0, math.asinh(1.0), math.asinh(-1.0))
    ) < 1e-12
    # acosh(x>=1) / atanh(|x|<1) defined on the sgn outputs used
    row = _q(spark, 'acosh(sgn(last_over_time({app="click"}[1h])) * 0 + 1)').first()
    assert row["value"] == 0.0
    row = _q(spark, 'atanh(sgn(last_over_time({app="click"}[1h])) * 0)').first()
    assert row["value"] == 0.0


# ------------------------------ round-9: experimental fn long tail
# (ref: reader/router/prometheus_query_range.go:24-45 — the reference
# proxies these to its embedded engine; native branches here)


def test_ts_of_over_time_family(spark):
    """ts_of_* return the TIMESTAMP (unix sec) of the window extreme."""
    base = _q(spark, 'max_over_time({app="view"}[1h])').collect()
    tmax = _q(spark, 'ts_of_max_over_time({app="view"}[1h])').collect()
    assert len(base) == len(tmax)
    # every returned value is a plausible unix-seconds stamp inside its
    # own window bucket
    for r in tmax:
        lo = r["timestamp_ns"] / 1e9
        assert lo <= r["value"] < lo + 3600
    # ts_of_last == max sample ts per bucket (direct recompute)
    last = {
        (r["fingerprint"], r["timestamp_ns"]): r["value"]
        for r in _q(
            spark, 'ts_of_last_over_time({app="view"}[1h])'
        ).collect()
    }
    m = metric(spark).filter(F.col("labels")["app"] == "view")
    want = (
        m.groupBy(
            "fingerprint",
            (
                F.col("timestamp_ns")
                - F.col("timestamp_ns") % F.lit(3_600_000_000_000)
            ).alias("b"),
        )
        .agg((F.max("timestamp_ns") / F.lit(1e9)).alias("t"))
        .collect()
    )
    assert len(want) == len(last)
    for r in want:
        assert abs(last[(r["fingerprint"], r["b"])] - r["t"]) < 1e-6


def test_ts_of_max_latest_tie_wins(spark):
    """Upstream scans with >= — the LATEST tied sample's ts wins."""
    rows = [(1, 1_000_000_000, 5.0), (1, 2_000_000_000, 5.0),
            (1, 3_000_000_000, 4.0)]
    df = spark.createDataFrame(
        rows, "fingerprint long, timestamp_ns long, value double"
    ).withColumn("labels", F.expr("map('app','t')"))
    got = (
        df.groupBy("fingerprint")
        .agg(
            F.max(
                F.struct(
                    F.col("value").alias("v"),
                    F.col("timestamp_ns").alias("t"),
                )
            ).getField("t").alias("t")
        )
        .first()["t"]
    )
    assert got == 2_000_000_000  # not the earlier 1s tie


def test_sort_by_label_ordering(spark):
    q = 'sort_by_label(max_over_time({app=~"click|view"}[1h]), "instance", "app")'
    rows = _q(spark, q).collect()
    keys = [
        (
            r["timestamp_ns"],
            r["labels"].get("instance", ""),
            r["labels"].get("app", ""),
        )
        for r in rows
    ]
    assert keys == sorted(keys)
    rows_d = _q(
        spark,
        'sort_by_label_desc(max_over_time({app=~"click|view"}[1h]), "instance", "app")',
    ).collect()
    keys_d = [
        (
            r["timestamp_ns"],
            r["labels"].get("instance", ""),
            r["labels"].get("app", ""),
        )
        for r in rows_d
    ]
    # within each timestamp the desc order is the exact reverse of asc
    # (the ordering key is total: requested labels + canonical string)
    from itertools import groupby

    asc_by_ts = {
        ts: [k[1:] for k in grp]
        for ts, grp in groupby(keys, key=lambda k: k[0])
    }
    for ts, grp in groupby(keys_d, key=lambda k: k[0]):
        assert [k[1:] for k in grp] == list(reversed(asc_by_ts[ts]))
    # same multiset of elements either way
    assert sorted(keys) == sorted(keys_d)


def test_limitk_per_group_and_passthrough(spark):
    out = _q(
        spark,
        'limitk(2, max_over_time({app=~"click|view|error"}[1h])) by (app)',
    )
    base = _q(spark, 'max_over_time({app=~"click|view|error"}[1h])')
    # ≤ 2 series per (step, app) group
    per = (
        out.groupBy("timestamp_ns", F.col("labels")["app"].alias("app"))
        .count()
        .collect()
    )
    assert per and all(r["count"] <= 2 for r in per)
    # selection is a pure filter: every kept row exists in the base
    assert out.join(
        base, ["fingerprint", "timestamp_ns", "value"], "left_anti"
    ).count() == 0


def test_limit_ratio_complement_contract(spark):
    """limit_ratio(r) ∪ limit_ratio(-(1-r)) == the full vector, disjoint
    (upstream's documented complement property)."""
    base = 'max_over_time({app=~"click|view"}[1h])'
    pos = _q(spark, f"limit_ratio(0.3, {base})")
    neg = _q(spark, f"limit_ratio(-0.7, {base})")
    full = _q(spark, base)
    n_pos, n_neg, n_full = pos.count(), neg.count(), full.count()
    assert n_pos + n_neg == n_full
    assert (
        pos.select("fingerprint", "timestamp_ns")
        .intersect(neg.select("fingerprint", "timestamp_ns"))
        .count()
        == 0
    )


def test_experimental_unknown_still_raises(spark):
    """The allowlist guard must keep failing loudly for any FUTURE
    experimental name (none of the known set raises anymore)."""
    import pytest as _pt

    from gigapipe_spark.logql.parser import LogQLSyntaxError
    from gigapipe_spark.promql import parser as PP

    PP.EXPERIMENTAL_FNS.add("frobnicate_over_time")
    try:
        with _pt.raises(LogQLSyntaxError, match="experimental"):
            PP.parse('frobnicate_over_time({app="x"}[5m])')
    finally:
        PP.EXPERIMENTAL_FNS.discard("frobnicate_over_time")
