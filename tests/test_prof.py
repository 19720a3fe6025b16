"""Profile tree algebra vs oracle (merged tree = direct lineitem agg)."""

from pyspark.sql import functions as F

from gigapipe_spark.prof.tree import (
    diff_trees,
    flamegraph_levels,
    merge_trees,
    render_dot,
    resolve_functions,
)
from gigapipe_spark.sources import views
from tests.conftest import SF_DIR
from tests.oracle_utils import assert_match

MERGED_ORACLE = """
SELECT CAST(0 AS BIGINT) AS id, CAST(0 AS BIGINT) AS parent, CAST(0 AS BIGINT) AS fn_id,
       CAST(0 AS BIGINT) AS self,
       CAST(sum(floor(o_totalprice * 1000)) AS BIGINT) AS total,
       count(*) AS n_samples
FROM orders WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem)
UNION ALL
SELECT CAST(code AS BIGINT), 0, CAST(code AS BIGINT),
       CAST(s AS BIGINT), CAST(s AS BIGINT), n
FROM (
  SELECT CASE l_returnflag WHEN 'R' THEN 1 WHEN 'A' THEN 2 ELSE 3 END AS code,
         sum(floor(l_extendedprice * 1000)) AS s,
         count(DISTINCT (l_orderkey,
               CASE l_returnflag WHEN 'R' THEN 1 WHEN 'A' THEN 2 ELSE 3 END)) AS n
  FROM lineitem GROUP BY 1
)
"""


def test_merge_trees_matches_oracle(spark):
    prof = views.profiles(spark, SF_DIR)
    merged = merge_trees(prof)
    assert_match(merged, MERGED_ORACLE, SF_DIR)


def test_resolve_and_levels(spark):
    prof = views.profiles(spark, SF_DIR)
    merged = resolve_functions(merge_trees(prof), prof)
    rows = merged.collect()
    names = {r["fn_id"]: r["fn_name"] for r in rows}
    assert names[0] == "root" and names[1] == "flag_R"
    levels = flamegraph_levels(rows)
    assert len(levels) == 2  # root level + flag level
    assert levels[0][0]["fn_id"] == 0
    assert {d["fn_id"] for d in levels[1]} == {1, 2, 3}
    dot = render_dot(rows, names)
    assert "digraph" in dot and "root" in dot and "n0 -> n1" in dot


def test_diff_trees(spark):
    prof = views.profiles(spark, SF_DIR)
    urgent = merge_trees(prof.filter(F.col("service_name") == "svc-1-URGENT"))
    low = merge_trees(prof.filter(F.col("service_name") == "svc-5-LOW"))
    d = diff_trees(urgent, low).collect()
    by_id = {r["id"]: r for r in d}
    # both selections have a root; deltas are consistent
    assert 0 in by_id
    r = by_id[0]
    assert r["total_delta"] == r["total_right"] - r["total_left"]
    assert all(
        row["self_delta"] == row["self_right"] - row["self_left"] for row in d
    )


# ------------------------------------------------ selector surface

def test_profile_selector_parse():
    import pytest

    from gigapipe_spark.prof.selector import (
        ProfSelectorError,
        parse_profile_selector,
    )

    assert parse_profile_selector("{}") == []
    assert parse_profile_selector("") == []
    sels = parse_profile_selector('{service_name="svc-1-URGENT", status!="F"}')
    assert [(s.name, s.op, s.val) for s in sels] == [
        ("service_name", "=", "svc-1-URGENT"),
        ("status", "!=", "F"),
    ]
    sels = parse_profile_selector('{__name__=~"process.*", priority=`2-HIGH`}')
    assert sels[0].op == "=~" and sels[1].val == "2-HIGH"
    with pytest.raises(ProfSelectorError):
        parse_profile_selector('{status"F"}')
    with pytest.raises(ProfSelectorError):
        parse_profile_selector('{status="F"} trailing')


def test_profile_fingerprints_global_vs_gin(spark):
    from gigapipe_spark.prof.selector import (
        parse_profile_selector,
        profile_fingerprints,
    )

    # pseudo-label __name__ matches the type_id head (global matcher)
    all_fp = profile_fingerprints(
        spark, SF_DIR, [parse_profile_selector('{__name__="process_cpu"}')]
    ).count()
    none_fp = profile_fingerprints(
        spark, SF_DIR, [parse_profile_selector('{__name__="nope"}')]
    ).count()
    total = views.profiles_series(spark, SF_DIR).count()
    assert all_fp == total and none_fp == 0
    # kv matcher resolves via the GIN; negation refines
    urgent = profile_fingerprints(
        spark, SF_DIR, [parse_profile_selector('{priority="1-URGENT"}')]
    )
    got = views.profiles_series(spark, SF_DIR).join(
        urgent, "fingerprint", "left_semi"
    )
    assert got.filter(F.col("service_name") != "svc-1-URGENT").count() == 0
    neg = profile_fingerprints(
        spark, SF_DIR, [parse_profile_selector('{priority!="1-URGENT"}')]
    ).count()
    assert neg == total - urgent.count()


def test_profile_fingerprints_multi_script_union(spark):
    from gigapipe_spark.prof.selector import (
        parse_profile_selector,
        profile_fingerprints,
    )

    one = profile_fingerprints(
        spark, SF_DIR, [parse_profile_selector('{priority="1-URGENT"}')]
    ).count()
    two = profile_fingerprints(
        spark,
        SF_DIR,
        [
            parse_profile_selector('{priority="1-URGENT"}'),
            parse_profile_selector('{priority="2-HIGH"}'),
        ],
    ).count()
    assert two > one  # union of the two scripts, distinct


def test_pyroscope_series_filter_labels(spark):
    from gigapipe_spark.api import Engine

    e = Engine(spark, SF_DIR)
    df = e.pyroscope_series(['{priority="1-URGENT"}'], label_names=["status"])
    row = df.first()
    assert set(row["labels"].keys()) == {"status"}


def test_pyroscope_render_with_selector(spark):
    from gigapipe_spark.api import Engine

    levels = Engine(spark, SF_DIR).pyroscope_render(
        selector='{service_name="svc-1-URGENT"}'
    )
    assert levels and levels[0][0]["fn_id"] == 0
