"""Pattern mining: fixed-corpus cluster tests (FIXTURES.md F8: cluster
count + <_> placement on a fixed corpus) + distributed run."""

from gigapipe_spark.patterns.cluster import (
    GENERALIZED,
    cluster_key,
    cluster_lines,
    mine_patterns,
    read_patterns,
    token_cost,
)


def test_token_costs():
    assert token_cost("199.15.1.2") == 1
    assert token_cost("2024-01-01T10:00:00Z") == 1
    assert token_cost("550e8400-e29b-41d4-a716-446655440000") == 1
    assert token_cost("42") == 1
    assert token_cost("GET") == 2
    assert token_cost("/api/users") == 3
    assert token_cost("connected") == 5


def test_cluster_key_skips_params():
    assert cluster_key("42 connected from 10.0.0.1".split()) == "connected"
    assert cluster_key("GET /api/x 200".split()) == "GET"  # no plain word → first token


def test_merge_generalizes_numbers():
    lines = [
        "user 17 logged in from 10.0.0.1",
        "user 42 logged in from 10.0.0.9",
        "user 58 logged in from 172.16.0.4",
        "disk full on /dev/sda1",
    ]
    clusters = cluster_lines(lines, similarity=0.6)
    assert len(clusters) == 2
    merged = clusters[0]
    assert merged.samples_count == 3
    assert merged.tokens == ["user", GENERALIZED, "logged", "in", "from", GENERALIZED]


def test_dissimilar_lines_stay_separate():
    lines = ["alpha beta gamma delta", "one two three four"]
    clusters = cluster_lines(lines, similarity=0.6)
    assert len(clusters) == 2


def test_merge_rule_threshold():
    # one differing plain word out of 4 (cost 5/20 = 0.25): merges at
    # sim 0.6 (0.25 <= 0.4), not at sim 0.8 (0.25 > 0.2)
    a = "service started on port"
    b = "service stopped on port"
    assert len(cluster_lines([a, b], similarity=0.6)) == 1
    assert len(cluster_lines([a, b], similarity=0.8)) == 2


def test_distributed_mining(spark):
    # all within one 10m flush bucket (600e9 ns) — clustering state is
    # per (fingerprint, bucket), matching the reference's 10m flush
    data = [
        (1, 1_300_000_000_000, "user 17 logged in from 10.0.0.1"),
        (1, 1_350_000_000_000, "user 42 logged in from 10.0.0.9"),
        (1, 1_400_000_000_000, "disk full on /dev/sda1"),
        (2, 1_450_000_000_000, "user 99 logged in from 10.1.1.1"),
    ]
    df = spark.createDataFrame(
        data, "fingerprint long, timestamp_ns long, string string"
    )
    pats = mine_patterns(df, similarity=0.6).cache()
    rows = pats.collect()
    # fingerprint 1: 2 clusters, fingerprint 2: 1 cluster
    by_fp = {}
    for r in rows:
        by_fp.setdefault(r["fingerprint"], []).append(r)
    assert len(by_fp[1]) == 2
    assert len(by_fp[2]) == 1
    merged = [r for r in by_fp[1] if r["samples_count"] == 2][0]
    assert merged["tokens"][1] == GENERALIZED
    agg = read_patterns(pats)
    assert agg.count() == 3
