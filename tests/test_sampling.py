"""Sampling / mixing / packing / scrubbing operators (datapipe.sampling,
datapipe.scrub) — determinism, rate accuracy, packing invariants, and
redaction behavior on crafted rows (the synthetic corpus is PII-free)."""

import pytest
from pyspark.sql import functions as F

from gigapipe_spark.datapipe import sampling, scrub
from gigapipe_spark.sources import views
from tests.conftest import SF_DIR


def docs(spark):
    return views.documents(spark, SF_DIR)


def test_hash_sample_deterministic_and_calibrated(spark):
    d = docs(spark)
    a = sorted(r.doc_id for r in sampling.hash_sample(d, 0.3, seed="s").collect())
    b = sorted(r.doc_id for r in sampling.hash_sample(d, 0.3, seed="s").collect())
    assert a == b  # same seed → same set, independent of run
    n = d.count()
    assert 0.15 * n < len(a) < 0.45 * n  # calibrated around the rate
    # monotone: a higher rate keeps a superset (thresholds nest)
    big = {r.doc_id for r in sampling.hash_sample(d, 0.6, seed="s").collect()}
    assert set(a) <= big
    # a different seed draws a different set
    c = sorted(r.doc_id for r in sampling.hash_sample(d, 0.3, seed="t").collect())
    assert a != c


def test_hash_sample_rate_one_keeps_all(spark):
    d = docs(spark)
    assert sampling.hash_sample(d, 1.0).count() == d.count()
    assert sampling.hash_sample(d, 0.0).count() == 0


def test_hash_sample_rejects_bad_rate():
    with pytest.raises(ValueError):
        sampling.rate_threshold_hex(1.5)


def test_stratified_sample_rates_per_stratum(spark):
    d = docs(spark)
    out = sampling.stratified_sample(
        d, rates={"en": 0.2, "de": 1.0}, default_rate=0.0
    )
    per = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    totals = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert per["de"] == totals["de"]  # rate 1.0 → everything
    assert 0 < per["en"] < totals["en"]  # downsampled
    assert set(per) == {"en", "de"}  # default 0 drops the rest


def test_mixture_plan_rates(spark):
    d = docs(spark)
    plan = {
        r["stratum"]: r
        for r in sampling.mixture_plan(
            d, weights={"src0": 6.0, "src1": 3.0, "src2": 1.0}, budget=60
        ).collect()
    }
    assert set(plan) == {"src0", "src1", "src2"}
    assert abs(plan["src0"]["weight"] - 0.6) < 1e-9
    for row in plan.values():
        assert 0.0 <= row["rate"] <= 1.0
        if row["target_n"] >= row["n_docs"]:
            assert row["rate"] == 1.0  # never oversample a small stratum
        else:
            assert abs(row["rate"] - row["target_n"] / row["n_docs"]) < 1e-6


def test_pack_sequences_invariants(spark):
    budget = 256
    out = sampling.pack_sequences(docs(spark), budget_tokens=budget, n_buckets=8)
    rows = out.collect()
    assert len(rows) == docs(spark).count()  # every doc assigned
    by_bucket: dict[int, list] = {}
    for r in rows:
        by_bucket.setdefault(r.bucket, []).append(r)
    for bucket, rs in by_bucket.items():
        rs.sort(key=lambda r: r.doc_id)
        cum = 0
        prev_seq = 0
        for r in rs:
            assert r.token_offset == cum  # exclusive running count
            assert r.seq_id == cum // budget  # doc belongs where it starts
            assert r.seq_id >= prev_seq  # seq ids are monotone per bucket
            prev_seq = r.seq_id
            cum += r.n_tokens
    # parallelism: the fixture spreads across all 8 buckets
    assert len(by_bucket) == 8


def test_scrub_pii_redacts_crafted_rows(spark):
    rows = [
        (1, "contact bob@example.com or alice@test.org for details"),
        (2, "server at 10.0.42.7 responded"),
        (3, "call +4915112345678 or 555-867-5309 now"),
        (4, "no pii here at all"),
        (5, "mixed: a@b.io from 192.168.1.1 dial 555-123-4567"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in scrub.scrub_pii(d).collect()}
    assert out[1].n_emails == 2 and "<EMAIL>" in out[1].clean_text
    assert "bob@example.com" not in out[1].clean_text
    assert out[2].n_ipv4s == 1 and "<IP>" in out[2].clean_text
    assert out[3].n_phones == 2 and out[3].clean_text.count("<PHONE>") == 2
    assert out[4].clean_text == "no pii here at all"
    assert (out[4].n_emails, out[4].n_ipv4s, out[4].n_phones) == (0, 0, 0)
    assert (out[5].n_emails, out[5].n_ipv4s, out[5].n_phones) == (1, 1, 1)


def test_scrub_pii_oracle_parity_on_crafted_rows(spark, tmp_path):
    """The oracle SQL mirrors the Spark stages byte-for-byte — proven on
    rows that actually contain PII (the sf corpus has none)."""
    import duckdb

    rows = [
        (1, "bob@example.com met 10.0.0.1 and +123456789"),
        (2, "clean text"),
        (3, "x 555-000-1111 y b@c.de z"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    pq = str(tmp_path / "pii.parquet")
    d.write.parquet(pq)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW pii AS SELECT * FROM read_parquet('{pq}/*.parquet')")
    odf = con.execute(scrub.scrub_pii_oracle_sql("pii")).df()
    orows = {
        int(r.doc_id): r for r in odf.itertuples(index=False)
    }
    for r in scrub.scrub_pii(d).collect():
        o = orows[r.doc_id]
        assert r.clean_text == o.clean_text
        assert (r.n_emails, r.n_ipv4s, r.n_phones) == (
            o.n_emails,
            o.n_ipv4s,
            o.n_phones,
        )


def test_contamination_ngrams_flags_planted_overlap(spark):
    corpus = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog today"),
            (11, "completely different words about spark query planning here"),
            (12, "quick brown fox jumps over the lazy dog again and again"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "a quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in scrub.contamination_ngrams(corpus, bench, n=5).collect()}
    assert 10 in out and 12 in out  # share 5-grams with the benchmark
    assert 11 not in out  # clean doc is absent (>=1-hit semantics)
    assert 0 < out[10].contamination <= 1.0
    assert out[10].n_hits <= out[10].n_ngrams


def test_contamination_plan_broadcasts_benchmark(spark):
    d = docs(spark)
    plan = scrub.contamination_ngrams(
        d, d.filter(F.col("doc_id") < 25), n=5
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # the benchmark side must broadcast


def test_shuffle_order_deterministic_permutation(spark):
    d = docs(spark)
    n = d.count()
    a = sampling.shuffle_order(d, seed="s", n_buckets=8).collect()
    b = sampling.shuffle_order(d, seed="s", n_buckets=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # reproducible
    # (bucket, pos) is a proper addressing: unique per doc, contiguous pos
    addr = {(r.bucket, r.pos) for r in a}
    assert len(addr) == n
    by_bucket: dict[int, list[int]] = {}
    for r in a:
        by_bucket.setdefault(r.bucket, []).append(r.pos)
    for poss in by_bucket.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # a different seed yields a different order
    c = sampling.shuffle_order(d, seed="t", n_buckets=8).collect()
    assert {(r.doc_id, r.bucket, r.pos) for r in c} != {
        (r.doc_id, r.bucket, r.pos) for r in a
    }


def test_bpe_pretoken_count(spark):
    from gigapipe_spark.datapipe import textstats

    d = spark.createDataFrame(
        [(1, "Hello, world! x2"), (2, "  spaced   out  "), (3, "")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in textstats.token_count(d).collect()}
    # "Hello" ",", " world", "!", " x", "2" -> 6 pieces
    assert out[1].n_bpe_pretokens == 6
    assert out[2].n_bpe_pretokens == 2  # " spaced", " out"
    assert out[3].n_bpe_pretokens == 0


def test_unigram_logprob_quality_signal(spark):
    """Repeated-word docs score higher (more probable) than unique-word
    docs under the corpus distribution; all probs are < 0."""
    from gigapipe_spark.datapipe import textstats

    d = spark.createDataFrame(
        [
            (1, "common common common common"),
            (2, "common rare1 rare2 rare3"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in textstats.unigram_logprob(d).collect()}
    assert out[1].mean_logprob > out[2].mean_logprob
    assert all(r.mean_logprob < 0 for r in out.values())
    assert out[1].n_tokens == 4 and out[2].n_tokens == 4


def test_stratified_default_rate_one_keeps_unlisted(spark):
    d = docs(spark)
    out = sampling.stratified_sample(d, rates={"en": 0.0}, default_rate=1.0)
    per = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    totals = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert "en" not in per  # rate 0 drops the listed stratum entirely
    for lang in totals:
        if lang != "en":
            assert per[lang] == totals[lang]  # default 1.0 keeps ALL rows
