"""BPE training + tokenization vs an independent apply-in-order Python
reference (the two classic BPE formulations — rank-greedy and
merge-in-order — are equivalent and must agree)."""

import random

from gigapipe_spark.datapipe import bpe
from tests.conftest import SF_DIR


def _apply_in_order(word: str, merges: list) -> list:
    """Independent reference: fuse each merge's occurrences in learned
    order (Sennrich's original formulation)."""
    syms = list(word) + [bpe.END]
    for a, b in merges:
        i, out = 0, []
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_bpe_train_hand_example(spark):
    d = spark.createDataFrame(
        [(1, "low low low"), (2, "lower lower"), (3, "newest")],
        "doc_id long, text string",
    )
    merges = bpe.bpe_train(d, num_merges=4)
    # (l,o) and (o,w) both occur 5x; the lexicographic tie-break picks
    # (o,w), then (l,ow) dominates at 5
    assert merges[0] == ("o", "w")
    assert merges[1] == ("l", "ow")
    counts = {r.doc_id: r.n_bpe_tokens for r in bpe.bpe_token_count(d, merges).collect()}
    # after ("low",END) merges (if learned), 'low' is 1-2 tokens; exact
    # values pinned by the independent reference below
    for i, text in ((1, "low low low"), (2, "lower lower"), (3, "newest")):
        want = sum(len(_apply_in_order(w, merges)) for w in text.split())
        assert counts[i] == want, (i, counts[i], want)


def test_bpe_differential_random_corpus(spark):
    rng = random.Random(123)
    alphabet = "abcdexyz"
    docs = []
    for i in range(30):
        words = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 7)))
            for _ in range(rng.randint(1, 20))
        ]
        docs.append((i, " ".join(words)))
    d = spark.createDataFrame(docs, "doc_id long, text string")
    merges = bpe.bpe_train(d, num_merges=25)
    assert len(merges) == 25
    got = {r.doc_id: r.n_bpe_tokens for r in bpe.bpe_token_count(d, merges).collect()}
    for i, text in docs:
        want = sum(len(_apply_in_order(w, merges)) for w in text.split())
        assert got[i] == want, (i, got[i], want)


def test_bpe_registry_entry(spark):
    import __spark_entry__ as e

    df = e.queries()["text_bpe_tokenize"](spark, SF_DIR)
    rows = df.collect()
    assert len(rows) == 500
    assert all(r.n_bpe_tokens > 0 for r in rows)


def test_bpe_train_bounded_vocab_collect(spark):
    """The driver-side vocabulary collect is bounded: with a cap wider
    than the vocab the merges are unchanged; with a tight cap training
    still succeeds on the most frequent words only (r5 scale finding)."""
    docs = [
        (0, "low low lower lowest"),
        (1, "new newer newest low"),
        (2, "wide wider low new"),
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    unbounded = bpe.bpe_train(d, num_merges=10)
    assert bpe.bpe_train(d, num_merges=10, max_vocab_words=10**6) == unbounded
    capped = bpe.bpe_train(d, num_merges=10, max_vocab_words=3)
    # 3 words exhaust the pair space early but training stays sound
    assert 0 < len(capped) <= 10
    # the cap keeps the highest-count words: 'low' (4×) survives, so its
    # end-of-word merge chain must appear
    joined = ["".join(p) for p in capped]
    assert any(s.startswith("lo") for s in joined)
    # frequency floor drops hapax words before the collect
    floored = bpe.bpe_train(d, num_merges=5, min_count=2)
    assert len(floored) == 5
