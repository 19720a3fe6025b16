"""Byte-pair-encoding training and tokenization over a document corpus
(Sennrich et al. 2016 — the standard subword vocabulary build for LLM
training data).

Shape at 100 TB, honestly split:

- ``word_counts``: the ONLY pass over the corpus — one explode +
  groupBy(word) count. Distributed; the result is the WORD VOCABULARY
  (counts per distinct word), which is vocabulary-sized (millions of
  rows at web scale, MB–GB), not corpus-sized.
- ``bpe_train``: classic BPE trains on that weighted vocabulary, not on
  the corpus: each merge step counts adjacent symbol pairs across
  distinct words and fuses the argmax pair. State is broadcast-scale,
  and every merge depends on the previous one, so this is an index
  BUILD on collected vocab (driver-side dict), exactly like fitting IVF
  centroids — NOT a per-row operator. The corpus never moves, and the
  collected vocabulary is bounded (frequency floor + distributed
  top-K TakeOrdered) so the driver never holds a web-scale distinct-
  word table.
- ``bpe_token_count``: applying learned merges is corpus-scale and
  embarrassingly parallel — merges broadcast to an Arrow-batched
  mapInPandas stage with a per-batch word→token-count memo (Zipf makes
  the memo hit rate very high). This is the "real BPE merges run as a
  Pandas-UDF stage" seam promised by textstats.token_count.

Determinism: pair-count ties break lexicographically, so the merge
list is a pure function of the corpus.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gigapipe_spark.datapipe.dedup import words_col

END = "</w>"  # end-of-word marker, standard BPE


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over the corpus — the one distributed pass."""
    return (
        docs.select(F.explode(words_col(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _pair_counts(vocab: dict[tuple, int]) -> Counter:
    pairs: Counter = Counter()
    for syms, cnt in vocab.items():
        for a, b in zip(syms, syms[1:]):
            pairs[(a, b)] += cnt
    return pairs


def _merge_vocab(vocab: dict[tuple, int], pair: tuple) -> dict[tuple, int]:
    a, b = pair
    fused = a + b
    out = {}
    for syms, cnt in vocab.items():
        merged, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                merged.append(fused)
                i += 2
            else:
                merged.append(syms[i])
                i += 1
        out[tuple(merged)] = out.get(tuple(merged), 0) + cnt
    return out


def bpe_train(
    docs: DataFrame,
    num_merges: int = 50,
    text_col: str = "text",
    min_count: int = 1,
    max_vocab_words: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Learn `num_merges` merges from the corpus. The distributed part
    is the word count; the merge loop runs on the collected vocabulary
    (see module docstring). Ties break lexicographically.

    The driver-side collect is BOUNDED: a frequency floor (`min_count`)
    plus a top-`max_vocab_words` cap, both applied DISTRIBUTED
    (filter + orderBy().limit() = TakeOrdered, no full-vocab driver
    materialization — the same fix the IVF trainer got). On a web-scale
    corpus the distinct-word table is 10^8–10^9 rows; capping to the
    most frequent million is standard BPE practice (merge counts are
    dominated by frequent words under Zipf) and changes nothing on any
    corpus whose vocabulary already fits the cap. Ties at the cap
    boundary break deterministically by (cnt desc, word)."""
    wc_df = word_counts(docs, text_col)
    if min_count > 1:
        wc_df = wc_df.filter(F.col("cnt") >= min_count)
    wc = (
        wc_df.orderBy(F.col("cnt").desc(), F.col("w"))
        .limit(max_vocab_words)
        .collect()
    )
    vocab = {tuple(r["w"]) + (END,): r["cnt"] for r in wc}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs = _pair_counts(vocab)
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        vocab = _merge_vocab(vocab, best)
    return merges


def _encode_word(word: str, ranks: dict[tuple, int]) -> int:
    """Number of BPE tokens for one word under the learned merges."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return len(syms)


def bpe_token_count(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_bpe_tokens): apply the learned merges to every doc.
    Arrow-batched; the merge table is closure-captured (broadcast with
    the task) and a per-batch word memo collapses repeated words."""
    import pandas as pd

    ranks = {tuple(p): i for i, p in enumerate(merges)}

    def run(batches):
        memo: dict[str, int] = {}
        for pdf in batches:
            counts = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                n = 0
                for w in (text or "").split():
                    if w not in memo:
                        memo[w] = _encode_word(w, ranks)
                    n += memo[w]
                counts.append((doc_id, n))
            yield pd.DataFrame(counts, columns=[id_col, "n_bpe_tokens"])

    return docs.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} long, n_bpe_tokens long"
    )
