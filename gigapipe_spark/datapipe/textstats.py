"""Text analysis operators: token counting, quality scoring, language-ID
heuristics, document fingerprinting. All pure built-in expressions —
deterministic and oracle-expressible in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gigapipe_spark.datapipe.dedup import words_col

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "on", "for", "with"]

# tiny per-language marker vocabularies for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "les"],
    "es": ["el", "y", "los"],
}


# GPT-2-style pre-tokenizer, restricted to the regex subset Java and
# RE2 evaluate identically (no lookahead): a token is an optionally
# space-prefixed letter run, digit run, or symbol run. Real BPE then
# splits INSIDE these pieces, so this count is the pre-tokenizer's
# piece count — a much tighter budget estimate than chars/4.
BPE_PRETOKEN_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def token_count(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace tokens, a BPE pre-tokenizer piece count, and the
    4-chars/token rule-of-thumb estimate (real BPE merges run as a
    Pandas-UDF stage over the pre-tokenized pieces)."""
    ws = words_col(F.col(text_col))
    return docs.select(
        F.col(id_col),
        F.size(ws).alias("n_tokens"),
        F.length(text_col).alias("n_chars"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_PRETOKEN_RE), 0))
        .cast("long")
        .alias("n_bpe_pretokens"),
        F.ceil(F.length(text_col) / 4).cast("long").alias("n_subwords_est"),
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Length/punctuation/stopword/repetition heuristics (the standard
    pre-training quality-filter family)."""
    text = F.col(text_col)
    ws = words_col(text)
    n_tokens = F.size(ws)
    n_chars = F.length(text)
    punct = n_chars - F.length(F.regexp_replace(text, r"[.,!?;:]", ""))
    stop_hits = F.size(F.filter(ws, lambda w: F.lower(w).isin(*STOPWORDS)))
    distinct_ratio = F.size(F.array_distinct(ws)) / F.greatest(n_tokens, F.lit(1))
    mean_word_len = (
        F.aggregate(ws, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w))
        / F.greatest(n_tokens, F.lit(1))
    )
    return docs.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        F.round(punct / F.greatest(n_chars, F.lit(1)), 6).alias("punct_ratio"),
        F.round(stop_hits / F.greatest(n_tokens, F.lit(1)), 6).alias("stopword_ratio"),
        F.round(distinct_ratio, 6).alias("distinct_token_ratio"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
    )


def _marker_score(text: Column, markers: list[str]) -> Column:
    ws = words_col(text)
    return F.size(F.filter(ws, lambda w: F.lower(w).isin(*markers)))


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Marker-word language scores + argmax prediction (deterministic
    tiebreak by language code). A real model slots in as a Pandas UDF;
    the plumbing (schema, scoring shape) is identical."""
    text = F.col(text_col)
    scores = {lang: _marker_score(text, m) for lang, m in LANG_MARKERS.items()}
    pairs = F.array(
        *[
            F.struct(scores[lang].alias("score"), F.lit(lang).alias("lang"))
            for lang in sorted(LANG_MARKERS)
        ]
    )
    best = F.array_max(pairs)  # struct compare: score first, then lang
    cols = [F.col(id_col)]
    cols += [scores[lang].alias(f"score_{lang}") for lang in sorted(LANG_MARKERS)]
    cols.append(best["lang"].alias("pred_lang"))
    return docs.select(*cols)


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Document fingerprints: exact digest, bag digest (order-insensitive)
    and a shingle-set digest (the rolling-hash family)."""
    text = F.col(text_col)
    ws = words_col(text)
    bag = F.md5(F.concat_ws(" ", F.array_sort(ws)))
    from gigapipe_spark.datapipe.dedup import shingles_col

    shingle_digest = F.md5(F.concat_ws("|", F.array_sort(shingles_col(text, 3))))
    return docs.select(
        F.col(id_col),
        F.md5(text).alias("exact_digest"),
        bag.alias("bag_digest"),
        shingle_digest.alias("shingle_digest"),
    )


def unigram_logprob(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """CCNet-style quality proxy: mean unigram log-probability of each
    doc under the CORPUS's own word distribution (the "stupid LM"
    perplexity filter — docs of improbable words score low, boilerplate
    scores high; filter both tails).

    Two aggregates, both scale-correct: (1) the unigram table is one
    word-count groupBy — vocabulary-sized, millions of rows at 100 TB,
    comfortably the BROADCAST side; (2) scoring is explode → broadcast
    join → per-doc mean. No smoothing is needed because every doc word
    is by construction in the corpus table.

    Output: (doc_id, n_tokens, mean_logprob) — natural-log, rounded 6.
    """
    words = docs.select(
        F.col(id_col), F.explode(words_col(F.col(text_col))).alias("w")
    )
    # corpus word total as a lazy 1-row broadcast (no driver action)
    totals = words.agg(F.count(F.lit(1)).cast("double").alias("total"))
    vocab = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(totals))
    )
    scored = words.join(F.broadcast(vocab), "w").select(
        id_col, F.log(F.col("cnt") / F.col("total")).alias("lp")
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.round(F.avg("lp"), 6).alias("mean_logprob"),
    )
