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


# Gopher (Rae et al. 2021, Table A1) stopword list for the
# "has >= 2 stop words" quality rule.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def ngrams_from_words(ws: Column, n: int) -> Column:
    """Non-distinct, order-preserving word n-grams via shifted-slice
    zip_with (same CSE-safe formulation as shingles_from_words — `ws`
    appears only as a per-ROW input, so Catalyst inlining cannot
    re-tokenize per element)."""
    cnt = F.greatest(F.size(ws) - (n - 1), F.lit(0))
    parts = [F.slice(ws, j + 1, cnt) for j in range(n)]
    acc = parts[0]
    for p in parts[1:]:
        acc = F.zip_with(acc, p, lambda x, y: F.concat_ws(" ", x, y))
    return acc


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ns: tuple = (2, 3, 4),
    dup_ns: tuple = (5,),
) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    "Scaling Language Models", Table A1 — the repetition-removal family):

    - ``dup_line_frac``: fraction of lines that are duplicates of an
      earlier line — ``(n_lines - n_distinct_lines) / n_lines``.
    - ``dup_line_char_frac``: characters inside any line occurring more
      than once, over all line characters.
    - ``top_{n}gram_char_frac`` (n in ``top_ns``): characters covered by
      the single most frequent word n-gram — ``count * nonspace_chars(
      gram) / nonspace_chars(doc)`` (max over grams; ties yield the
      same coverage value, so the result is deterministic).
    - ``dup_{n}gram_char_frac`` (n in ``dup_ns``): characters covered by
      n-grams occurring more than once (overlap-ignoring upper bound,
      capped at 1.0 — the standard cheap surrogate for Gopher's exact
      character-coverage scan).

    Shape at 100 TB: one explode per granularity, every shuffle keyed by
    (doc_id[, gram]) — embarrassingly parallel per document, no global
    state. Final assembly is doc_id-keyed joins.
    """
    did = F.col(id_col)
    text = F.col(text_col)
    base = docs.select(
        did,
        text,
        F.length(F.regexp_replace(text, r"\s+", "")).alias("__nonspace"),
    )

    # ---- line-level duplicates ----
    lines = base.select(
        did,
        F.explode(F.filter(F.split(text, r"\n"), lambda l: l != "")).alias("__line"),
    )
    line_counts = (
        lines.withColumn("__len", F.length("__line"))
        .groupBy(id_col, "__line", "__len")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    line_stats = line_counts.groupBy(id_col).agg(
        F.sum("__cnt").cast("long").alias("n_lines"),
        F.round(
            (F.sum("__cnt") - F.count(F.lit(1)))
            / F.greatest(F.sum("__cnt"), F.lit(1)),
            6,
        ).alias("dup_line_frac"),
        F.round(
            F.sum(F.when(F.col("__cnt") > 1, F.col("__cnt") * F.col("__len")).otherwise(0))
            / F.greatest(F.sum(F.col("__cnt") * F.col("__len")), F.lit(1)),
            6,
        ).alias("dup_line_char_frac"),
    )

    out = base.select(did, "__nonspace").join(line_stats, id_col, "left")

    # ---- n-gram coverage ----
    ws_docs = base.withColumn("__ws", words_col(text))
    for n in tuple(top_ns) + tuple(dup_ns):
        grams = ws_docs.select(
            did,
            F.col("__nonspace"),
            F.explode(ngrams_from_words(F.col("__ws"), n)).alias("__g"),
        )
        counts = (
            grams.withColumn(
                "__glen", F.length(F.regexp_replace("__g", r"\s+", ""))
            )
            .groupBy(id_col, "__nonspace", "__g", "__glen")
            .agg(F.count(F.lit(1)).alias("__cnt"))
        )
        if n in top_ns:
            stat = counts.groupBy(id_col).agg(
                F.round(
                    F.max(F.col("__cnt") * F.col("__glen"))
                    / F.greatest(F.first("__nonspace"), F.lit(1)),
                    6,
                ).alias(f"top_{n}gram_char_frac")
            )
        else:
            stat = counts.groupBy(id_col).agg(
                F.round(
                    F.least(
                        F.sum(
                            F.when(
                                F.col("__cnt") > 1, F.col("__cnt") * F.col("__glen")
                            ).otherwise(0)
                        )
                        / F.greatest(F.first("__nonspace"), F.lit(1)),
                        F.lit(1.0),
                    ),
                    6,
                ).alias(f"dup_{n}gram_char_frac")
            )
        out = out.join(stat, id_col, "left")

    stat_cols = [c for c in out.columns if c not in (id_col, "__nonspace")]
    return out.select(
        did, *[F.coalesce(F.col(c), F.lit(0.0)).alias(c) if c != "n_lines"
               else F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
               for c in stat_cols]
    )


def gopher_quality(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher quality-filter rules (Rae et al. 2021, Table A1) as pure
    column expressions — one narrow projection, no shuffle, scan-fused:

    - 50 <= word count <= 100_000
    - 3 <= mean word length <= 10
    - symbol-to-word ratio ('#', '…', '...') <= 0.1
    - fraction of lines starting with a bullet <= 0.9
    - fraction of lines ending in an ellipsis <= 0.3
    - >= 80% of words contain an alphabetic character
    - >= 2 of the Gopher stop words

    Emits each raw signal plus the combined ``gopher_pass`` flag so a
    pipeline can re-threshold without recomputing.
    """
    text = F.col(text_col)
    ws = words_col(text)
    n_words = F.size(ws)
    safe_n = F.greatest(n_words, F.lit(1))
    mean_wl = (
        F.aggregate(ws, F.lit(0).cast("long"), lambda a, w: a + F.length(w)) / safe_n
    )
    n_hash = F.length(text) - F.length(F.regexp_replace(text, r"#", ""))
    n_ellipsis = F.size(F.regexp_extract_all(text, F.lit(r"\.\.\.|…"), 0))
    symbol_ratio = (n_hash + n_ellipsis) / safe_n
    lines = F.filter(F.split(text, r"\n"), lambda l: l != "")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    bullet_frac = (
        F.size(F.filter(lines, lambda l: l.rlike(r"^\s*([-*•‣◦])")))
        / n_lines
    )
    ellipsis_frac = (
        F.size(F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)\s*$"))) / n_lines
    )
    alpha_frac = F.size(F.filter(ws, lambda w: w.rlike(r"[A-Za-z]"))) / safe_n
    stop_hits = F.size(F.filter(ws, lambda w: F.lower(w).isin(*GOPHER_STOPWORDS)))
    mean_wl_r = F.round(mean_wl, 6)
    symbol_r = F.round(symbol_ratio, 6)
    bullet_r = F.round(bullet_frac, 6)
    ellipsis_r = F.round(ellipsis_frac, 6)
    alpha_r = F.round(alpha_frac, 6)
    gopher_pass = (
        n_words.between(50, 100_000)
        & mean_wl_r.between(3.0, 10.0)
        & (symbol_r <= 0.1)
        & (bullet_r <= 0.9)
        & (ellipsis_r <= 0.3)
        & (alpha_r >= 0.8)
        & (stop_hits >= 2)
    )
    return docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_wl_r.alias("mean_word_len"),
        symbol_r.alias("symbol_word_ratio"),
        bullet_r.alias("bullet_line_frac"),
        ellipsis_r.alias("ellipsis_line_frac"),
        alpha_r.alias("alpha_word_frac"),
        stop_hits.alias("n_stop_hits"),
        gopher_pass.alias("gopher_pass"),
    )


def c4_filters(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """C4-style document filters (Raffel et al. 2020 §2.2) as pure
    column expressions — the second classic rule set next to
    ``gopher_quality``:

    - ``terminal_punct_line_frac``: lines ending in . ! ? or ".
    - ``short_line_frac``: lines with fewer than 3 words (C4 drops
      lines under 3 words).
    - ``has_lorem_ipsum`` / ``has_brace``: boilerplate and code
      markers ("lorem ipsum", '{').
    - ``n_sentences``: terminal-punctuation runs, the sentence-count
      proxy (C4 keeps docs with >= 3 sentences).
    - ``c4_pass``: all-lines-terminal AND >=3 sentences AND no lorem
      ipsum AND no brace.

    Shuffle-free; fuses into the document scan like gopher_quality.
    """
    text = F.col(text_col)
    lines = F.filter(F.split(text, r"\n"), lambda l: l != "")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    terminal = F.size(F.filter(lines, lambda l: l.rlike(r'[.!?"]\s*$'))) / n_lines
    short = (
        F.size(
            F.filter(
                lines,
                lambda l: F.size(F.filter(F.split(l, r"\s+"), lambda w: w != ""))
                < F.lit(3),
            )
        )
        / n_lines
    )
    lorem = F.lower(text).contains("lorem ipsum")
    brace = text.contains("{")
    n_sentences = F.size(F.regexp_extract_all(text, F.lit(r"[.!?]+"), 0))
    terminal_r = F.round(terminal, 6)
    short_r = F.round(short, 6)
    c4_pass = (
        (terminal_r == 1.0) & (n_sentences >= 3) & ~lorem & ~brace
    )
    return docs.select(
        F.col(id_col),
        terminal_r.alias("terminal_punct_line_frac"),
        short_r.alias("short_line_frac"),
        lorem.alias("has_lorem_ipsum"),
        brace.alias("has_brace"),
        n_sentences.alias("n_sentences"),
        c4_pass.alias("c4_pass"),
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


def word_entropy(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document unigram (word) Shannon entropy in nats — the
    low-entropy filter of curation pipelines (boilerplate, keyword
    stuffing and template spam all score low; Gopher/RefinedWeb-style
    signal family).

    Scale shape: one explode + two doc-keyed aggregations (word counts,
    then the entropy fold) — the shuffles are keyed by (doc, word) and
    doc, never global; map-side combine collapses repeated words before
    either exchange."""
    w = docs.select(
        F.col(id_col), F.explode(words_col(F.col(text_col))).alias("word")
    )
    counts = w.groupBy(id_col, "word").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        counts.groupBy(id_col)
        .agg(
            F.sum("cnt").alias("__n"),
            F.collect_list("cnt").alias("__cs"),
        )
        .select(
            id_col,
            F.round(
                -F.aggregate(
                    "__cs",
                    F.lit(0.0),
                    lambda acc, c: acc
                    + (c / F.col("__n")) * F.log(c / F.col("__n")),
                ),
                6,
            ).alias("entropy"),
        )
    )


def bigram_logprob(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """CCNet-style 'stupid LM' quality proxy, one order up from
    unigram_logprob: mean log-probability of each doc under the
    CORPUS's own bigram model — log P(w₁) + Σ log P(wᵢ | wᵢ₋₁),
    averaged over the doc's tokens. Repetitive boilerplate scores
    high, token-salad spam scores low, and unlike the unigram score a
    shuffled doc no longer scores like its original (word ORDER now
    matters) — the practical gap this closes vs unigram filtering.

    Model terms are MLE over the corpus itself, so no smoothing is
    needed: every doc bigram is by construction in the count table.
    P(w₂|w₁) = C(w₁w₂) / C(w₁·), with C(w₁·) the count of bigrams
    starting with w₁ (not the raw unigram count — final words of docs
    start no bigram); the start term P(w₁) is the corpus unigram
    distribution.

    100 TB shape, same as unigram_logprob one order up: the bigram
    count table is one groupBy (bigram-vocabulary-sized — tens of
    millions of rows at web scale, still the BROADCAST side or a
    co-partitioned join at worst); scoring is explode → join →
    per-doc mean. Bigrams are built array-side (zip of the words
    array with its shift) — no positional self-join ever touches the
    corpus. Docs with one word carry only the start term; empty docs
    produce no row (no tokens to average).

    Output: (doc_id, n_tokens, mean_logprob) — natural log, rounded 6.
    """
    ws = words_col(F.col(text_col))
    base = docs.select(F.col(id_col), ws.alias("ws")).filter(
        F.size("ws") > 0
    )
    # start term: first word, scored under the corpus unigram model
    firsts = base.select(id_col, F.element_at("ws", 1).alias("w"))
    allwords = base.select(id_col, F.explode("ws").alias("w"))
    totals = allwords.agg(
        F.count(F.lit(1)).cast("double").alias("total")
    )
    uni = (
        allwords.groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(totals))
    )
    # no forced broadcast: the vocab table is broadcast-sized at
    # most scales but web-scale bigram vocab can exceed it — let AQE
    # choose (it auto-broadcasts under the threshold)
    start_lp = firsts.join(uni, "w").select(
        id_col, F.log(F.col("cnt") / F.col("total")).alias("lp")
    )
    # bigram terms: zip ws with its shift, array-side
    n = F.size("ws")
    pairs = base.select(
        F.col(id_col),
        F.explode(
            F.zip_with(
                F.slice("ws", 1, n - 1),
                F.slice("ws", 2, n - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg"),
    ).select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    w1_totals = pairs.groupBy("w1").agg(
        F.count(F.lit(1)).cast("double").alias("c1")
    )
    bi = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .join(w1_totals, "w1")
    )
    pair_lp = pairs.join(bi, ["w1", "w2"]).select(
        id_col, F.log(F.col("c12") / F.col("c1")).alias("lp")
    )
    return (
        start_lp.unionByName(pair_lp)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(F.avg("lp"), 6).alias("mean_logprob"),
        )
    )


def nb_classifier(
    docs: DataFrame,
    label_col: str = "source",
    max_vocab: int = 50_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """fastText-style linear document classifier, trained in-pipeline:
    multinomial Naive Bayes over a bounded unigram vocabulary, the
    classical quality/domain classifier of curation pipelines (label
    with a trusted-source tag, score the open crawl).

    Train and apply in one pass over the corpus:
    - vocabulary = the `max_vocab` globally most frequent words, ties
      broken by the word itself (a deterministic distributed
      TakeOrdered, the same bound discipline as bpe_train — never the
      raw web-scale vocabulary);
    - per-class word likelihoods with add-one smoothing over the
      vocabulary, P(w|c) = (C(w,c)+1)/(C(·,c)+V); class priors from
      document counts;
    - score(doc, c) = log P(c) + Σ_{w ∈ doc ∩ vocab} log P(w|c);
      out-of-vocabulary tokens are skipped on BOTH train and apply
      sides (the documented bounded-vocab tradeoff; a doc with no
      in-vocab tokens falls back to the prior).

    100 TB shape: the likelihood grid is labels × vocab — broadcast-
    sized by construction — so scoring is explode → broadcast join →
    one doc-keyed aggregation; nothing label-cross-joins the corpus.
    Prediction ties break toward the greater label (max_by on a
    (score, label) struct), mirroring the oracle's ORDER BY.

    Output: (doc_id, label, predicted, score) — natural-log score of
    the predicted class, rounded 6.
    """
    ws = words_col(F.col(text_col))
    base = docs.select(
        F.col(id_col), F.col(label_col).alias("label"), ws.alias("ws")
    ).filter(F.size("ws") > 0)
    tok = base.select(id_col, "label", F.explode("ws").alias("w"))
    vocab = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w"))
        .limit(max_vocab)
        .select("w")
    )
    vsize = vocab.agg(F.count(F.lit(1)).cast("double").alias("v"))
    labels = base.groupBy("label").agg(
        F.count(F.lit(1)).cast("double").alias("docs")
    )
    total_docs = base.agg(F.count(F.lit(1)).cast("double").alias("t"))
    in_vocab = tok.join(F.broadcast(vocab), "w")
    wl = in_vocab.groupBy("label", "w").agg(F.count(F.lit(1)).alias("c"))
    ltot = wl.groupBy("label").agg(F.sum("c").cast("double").alias("tot"))
    grid = (
        labels.select("label")
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(vsize))
        # LEFT join + 0: a class whose documents contain no in-vocab
        # words still needs grid rows — its smoothed likelihoods are
        # log(1/V) per token, not a silent prior-only score
        .join(ltot, "label", "left")
        .withColumn("tot", F.coalesce(F.col("tot"), F.lit(0.0)))
        .join(wl, ["label", "w"], "left")
        .select(
            "label",
            "w",
            F.log(
                (F.coalesce(F.col("c"), F.lit(0)) + 1.0)
                / (F.col("tot") + F.col("v"))
            ).alias("ll"),
        )
    )
    tok_scores = (
        in_vocab.select(id_col, "w")
        .join(F.broadcast(grid.withColumnRenamed("label", "cand")), "w")
        .groupBy(id_col, "cand")
        .agg(F.sum("ll").alias("s"))
    )
    full = (
        base.select(id_col, "label")
        .crossJoin(
            F.broadcast(
                labels.crossJoin(total_docs).select(
                    F.col("label").alias("cand"),
                    F.log(F.col("docs") / F.col("t")).alias("prior"),
                )
            )
        )
        .join(tok_scores, [id_col, "cand"], "left")
        .select(
            id_col,
            "label",
            "cand",
            (F.col("prior") + F.coalesce(F.col("s"), F.lit(0.0))).alias(
                "score"
            ),
        )
    )
    return full.groupBy(id_col, "label").agg(
        F.max_by("cand", F.struct(F.col("score"), F.col("cand"))).alias(
            "predicted"
        ),
        F.round(F.max("score"), 6).alias("score"),
    )


def trigram_backoff_logprob(
    docs: DataFrame,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Stupid-backoff trigram LM score (Brants et al. 2007, §4): mean
    log S(w_i | w_{i-2} w_{i-1}) under the corpus's own PRUNED n-gram
    tables — the top of the unigram → bigram → trigram quality-proxy
    ladder. Pruning (`min_count`) is what makes backoff real: a
    corpus-trained unpruned model contains every doc n-gram by
    construction, and web-scale trigram tables are count-pruned anyway
    (Brants §3), so n-grams below the floor are treated as unseen and
    the score backs off with the paper's fixed α=0.4 per level:

      S(w|u,v) = c(uvw)/c(uv)        if c(uvw) ≥ min_count
               = 0.4·S(w|v)          otherwise
      S(w|v)   = c(vw)/c(v)          if c(vw) ≥ min_count
               = 0.4·S(w)            otherwise
      S(w)     = c(w)/N              (never pruned)

    Position 1 scores S(w₁), position 2 S(w₂|w₁). Denominators use
    RAW counts (pruning gates presence, not mass). Backed-off scores
    are not normalized probabilities — the paper's point; the mean
    log score is still a monotone quality signal.

    100 TB shape, one order up from bigram_logprob: three count
    groupBys (vocab-sized tables — the broadcast side or
    co-partitioned at worst; min_count prunes the trigram table's
    singleton long tail, which is most of it), then explode → join →
    per-doc mean. N-grams build array-side; no positional self-join
    touches the corpus.

    Output: (doc_id, n_tokens, mean_logprob) — natural log, rounded 6.
    """
    ws = words_col(F.col(text_col))
    base = docs.select(F.col(id_col), ws.alias("ws")).filter(F.size("ws") > 0)
    allw = base.select(id_col, F.explode("ws").alias("w"))
    totals = allw.agg(F.count(F.lit(1)).cast("double").alias("n"))
    uni = allw.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    n = F.size("ws")
    bg_all = base.select(
        F.explode(
            F.zip_with(
                F.slice("ws", 1, n - 1),
                F.slice("ws", 2, n - 1),
                lambda a, b: F.struct(a.alias("u"), b.alias("v")),
            )
        ).alias("g")
    ).select("g.u", "g.v")
    bi = bg_all.groupBy("u", "v").agg(F.count(F.lit(1)).alias("c2"))
    tg_all = base.select(
        F.explode(
            F.zip_with(
                F.zip_with(
                    F.slice("ws", 1, n - 2),
                    F.slice("ws", 2, n - 2),
                    lambda a, b: F.struct(a.alias("u"), b.alias("v")),
                ),
                F.slice("ws", 3, n - 2),
                lambda p, c: F.struct(
                    p["u"].alias("u"), p["v"].alias("v"), c.alias("w")
                ),
            )
        ).alias("g")
    ).select("g.u", "g.v", "g.w")
    tri = tg_all.groupBy("u", "v", "w").agg(F.count(F.lit(1)).alias("c3"))

    # per-position frame: (doc, pos, u=prev2, v=prev, w); u/v null at
    # the doc start — ws stays in scope so prev words come from the
    # array, never a positional self-join
    pos = base.select(
        F.col(id_col),
        F.size("ws").alias("n_tokens"),
        "ws",
        F.posexplode("ws").alias("i", "w"),
    ).select(
        id_col,
        "n_tokens",
        "w",
        # 0-based i: prev = ws[i-1], prev2 = ws[i-2]
        F.when(F.col("i") >= 2, F.element_at("ws", F.col("i") - 1)).alias("u"),
        F.when(F.col("i") >= 1, F.element_at("ws", F.col("i"))).alias("v"),
        "i",
    )
    scored = (
        pos.join(
            tri.select(
                F.col("u").alias("__tu"),
                F.col("v").alias("__tv"),
                F.col("w").alias("__tw"),
                "c3",
            ),
            (F.col("u") == F.col("__tu"))
            & (F.col("v") == F.col("__tv"))
            & (F.col("w") == F.col("__tw")),
            "left",
        )
        .join(
            bi.select(
                F.col("u").alias("__bu"), F.col("v").alias("__bv"),
                F.col("c2").alias("c2_uv"),
            ),
            (F.col("u") == F.col("__bu")) & (F.col("v") == F.col("__bv")),
            "left",
        )
        .join(
            bi.select(
                F.col("u").alias("__cu"), F.col("v").alias("__cv"),
                F.col("c2").alias("c2_vw"),
            ),
            (F.col("v") == F.col("__cu")) & (F.col("w") == F.col("__cv")),
            "left",
        )
        .join(
            uni.select(F.col("w").alias("__uv"), F.col("c1").alias("c1_v")),
            F.col("v") == F.col("__uv"),
            "left",
        )
        .join(
            uni.select(F.col("w").alias("__uw"), F.col("c1").alias("c1_w")),
            F.col("w") == F.col("__uw"),
            "left",
        )
        .crossJoin(F.broadcast(totals))
    )
    mc = F.lit(min_count)
    s_uni = F.col("c1_w") / F.col("n")
    s_bi = F.when(
        F.coalesce(F.col("c2_vw"), F.lit(0)) >= mc,
        F.col("c2_vw") / F.col("c1_v"),
    ).otherwise(0.4 * s_uni)
    s_tri = F.when(
        F.coalesce(F.col("c3"), F.lit(0)) >= mc,
        F.col("c3") / F.col("c2_uv"),
    ).otherwise(0.4 * s_bi)
    lp = (
        F.when(F.col("i") == 0, F.log(s_uni))
        .when(F.col("i") == 1, F.log(s_bi))
        .otherwise(F.log(s_tri))
    )
    return (
        scored.select(id_col, "n_tokens", lp.alias("lp"))
        .groupBy(id_col, "n_tokens")
        .agg(F.round(F.sum("lp") / F.col("n_tokens"), 6).alias("mean_logprob"))
        .select(id_col, F.col("n_tokens").cast("long"), "mean_logprob")
    )


def bm25_topk(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 ranked retrieval over the corpus (Robertson-Spärck Jones,
    the Lucene-default scoring shape) — the lexical search primitive a
    curation stack needs next to embedding ANN (e.g. contamination
    audits: "which training docs score highest against this benchmark
    question").

      score(q,d) = Σ_{t∈q} IDF(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl))
      IDF(t)     = ln((N − df + 0.5)/(df + 0.5) + 1)   (Lucene's +1 form)

    100 TB shape: the postings build is one (term, doc) groupBy; df and
    avgdl are term-table / scalar aggregates; the query side is a tiny
    literal frame BROADCAST against the postings of matching terms
    only, so the join touches the inverted-index slice for the query
    vocabulary, never the corpus. Ranking rounds BEFORE ordering so
    cross-engine float-sum noise cannot flip a rank (ties break by
    doc id).

    Returns (query_id, rank, doc_id, score) — top-k per query.
    """
    from pyspark.sql import Window

    spark = docs.sparkSession
    ws = words_col(F.col(text_col))
    base = docs.select(F.col(id_col), ws.alias("ws")).filter(F.size("ws") > 0)
    lens = base.select(id_col, F.size("ws").alias("dl"))
    n_avg = lens.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("dl").alias("avgdl"),
    )
    tf = (
        base.select(id_col, F.explode("ws").alias("t"))
        .groupBy(id_col, "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    qterms = (
        spark.createDataFrame(queries, "query_id long, q string")
        .select("query_id", F.explode(words_col(F.col("q"))).alias("t"))
        .distinct()
    )
    scored = (
        tf.join(F.broadcast(qterms), "t")
        .join(df_t, "t")
        .join(lens, id_col)
        .crossJoin(F.broadcast(n_avg))
        .select(
            "query_id",
            id_col,
            (
                F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("s"),
        )
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum("s"), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("long"), id_col, "score")
    )


def corpus_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One-row corpus profile — the summary a training run reads before
    touching the data: document/token/character totals, vocabulary
    size, type-token ratio, and the document-length distribution
    (mean / median / max tokens).

    Two aggregates total: a per-doc token count (scan-fused) feeding
    the global rollup, and one distinct-word count (the only
    vocabulary-sized shuffle). Median uses percentile's linear
    interpolation — the same contract as DuckDB's quantile_cont, so the
    number is oracle-exact."""
    ws = words_col(F.col(text_col))
    per_doc = docs.select(
        F.col(id_col),
        F.size(ws).alias("__nt"),
        F.length(text_col).alias("__nc"),
    )
    vocab = (
        docs.select(F.explode(ws).alias("w")).agg(
            F.count_distinct("w").alias("vocab_size")
        )
    )
    agg = per_doc.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__nt").cast("long").alias("n_tokens"),
        F.sum("__nc").cast("long").alias("n_chars"),
        F.round(F.avg("__nt"), 6).alias("mean_doc_tokens"),
        F.percentile("__nt", F.lit(0.5)).alias("median_doc_tokens"),
        F.max("__nt").cast("long").alias("max_doc_tokens"),
    )
    return agg.crossJoin(vocab).select(
        "n_docs",
        "n_tokens",
        "n_chars",
        "vocab_size",
        F.round(F.col("vocab_size") / F.col("n_tokens"), 6).alias(
            "type_token_ratio"
        ),
        "mean_doc_tokens",
        "median_doc_tokens",
        "max_doc_tokens",
    )


def tfidf_keywords(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF —
    the corpus-exploration primitive next to BM25 (what is this doc
    about; which docs does a domain term dominate):

      tfidf(t,d) = (tf / |d|) · ln(N / df(t)) + 0  (natural log,
                   raw df — every doc term exists, so no smoothing
                   constant is needed)

    Same table shapes as bm25_topk: one (term, doc) groupBy for tf,
    a term-keyed df aggregate, a scalar N. Ranking rounds BEFORE
    ordering (ties then break by term) so cross-engine float noise
    cannot flip a rank.

    Returns (doc_id, rank, term, tfidf)."""
    from pyspark.sql import Window

    ws = words_col(F.col(text_col))
    base = docs.select(F.col(id_col), ws.alias("ws")).filter(F.size("ws") > 0)
    lens = base.select(id_col, F.size("ws").alias("dl"))
    n_docs = base.agg(F.count(F.lit(1)).cast("double").alias("n"))
    tf = (
        base.select(id_col, F.explode("ws").alias("t"))
        .groupBy(id_col, "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(df_t, "t")
        .join(lens, id_col)
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            F.col("t").alias("term"),
            F.round(
                (F.col("tf") / F.col("dl")) * F.log(F.col("n") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, F.col("rank").cast("long"), "term", "tfidf")
    )
