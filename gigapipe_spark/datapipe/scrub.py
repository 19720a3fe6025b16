"""PII scrubbing and benchmark-contamination detection.

Two pre-training hygiene passes every large corpus needs:

  scrub_pii              redact emails / IPv4s / phone numbers with
                         typed placeholder tokens and count what was
                         removed — pure regexp column expressions, no
                         shuffle, predicate-free full scan (the scan IS
                         the workload)
  contamination_ngrams   flag documents whose word n-grams overlap a
                         benchmark/eval set — the exploded n-gram join
                         against a BROADCAST benchmark n-gram set
                         (benchmarks are MB-sized; the corpus is the
                         100 TB side and never shuffles on text)

Regex portability: patterns below restrict themselves to the syntax
subset Java regex (Spark) and RE2 (DuckDB oracle) evaluate identically —
character classes, bounded repetition, \\b word boundaries; no
lookaround, no backrefs. Replacement order is fixed (email → ipv4 →
phone) and each stage counts matches on ITS OWN input, so both engines
produce byte-identical scrubbed text and counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
# international +prefixed runs and US-style dashed numbers; deliberately
# conservative — a corpus scrubber wants near-zero false positives on
# ordinary integers
PHONE_RE = r"\+[0-9]{7,15}\b|\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b"

_STAGES: list[tuple[str, str, str]] = [
    ("emails", EMAIL_RE, "<EMAIL>"),
    ("ipv4s", IPV4_RE, "<IP>"),
    ("phones", PHONE_RE, "<PHONE>"),
]


def scrub_text(text: Column) -> Column:
    """The scrub as a plain column expression (streaming-composable)."""
    cur = text
    for _, pat, token in _STAGES:
        cur = F.regexp_replace(cur, pat, token)
    return cur


def scrub_pii(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, clean_text, n_emails, n_ipv4s, n_phones) — placeholders
    substituted in stage order, counts per stage."""
    cur: Column = F.col(text_col)
    counts = []
    for name, pat, token in _STAGES:
        counts.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), 0))
            .cast("long")
            .alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pat, token)
    return docs.select(F.col(id_col), cur.alias("clean_text"), *counts)


def scrub_pii_oracle_sql(table: str = "documents") -> str:
    """The DuckDB mirror (same stage order, counts on stage input)."""
    cur = "text"
    count_cols = []
    for name, pat, token in _STAGES:
        pat_sql = pat.replace("'", "''")
        count_cols.append(f"len(regexp_extract_all({cur}, '{pat_sql}')) AS n_{name}")
        cur = f"regexp_replace({cur}, '{pat_sql}', '{token}', 'g')"
    cols = ",\n       ".join([f"{cur} AS clean_text"] + count_cols)
    return f"SELECT doc_id,\n       {cols}\nFROM {table}"


def contamination_ngrams(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc overlap with a benchmark set's word n-grams.

    benchmark: a (usually tiny) DataFrame with the same text column —
    the eval set you must not train on. Its DISTINCT n-grams broadcast
    to the corpus scan; each corpus doc reports how many of its own
    distinct n-grams appear in the benchmark. Only contaminated docs
    (≥1 hit) return — the downstream action is "drop or quarantine
    these". Docs present in the benchmark frame itself are the caller's
    business to exclude (pass corpus.join(bench, 'left_anti') if
    needed).

    Output: (doc_id, n_ngrams, n_hits, contamination) sorted-free;
    contamination = n_hits / n_ngrams rounded to 6.
    """
    from gigapipe_spark.datapipe.dedup import with_shingles

    corpus = with_shingles(docs, text_col, "__ng", n).select(
        F.col(id_col),
        F.size("__ng").cast("long").alias("n_ngrams"),
        F.explode("__ng").alias("tok"),
    )
    bench_toks = (
        with_shingles(benchmark, text_col, "__ng", n)
        .select(F.explode("__ng").alias("tok"))
        .distinct()
    )
    hits = (
        corpus.join(F.broadcast(bench_toks), "tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.any_value("n_ngrams").alias("n_ngrams"),
        )
    )
    return hits.select(
        id_col,
        "n_ngrams",
        "n_hits",
        F.round(F.col("n_hits") / F.col("n_ngrams"), 6).alias("contamination"),
    )


def contamination_spans(
    docs: DataFrame,
    benchmark: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Span-level decontamination: the word-position spans of each
    training doc covered by a length-k word window that appears
    VERBATIM in the benchmark set — the excise-don't-drop counterpart
    to contamination_ngrams' doc-level flag (pipe the output into
    dedup.remove_spans to cut leaked benchmark text while keeping the
    rest of the document, the Lee et al. 2022 treatment applied to
    decontamination).

    Shape: positional k-gram hashes build ARRAY-SIDE per doc (same
    formulation as dedup.repeated_substring_spans — the corpus never
    self-joins); the benchmark's DISTINCT gram hashes are the small
    side of a semi-join (broadcast-sized for any real eval set); marked
    positions merge into maximal spans with the gaps-and-islands window
    over the MARKED subset only.

    Returns (doc_id, start_word, n_words), 0-based start.
    """
    from pyspark.sql import Window

    from gigapipe_spark.datapipe.dedup import words_col

    def positional_grams(df: DataFrame, idc) -> DataFrame:
        ws = words_col(F.col(text_col))
        base = df.select(idc, ws.alias("ws")).filter(F.size("ws") >= k)
        return base.select(
            idc,
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("ws") - k),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.xxhash64(
                            F.concat_ws(" ", F.slice("ws", i + 1, k))
                        ).alias("g"),
                    ),
                )
            ).alias("pg"),
        ).select(idc, F.col("pg.pos").alias("pos"), F.col("pg.g").alias("g"))

    grams = positional_grams(docs, F.col(id_col))
    bench = (
        positional_grams(benchmark, F.lit(0).alias("__b"))
        .select("g")
        .distinct()
    )
    marked = grams.join(F.broadcast(bench), "g", "left_semi").select(
        id_col, "pos"
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    islands = marked.withColumn(
        "__new",
        F.when(F.col("pos") - F.lag("pos").over(w) > k, F.lit(1)).otherwise(
            F.lit(0)
        ),
    ).withColumn(
        "__island",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy(id_col, "__island")
        .agg(
            F.min("pos").alias("start_word"),
            (F.max("pos") + k - F.min("pos")).cast("long").alias("n_words"),
        )
        .select(id_col, F.col("start_word").cast("long"), "n_words")
    )
