"""One-call corpus curation: the composed filter chain a training-data
pipeline actually runs (the Dolma / RefinedWeb / FineWeb shape), built
entirely from this package's individually-oracled operators.

Stage order — each verdict names the FIRST stage that would drop the
document, in the order real pipelines apply them:

1. exact duplicate (md5 digest, keep the lowest id per distinct text)
2. near-duplicate (MinHash-LSH pairs → connected components, keep the
   component's canonical minimum-id member)
3. quality (Gopher rules AND C4 rules)
4. language (marker-word lang-id against an allowlist)
5. survivors get PII scrubbed (clean_text + counts)

Everything composes as ONE DataFrame plan over doc_id-keyed joins —
per-doc signals fuse into the scan, the dedup stages reuse their
documented bucketed/capped shapes, and nothing collects driver-side.
At 100 TB each stage's cost profile is exactly its standalone
operator's; the composition adds only doc-keyed left joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gigapipe_spark.datapipe import dedup as _dd
from gigapipe_spark.datapipe import scrub as _scrub
from gigapipe_spark.datapipe import textstats as _ts


def curate_corpus(
    docs: DataFrame,
    near_dup_threshold: float = 0.8,
    langs: tuple[str, ...] = ("en",),
    id_col: str = "doc_id",
    text_col: str = "text",
    **minhash_kw,
) -> DataFrame:
    """Per-document curation verdicts + cleaned text.

    Returns (doc_id, kept, drop_reason, clean_text, n_pii):
    - kept: survives all four filter stages
    - drop_reason: 'exact_duplicate' | 'near_duplicate' | 'quality' |
      'language' | NULL — first failing stage in pipeline order
    - clean_text: PII-scrubbed text for kept docs, NULL otherwise
    - n_pii: total PII substitutions in kept docs (emails+IPs+phones)
    """
    base = docs.select(F.col(id_col), F.col(text_col))

    # 1. exact: keep the lowest id per digest (dedup.exact_dedup shape,
    # inlined so the digest→keeper map joins back by id)
    keeper = (
        base.select(id_col, F.md5(F.col(text_col)).alias("__digest"))
        .groupBy("__digest")
        .agg(F.min(id_col).alias("__keep_id"))
    )
    exact = (
        base.select(id_col, F.md5(F.col(text_col)).alias("__digest"))
        .join(keeper, "__digest")
        .select(
            id_col, (F.col(id_col) == F.col("__keep_id")).alias("__exact_keep")
        )
    )

    # 2. near-dup: pairs → components → canonical member survives
    pairs = _dd.minhash_lsh_pairs(
        base, near_dup_threshold, id_col=id_col, text_col=text_col, **minhash_kw
    )
    comp = _dd.dedup_components(pairs).select(
        F.col(id_col), F.col("is_canonical").alias("__near_keep")
    )

    # 3 + 4. per-doc signals, shuffle-free column algebra
    gq = _ts.gopher_quality(base, id_col=id_col, text_col=text_col).select(
        id_col, "gopher_pass"
    )
    c4 = _ts.c4_filters(base, id_col=id_col, text_col=text_col).select(
        id_col, "c4_pass"
    )
    lid = _ts.lang_id(base, id_col=id_col, text_col=text_col).select(
        id_col, "pred_lang"
    )

    # 5. scrub everything in the same plan; the verdict masks it
    pii = _scrub.scrub_pii(base, text_col=text_col, id_col=id_col).select(
        id_col,
        "clean_text",
        (F.col("n_emails") + F.col("n_ipv4s") + F.col("n_phones")).alias(
            "__n_pii"
        ),
    )

    out = (
        base.select(id_col)
        .join(exact, id_col, "left")
        .join(comp, id_col, "left")  # docs with no near-dup pair: no row
        .join(gq, id_col, "left")
        .join(c4, id_col, "left")
        .join(lid, id_col, "left")
        .join(pii, id_col, "left")
    )
    near_keep = F.coalesce(F.col("__near_keep"), F.lit(True))
    reason = (
        F.when(~F.col("__exact_keep"), F.lit("exact_duplicate"))
        .when(~near_keep, F.lit("near_duplicate"))
        .when(
            ~(F.col("gopher_pass") & F.col("c4_pass")), F.lit("quality")
        )
        .when(~F.col("pred_lang").isin(*langs), F.lit("language"))
    )
    kept = reason.isNull()
    return out.select(
        F.col(id_col),
        kept.alias("kept"),
        reason.alias("drop_reason"),
        F.when(kept, F.col("clean_text")).alias("clean_text"),
        F.when(kept, F.col("__n_pii")).alias("n_pii"),
    )
