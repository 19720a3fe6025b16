"""Deduplication operators for large-scale training-data pipelines.

Four strategies, each fully distributed (no driver-side loops):

  exact_dedup        hash-groupBy on normalized text — one shuffle
  jaccard_pairs      exact n-gram-shingle Jaccard over bounded candidate
                     pairs (the small-scale oracle / verification path)
  minhash_lsh_pairs  MinHash signatures + LSH banding → candidates →
                     exact-Jaccard verification. The 100 TB path: cost is
                     O(docs × num_hashes) + a band-bucket shuffle, never
                     O(n²). Deterministic: fixed hash params, xxhash64.
  simhash_pairs      64-bit SimHash + banded Hamming search, verified the
                     same way.

All set operations stay in Spark built-ins (transform/aggregate/
array_*) — no Python UDFs in any hot path.
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 31-bit Mersenne prime universe: keeps a*h+b within int64 under ANSI
# arithmetic (Spark 4 errors on overflow rather than wrapping)
MERSENNE_P = (1 << 31) - 1


def words_col(text: Column) -> Column:
    return F.filter(F.split(text, r"\s+"), lambda w: w != "")


def shingles_from_words(ws: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles via shifted-slice zip_with.

    Formulated WITHOUT element-indexed access into `ws` (no F.get(ws, i)
    inside a lambda): Catalyst does not CSE across lambda scopes, and
    CollapseProject can inline the words expression into the lambda — an
    indexed formulation then re-tokenizes the text once per ELEMENT
    (measured ~8s of an 11s query at sf0.1). Here `ws` appears only as a
    per-ROW input to slice/zip_with, so even fully inlined it evaluates
    O(n) times per row, not O(words) times.
    """
    cnt = F.greatest(F.size(ws) - (n - 1), F.lit(0))
    parts = [F.slice(ws, j + 1, cnt) for j in range(n)]
    acc = parts[0]
    for p in parts[1:]:
        acc = F.zip_with(acc, p, lambda x, y: F.concat_ws(" ", x, y))
    return F.array_distinct(acc)


def with_shingles(df: DataFrame, text_col: str, out: str = "sh", n: int = 3) -> DataFrame:
    """df + a shingle column, with the words array materialized once."""
    return (
        df.withColumn("__ws", words_col(F.col(text_col)))
        .withColumn(out, shingles_from_words(F.col("__ws"), n))
        .drop("__ws")
    )


def shingles_col(text: Column, n: int = 3) -> Column:
    """Inline shingles (SLOW PATH — re-tokenizes per access; prefer
    with_shingles). Kept for expression contexts that can't add
    columns."""
    return shingles_from_words(words_col(text), n)


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest id per distinct text. One hash shuffle on the
    text digest (not the full text — cheaper wide rows at scale)."""
    return (
        docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("__digest"))
        .groupBy("__digest")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("keep_id", "n_copies")
    )


def paragraph_dedup(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Cross-document paragraph-level exact dedup (the Dolma-style
    paragraph dedup pass, done with exact corpus counts instead of a
    Bloom filter): split each document on newlines, hash every
    non-empty paragraph, count occurrences CORPUS-WIDE, and report per
    document how much of it is boilerplate seen elsewhere.

    Output per doc: ``n_paras``, ``dup_para_frac`` (paragraphs whose
    digest occurs >1 time in the corpus — in any doc, including this
    one — over all paragraphs), ``dup_para_char_frac`` (same, weighted
    by paragraph length). A curation pipeline drops/strips paragraphs
    where these exceed a threshold.

    Shape at 100 TB: explode → one shuffle keyed on the 128-bit digest
    (near-uniform, no skew) for the global count → digest-keyed join
    back → doc_id-keyed agg. The digest count table is the only
    corpus-global state and it is itself partitioned by digest; nothing
    funnels through fewer keys than the data has paragraphs.
    """
    paras = docs.select(
        F.col(id_col),
        F.explode(F.filter(F.split(F.col(text_col), r"\n"), lambda p: p != "")).alias(
            "__p"
        ),
    ).select(
        id_col, F.md5(F.col("__p")).alias("__digest"), F.length("__p").alias("__len")
    )
    counts = paras.groupBy("__digest").agg(F.count(F.lit(1)).alias("__global_cnt"))
    joined = paras.join(counts, "__digest")
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_paras"),
        F.round(
            F.sum(F.when(F.col("__global_cnt") > 1, 1).otherwise(0))
            / F.count(F.lit(1)),
            6,
        ).alias("dup_para_frac"),
        F.round(
            F.sum(F.when(F.col("__global_cnt") > 1, F.col("__len")).otherwise(0))
            / F.greatest(F.sum("__len"), F.lit(1)),
            6,
        ).alias("dup_para_char_frac"),
    )


def _components_driver(edges: DataFrame) -> DataFrame:
    """Union-find over a broadcast-sized (already-persisted,
    bidirectional) edge cache. Roots are kept at the component minimum,
    so resolve(x) IS the min-label the distributed path converges to;
    path compression makes the whole pass near-linear in |E|."""
    import pyspark.sql.types as T

    rows = edges.select("src", "dst").collect()
    id_type = edges.schema["src"].dataType
    edges.unpersist()
    parent: dict = {}

    def resolve(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        a, b = resolve(r[0]), resolve(r[1])
        if a != b:
            lo, hi = (a, b) if a < b else (b, a)
            parent[hi] = lo  # min id stays the root

    nodes = {r[0] for r in rows}
    spark = edges.sparkSession
    schema = T.StructType(
        [
            T.StructField("doc_id", id_type, False),
            T.StructField("cluster_id", id_type, False),
        ]
    )
    out = spark.createDataFrame(
        [(n, resolve(n)) for n in sorted(nodes)], schema
    )
    return out.withColumn(
        "is_canonical", F.col("doc_id") == F.col("cluster_id")
    )


def dedup_components(
    pairs: DataFrame, max_iter: int = 20, driver_cap: int = 200_000
) -> DataFrame:
    """Near-dup pairs → connected components: (doc_id, cluster_id,
    is_canonical), cluster_id = the component's minimum doc id — the
    step after pair generation in every dedup pipeline (keep one
    canonical doc per cluster, drop the rest).

    Adaptive, probe-gated (the same complexity-probe pattern as the
    traceql broadcast gate): an edge set of ≤ ``driver_cap`` rows is
    broadcast-sized — Spark's own broadcast join ships that much to the
    driver — so it union-finds driver-side in O(E·α) and skips the
    per-round distributed jobs entirely (each round is ~1.5s of fixed
    scheduler cost at any data size; near-dup edge sets are a tiny
    fraction of the corpus because most docs have no near-dup).

    Above the cap: distributed min-label propagation — each iteration
    one edge-join + min-agg, converging in O(component diameter)
    rounds, the standard Spark connected-components shape
    (GraphFrames/Pregel). Each round materializes via an isEmpty
    convergence probe on the CHANGED set only, so a converged graph
    costs one empty check, not a full relabel. Input `pairs` needs
    (doc_a, doc_b) columns. ``driver_cap=0`` forces the distributed
    path (tests pin both paths equal).
    """
    # the propagation state is doc-id-sized (near-dup graphs are sparse:
    # nodes = docs with ≥1 near-dup) — keep it in a handful of fat
    # partitions so each round's stages don't pay one scheduler slot per
    # shuffle-partition sliver; at true scale raise `state_partitions`
    # with the graph, or swap in large-star/small-star for wide graphs
    state_partitions = max(4, pairs.sparkSession.sparkContext.defaultParallelism // 4)
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .distinct()
        .repartition(state_partitions, "src")
        .persist()
    )
    # complexity probe: ONE job (it also materializes the edge cache the
    # distributed path's round 1 would need anyway)
    if driver_cap and edges.count() <= driver_cap:
        return _components_driver(edges)
    # labels hash-partitioned on id with the SAME partition count as
    # edges(src): the per-round join is then exchange-free on both sides
    # (matching HashPartitioning); only the min-propagation groupBy
    # shuffles, which is the irreducible step of the algorithm
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("cluster", F.col("id"))
        .repartition(state_partitions, "id")
        .persist()
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.src == labels.id, "inner")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("cluster").alias("nbr_cluster"))
        )
        prop = labels.join(neighbor_min, "id", "left").select(
            "id",
            F.least(
                F.col("cluster"), F.coalesce("nbr_cluster", F.col("cluster"))
            ).alias("cluster"),
            (F.coalesce("nbr_cluster", F.col("cluster")) < F.col("cluster")).alias(
                "__chg1"
            ),
        )
        # pointer doubling: relabel through the freshly-propagated table
        # itself (cluster ← label[cluster]) — labels chase the component
        # minimum exponentially, so a diameter-D chain converges in
        # O(log D) rounds instead of D (1-hop-only propagation silently
        # returned PARTIAL labels on chains deeper than max_iter)
        lut = prop.select(
            F.col("id").alias("__lid"), F.col("cluster").alias("__lc")
        )
        updated = (
            prop.join(lut, prop.cluster == lut.__lid, "left")
            .select(
                "id",
                F.least(
                    F.col("cluster"), F.coalesce("__lc", F.col("cluster"))
                ).alias("cluster"),
                (
                    F.col("__chg1")
                    | (F.coalesce("__lc", F.col("cluster")) < F.col("cluster"))
                ).alias("__changed"),
            )
            .repartition(state_partitions, "id")  # keep the id-hash invariant
            # EAGER checkpoint, not persist: the convergence probe below
            # is a limit-1 job that materializes only SOME partitions of
            # a lazy cache — the next round's join then recomputes the
            # missed partitions through the PREVIOUS round's (by then
            # unpersisted) lineage, compounding every iteration
            # (measured 7.4s for a 3-round 500-doc graph; 1.5s fixed).
            # localCheckpoint materializes every partition once and cuts
            # the lineage, so each round costs exactly its own join.
            .localCheckpoint(eager=True)
        )
        done = updated.filter("__changed").isEmpty()
        labels.unpersist()
        labels = updated.select("id", "cluster")
        if done:
            break
    out = labels.withColumn("is_canonical", F.col("id") == F.col("cluster")).select(
        F.col("id").alias("doc_id"), F.col("cluster").alias("cluster_id"), "is_canonical"
    )
    edges.unpersist()
    return out


def _jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return inter / union


def _explode_shingles_bounded(
    sh: DataFrame, max_shingle_df: int | None
) -> tuple[DataFrame, DataFrame]:
    """Shared exploded-shingle frame for the exact pair generators.

    Returns (ex, sizes): `ex` is the MINIMAL-width join feed — (id,
    part, tok) with `tok` the 64-bit hash of the shingle (a collision
    inflating an intersection count needs two distinct shingles of one
    doc pair colliding, ~2⁻⁶⁴ per pair) — and `sizes` is one narrow
    (id, part, n) row per doc over the KEPT universe, for the callers
    to attach to their pair AGGREGATE. Set sizes never ride through
    the join: the exchanged row is 3 fixed-width fields, because at
    web scale the equi-join's two exchanges of the exploded set ARE
    the operator's cost and every byte is multiplied by total corpus
    shingle count (a first cut that carried n per row and re-keyed the
    exploded set for size recomputes tripled shuffle temp and spilled
    a 30× probe off the disk).

    A shingle appearing in D documents contributes D² rows to the pair
    equi-join on that ONE key — at web scale a single boilerplate
    trigram ("all rights reserved" class) is 10⁶+ docs → 10¹² rows,
    the skewed-key quadratic the MinHash path caps via `_cap_buckets`.
    `max_shingle_df` drops over-cap shingles BEFORE the join (they
    separate nothing) and subtracts per-doc drop counts from `sizes`,
    so jaccard / containment stay internally consistent over the kept
    universe. The machinery is skipped entirely when the corpus has
    ≤ cap docs (no shingle CAN be hot) or the hot set is empty; hot
    removal is a broadcast anti-join. Net extra cost in the capped
    regime: one counting aggregate over the exploded frame. The
    dropped-shingle count is logged — never a silent cap. Docs whose
    every shingle is hot match nothing (nothing discriminative left;
    exact_dedup is the tool for pure boilerplate). Pass None for
    fully exact semantics."""
    sizes = sh.select("id", "part", F.size("sh").alias("n"))
    # `sh` carries 64-bit shingle HASHES (see _hashed_shingle_sets) —
    # tok is the hash itself, exploded as-is
    base = sh.select("id", "part", F.explode("sh").alias("tok"))
    if max_shingle_df is None:
        return base, sizes
    # df ≤ corpus doc count: a small corpus cannot have a hot shingle
    if sh.count() <= max_shingle_df:
        return base, sizes
    hot = (
        base.groupBy("part", "tok")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") > max_shingle_df)
        .select("part", "tok")
        .persist()
    )
    n_hot = hot.count()  # materializes the small hot set for broadcast
    if not n_hot:
        hot.unpersist()
        return base, sizes
    logging.getLogger(__name__).warning(
        "exact-pair shingle join: dropped %d shingles with df > %d "
        "(non-discriminative hot keys; pass max_shingle_df=None for "
        "fully exact semantics)", n_hot, max_shingle_df,
    )
    kept = base.join(F.broadcast(hot), ["part", "tok"], "left_anti")
    hot_counts = (
        base.join(F.broadcast(hot), ["part", "tok"], "left_semi")
        .groupBy("id", "part")
        .agg(F.count(F.lit(1)).alias("__h"))
    )
    sizes = (
        sizes.join(hot_counts, ["id", "part"], "left")
        .withColumn("n", F.col("n") - F.coalesce(F.col("__h"), F.lit(0)))
        .drop("__h")
    )
    return kept, sizes


def _attach_sizes(inter: DataFrame, sizes: DataFrame,
                  a_col: str, b_col: str) -> DataFrame:
    """Join the per-doc kept-set sizes onto the pair aggregate as
    na/nb — two joins that move only the (already aggregated) pair
    set and a narrow one-row-per-doc frame."""
    a = sizes.select(F.col("id").alias(a_col), F.col("n").alias("na"))
    b = sizes.select(F.col("id").alias(b_col), F.col("n").alias("nb"))
    return inter.join(a, a_col).join(b, b_col)


def jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    n: int = 3,
    partition_col: str | None = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int | None = 100_000,
) -> DataFrame:
    """Exact shingle-Jaccard pairs via an exploded-shingle equi-join.

    Shape: explode each doc's distinct shingles to (id, shingle) rows,
    self-join on the shingle token, count matches per (doc_a, doc_b) —
    that count IS |A∩B| because shingle sets are distinct — and recover
    |A∪B| = |A|+|B|−|A∩B| from the per-doc sizes carried through the
    aggregate. Only pairs that SHARE a shingle ever materialize (a pair
    with no overlap has jaccard 0 < threshold by construction), so cost
    is O(co-occurring shingle pairs), not O(n²) array intersections —
    and the join key is the shingle itself, which distributes across the
    cluster instead of skewing onto one partition per `partition_col`
    value. A naive pair-join formulation also re-evaluates the inlined
    shingle expression once per PAIR row (CollapseProject inlines the
    projection under the join); here shingles are computed once per doc
    on the explode side. partition_col additionally bounds pairs to
    equal values (e.g. same lang); None compares across the whole corpus.

    `max_shingle_df` bounds the one remaining hot-key exposure — a
    boilerplate shingle shared by D docs costs D² join rows on its key —
    by dropping shingles with document frequency above the cap and
    measuring jaccard over the kept universe (see
    _explode_shingles_bounded). Fully exact semantics: max_shingle_df=
    None; the default cap only engages on corpora with >100k-doc
    boilerplate keys, far above any fixture.
    """
    sh = _hashed_shingle_sets(docs, text_col, id_col, partition_col, n)
    ex, sizes = _explode_shingles_bounded(sh, max_shingle_df)
    a = ex.select(F.col("id").alias("doc_a"), "part", "tok")
    b = ex.select(F.col("id").alias("doc_b"), "part", "tok")
    inter = (
        a.join(b, ["tok", "part"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    inter = _attach_sizes(inter, sizes, "doc_a", "doc_b")
    jac = F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
    return (
        inter.filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


def containment_pairs(
    docs: DataFrame,
    n: int = 3,
    partition_col: str | None = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int | None = 100_000,
) -> DataFrame:
    """Substring-containment dedup: doc A is CONTAINED in doc B when
    every distinct word n-gram of A also appears in B (|A∩B| == |A|) —
    the "document fully covered by a longer document" curation step
    (quotes, boilerplate-wrapped copies, truncated mirrors) that a
    Jaccard threshold misses because the union term dilutes small docs.

    Same 100 TB shape as jaccard_pairs: exploded-shingle equi-join —
    only pairs sharing a shingle materialize, keyed by the shingle.
    `max_shingle_df` bounds the hot-key volume (a df-D boilerplate
    shingle is D² join rows on one key): over-cap shingles are dropped
    and containment is decided over the kept universe (see
    _explode_shingles_bounded; None = fully exact). Direction is
    deterministic: the contained doc is the one with the smaller
    shingle set, ties (identical sets) flag the higher id, matching
    exact_dedup's keep-lowest-id rule.
    Returns (doc_contained, doc_container).
    """
    sh = _hashed_shingle_sets(docs, text_col, id_col, partition_col, n).filter(
        F.size("sh") > 0
    )
    ex, sizes = _explode_shingles_bounded(sh, max_shingle_df)
    a = ex.select(F.col("id").alias("doc_contained"), "part", "tok")
    b = ex.select(F.col("id").alias("doc_container"), "part", "tok")
    inter = (
        a.join(b, ["tok", "part"])
        .filter(F.col("doc_contained") != F.col("doc_container"))
        .groupBy("doc_contained", "doc_container")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    inter = _attach_sizes(inter, sizes, "doc_contained", "doc_container")
    return inter.filter(
        (F.col("i") == F.col("na"))
        & (
            (F.col("na") < F.col("nb"))
            | (
                (F.col("na") == F.col("nb"))
                & (F.col("doc_contained") > F.col("doc_container"))
            )
        )
    ).select("doc_contained", "doc_container")


def _ngram_hashes(word_hashes: Column, n: int) -> Column:
    """Word n-gram 64-bit hashes from a word-hash array, via the same
    shifted-slice zip_with shape as shingles_from_words (no indexed
    access into the array — see that docstring) with xxhash64(acc, x)
    as the pairwise combiner. Purely numeric: no shingle strings are
    ever materialized."""
    cnt = F.greatest(F.size(word_hashes) - (n - 1), F.lit(0))
    parts = [F.slice(word_hashes, j + 1, cnt) for j in range(n)]
    acc = parts[0]
    for p in parts[1:]:
        acc = F.zip_with(acc, p, lambda a, b: F.xxhash64(a, b))
    return acc


def _hashed_shingle_sets(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    partition_col: str | None,
    n: int,
) -> DataFrame:
    """(id, part, sh) with sh = the doc's DISTINCT word n-gram 64-bit
    hashes — the exact pair generators' input. Like the MinHash path,
    shingle STRINGS are never materialized (each word hashes once,
    n-gram hashes fold pairwise); all downstream set math is on the
    hashes, identical to string-set semantics modulo the documented
    2⁻⁶⁴ collision bound."""
    wh = F.transform(words_col(F.col(text_col)), lambda w: F.xxhash64(w))
    return docs.select(
        F.col(id_col).alias("id"),
        (F.col(partition_col) if partition_col else F.lit(0)).alias("part"),
        F.array_distinct(_ngram_hashes(wh, n)).alias("sh"),
    )


def _minhash_sig(hashes: Column, num_hashes: int) -> Column:
    """MinHash signature from a MATERIALIZED shingle-hash column: per
    permutation j, min over hashes of (a_j*h + b_j) mod p. Params are
    fixed odd constants — deterministic across runs and engines. The
    hash array must be a column reference (no CSE across lambdas)."""
    params = F.expr(
        f"transform(sequence(0, {num_hashes - 1}), "
        f"j -> struct(CAST(2*j + 1 AS BIGINT) AS a, CAST(j AS BIGINT) * 98765431 + 12345 AS b))"
    )
    return F.transform(
        params,
        lambda p: F.array_min(
            F.transform(
                hashes,
                lambda h: F.pmod(p["a"] * h + p["b"], F.lit(MERSENNE_P)),
            )
        ),
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int | None = 512,
    cap_gate_docs: int | None = None,
) -> DataFrame:
    """MinHash + LSH banding near-duplicate pairs, exact-verified.

    `cap_gate_docs`: corpora at or below this doc count skip the
    bucket-cap machinery entirely (see the gate comment below). None
    derives 32×max_bucket; 0 forces the cap on at any corpus size.

    rows-per-band = num_hashes // bands. Candidate generation is a
    groupBy on (band, band_hash) — the only shuffle touching all docs;
    verification joins shingle sets back for candidates only.

    Band geometry: r=4 rows × 16 bands. For background-similarity pairs
    (j≈0.05 on this corpus) the per-pair candidate probability is
    ~16·j⁴ ≈ 1e-4 — candidate volume stays linear-ish; at the match
    threshold (j≥0.8) the miss probability is (1-j⁴)¹⁶ ≈ 2e-4. r=2
    produced ~8% false-candidate rate = a quadratic blowup at scale.

    max_bucket caps the size of a band bucket that may generate
    candidates (None disables). A bucket of size s yields s²/2 pairs,
    so ONE degenerate signature — boilerplate, templated text, a
    pathologically small vocabulary — turns the candidate stage
    quadratic no matter how good the band geometry is (measured on a
    100× replicated corpus: a 1.6k-doc bucket family produced 16.6M
    candidates for 25.6k true pairs and verification dominated the
    runtime). Capping is the standard guard in production MinHash
    pipelines; members of an over-cap bucket still pair through their
    OTHER (non-degenerate) bands, and byte-identical boilerplate is
    exact_dedup's job anyway.
    """
    rows = num_hashes // bands
    # Signature index: shingles + MinHash sig per doc, persisted — this
    # is the artifact a 100 TB deployment stores as a table; persisting
    # is also the optimizer barrier that stops CollapseProject from
    # re-inlining (and thus recomputing) the shingle/hash arrays into
    # every downstream lambda.
    # repartition BEFORE the expression-heavy shingle/hash computation:
    # small corpora arrive as one parquet partition and would build the
    # whole index on a single core
    par = docs.sparkSession.sparkContext.defaultParallelism
    # The index keeps ONLY the 64-bit shingle hashes — the shingle
    # strings never enter the cache or any shuffle. Verification
    # computes Jaccard on the hashed sets, which is value-identical to
    # string-set Jaccard absent a 64-bit collision (~n²/2⁶⁵ per pair —
    # negligible at any corpus size this engine targets); at 30×-sf0.1
    # scale this halves the whole query (string arrays were ~8× the
    # bytes of the hash arrays in cache and in the two verify joins).
    # r11: the shingle STRINGS are never built either — each word
    # hashes once (xxhash64) and the n-gram hash folds the n word
    # hashes pairwise with xxhash64(acc, next), so the pass allocates
    # no concatenated strings and hashes each word's bytes exactly once
    # (the concat_ws formulation re-hashed every word n times inside
    # n-char-longer strings; measured 29s → ~11s for the whole pass at
    # 30×-sf0.1). Same trigram-set semantics modulo the already-
    # documented 64-bit collision bound.
    wh = F.transform(words_col(F.col(text_col)), lambda w: F.xxhash64(w))
    sh = (
        docs.repartition(par, id_col)
        .withColumn("__wh", wh)
        .withColumn("__tri", _ngram_hashes(F.col("__wh"), n))
        .filter(F.size("__tri") > 0)
        .select(
            F.col(id_col).alias("id"),
            F.transform(
                F.array_distinct("__tri"),
                lambda t: F.pmod(F.abs(t), F.lit(MERSENNE_P)),
            ).alias("__h"),
        )
        .persist()
    )
    # persisted: without the materialization barrier CollapseProject
    # inlines this 64-permutation expression into the banding transform's
    # lambda, which re-evaluates it once PER BAND (16×) — measured as the
    # whole query's cost at sf0.1. This is the signature table a 100 TB
    # deployment stores.
    sig = (
        sh.withColumn("sig", _minhash_sig(F.col("__h"), num_hashes))
        .select("id", "sig")
        .persist()
    )
    # banding: ids only through the shuffle — shingle arrays stay home.
    # persisted: the candidate self-join consumes banded TWICE, and
    # without the materialization barrier each side re-inlines (and so
    # re-computes) the full 64-permutation signature chain — measured
    # ~6× the whole query's cost at sf0.1. The banded index is tiny
    # (bands rows of (id, band, h) per doc) and is the second artifact a
    # 100 TB deployment would store alongside the signature table.
    banded = sig.select(
        "id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), "
                f"b -> struct(b AS band, xxhash64(concat_ws(',', slice(sig, b*{rows}+1, {rows}))) AS h))"
            )
        ).alias("bh"),
    ).select("id", F.col("bh.band").alias("band"), F.col("bh.h").alias("h"))
    # small-corpus gate: one cheap count on the persisted signature
    # index (it materializes here anyway — the count is the eager
    # trigger). When the corpus is within 32× the cap, even a fully
    # degenerate bucket yields a candidate set the verify stage absorbs
    # at interactive scale, so the cap machinery (a count aggregate +
    # broadcast anti-join, ~25% of the whole query at sf0.1) is pure
    # overhead; at the 30×+ scales the cap was built for (measured
    # 96.4s→49.8s) the gate leaves it on.
    gate = 32 * (max_bucket or 0) if cap_gate_docs is None else cap_gate_docs
    if max_bucket is not None and gate > 0 and sig.count() <= gate:
        max_bucket = None
    # the persisted artifact is the CAPPED banded index: the self-join
    # consumes it twice, and persisting downstream of the cap runs the
    # count once instead of once per join side
    cand_src = _cap_buckets(banded, ["band", "h"], max_bucket).persist()
    cand = (
        cand_src.alias("l")
        .join(cand_src.alias("r"), ["band", "h"])
        .select(F.col("l.id").alias("doc_a"), F.col("r.id").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .distinct()
    )
    # verification: join hashed shingle sets back for candidates only.
    # DELIBERATELY two joins (r15, VERDICT task 3 falsified): the
    # single-join fusion — explode each pair into (doc_a, doc_b, id)
    # legs, join the index once, reassemble via a (doc_a, doc_b)
    # collect_list aggregation — does drop one broadcast job per warm
    # run at sf0.1 (jobprobe: 5 → 4) but is timing-neutral there
    # (0.28 vs 0.31 median), and at the 30× regime the pair-
    # reassembling aggregation is catastrophically slower: warm
    # 7.9–19.8s (this chain) → 55.5s (fused), cold 54 → 117s under
    # matched conditions. collect_list of shingle-array payloads is an
    # ObjectHashAggregate that degrades to its sort-based fallback at
    # candidate volume, re-sorting the heavy arrays; the join chain
    # keeps the arrays in hash-relation lookups instead. Receipt in
    # OPTIMIZATION_r15.md §B and docs/SCALE.md.
    shingle_sets = sh.select("id", F.col("__h").alias("sh"))
    verified = (
        cand.join(shingle_sets.select(F.col("id").alias("doc_a"), F.col("sh").alias("sh_a")), "doc_a")
        .join(shingle_sets.select(F.col("id").alias("doc_b"), F.col("sh").alias("sh_b")), "doc_b")
        .withColumn("jaccard", _jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


def _simhash(hashes: Column, bits: int = 64) -> Column:
    """64-bit SimHash: bit i = sign of Σ_tokens (±1 by token hash bit i).

    ONE fold over the token-hash array with an array<long> accumulator of
    per-bit counters (acc[i] += ±1 via the 2-ary transform's index arg),
    then one zip_with+fold to assemble the signature. The earlier
    formulation unrolled 64 separate F.aggregate folds; CollapseProject
    inlined the token-hash transform into every one of them (no CSE
    across lambda scopes), re-tokenizing and re-hashing each document
    64× (~8s of an 8.8s query at sf0.01). Single-reference single-pass
    keeps the work at tokens×64 counter bumps, all JVM-side."""
    counters = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, h: F.transform(
            acc, lambda a, i: a + F.bit_get(h, i).cast("long") * 2 - 1
        ),
    )
    # literal powers-of-two (bit 63 = int64 sign bit); zip against the
    # counters INSIDE HOF land — element_at(counters, i) unrolled 64×
    # would re-run the fold per reference.
    powers = F.array(
        *[
            F.lit((1 << i) if i < 63 else -(1 << 63)).cast("long")
            for i in range(bits)
        ]
    )
    contribs = F.zip_with(
        counters,
        powers,
        lambda s, p: F.when(s > 0, p).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(
        contribs, F.lit(0).cast("long"), lambda a, b: a.bitwiseOR(b)
    )


def _chunk_bounds(max_hamming: int, bits: int = 64) -> list[tuple[int, int]]:
    """(start, width) spans banding `bits` into max_hamming+1 NON-EMPTY
    chunks (capped at `bits` chunks). Pigeonhole recall needs strictly
    more chunks than differing bits; empty chunks would match every
    pair (an all-pairs explosion), so widths are distributed base/base+1."""
    n_chunks = min(max_hamming + 1, bits)
    base_w, extra = divmod(bits, n_chunks)
    bounds, pos = [], 0
    for i in range(n_chunks):
        w = base_w + (1 if i < extra else 0)
        bounds.append((pos, w))
        pos += w
    return bounds


def _cap_buckets(
    banded: DataFrame, keys: list[str], max_bucket: int | None
) -> DataFrame:
    """Drop candidate-generating buckets larger than max_bucket — the
    shared guard against one degenerate signature turning the bucket
    self-join quadratic (see minhash_lsh_pairs). The count aggregate
    shares the self-join's key partitioning, so no extra exchange of
    the banded index."""
    if max_bucket is None:
        return banded
    # Over-cap buckets are RARE by construction (each holds > max_bucket
    # members, so there are at most N/max_bucket of them) — find them
    # with one partial-agg-friendly count and BROADCAST anti-join, which
    # leaves the banded index itself unshuffled at this stage. A window
    # count or semi-join formulation forces a full sort/exchange of the
    # index per consumer (measured ~2× the whole minhash query at
    # sf0.1); this shape adds only the counting aggregate.
    bad = (
        banded.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__bn"))
        .filter(F.col("__bn") > max_bucket)
        .select(*keys)
    )
    return banded.join(F.broadcast(bad), keys, "left_anti")


def hamming_pairs(
    sig: DataFrame, max_hamming: int, max_bucket: int | None = 512
) -> DataFrame:
    """Shared 64-bit-signature near-dup core: band each signature into
    `max_hamming + 1` chunks (pigeonhole: a pair within the distance
    bound differs in at most max_hamming chunks, so at least one chunk
    matches exactly — guaranteed recall), cap degenerate buckets, then
    verify by true Hamming distance. Consumed by SimHash text dedup,
    pHash image dedup and the audio fingerprint — one candidate
    machine, three signature producers. Input: (id, sig int64) rows.
    Output: (doc_a, doc_b, hamming)."""
    chunk_structs = [
        F.struct(
            F.lit(i).alias("chunk"),
            F.shiftrightunsigned(F.col("sig"), start)
            # width 64 (max_hamming=0, one chunk) needs the all-ones
            # mask as int64: (1<<64)-1 overflows the long literal
            .bitwiseAND(F.lit((1 << width) - 1 if width < 64 else -1))
            .alias("h"),
        )
        for i, (start, width) in enumerate(_chunk_bounds(max_hamming))
    ]
    chunks = sig.select(
        "id", "sig", F.explode(F.array(*chunk_structs)).alias("ch")
    ).select(
        "id", "sig", F.col("ch.chunk").alias("chunk"), F.col("ch.h").alias("h")
    )
    chunks = _cap_buckets(chunks, ["chunk", "h"], max_bucket)
    left = chunks.select(
        "chunk", "h", F.col("id").alias("doc_a"), F.col("sig").alias("sig_a")
    )
    right = chunks.select(
        "chunk", "h", F.col("id").alias("doc_b"), F.col("sig").alias("sig_b")
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        left.join(right, ["chunk", "h"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)  # before dedup: shrink early
        .select("doc_a", "doc_b", "hamming")
        .distinct()
    )


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    verify_threshold: float | None = None,
    shingle_n: int = 3,
    max_bucket: int | None = 512,
) -> DataFrame:
    """SimHash near-dup pairs: band the 64-bit signature into
    `max_hamming + 1` chunks (pigeonhole: a pair at Hamming distance
    ≤ max_hamming differs in at most max_hamming chunks, so at least one
    of the max_hamming+1 chunks matches exactly — guaranteed recall),
    then filter by true Hamming distance via bit_count(xor). Chunk count
    derives from max_hamming so the default geometry cannot silently
    drop pairs the distance bound promises. max_bucket caps degenerate
    chunk buckets (boilerplate; see minhash_lsh_pairs)."""
    # signature index (persisted barrier, same pattern as minhash)
    sig = (
        docs.withColumn("__ws", words_col(F.col(text_col)))
        .withColumn("__th", F.transform(F.col("__ws"), lambda w: F.xxhash64(w)))
        .select(F.col(id_col).alias("id"), _simhash(F.col("__th")).alias("sig"))
        .persist()
    )
    cand = hamming_pairs(sig, max_hamming, max_bucket)
    if verify_threshold is not None:
        # verify against precomputed shingle sets (candidates only)
        sets = with_shingles(docs, text_col, "sh", shingle_n).select(
            F.col(id_col).alias("id"), "sh"
        )
        out = (
            cand.join(sets.select(F.col("id").alias("doc_a"), F.col("sh").alias("sh_a")), "doc_a")
            .join(sets.select(F.col("id").alias("doc_b"), F.col("sh").alias("sh_b")), "doc_b")
            .withColumn("jaccard", _jaccard(F.col("sh_a"), F.col("sh_b")))
            .filter(F.col("jaccard") >= verify_threshold)
        )
        return out.select(
            "doc_a", "doc_b", "hamming", F.round("jaccard", 6).alias("jaccard")
        )
    return cand


def embedding_cosine_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    n_planes: int = 16,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = 512,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: random-hyperplane LSH bands
    generate candidates (bucket join, never all-pairs), exact cosine
    verifies each candidate against `threshold`. Precision is exact
    (every emitted pair is verified); recall is the hyperplane-LSH
    collision probability — for near-dup thresholds (≥0.9) a pair shares
    ≥1 of the 4 bands with ≥98% probability, tunable via n_planes/bands.
    At scale only (id, band-hash, vec) rows move through the exchange;
    the signature table is the stored index (same persisted-barrier
    pattern as MinHash)."""
    from gigapipe_spark.datapipe.simsearch import _as_double, _cosine_s, signature_col

    rows = n_planes // bands
    mask = (1 << rows) - 1
    base = (
        embeddings.select(
            F.col(id_col).alias("id"), _as_double(vec_col).alias("v")
        )
        .withColumn("sig", signature_col("v", dim, n_planes))
        .persist()
    )
    banded = base.select(
        "id",
        "v",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("sig"), b * rows)
                        .bitwiseAND(F.lit(mask))
                        .alias("h"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bh"),
    ).select("id", "v", F.col("bh.band").alias("band"), F.col("bh.h").alias("h"))
    # zero/clustered embeddings collapse onto one signature — cap those
    # buckets like the text-LSH paths (degenerate vectors are their own
    # cleanup problem, not a pair-generation one)
    banded = _cap_buckets(banded, ["band", "h"], max_bucket)
    left = banded.select(
        "band", "h", F.col("id").alias("doc_a"), F.col("v").alias("va")
    )
    right = banded.select(
        "band", "h", F.col("id").alias("doc_b"), F.col("v").alias("vb")
    )
    cand = (
        left.join(right, ["band", "h"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return (
        cand.withColumn("cosine", _cosine_s("va", "vb"))
        .filter(F.col("cosine") >= threshold)
        .select("doc_a", "doc_b", F.round("cosine", 6).alias("cosine"))
    )


def repeated_substring_spans(
    docs: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact-substring dedup spans (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): every maximal run of
    word positions whose length-k word window also occurs elsewhere in
    the corpus (another doc, or another offset of the same doc). The
    reference treatment removes these spans from training data rather
    than whole documents — the curation step whole-doc dedup cannot
    express (licenses, quoted passages, templated sections inside
    otherwise-unique docs).

    Spark shape, suffix-array-free: positional k-grams are built
    ARRAY-SIDE per doc (transform over an index sequence — the corpus
    is never self-joined), a gram is "duplicated" when its corpus
    occurrence count exceeds 1 (one groupBy on the gram hash — counts,
    not pairs, so a hot boilerplate gram costs one counter, never a
    quadratic blow-up), and marked positions merge into maximal spans
    with the gaps-and-islands window (a new island starts where the
    gap between consecutive duplicated positions exceeds k, since
    fixed k-intervals [p, p+k) chain-overlap exactly up to that gap).
    The only shuffles: the gram-count aggregate, the semi-join back,
    and the per-doc window over the MARKED subset.

    Returns (doc_id, start_word, n_words): 0-based start, span length
    in words, k <= n_words for every row by construction.
    """
    from pyspark.sql import Window

    ws = words_col(F.col(text_col))
    base = docs.select(F.col(id_col).alias("id"), ws.alias("ws")).filter(
        F.size("ws") >= k
    )
    # (id, pos, gram-hash) — pos 0-based; the gram joins on its 64-bit
    # hash for a fixed-width exchange (equality semantics; a collision
    # needs two distinct grams at ~2^-64)
    grams = base.select(
        "id",
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
    ).select("id", F.col("pg.pos").alias("pos"), F.col("pg.g").alias("g"))
    dup = (
        grams.groupBy("g")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .select("g")
    )
    marked = grams.join(dup, "g", "left_semi").select("id", "pos")
    w = Window.partitionBy("id").orderBy("pos")
    islands = marked.withColumn(
        "__new",
        F.when(
            F.col("pos") - F.lag("pos").over(w) > k, F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "__island",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy("id", "__island")
        .agg(
            F.min("pos").alias("start_word"),
            (F.max("pos") + k - F.min("pos")).alias("n_words"),
        )
        .select(
            F.col("id").alias(id_col),
            "start_word",
            F.col("n_words").cast("long").alias("n_words"),
        )
    )


# ------------------------------------------------------------- SemDeDup


def semdedup(
    embeddings: DataFrame,
    n_clusters: int = 8,
    threshold: float = 0.95,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster: int = 100_000,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by k-means clustering the embedding space, then
    dropping all but one member of every within-cluster group of
    semantically-identical points (pairwise cosine ≥ threshold).

    The kept member of each duplicate group is the one FARTHEST from
    its cluster centroid — the paper's keep-hard-examples choice (§3:
    "we keep the examples with low cosine similarity to the cluster
    centroid"). Distinct from pairwise embedding dedup
    (embedding_cosine_pairs): candidate pairs are scoped to a cluster,
    so the candidate volume is Σ|cluster|² instead of corpus², and the
    operator emits a kept/dropped verdict rather than raw pairs.

    100 TB shape: the centroid fit is `ivf_fit` (broadcast-join Lloyd
    rounds, centroid table stays cells × dim); assignment is one
    broadcast join; the only per-cluster work runs in applyInPandas
    over cluster-id partitions with members capped at `max_cluster`
    (rows past the cap are KEPT untouched and counted in the
    `overflow` column — a deliberate, visible cap, never a silent
    drop; the paper's own clusters are sized corpus/k for exactly this
    reason). Within a cluster the greedy scan walks members from
    farthest-to-nearest-centroid, dropping any member whose cosine to
    an already-kept member reaches the threshold — numpy matrix ops on
    a bounded group, the documented Pandas-UDF seam.

    Returns (vec_id, cluster, keep, overflow) — `overflow` marks rows
    kept only because their cluster exceeded max_cluster."""
    import numpy as np
    import pandas as pd

    from gigapipe_spark.datapipe.simsearch import (
        _assign_cells,
        _as_double,
        ivf_fit,
    )

    # the fitted centroids are a k × dim constant: collect once, ship
    # them inside the Arrow closure — corpus→cluster assignment is one
    # narrow numpy pass (no crossJoin, no vec_id-keyed shuffle;
    # simsearch._assign_cells design)
    crows = sorted(
        ivf_fit(
            embeddings, n_cells=n_clusters, iters=iters,
            id_col=id_col, vec_col=vec_col,
        ).collect(),
        key=lambda r: r["cid"],
    )
    if not crows:  # empty corpus: nothing to deduplicate
        return embeddings.sparkSession.createDataFrame(
            [], "vec_id long, cluster int, keep boolean, overflow boolean"
        )
    base = embeddings.select(
        F.col(id_col).alias("vec_id"), _as_double(vec_col).alias("v")
    )
    assigned = _assign_cells(
        base, [(r["cid"], list(r["c"])) for r in crows],
        out="cluster", with_dist=True,
    )

    def _greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        # farthest-from-centroid first: earlier rows win ties, so the
        # kept representative is the paper's low-centroid-similarity
        # member; vec_id breaks exact-distance ties deterministically
        pdf = pdf.sort_values(
            ["dist", "vec_id"], ascending=[False, True]
        ).reset_index(drop=True)
        overflow = pdf.index >= max_cluster
        work = pdf[~overflow]
        mat = np.array(work["v"].tolist(), dtype="float64")
        keep = np.ones(len(work), dtype=bool)
        if len(work):
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0.0] = 1.0
            unit = mat / norms[:, None]
            kept_rows: list[int] = []
            for i in range(len(work)):
                if kept_rows:
                    sims = unit[kept_rows] @ unit[i]
                    if float(sims.max()) >= threshold:
                        keep[i] = False
                        continue
                kept_rows.append(i)
        return pd.DataFrame(
            {
                "vec_id": pdf["vec_id"],
                "cluster": pdf["cluster"],
                "keep": np.concatenate(
                    [keep, np.ones(int(overflow.sum()), dtype=bool)]
                ),
                "overflow": overflow,
            }
        )

    return assigned.groupBy("cluster").applyInPandas(
        _greedy, schema="vec_id long, cluster int, keep boolean, overflow boolean"
    )


def remove_spans(
    docs: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply span-level dedup: drop every word whose 0-based position
    falls inside a (start_word, n_words) span, rejoin the survivors
    with single spaces — the REMOVAL half of Lee et al. 2022's
    exact-substring treatment (repeated_substring_spans detects; this
    transforms the training text). Whitespace is canonicalized to the
    word grid the spans were computed on, so span positions and text
    positions can never drift apart.

    Scale shape: spans collapse to one array per doc (a doc has FEW
    maximal spans by construction — islands of duplicated k-grams),
    then one doc-keyed left join and a per-row array filter; the
    corpus text never shuffles on anything but doc_id.

    Returns (doc_id, clean_text, n_removed_words).
    """
    per_doc = spans.groupBy(F.col(id_col)).agg(
        F.collect_list(
            F.struct(
                F.col("start_word").cast("long").alias("s"),
                F.col("n_words").cast("long").alias("n"),
            )
        ).alias("__spans")
    )
    ws = words_col(F.col(text_col))
    out = (
        docs.select(F.col(id_col), ws.alias("__ws"))
        .join(per_doc, id_col, "left")
        .withColumn("__spans", F.coalesce("__spans", F.array()))
    )
    kept = F.filter(
        F.col("__ws"),
        lambda w, i: ~F.exists(
            F.col("__spans"),
            lambda sp: (sp["s"] <= i) & (i < sp["s"] + sp["n"]),
        ),
    )
    return out.select(
        F.col(id_col),
        F.concat_ws(" ", kept).alias("clean_text"),
        (F.size("__ws") - F.size(kept)).cast("long").alias("n_removed_words"),
    )
