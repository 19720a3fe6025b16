"""Similarity search over embedding columns (array<float>).

  cosine_topk      brute-force exact top-k: broadcast the (small) query
                   set against the corpus; dot products via zip_with /
                   aggregate — JVM-side, no UDFs. The baseline.
  lsh_ann_topk     random-hyperplane LSH:
                   sign-bit signatures → band buckets → candidates →
                   exact rerank. The scale path: candidate generation is
                   a bucket join, not a cross join. Hyperplanes are
                   derived deterministically from xxhash64(j, d) — no RNG,
                   reproducible across runs/executors.

  ivf_topk         IVF (inverted-file) routing: a coarse k-means
                   quantizer (deterministic init, bounded Lloyd
                   iterations, all DataFrame ops) assigns every vector
                   to a cell; queries probe the nprobe nearest cells and
                   rerank exactly. The classic ANN index shape — recall
                   is tunable via nprobe, candidate cost is
                   corpus/cells × nprobe.

At 100 TB the corpus side stays partitioned; only queries, bucket keys
and the (tiny) centroid table move. Centroid/codebook tables are
dimension-sized CONSTANTS (k × dim doubles — FAISS keeps the same
tables in RAM): they are collected once per fit round and inlined into
the assignment expression, so cell routing / PQ encode / ADC scoring
are NARROW maps over the corpus scan — no join, no shuffle, no
driver-side loop over data rows, at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# Vector math as SQL-string expression builders, not Column-API HOFs: a
# Python-lambda higher-order function costs ~12 Py4J round trips to
# build (callback registration per lambda); a plan with a few dozen of
# them spends 1.5-2s of DRIVER time per query in socket chatter alone
# (profiled: 3,183 round trips / 1.7s for one pq_topk plan). One
# F.expr(...) string is one round trip and compiles to the identical
# Catalyst tree, so plan construction drops ~6× with the same physical
# plan. The *_s builders return SQL fragments composable into larger
# single-expr strings; inputs are column names or SQL fragments.


def _dot_s(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        f"cast(0.0 as double), (acc, x) -> acc + x)"
    )


def _norm_s(a: str) -> str:
    return (
        f"sqrt(aggregate(transform({a}, x -> x * x), "
        f"cast(0.0 as double), (acc, x) -> acc + x))"
    )


def _sq_dist_s(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
        f"cast(0.0 as double), (acc, x) -> acc + x)"
    )


def _as_double_s(c: str) -> str:
    return f"transform({c}, x -> cast(x as double))"


def _cosine_s(q: str, v: str) -> Column:
    return F.expr(f"{_dot_s(q, v)} / ({_norm_s(q)} * {_norm_s(v)})")


def _sq_dist_c(a: str, b: str) -> Column:
    return F.expr(_sq_dist_s(a, b))


def _as_double(col: str) -> Column:
    return F.expr(_as_double_s(f"`{col}`"))


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id (self excluded).

    Queries are broadcast (small side); per-row cost is one fused
    zip_with/aggregate pass over the vector — whole-stage codegen, no
    Python. Deterministic tiebreak on neighbor id.
    """
    from pyspark.sql import Window

    base = embeddings.select(
        F.col(id_col).alias("vec_id"), _as_double(vec_col).alias("v")
    )
    queries = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q")
    )
    joined = base.crossJoin(F.broadcast(queries)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = joined.withColumn("cosine", _cosine_s("q", "v"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round("cosine", 6).alias("cosine"),
        )
    )


def _hyperplane_s(j: str, dim: int) -> str:
    """Deterministic pseudo-random ±1 hyperplane `j` (array<double>
    SQL fragment); `j` may itself be an expression (a lambda var)."""
    return (
        f"transform(sequence(0, {dim - 1}), "
        f"d -> CAST(CASE WHEN xxhash64(({j}) * 1048573 + d) % 2 = 0 "
        f"THEN 1.0 ELSE -1.0 END AS DOUBLE))"
    )


def signature_col(vec: str, dim: int, n_planes: int = 16) -> Column:
    """n_planes sign bits packed into a long — ONE expression: fold the
    plane index sequence, OR-ing each sign bit into the accumulator
    (same bits as the old per-plane column chain, one Py4J round trip
    instead of ~n_planes × 14)."""
    return F.expr(
        f"aggregate(sequence(0, {n_planes - 1}), cast(0 as long), "
        f"(acc, j) -> acc | IF({_dot_s(vec, _hyperplane_s('j', dim))} > 0, "
        f"shiftleft(cast(1 as long), j), cast(0 as long)))"
    )


def lsh_ann_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    dim: int = 64,
    n_planes: int = 16,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share ≥1 LSH band with the query,
    then exact cosine rerank. Returns the same schema as cosine_topk."""
    from pyspark.sql import Window

    rows = n_planes // bands
    mask = (1 << rows) - 1
    base = embeddings.select(
        F.col(id_col).alias("vec_id"), _as_double(vec_col).alias("v")
    ).withColumn("sig", signature_col("v", dim, n_planes))
    banded = base.select(
        "vec_id",
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
    ).select("vec_id", "v", F.col("bh.band").alias("band"), F.col("bh.h").alias("h"))
    queries = banded.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q"), "band", "h"
    )
    cand = (
        banded.join(F.broadcast(queries), ["band", "h"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = cand.withColumn("cosine", _cosine_s("q", "v"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round("cosine", 6).alias("cosine"),
        )
    )


def _dlit(x: float) -> str:
    """Exact SQL double literal (repr is shortest-round-trip)."""
    import math

    if math.isfinite(x):
        return repr(float(x)) + "D"
    return f"cast('{x}' as double)"


def _vecs_lit(vecs: list) -> str:
    """array<array<double>> literal from collected vectors."""
    return (
        "array("
        + ", ".join("array(" + ", ".join(_dlit(x) for x in v) + ")" for v in vecs)
        + ")"
    )


def _argmin_s(sv: str, cents: str) -> str:
    """0-based index of the nearest (squared-L2) centroid in the
    `cents` array-of-vectors fragment; ties keep the lowest index.
    A NARROW expression — the centroid table is a dimension-sized
    constant (k × dim doubles), so nearest-centroid assignment needs
    no join and no shuffle at any corpus size (FAISS keeps the same
    table in RAM; here it is inlined into the plan as a literal)."""
    d = _sq_dist_s(sv, "c")
    return (
        f"aggregate({cents}, "
        f"named_struct('i', 0, 'bi', -1, 'bd', cast('Infinity' as double)), "
        f"(acc, c) -> named_struct("
        f"'i', acc.i + 1, "
        f"'bi', IF({d} < acc.bd, acc.i, acc.bi), "
        f"'bd', least(acc.bd, {d})), "
        f"acc -> acc.bi)"
    )


def _centroid_means(assigned: DataFrame) -> DataFrame:
    """(cid, v) rows → element-wise mean per cid: ONE shuffle keyed
    (cid, pos); partial aggregation makes the exchange centroid-sized."""
    return (
        assigned.select("cid", F.posexplode("v").alias("pos", "x"))
        .groupBy("cid", "pos")
        .agg(F.avg("x").alias("m"))
        .groupBy("cid")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("c")
        )
    )


def ivf_fit(
    embeddings: DataFrame,
    n_cells: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Coarse quantizer: k-means centroids as a (cid, c) DataFrame.

    Deterministic init — the n_cells vectors with the smallest
    xxhash64(id) (a seedless reproducible sample) — then `iters` Lloyd
    rounds. Per round the current centroids (a k × dim constant) are
    collected and INLINED into the assignment expression (_argmin_s),
    so assignment is a narrow map over the corpus — no broadcast join,
    no (vec_id)-keyed shuffle; the only exchange per round is the
    centroid-sized mean recompute. Nothing corpus-sized ever moves,
    at any scale."""
    from pyspark.sql import Window

    base = embeddings.select(
        F.col(id_col).alias("vec_id"), _as_double(vec_col).alias("v")
    )
    # distributed TakeOrdered picks the seeds (same determinism as a
    # global sort, no single-partition exchange of the corpus); the
    # ordinal window then runs over n_cells rows only
    seeds = base.orderBy(F.xxhash64(F.col("vec_id")), F.col("vec_id")).limit(n_cells)
    w = Window.orderBy(F.xxhash64(F.col("vec_id")), F.col("vec_id"))
    cents = seeds.withColumn("__rn", F.row_number().over(w)).select(
        (F.col("__rn") - 1).alias("cid"), F.col("v").alias("c")
    )
    for _ in range(iters):
        crows = sorted(cents.collect(), key=lambda r: r["cid"])
        if not crows:
            break
        cb = _vecs_lit([r["c"] for r in crows])
        cid_map = "array(" + ", ".join(str(r["cid"]) for r in crows) + ")"
        assigned = base.select(
            F.expr(f"element_at({cid_map}, {_argmin_s('v', cb)} + 1)").alias(
                "cid"
            ),
            "v",
        )
        cents = _centroid_means(assigned)
    return cents


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_cells: int = 8,
    nprobe: int = 2,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN top-k: route every vector to its nearest centroid cell,
    probe the query's `nprobe` nearest cells, exact-cosine rerank the
    candidates. Same output schema as cosine_topk. The fitted centroid
    table is a k × dim constant: it is collected once (an index build,
    like the reference's stored GIN) and inlined, so corpus→cell
    routing is a NARROW expression — the corpus never shuffles; only
    the (tiny) probe table and the final per-query window move."""
    from pyspark.sql import Window

    base = embeddings.select(
        F.col(id_col).alias("vec_id"), _as_double(vec_col).alias("v")
    )
    crows = sorted(
        ivf_fit(embeddings, n_cells, iters, id_col, vec_col).collect(),
        key=lambda r: r["cid"],
    )
    if not crows:
        return base.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double"
        )
    cb = _vecs_lit([r["c"] for r in crows])
    cid_map = "array(" + ", ".join(str(r["cid"]) for r in crows) + ")"
    # corpus → cell assignment: narrow, no exchange
    corpus = base.select(
        F.expr(f"element_at({cid_map}, {_argmin_s('v', cb)} + 1)").alias("cid"),
        "vec_id",
        "v",
    )
    # queries → nprobe nearest cells: the query batch is collected
    # (bounded — it is the request, not the corpus) and probed against
    # the same constant driver-side
    qrows = base.filter(F.col("vec_id").isin(query_ids)).collect()

    def _sqd(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    probe_rows = []
    for qr in qrows:
        ranked = sorted(
            ((_sqd(qr["v"], r["c"]), r["cid"]) for r in crows)
        )[:nprobe]
        probe_rows += [(qr["vec_id"], list(qr["v"]), cid) for _, cid in ranked]
    import pyspark.sql.types as T

    probes = base.sparkSession.createDataFrame(
        probe_rows,
        T.StructType(
            [
                T.StructField("query_id", base.schema["vec_id"].dataType),
                T.StructField("q", T.ArrayType(T.DoubleType())),
                T.StructField("cid", T.IntegerType()),
            ]
        ),
    )
    cand = corpus.join(F.broadcast(probes), "cid").filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = cand.withColumn("cosine", _cosine_s("q", "v"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round("cosine", 6).alias("cosine"),
        )
    )


def _subvectors_s(vec: str, m: int) -> str:
    """Split a (dim-)vector into m contiguous subvectors —
    array<struct<sub:int, sv:array<double>>> SQL fragment. Sub width
    derives from the runtime array size so one expression serves any
    dimension."""
    width = f"cast(size({vec}) / {m} as int)"
    return (
        f"transform(sequence(0, {m - 1}), s -> struct("
        f"cast(s as int) as sub, "
        f"slice({vec}, s * {width} + 1, {width}) as sv))"
    )


def pq_fit(
    embeddings: DataFrame,
    m: int = 4,
    k_centroids: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_cap: int = 65536,
) -> DataFrame:
    """Product-quantization codebook: per-subspace k-means centroids as
    one (sub, cid, c) DataFrame (Jégou et al. 2011, "Product
    quantization for nearest neighbor search").

    All m subspaces train TOGETHER: per Lloyd round the codebook (an
    m × k × dim/m constant — exactly dim × k doubles) is collected and
    inlined, so subvector→centroid assignment is a NARROW expression
    and the only exchange per round is the centroid-sized mean
    recompute keyed (sub, cid) — the same shape as ivf_fit,
    independent of m. Deterministic seeds: per subspace, the k vectors
    with the smallest xxhash64(id).

    `train_cap` bounds the TRAINING set with a deterministic hash
    sample (standard PQ practice — codebooks converge on a bounded
    sample; FAISS trains on ~256 vectors per centroid). At 100 TB the
    fit therefore touches a fixed-size slice; encode remains the only
    full corpus pass. 0/None disables the cap (the exact degenerate
    config needs every subvector as a seed)."""
    from pyspark.sql import Window

    train = embeddings
    if train_cap:
        n = train.count()
        if n > train_cap:
            # deterministic hash-threshold sample ≈ train_cap rows
            train = train.filter(
                F.pmod(F.abs(F.xxhash64(F.col(id_col))), F.lit(n))
                < F.lit(train_cap)
            )
    base = train.select(
        F.col(id_col).alias("vec_id"),
        F.explode(F.expr(_subvectors_s(_as_double_s(f"`{vec_col}`"), m))).alias("s"),
    ).select("vec_id", F.col("s.sub").alias("sub"), F.col("s.sv").alias("sv"))
    w = Window.partitionBy("sub").orderBy(
        F.xxhash64(F.col("vec_id")), F.col("vec_id")
    )
    cents = (
        base.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k_centroids)
        .select("sub", (F.col("__rn") - 1).alias("cid"), F.col("sv").alias("c"))
    )
    for _ in range(iters):
        cb3, cid_map2, subs_present = _codebook_lits(cents.collect())
        if not subs_present:
            break
        assigned = base.select(
            "sub",
            F.expr(
                f"element_at(element_at({cid_map2}, sub + 1), "
                f"{_argmin_s('sv', f'element_at({cb3}, sub + 1)')} + 1)"
            ).alias("cid"),
            "sv",
        )
        # element-wise centroid mean in ONE (sub, cid) shuffle: fold the
        # collected member subvectors with zip_with. The collect is
        # bounded: ≤ train_cap/k_centroids subvectors of dim/m doubles
        # per group.
        lst = F.collect_list("sv")
        cents = (
            assigned.groupBy("sub", "cid")
            .agg(lst.alias("__svs"))
            .select(
                "sub",
                "cid",
                F.transform(
                    F.aggregate(
                        F.slice(
                            F.col("__svs"), 2, F.size("__svs") - 1
                        ),
                        F.element_at(F.col("__svs"), 1),
                        lambda acc, x: F.zip_with(
                            acc, x, lambda a, b: a + b
                        ),
                    ),
                    lambda s: s / F.size("__svs"),
                ).alias("c"),
            )
        )
    return cents


# Inline the codebook as a literal only while it is dimension-sized:
# the argmin fold is O(entries) interpreted steps PER SUBVECTOR, so a
# degenerate codebook (k ≈ corpus, the exact-oracle configuration)
# makes the narrow pass slower than the broadcast join it replaced.
# Production PQ codebooks are 16-256 entries/subspace — far under this.
_INLINE_CODEBOOK_CAP = 1024


def _codebook_df(spark, cb_rows: list) -> DataFrame:
    """Collected codebook rows → a local-relation DataFrame (no
    recompute of the fit) for the broadcast-join fallback."""
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("sub", T.IntegerType()),
            T.StructField("cid", T.IntegerType()),
            T.StructField("c", T.ArrayType(T.DoubleType())),
        ]
    )
    return spark.createDataFrame(
        [(r["sub"], r["cid"], list(r["c"])) for r in cb_rows], schema
    )


def _codebook_lits(rows: list) -> tuple[str, str, list[int]]:
    """Collected (sub, cid, c) codebook rows (an m × k × dim/m
    constant) → inline SQL literals: CB3[sub+1][pos+1] = centroid
    vector, CIDS[sub+1][pos+1] = that centroid's cid. Returns (CB3,
    CIDS, subs_present). Positions are per-sub, cid-ascending."""
    by_sub: dict[int, list] = {}
    for r in rows:
        by_sub.setdefault(r["sub"], []).append((r["cid"], r["c"]))
    if not by_sub:
        return "", "", []
    m = max(by_sub) + 1
    cb_parts, cid_parts = [], []
    for s in range(m):
        ents = sorted(by_sub.get(s, []))
        cb_parts.append(_vecs_lit([c for _, c in ents]) if ents else "array()")
        cid_parts.append(
            "array(" + ", ".join(str(cid) for cid, _ in ents) + ")"
            if ents
            else "array()"
        )
    return (
        "array(" + ", ".join(cb_parts) + ")",
        "array(" + ", ".join(cid_parts) + ")",
        sorted(by_sub),
    )


def pq_encode(
    embeddings: DataFrame,
    codebook: DataFrame,
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Corpus → PQ codes (vec_id, sub, code): per subvector, the id of
    its nearest codebook centroid. The codebook is a dim × k constant,
    collected once and inlined, so encode is a NARROW map over the
    corpus — no join, no shuffle; this is the stored index at scale
    (m small ints per vector instead of dim floats, a 16–32×
    compression) and it is built in the same pass that scans the
    vectors."""
    cb_rows = codebook.collect()
    cb3, cid_map2, subs_present = _codebook_lits(cb_rows)
    if not subs_present:
        return embeddings.sparkSession.createDataFrame(
            [], "vec_id long, sub int, code int"
        )
    subs = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.explode(F.expr(_subvectors_s(_as_double_s(f"`{vec_col}`"), m))).alias("s"),
    ).select("vec_id", F.col("s.sub").alias("sub"), F.col("s.sv").alias("sv"))
    if len(cb_rows) > _INLINE_CODEBOOK_CAP:
        # degenerate-size codebook: broadcast join beats the literal fold
        cbdf = _codebook_df(embeddings.sparkSession, cb_rows)
        return (
            subs.join(F.broadcast(cbdf), "sub")
            .groupBy("vec_id", "sub")
            .agg(
                F.min_by(
                    F.col("cid"), F.struct(_sq_dist_c("sv", "c"), F.col("cid"))
                ).alias("code")
            )
        )
    return subs.select(
        "vec_id",
        "sub",
        F.expr(
            f"element_at(element_at({cid_map2}, sub + 1), "
            f"{_argmin_s('sv', f'element_at({cb3}, sub + 1)')} + 1)"
        ).alias("code"),
    )


def pq_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    m: int = 4,
    k_centroids: int = 16,
    iters: int = 2,
    refine: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_cap: int = 65536,
) -> DataFrame:
    """PQ ANN top-k with asymmetric distance (ADC) + exact refine.

    The codebook (dim × k doubles) and the per-query ADC table
    dot(q_sub, centroid) (queries × m × k doubles) are both
    dimension-sized constants: they are computed once and INLINED, so
    the whole candidate-scoring pass — encode each subvector + per
    query sum the table lookups — is ONE narrow expression over the
    corpus scan that never touches a join. The corpus moves through
    exactly one exchange: the per-query shortlist window; the top
    k×refine ADC shortlist is then exact-cosine reranked (the standard
    ADC+refine pipeline). At 100 TB the codes column is the persisted
    index and encode happens at ingest (pq_encode, also narrow).

    With k_centroids ≥ distinct subvectors, every subvector IS a
    centroid, ADC equals the exact dot product, and the result matches
    cosine_topk exactly — the oracle-able degenerate configuration
    (sim_ann_pq_exact)."""
    from pyspark.sql import Window

    base = embeddings.select(
        F.col(id_col).alias("vec_id"), _as_double(vec_col).alias("v")
    )
    codebook = pq_fit(
        embeddings, m, k_centroids, iters, id_col, vec_col, train_cap
    )
    cb_rows = codebook.collect()
    cb3, _cid_map2, subs_present = _codebook_lits(cb_rows)
    qrows = sorted(
        base.filter(F.col("vec_id").isin(query_ids)).collect(),
        key=lambda r: r["vec_id"],
    )
    if not subs_present or not qrows:
        return base.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double"
        )
    # per-query ADC lookup table, built driver-side against the same
    # collected codebook: ADCT[qi+1][sub+1][pos+1] = dot(q_sub, centroid)
    by_sub: dict[int, list] = {}
    for r in cb_rows:
        by_sub.setdefault(r["sub"], []).append((r["cid"], r["c"]))
    mm = max(by_sub) + 1
    width = len(qrows[0]["v"]) // m

    def _qtable(qv) -> str:
        parts = []
        for s in range(mm):
            qs = qv[s * width : (s + 1) * width]
            parts.append(
                "array("
                + ", ".join(
                    _dlit(sum(x * y for x, y in zip(qs, c)))
                    for _, c in sorted(by_sub.get(s, []))
                )
                + ")"
                if by_sub.get(s)
                else "array()"
            )
        return "array(" + ", ".join(parts) + ")"

    if len(cb_rows) > _INLINE_CODEBOOK_CAP:
        # degenerate-size codebook (k ≈ corpus, the exact-oracle
        # config): broadcast-join scoring — codes via pq_encode's join
        # branch, ADC partials as a local broadcast table built from
        # the SAME driver-side dot products the inline path uses
        import pyspark.sql.types as T

        cbdf = _codebook_df(base.sparkSession, cb_rows)
        subs = base.select(
            "vec_id", F.explode(F.expr(_subvectors_s("v", m))).alias("s")
        ).select("vec_id", F.col("s.sub").alias("sub"), F.col("s.sv").alias("sv"))
        codes = (
            subs.join(F.broadcast(cbdf), "sub")
            .groupBy("vec_id", "sub")
            .agg(
                F.min_by(
                    F.col("cid"), F.struct(_sq_dist_c("sv", "c"), F.col("cid"))
                ).alias("code")
            )
        )
        trows = []
        for qr in qrows:
            qv = qr["v"]
            for s in range(mm):
                qs = qv[s * width : (s + 1) * width]
                for cid, c in by_sub.get(s, []):
                    trows.append(
                        (qr["vec_id"], s, cid, sum(x * y for x, y in zip(qs, c)))
                    )
        table = base.sparkSession.createDataFrame(
            trows,
            T.StructType(
                [
                    T.StructField("query_id", base.schema["vec_id"].dataType),
                    T.StructField("sub", T.IntegerType()),
                    T.StructField("code", T.IntegerType()),
                    T.StructField("partial", T.DoubleType()),
                ]
            ),
        )
        adc = (
            codes.join(F.broadcast(table), ["sub", "code"])
            .filter(F.col("vec_id") != F.col("query_id"))
            .groupBy("query_id", "vec_id")
            .agg(F.sum("partial").alias("adc_dot"))
        )
    else:
        adct = "array(" + ", ".join(_qtable(qr["v"]) for qr in qrows) + ")"
        qid_map = "array(" + ", ".join(f'{qr["vec_id"]}L' for qr in qrows) + ")"
        # fused narrow scoring pass: encode the row's subvectors (argmin
        # positions) then, per query, sum the inlined table lookups
        pos_codes = (
            f"transform({_subvectors_s('v', m)}, s -> "
            f"{_argmin_s('s.sv', f'element_at({cb3}, s.sub + 1)')})"
        )
        adc_scores = (
            f"transform(sequence(1, {len(qrows)}), qi -> named_struct("
            f"'query_id', element_at({qid_map}, qi), "
            f"'adc_dot', aggregate(sequence(1, {mm}), cast(0.0 as double), "
            f"(acc, s) -> acc + element_at(element_at(element_at({adct}, qi), s), "
            f"element_at(__codes, s) + 1))))"
        )
        adc = (
            base.withColumn("__codes", F.expr(pos_codes))
            .select("vec_id", F.explode(F.expr(adc_scores)).alias("__a"))
            .select(
                F.col("__a.query_id").alias("query_id"),
                "vec_id",
                F.col("__a.adc_dot").alias("adc_dot"),
            )
            .filter(F.col("vec_id") != F.col("query_id"))
        )
    wa = Window.partitionBy("query_id").orderBy(
        F.col("adc_dot").desc(), F.col("vec_id").asc()
    )
    shortlist = (
        adc.withColumn("__rn", F.row_number().over(wa))
        .filter(F.col("__rn") <= k * refine)
        .select("query_id", "vec_id")
    )
    # exact rerank on the shortlist only
    cand = (
        shortlist.join(base, "vec_id")
        .join(
            F.broadcast(
                base.filter(F.col("vec_id").isin(query_ids)).select(
                    F.col("vec_id").alias("query_id"), F.col("v").alias("q")
                )
            ),
            "query_id",
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        cand.withColumn("cosine", _cosine_s("q", "v"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round("cosine", 6).alias("cosine"),
        )
    )
