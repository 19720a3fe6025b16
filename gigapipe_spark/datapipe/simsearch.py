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
and the (tiny) centroid table move. IVF cell assignment is one
broadcast-join pass per Lloyd iteration — no driver-side loops over
data, only over the centroid table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


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
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    )
    queries = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q")
    )
    joined = base.crossJoin(F.broadcast(queries)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    cos = _dot(F.col("q"), F.col("v")) / (_norm(F.col("q")) * _norm(F.col("v")))
    scored = joined.withColumn("cosine", cos)
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


def _hyperplane(j: int, dim: int) -> Column:
    """Deterministic pseudo-random ±1 hyperplane j (array<double>)."""
    return F.expr(
        f"transform(sequence(0, {dim - 1}), "
        f"d -> CAST(CASE WHEN xxhash64({j} * 1048573 + d) % 2 = 0 THEN 1.0 ELSE -1.0 END AS DOUBLE))"
    )


def signature_col(vec: Column, dim: int, n_planes: int = 16) -> Column:
    """n_planes sign bits packed into a long."""
    bits = [
        F.when(_dot(vec, _hyperplane(j, dim)) > 0, F.lit(1 << j)).otherwise(F.lit(0))
        for j in range(n_planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out.cast("long")


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
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("sig", signature_col(F.col("v"), dim, n_planes))
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
    cos = _dot(F.col("q"), F.col("v")) / (_norm(F.col("q")) * _norm(F.col("v")))
    scored = cand.withColumn("cosine", cos)
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


def _sq_dist(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
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
    rounds. Each round is ONE broadcast join (assign) + ONE shuffle on
    (cid, pos) (recompute means element-wise); nothing iterates over
    data rows driver-side, so rounds cost O(corpus × cells) compute and
    one exchange regardless of scale. The centroid table stays
    dimension-sized (cells × dim)."""
    from pyspark.sql import Window

    base = embeddings.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
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
        assigned = (
            base.crossJoin(F.broadcast(cents))
            .groupBy("vec_id")
            .agg(
                F.min_by(F.struct("cid", "v"), _sq_dist(F.col("v"), F.col("c"))).alias(
                    "__best"
                )
            )
            .select(F.col("__best.cid").alias("cid"), F.col("__best.v").alias("v"))
        )
        # element-wise mean per cell: explode positions, avg, regroup
        cents = (
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
    candidates. Same output schema as cosine_topk. At scale the fitted
    centroid table is persisted once (an index build, like the
    reference's stored GIN) and reused across queries."""
    from pyspark.sql import Window

    base = embeddings.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    )
    cents = ivf_fit(embeddings, n_cells, iters, id_col, vec_col).persist()
    # corpus → cell assignment (one broadcast pass)
    corpus = (
        base.crossJoin(F.broadcast(cents))
        .groupBy("vec_id")
        .agg(
            F.min_by(F.struct("cid", "v"), _sq_dist(F.col("v"), F.col("c"))).alias("__b")
        )
        .select(F.col("__b.cid").alias("cid"), "vec_id", F.col("__b.v").alias("v"))
    )
    # queries → nprobe nearest cells
    qbase = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q")
    )
    wq = Window.partitionBy("query_id").orderBy(
        _sq_dist(F.col("q"), F.col("c")).asc(), F.col("cid").asc()
    )
    probes = (
        qbase.crossJoin(F.broadcast(cents))
        .withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select("query_id", "q", "cid")
    )
    cand = corpus.join(F.broadcast(probes), "cid").filter(
        F.col("vec_id") != F.col("query_id")
    )
    cos = _dot(F.col("q"), F.col("v")) / (_norm(F.col("q")) * _norm(F.col("v")))
    scored = cand.withColumn("cosine", cos)
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


def _subvectors(vec: Column, m: int) -> Column:
    """Split a (dim-)vector into m contiguous subvectors —
    array<struct<sub:int, sv:array<double>>>. Sub width derives from
    the runtime array size so one expression serves any dimension."""
    width = (F.size(vec) / F.lit(m)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda s: F.struct(
            s.cast("int").alias("sub"),
            F.slice(vec, s * width + 1, width).alias("sv"),
        ),
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

    All m subspaces train TOGETHER: each Lloyd round is one broadcast
    assign + one shuffle keyed (sub, cid, pos) — the same two-exchange
    shape as ivf_fit, independent of m. Deterministic seeds: per
    subspace, the k vectors with the smallest xxhash64(id). The
    codebook stays tiny (m × k × dim/m doubles = exactly dim × k).

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
        F.explode(_subvectors(_as_double(F.col(vec_col)), m)).alias("s"),
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
        assigned = (
            base.join(F.broadcast(cents), "sub")
            .groupBy("vec_id", "sub")
            .agg(
                F.min_by(
                    F.struct("cid", "sv"), _sq_dist(F.col("sv"), F.col("c"))
                ).alias("__b")
            )
            .select("sub", F.col("__b.cid").alias("cid"), F.col("__b.sv").alias("sv"))
        )
        # element-wise centroid mean in ONE (sub, cid) shuffle: fold the
        # collected member subvectors with zip_with instead of the old
        # posexplode → (sub,cid,pos) agg → regroup (2 shuffles + an
        # explode of every training float). The collect is bounded:
        # ≤ train_cap/k_centroids subvectors of dim/m doubles per group.
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


def pq_encode(
    embeddings: DataFrame,
    codebook: DataFrame,
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Corpus → PQ codes (vec_id, sub, code): per subvector, the id of
    its nearest codebook centroid. ONE broadcast join over the exploded
    subvectors — this is the stored index at scale (m small ints per
    vector instead of dim floats, a 16–32× compression)."""
    subs = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.explode(_subvectors(_as_double(F.col(vec_col)), m)).alias("s"),
    ).select("vec_id", F.col("s.sub").alias("sub"), F.col("s.sv").alias("sv"))
    return (
        subs.join(F.broadcast(codebook), "sub")
        .groupBy("vec_id", "sub")
        .agg(
            F.min_by(F.col("cid"), _sq_dist(F.col("sv"), F.col("c"))).alias(
                "code"
            )
        )
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

    Per query, the distance table dot(q_sub, centroid) has m ×
    k_centroids entries — it broadcasts against the stored codes, so
    candidate scoring is a lookup-sum that never touches the original
    vectors. The top k×refine ADC shortlist is then exact-cosine
    reranked (the standard ADC+refine pipeline). The corpus moves
    through exactly two shuffles: the (vec_id, sub) encode groupBy and
    the per-query shortlist window; at 100 TB the codes table is the
    persisted index and encode happens at ingest.

    With k_centroids ≥ distinct subvectors, every subvector IS a
    centroid, ADC equals the exact dot product, and the result matches
    cosine_topk exactly — the oracle-able degenerate configuration
    (sim_ann_pq_exact)."""
    from pyspark.sql import Window

    base = embeddings.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    )
    # persist, not eager localCheckpoint: A/B-measured (r9) — the lazy
    # persist lets the fit run inside the first broadcast's job with
    # full AQE stage coalescing (cold 5.1s/warm 2.2s at sf0.01 vanilla)
    # while an eager checkpoint re-pays the un-coalesced fit every call
    # (warm 4.5s)
    codebook = pq_fit(
        embeddings, m, k_centroids, iters, id_col, vec_col, train_cap
    ).persist()
    codes = pq_encode(embeddings, codebook, m, id_col, vec_col)

    qbase = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("q"),
        F.explode(_subvectors(F.col("v"), m)).alias("s"),
    ).select(
        "query_id", "q", F.col("s.sub").alias("sub"), F.col("s.sv").alias("qs")
    )
    # ADC lookup table: (query_id, sub, cid) → partial dot
    table = qbase.join(F.broadcast(codebook), "sub").select(
        "query_id",
        "sub",
        F.col("cid").alias("code"),
        _dot(F.col("qs"), F.col("c")).alias("partial"),
    )
    adc = (
        codes.join(F.broadcast(table), ["sub", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("partial").alias("adc_dot"), F.count(F.lit(1)).alias("__m"))
        .filter(F.col("__m") == m)  # all subspaces matched the table
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
    cos = _dot(F.col("q"), F.col("v")) / (_norm(F.col("q")) * _norm(F.col("v")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        cand.withColumn("cosine", cos)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round("cosine", 6).alias("cosine"),
        )
    )
