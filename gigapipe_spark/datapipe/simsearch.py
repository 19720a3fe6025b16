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

At 100 TB the corpus side stays partitioned; only queries and
bucket keys move. An IVF variant would add a coarse k-means routing
step — the LSH path covers the same contract without iterative fitting.
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
