"""Similarity search over an embedding column (array<float>).

Three tiers, trading recall for scale:
- cosine_topk: brute-force exact top-k. Query side is broadcast; the scan
  over candidates is embarrassingly parallel, no shuffle except the final
  per-query top-k (a tiny TakeOrdered). Baseline + verifier.
- cosine_pairs_blocked: all-pairs within a blocking key (label / LSH bucket /
  cluster id) — the O(n^2) is confined to blocks.
- lsh_topk: random-hyperplane (sign) LSH — candidates share the query's
  bucket, turning the scan into a bucket-pruned join. The scale path.

Dot products run as zip_with + aggregate — higher-order built-ins inside
codegen, not Python UDFs. Scores are computed in float64 and rounded to 6 dp
so results are stable across engines and summation strategies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column, dp: int = 6) -> Column:
    return F.round(_dot(a, b) / (_norm(a) * _norm(b)), dp)


def cosine_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k per query (excluding self)."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    c = candidates.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("__cv"))
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", cosine(F.col("__qv"), F.col("__cv")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos", "rank")
    )


def cosine_pairs_blocked(
    vectors: DataFrame,
    block_col: str,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs cosine >= threshold within each block (near-dup detection).
    The equi-join on the block key keeps the quadratic cost inside blocks."""
    a = vectors.select(
        F.col(block_col).alias("__blk"), F.col(id_col).alias("a_id"), F.col(vec_col).alias("__av")
    )
    b = vectors.select(
        F.col(block_col).alias("__blk"), F.col(id_col).alias("b_id"), F.col(vec_col).alias("__bv")
    )
    return (
        a.join(b, "__blk")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", cosine(F.col("__av"), F.col("__bv")).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: bit i = (vec . plane_i >= 0). Plan-time constant
    planes — the dot products are codegen'd expressions, no UDF."""
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        d = _dot(vec, F.array(*[F.lit(float(x)) for x in p]))
        bucket = bucket + F.when(d >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.
    At scale the candidate side is bucketed/partitioned by `bucket`, so a
    query touches 1/2^n_planes of the data."""
    dim = 64
    planes = _hyperplanes(dim, n_planes, seed)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    c = candidates.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("__cv"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", cosine(F.col("__qv"), F.col("__cv")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos", "rank")
    )
