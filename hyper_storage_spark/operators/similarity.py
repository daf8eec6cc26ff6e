"""Similarity search over an embedding column (array<float>).

- :func:`cosine_topk` — brute-force exact top-k: broadcast the (small)
  query set against the corpus; the dot product runs as built-in
  higher-order functions (zip_with + aggregate) inside codegen, the
  top-k per query is a window rank (TakeOrdered-style). At 100 TB the
  corpus side stays partition-parallel and nothing shuffles except the
  final per-query top-k (tiny).
- :func:`lsh_bucket_topk` — the approximate scale path: random
  hyperplane signatures (sign of dot with h fixed vectors) bucket the
  corpus; queries search only their bucket (plus optional multi-probe).
  Accuracy/recall trades against bucket count; the bucketing is a
  deterministic column expression, so it co-partitions with a simple
  repartition on the signature — no per-query scans.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, rank, cosine)."""
    from pyspark.sql import Window

    queries = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    corpus = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        corpus.join(F.broadcast(queries), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rnd = random.Random(seed)
    return [[rnd.gauss(0, 1) for _ in range(dim)] for _ in range(n_planes)]


def signature_col(vec_col, planes: list[list[float]]):
    """Random-hyperplane LSH signature: one bit per plane (sign of dot)."""
    sig = F.lit(0).cast("bigint")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        sig = sig + F.when(_dot(vec_col, plane) > 0, F.lit(2**i).cast("bigint")).otherwise(0)
    return sig


def lsh_bucket_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k searching only the query's LSH bucket.

    Recall is approximate by construction; rank/cosine are exact within
    the bucket. Returns (query_id, neighbor_id, rank, cosine).
    """
    from pyspark.sql import Window

    planes = _hyperplanes(dim, n_planes, seed)
    sig = emb.select(
        F.col(id_col), F.col(vec_col), signature_col(F.col(vec_col), planes).alias("bucket")
    )
    queries = sig.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), F.col("bucket")
    )
    corpus = sig.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "bucket")
    scored = (
        corpus.join(F.broadcast(queries), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )
