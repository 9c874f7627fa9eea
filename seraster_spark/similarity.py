"""Similarity search over embedding columns (array<float>).

Baseline: exact brute-force cosine top-k — dot products via ``zip_with`` +
``aggregate`` (JVM-side sequential fold, deterministic order) with a window
top-k. Scale path: random-hyperplane LSH bucketing — signatures via one
Arrow-batched numpy matmul, candidates from an equi-join on bucket id, exact
re-rank only within buckets; multi-probe via Hamming-adjacent buckets.

Embedding-cosine near-duplicate detection reuses the same machinery with a
threshold instead of top-k.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W, functions as F
from pyspark.sql import types as T


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(vec) -> "F.Column":
    return F.sqrt(_dot(vec, vec))


def brute_force_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set, crossJoin against
    the items table (embarrassingly parallel scan — no shuffle of the big
    side), window top-k per query. Ties broken by item id."""
    q = queries.select(
        F.col(query_id).alias("_qid"), F.col(vec_col).alias("_qvec")
    )
    it = items.select(F.col(id_col).alias("_iid"), F.col(vec_col).alias("_ivec"))
    joined = it.crossJoin(F.broadcast(q))
    cos = _dot(F.col("_ivec"), F.col("_qvec")) / (
        norm_expr(F.col("_ivec")) * norm_expr(F.col("_qvec"))
    )
    ranked = (
        joined.withColumn("cosine", cos)
        .withColumn(
            "rank",
            F.row_number().over(
                W.partitionBy("_qid").orderBy(F.col("cosine").desc(), F.col("_iid").asc())
            ),
        )
        .filter(F.col("rank") <= k)
    )
    return ranked.select(
        F.col("_qid").alias(query_id), F.col("_iid").alias(id_col), "cosine", "rank"
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def lsh_bucket_udf(dim: int, n_planes: int = 16, seed: int = 7):
    """Random-hyperplane LSH bucket id (sign-bit signature) — one numpy
    matmul per Arrow batch."""
    planes = _hyperplanes(dim, n_planes, seed)

    @F.pandas_udf(T.LongType())
    def _bucket(vec: pd.Series) -> pd.Series:
        m = np.stack(vec.to_numpy())  # (batch, dim)
        signs = (m.astype(np.float64) @ planes.T) > 0  # (batch, n_planes)
        out = np.zeros(len(m), dtype=np.int64)
        for b in range(n_planes):
            out |= signs[:, b].astype(np.int64) << b
        return pd.Series(out)

    return _bucket


def lsh_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    n_planes: int = 12,
    n_probes: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Approximate cosine top-k: bucket both sides by hyperplane signature,
    multi-probe queries into Hamming-1 neighbor buckets (probe list built as
    a literal array — no extra shuffle), exact cosine re-rank inside the
    probed buckets only."""
    bucket = lsh_bucket_udf(dim, n_planes, seed)
    it = items.select(
        F.col(id_col).alias("_iid"), F.col(vec_col).alias("_ivec")
    ).withColumn("bucket", bucket(F.col("_ivec")))
    q = queries.select(
        F.col(query_id).alias("_qid"), F.col(vec_col).alias("_qvec")
    ).withColumn("bucket0", bucket(F.col("_qvec")))
    probes = [F.col("bucket0")] + [
        F.col("bucket0").bitwiseXOR(F.lit(1 << b)) for b in range(min(n_probes - 1, n_planes))
    ]
    qp = q.withColumn("bucket", F.explode(F.array(*probes))).drop("bucket0")
    joined = it.join(F.broadcast(qp), "bucket")
    cos = _dot(F.col("_ivec"), F.col("_qvec")) / (
        norm_expr(F.col("_ivec")) * norm_expr(F.col("_qvec"))
    )
    ranked = (
        joined.withColumn("cosine", cos)
        .dropDuplicates(["_qid", "_iid"])
        .withColumn(
            "rank",
            F.row_number().over(
                W.partitionBy("_qid").orderBy(F.col("cosine").desc(), F.col("_iid").asc())
            ),
        )
        .filter(F.col("rank") <= k)
    )
    return ranked.select(
        F.col("_qid").alias(query_id), F.col("_iid").alias(id_col), "cosine", "rank"
    )


def cosine_near_duplicates(
    items: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    seed: int = 7,
) -> DataFrame:
    """Embedding-cosine near-dup pairs: LSH self-bucket-join + exact cosine
    filter. Returns (id_a, id_b, cosine) with id_a < id_b."""
    bucket = lsh_bucket_udf(dim, n_planes, seed)
    it = items.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec")
    ).withColumn("bucket", bucket(F.col("_vec")))
    l, r = it.alias("l"), it.alias("r")
    pairs = l.join(
        r, (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l._id") < F.col("r._id"))
    )
    cos = _dot(F.col("l._vec"), F.col("r._vec")) / (
        norm_expr(F.col("l._vec")) * norm_expr(F.col("r._vec"))
    )
    return (
        pairs.withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"), "cosine")
        .dropDuplicates(["id_a", "id_b"])
    )
