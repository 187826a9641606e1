"""Approximate nearest-neighbor search over an embedding column.

- brute_force_topk: exact cosine top-k via query-broadcast join +
  window — the correctness baseline. O(|Q| × |corpus|) but fully
  distributed and shuffle-light when |Q| is broadcastable.
- hyperplane LSH: deterministic random-hyperplane sign buckets; only
  same-bucket (or neighboring-probe) candidates are scored. The scale
  path: candidate count drops ~2^-bits per bucket.

Hyperplanes are generated from a fixed seed with numpy on the driver
and shipped as literal arrays — deterministic across cluster sizes.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import similarity as S


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """(query_id, neighbor_id, cos, rank): exact top-k per query.

    queries is expected to be small (broadcast); ties broken by
    neighbor id for determinism.
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.join(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(S.cosine(F.col("q_vec"), F.col("c_vec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def hyperplane_expr(vec_col: str, dim: int, bits: int = 8, seed: int = 7):
    """Bucket id column: sign bits of `bits` fixed random hyperplanes."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((bits, dim))
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        d = S.dot(F.col(vec_col), lit_plane)
        bucket = bucket + F.when(d >= 0, F.lit(1 << i).cast("long")).otherwise(0)
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    bits: int = 8,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """LSH-bucketed approximate top-k: candidates share the sign-bucket.

    Recall < 1 by construction; raise recall with fewer bits or
    multi-probe. Returned schema matches brute_force_topk.
    """
    b = hyperplane_expr(vec_col, dim, bits, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"), b.alias("bucket")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"),
        hyperplane_expr(vec_col, dim, bits, seed).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(S.cosine(F.col("q_vec"), F.col("c_vec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )
