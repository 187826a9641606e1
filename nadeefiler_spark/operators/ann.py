"""Approximate nearest-neighbor search over an embedding column.

- brute_force_topk: exact cosine top-k via query-broadcast join +
  window — the correctness baseline. O(|Q| × |corpus|) but fully
  distributed and shuffle-light when |Q| is broadcastable.
- hyperplane LSH: deterministic random-hyperplane sign buckets; only
  same-bucket (or neighboring-probe) candidates are scored. The scale
  path: candidate count drops ~2^-bits per bucket.
- IVF (inverted-file): a coarse quantizer of k centroids partitions the
  corpus into cells; queries probe only their nprobe nearest cells.
  Cell assignment is a map-side vectorized Arrow UDF — one numpy
  matmul per batch against the (tiny, driver-collected) centroid
  matrix — so building the index costs ZERO shuffle; the only shuffle
  is the final per-query top-k window, sized by |Q|. Centroids come
  either from fixed corpus rows (oracle-friendly) or from
  kmeans_centroids, a distributed Lloyd's trainer whose per-iteration
  update is a map-side partial aggregation (posexplode →
  groupBy(cell, pos) combines to k × dim rows per partition before the
  shuffle). write_ivf_index / ivf_topk_indexed persist the corpus
  cell-partitioned so repeated query batches scan only probed cells
  (partition pruning at the file level).

Hyperplanes are generated from a fixed seed with numpy on the driver
and shipped as literal arrays — deterministic across cluster sizes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

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

# ---------------------------------------------------------------------------
# IVF: inverted-file index with a vectorized-matmul coarse quantizer
# ---------------------------------------------------------------------------


def _dist_matrix(vs, C, cn):
    """(batch x k) squared-L2 distances: ||v||^2 - 2 v.C^T + ||c||^2.

    One numpy matmul per Arrow batch — the whole quantizer is ~three
    BLAS calls, vs k x dim interpreted higher-order-function evals per
    row for a literal-expression argmin (measured ~6x slower end-to-end
    at sf0.01 counting its per-query analysis cost). Ordering matches
    the DuckDB oracle's list_distance for well-separated centroids
    (FP discrepancy ~1e-12 vs O(1) inter-centroid gaps).
    """
    V = np.array([np.asarray(v, dtype=np.float64) for v in vs])
    return (V * V).sum(axis=1)[:, None] - 2.0 * (V @ C.T) + cn[None, :]


def ivf_cell_expr(vec_col: str, centroids):
    """Nearest-centroid cell id — map-side Arrow UDF, no shuffle.

    Ties break on the lower cell id (np.argmin returns the first
    minimum), mirroring the oracle's ORDER BY dist, cell.
    """
    C = np.asarray(centroids, dtype=np.float64)
    cn = (C * C).sum(axis=1)

    @F.pandas_udf("int")
    def cell(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="int32")
        return pd.Series(_dist_matrix(vs, C, cn).argmin(axis=1).astype("int32"))

    return cell(F.col(vec_col))


def ivf_probe_expr(vec_col: str, centroids, nprobe: int):
    """array<int> of the nprobe nearest cells, nearest first.

    Stable argsort: equal distances keep ascending cell order, matching
    the oracle's ORDER BY dist, cell.
    """
    C = np.asarray(centroids, dtype=np.float64)
    cn = (C * C).sum(axis=1)

    @F.pandas_udf("array<int>")
    def probes(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        idx = np.argsort(_dist_matrix(vs, C, cn), axis=1, kind="stable")
        return pd.Series([r[:nprobe].astype("int32").tolist() for r in idx])

    return probes(F.col(vec_col))


def _min_dist_expr(vec_col: str, centroids):
    """Squared distance to the nearest centroid (for inertia)."""
    C = np.asarray(centroids, dtype=np.float64)
    cn = (C * C).sum(axis=1)

    @F.pandas_udf("double")
    def mind(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="float64")
        return pd.Series(_dist_matrix(vs, C, cn).min(axis=1))

    return mind(F.col(vec_col))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """IVF approximate top-k: score only candidates in the query's
    nprobe nearest cells.

    centroids: sequence of dim-length float sequences (k_cells × dim),
    collected on the driver and closed over by the Arrow UDFs — corpus
    cell assignment and query probe selection are both map-side. The
    candidate join broadcasts the (small) exploded query-probe table;
    the only shuffle is the per-query top-k window. Returned schema
    matches brute_force_topk. For repeated query batches at scale,
    persist the corpus side with write_ivf_index and search with
    ivf_topk_indexed — the scan then skips unprobed cells entirely.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        ivf_cell_expr(vec_col, centroids).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(ivf_probe_expr(vec_col, centroids, nprobe)).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(S.cosine(F.col("q_vec"), F.col("c_vec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def kmeans_centroids(
    df: DataFrame,
    k: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Distributed Lloyd's k-means over an embedding column.

    Deterministic: initial centroids are the k lowest-id rows (stable
    across parallelism), and each update is exact arithmetic over a
    deterministic partition-independent grouping. Per iteration:
    map-side cell assignment (Arrow-UDF matmul argmin, no shuffle),
    then posexplode + groupBy(cell, pos) mean — partial aggregation
    combines each partition down to k × dim rows before the shuffle, so
    the shuffle is O(k × dim × n_partitions) regardless of row count.
    Empty cells keep their previous centroid. Returns (k × dim) float64.
    """
    seed_rows = (
        df.orderBy(F.col(id_col).asc())
        .limit(k)
        .select(F.col(vec_col).cast("array<double>").alias("v"))
        .collect()
    )
    cents = np.array([r["v"] for r in seed_rows], dtype=np.float64)
    base = df.select(F.col(vec_col).alias("v"))
    for _ in range(iters):
        assigned = base.select(
            ivf_cell_expr("v", cents).alias("cell"), F.posexplode("v").alias("pos", "val")
        )
        rows = (
            assigned.groupBy("cell", "pos")
            .agg(F.avg(F.col("val").cast("double")).alias("m"))
            .collect()
        )
        new = cents.copy()
        for r in rows:
            new[r["cell"], r["pos"]] = r["m"]
        cents = new
    return cents


def kmeans_inertia(
    df: DataFrame, centroids, vec_col: str = "embedding"
) -> float:
    """Mean squared distance to the nearest centroid (training loss)."""
    row = df.select(
        F.avg(_min_dist_expr(vec_col, centroids)).alias("inertia")
    ).collect()[0]
    return float(row["inertia"])


def write_ivf_index(
    corpus: DataFrame,
    path: str,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "overwrite",
) -> None:
    """Persist the corpus as a cell-partitioned IVF index.

    partitionBy("cell") lays out one directory per quantizer cell, so a
    search filtering on its probed cells reads only ~nprobe/k_cells of
    the data — the scan-level payoff of IVF at 10^12 rows, where even
    a perfect in-memory candidate filter would still pay the full scan.
    repartition("cell") co-locates each cell into one shuffle partition
    before the write (one file run per cell instead of one file per
    cell per input partition); at larger scale repartition(n, "cell")
    bounds file size while keeping the layout.
    """
    (
        corpus.select(
            F.col(id_col), F.col(vec_col), ivf_cell_expr(vec_col, centroids).alias("cell")
        )
        .repartition("cell")
        .write.mode(mode)
        .partitionBy("cell")
        .parquet(path)
    )


def ivf_topk_indexed(
    spark,
    index_path: str,
    queries: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """Top-k search over a write_ivf_index table, scanning only probed
    cells.

    The distinct probed cells (at most |Q| × nprobe ints) are collected
    and applied as a literal partition filter, so the parquet scan
    plans PartitionFilters and lists/reads only those cell directories
    (verified by inputFiles in tests). Everything after the pruned scan
    matches ivf_topk: broadcast the exploded query-probe table, score,
    per-query top-k window.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(ivf_probe_expr(vec_col, centroids, nprobe)).alias("cell"),
    )
    cells = sorted(r["cell"] for r in q.select("cell").distinct().collect())
    idx = (
        spark.read.parquet(index_path)
        .where(F.col("cell").isin(cells))
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("c_vec"),
            F.col("cell").cast("int").alias("cell"),
        )
    )
    scored = (
        idx.join(F.broadcast(q), "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(S.cosine(F.col("q_vec"), F.col("c_vec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )
