"""Instance-based column matching between two corpus releases.

When a snapshot renames columns (an upstream exporter change, a schema
migration), name-keyed tools — profile_diff, drift_metrics, expectation
suites — silently lose the lineage. This operator recovers the column
correspondence FROM THE DATA: for every (old column, new column) pair
it measures the Jaccard overlap of their distinct value sets and ranks
candidates per old column, the classic instance-based schema-matching
signal (public literature: Rahm & Bernstein, "A survey of approaches to
automatic schema matching", VLDB J. 2001 — instance-level matchers).

Plan shape (the 100-TB story):
- Each side is melted to DISTINCT ``(col, value)`` pairs — one
  aggregate per side, shuffle keyed on (col, value); sum-of-NDV rows
  survive, never sum-of-rows.
- Optionally, the melt keeps only values whose md5 falls under a hex
  prefix threshold (``sample_hex``) — a KMV-style value-space sample.
  Because BOTH sides apply the same deterministic filter, Jaccard on
  the sampled universe is an unbiased estimate of the true Jaccard,
  and the melt size is capped regardless of NDV. md5 is portable
  (identical in the JVM and DuckDB), so a mirrored oracle samples the
  identical value subset.
- The intersection is a value-keyed equi-join of the two melts,
  aggregated immediately to ``(col_old, col_new) -> n_common``: a
  value shared by j_old x j_new columns expands to that many rows and
  no further — bounded by the column-count product, not by data size.
- Jaccard needs no second pass: per-column NDVs come from the same
  melts, ``J = n_common / (ndv_old + ndv_new - n_common)``.

Pairs with zero overlap never appear (inner join) — an old column with
no candidate above ``min_jaccard`` simply emits nothing, which is the
honest answer ("no instance-based match found").

No reference analog (beyond-reference operator per the task mandate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def melt_distinct(
    df: DataFrame, cols: list[str], sample_hex: str | None = None
) -> DataFrame:
    """DISTINCT (col, value-as-string) pairs for the given columns, in
    ONE table scan (typedetect.melt_values' explode melt — the
    per-column UNION ALL formulation was measured to plan one FileScan
    per column, multiplying per-scan scheduling/row-group overhead by
    the column count at no I/O benefit on columnar storage).

    NULLs are dropped (they match everything and mean nothing);
    ``sample_hex`` keeps only values with ``md5(value) < sample_hex``
    (lowercase-hex string compare — e.g. ``"4"`` keeps the quarter of
    value space whose first hex digit is 0-3)."""
    from ..typedetect import melt_values

    out = (
        melt_values(df, list(cols))
        .withColumnRenamed("key", "col")
        .where(F.col("value").isNotNull())
    )
    if sample_hex is not None:
        out = out.where(F.md5(F.col("value")) < F.lit(sample_hex))
    return out.distinct()


def column_match(
    old: DataFrame,
    new: DataFrame,
    cols_old: list[str],
    cols_new: list[str],
    min_jaccard: float = 0.0,
    sample_hex: str | None = None,
    eager: bool = True,
) -> DataFrame:
    """Ranked instance-based column correspondences old -> new.

    Returns one row per candidate pair with ``n_common > 0`` and
    ``jaccard >= min_jaccard``: (col_old, col_new, ndv_old, ndv_new,
    n_common, jaccard, rank) — rank 1 is the best new-side candidate
    for that old column (ties beyond float resolution break on
    col_new).

    Each melt feeds BOTH its NDV aggregate and the intersection join;
    Spark does not share a subplan between two DataFrame references, so
    the melts are persisted and (with ``eager``, the default) released
    as soon as the small result is materialized — two base-table scans
    total instead of four. ``eager=False`` keeps lazy semantics and
    leaves intermediate lifetimes to the caller."""
    from .dedup import _finalize

    m_old = melt_distinct(old, cols_old, sample_hex).persist()
    m_new = melt_distinct(new, cols_new, sample_hex).persist()
    ndv_old = m_old.groupBy("col").agg(F.count("*").alias("ndv_old"))
    ndv_new = m_new.groupBy("col").agg(F.count("*").alias("ndv_new"))
    inter = (
        m_old.withColumnRenamed("col", "col_old")
        .join(m_new.withColumnRenamed("col", "col_new"), "value")
        .groupBy("col_old", "col_new")
        .agg(F.count("*").alias("n_common"))
    )
    pairs = (
        inter.join(ndv_old.withColumnRenamed("col", "col_old"), "col_old")
        .join(ndv_new.withColumnRenamed("col", "col_new"), "col_new")
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.col("ndv_old") + F.col("ndv_new") - F.col("n_common")),
        )
        .where(F.col("jaccard") >= F.lit(min_jaccard))
    )
    win = Window.partitionBy("col_old").orderBy(
        F.col("jaccard").desc(), F.col("col_new")
    )
    out = pairs.select(
        "col_old",
        "col_new",
        "ndv_old",
        "ndv_new",
        "n_common",
        F.round("jaccard", 6).alias("jaccard"),
        F.row_number().over(win).alias("rank"),
    )
    return _finalize(out, m_old, m_new, eager=eager)
