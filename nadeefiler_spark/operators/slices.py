"""Slice finder: which data slices drag a quality metric.

A corpus-level mean hides the damage: one crawler source emitting
boilerplate, one language with a broken extractor. The slice finder
scores every (dimension, value) slice by how far its metric mean sits
from the corpus mean in STANDARD-ERROR units::

    z = (mean_slice - mean_global) / (std_global / sqrt(n_slice))

— large |z| with real support is a slice worth investigating, and the
standard-error scaling keeps small noisy slices from outranking a
large genuinely-degraded one.

100-TB shape: ALL dimensions melt to (dim, value, metric) rows in one
``inline`` pass (the advisor/profiler melt), ONE groupBy(dim, value)
computes per-slice n/mean, and the corpus mean/std is ONE scalar
aggregate cross-joined back (broadcast of one row). Two exchanges
total regardless of dimension count; partial aggregation throughout;
output rows ∝ distinct slice values. Population stddev (not sample)
so every engine computes the identical denominator.

Reference analog: nadeefiler's per-column histograms/outlier stats
(SURVEY §2 A1/A9) score VALUES; the slice finder scores value GROUPS
against the corpus — the triage view a 100-TB curation run starts
from. Beyond-reference operator per the task mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["quality_slices"]


def quality_slices(
    df: DataFrame,
    metric: Column | str,
    dims: list[str],
    min_support: int = 1,
) -> DataFrame:
    """(dim, value, n, mean_metric, z) per slice with n >= min_support;
    mean/z rounded to 6. NULL dimension values form their own slice;
    NULL metrics are excluded from means (SQL AVG semantics). z is 0
    when the corpus std is 0 (constant metric)."""
    if not dims:
        raise ValueError("dims must not be empty")
    m = (F.col(metric) if isinstance(metric, str) else metric).alias("metric")
    melted = df.select(
        F.inline(
            F.array(*[
                F.struct(
                    F.lit(d).alias("dim"),
                    F.col(d).cast("string").alias("value"),
                )
                for d in dims
            ])
        ),
        m,
    )
    slices = melted.groupBy("dim", "value").agg(
        F.count("metric").alias("n"),
        F.avg("metric").alias("mean_metric"),
    )
    g = df.select(m).agg(
        F.avg("metric").alias("g_mean"),
        F.stddev_pop("metric").alias("g_std"),
    )
    z = F.when(
        (F.col("g_std") > 0) & (F.col("n") > 0),
        (F.col("mean_metric") - F.col("g_mean"))
        / (F.col("g_std") / F.sqrt(F.col("n"))),
    ).otherwise(0.0)
    return (
        slices.crossJoin(F.broadcast(g))
        .where(F.col("n") >= F.lit(min_support))
        .select(
            "dim",
            "value",
            F.col("n").cast("bigint").alias("n"),
            F.round("mean_metric", 6).alias("mean_metric"),
            F.round(z, 6).alias("z"),
        )
    )
