"""Physical-layout advisor: partition/bucket-key recommendations from
measured column statistics.

At 10^12 rows the difference between a good and a bad partition key is
the difference between pruning 99.9% of a scan and rewriting the table.
The advisor turns the profiler's statistics into the standard design
rules, computed (not guessed) from the data:

- ``partition``: NDV in the directory-friendly band (enough values to
  prune on, few enough that the file count stays sane), the hottest
  value doesn't dominate (skew caps the win and creates straggler
  partitions), and nulls are rare (a giant __HIVE_DEFAULT_PARTITION__
  is a smell).
- ``bucket``: too many values to be directories, but high-cardinality
  and balanced — the shape that pays off as a bucket/cluster key for
  co-located joins.
- ``reject``: constant-ish, too skewed, or too null.

One pass: the candidate columns are melted to (col, value) rows with
``inline`` (arrays_zip explode), then ONE groupBy(col, value) counts →
ONE groupBy(col) rolls up NDV / null count / hottest-value count — the
same two-exchange melt the profiler's exact-NDV path uses, paid once
for ALL candidates instead of one job per column. Thresholds are plain
integer/double comparisons, so the DuckDB oracle reproduces the
verdicts exactly.

Reference analog: nadeefiler profiles per-column distinct/histogram
stats (SURVEY §2 A1/A7); the advisor is those stats turned into the
scale decision the reference never had to make (beyond-reference
operator per the task mandate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["layout_advisor"]

# directory-count band for a partition key and the skew/null gates
PART_NDV_MIN = 8
PART_NDV_MAX = 10_000
PART_TOP_FRAC_MAX = 0.5
PART_NULL_FRAC_MAX = 0.01
BUCKET_NDV_MIN = 10_000


def layout_advisor(df: DataFrame, cols: list[str]) -> DataFrame:
    """(col, n, ndv, null_frac, top_frac, recommendation) per candidate
    column; fractions rounded to 6 places. NDV excludes NULL (matching
    count(distinct)); ``top_frac`` is the hottest non-null value's share
    of all rows."""
    if not cols:
        raise ValueError("cols must not be empty")
    melted = df.select(
        F.inline(
            F.array(*[
                F.struct(
                    F.lit(c).alias("col"),
                    F.col(c).cast("string").alias("value"),
                )
                for c in cols
            ])
        )
    )
    counts = melted.groupBy("col", "value").agg(F.count(F.lit(1)).alias("cnt"))
    stats = counts.groupBy("col").agg(
        F.sum("cnt").alias("n"),
        F.count(F.when(F.col("value").isNotNull(), 1)).alias("ndv"),
        F.coalesce(
            F.sum(F.when(F.col("value").isNull(), F.col("cnt"))), F.lit(0)
        ).alias("n_null"),
        F.coalesce(
            F.max(F.when(F.col("value").isNotNull(), F.col("cnt"))), F.lit(0)
        ).alias("top_cnt"),
    )
    null_frac = F.col("n_null") / F.col("n")
    top_frac = F.col("top_cnt") / F.col("n")
    rec = (
        F.when(
            (F.col("ndv") >= PART_NDV_MIN)
            & (F.col("ndv") <= PART_NDV_MAX)
            & (top_frac <= PART_TOP_FRAC_MAX)
            & (null_frac <= PART_NULL_FRAC_MAX),
            F.lit("partition"),
        )
        .when(
            (F.col("ndv") > BUCKET_NDV_MIN) & (top_frac <= PART_TOP_FRAC_MAX),
            F.lit("bucket"),
        )
        .otherwise(F.lit("reject"))
    )
    return stats.select(
        "col",
        F.col("n").cast("bigint").alias("n"),
        F.col("ndv").cast("bigint").alias("ndv"),
        F.round(null_frac, 6).alias("null_frac"),
        F.round(top_frac, 6).alias("top_frac"),
        rec.alias("recommendation"),
    )
