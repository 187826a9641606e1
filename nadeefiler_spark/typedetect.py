"""messystreams-shaped type profiling over any set of string columns.

Reference output contract (/root/reference/profilers/messystreams.js):
- per-column summary row  {key, boolean, integer, float, percent, date,
  string, null}                                  (messystreams.js:123-127)
- per-type histogram rows {histogram, key, value, count}, null type
  excluded                                        (messystreams.js:108-122)
- scores are weighted by the per-distinct-value row count — the
  reference pushes GROUP BY value COUNT(*) into Mongo and runs detectors
  once per distinct value (messystreams.js:91-107). Here the same
  dedupe-before-expensive-work shape: melt all columns in one pass,
  aggregate to distinct (key, value, count) triples, THEN apply the
  detector expressions, then aggregate scores from the (already tiny)
  histogram — two shuffles total for ALL columns, each with map-side
  partial aggregation.

Deviation (documented): the reference stores the PARSED value in
histogram rows (parseFloat for numbers; a bugged `new Date()` for dates,
messystreams.js:48). We keep the raw string in `value` and add
`value_num` (parsed double, null for non-numeric types) — deterministic,
type-stable, and it fixes the date bug without changing any score.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions import detectors as D


def melt_values(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """(key, value) pairs for all requested columns in one projection."""
    cols = cols or [f.name for f in df.schema.fields]
    entries = [
        F.struct(F.lit(c).alias("key"), F.col(c).cast("string").alias("value"))
        for c in cols
    ]
    return df.select(F.explode(F.array(*entries)).alias("kv")).select("kv.*")


def type_histograms(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """(histogram, key, value, value_num, count) — reference histogram rows.

    Detectors run on DISTINCT values only (reference optimization,
    messystreams.js:91-107); 'null' type rows are excluded
    (messystreams.js:115-118).
    """
    melted = melt_values(df, cols)
    distinct_counts = melted.groupBy("key", "value").agg(F.count(F.lit(1)).alias("count"))
    typed = distinct_counts.withColumn("histogram", D.detect_type(F.col("value")))
    return (
        typed.where(F.col("histogram") != "null")
        .withColumn(
            "value_num",
            F.when(
                F.col("histogram").isin("integer", "float", "percent"),
                D.parse_number(F.col("value")),
            ),
        )
        .select("histogram", "key", "value", "value_num", "count")
    )


def type_scores(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """(key, boolean, integer, float, percent, date, string, null) —
    reference summary rows (messystreams.js:123-127), aggregated from the
    distinct-value histogram so detectors run once per distinct value."""
    melted = melt_values(df, cols)
    distinct_counts = melted.groupBy("key", "value").agg(F.count(F.lit(1)).alias("count"))
    typed = distinct_counts.withColumn("type", D.detect_type(F.col("value")))
    aggs = [
        F.coalesce(
            F.sum(F.when(F.col("type") == t, F.col("count"))), F.lit(0)
        ).alias(t if t != "null" else "null_")
        for t in D.TYPE_LABELS
    ]
    out = typed.groupBy("key").agg(*aggs)
    # `null` is not a legal unquoted identifier in some SQL dialects; keep
    # the reference field name via rename after agg
    return out.withColumnRenamed("null_", "null")
