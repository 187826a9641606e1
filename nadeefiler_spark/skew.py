"""Explicit skew handling: salted two-phase aggregation.

north_rule requires "partitioning / shuffle / skew handled explicitly".
The clips table is deliberately skewed (~70% of rows share one codec,
FIXTURES.md §1, datagen._CODEC_CUM), so any groupBy keyed on codec (or on
(part, key, bin) histogram triples where part derives from codec) hashes
the hot key's rows to ONE reducer. Two complementary mechanisms:

- **joins / shuffle reads**: AQE skew-join splitting
  (``spark.sql.adaptive.skewJoin.enabled``, on in session.get_spark) —
  Spark re-plans oversized shuffle partitions at runtime; nothing to do
  in engine code.
- **groupBy aggregations**: AQE does NOT split a skewed *aggregation*
  key — that needs salting, provided here. For algebraic aggregates
  (count/sum/min/max) the classic fix is two-phase: group on
  (key, salt) with salt = hash(row) % B, then re-group on key summing
  the partials. Shuffle-1 spreads the hot key over B reducers;
  shuffle-2 moves only B rows per key.

Note on when salting is NOT needed: hash aggregation performs map-side
partial combine, so a LOW-cardinality skewed key (codec: 4 distinct)
ships ≤ #map-tasks × #keys partial rows — no hot reducer regardless of
row skew. Salting matters when the skewed key set is too large for the
partial-agg hash map (spills) or the aggregate is non-algebraic
(collect_list / exact distinct). The engine therefore uses plain
groupBy for its bounded-cardinality profile histograms and exposes
salted_agg for unbounded/hot cases (e.g. per-clip_id aggregations where
one clip id is pathologically duplicated).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, buckets: int = 32, deterministic_from: str | None = None) -> DataFrame:
    """Add a salt column in [0, buckets). Deterministic when derived from
    a column (stable across retries/parallelism — preferred); otherwise
    per-row random (still correct for algebraic aggs, but task retries
    may re-salt)."""
    if deterministic_from is not None:
        salt = F.pmod(F.xxhash64(F.col(deterministic_from)), F.lit(buckets))
    else:
        salt = (F.rand(seed=7) * buckets).cast("int")
    return df.withColumn(SALT_COL, salt)


def salted_count(
    df: DataFrame,
    keys: list[str],
    buckets: int = 32,
    salt_from: str | None = None,
    count_alias: str = "count",
) -> DataFrame:
    """GROUP BY keys COUNT(*) with a salted first phase.

    Equivalent to ``df.groupBy(*keys).count()`` but the first shuffle
    spreads each key over `buckets` reducers; the second shuffle moves
    only `buckets` partial rows per key.
    """
    salted = with_salt(df, buckets, salt_from)
    partial = salted.groupBy(*keys, SALT_COL).agg(F.count(F.lit(1)).alias("_c"))
    return partial.groupBy(*keys).agg(F.sum("_c").alias(count_alias))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    buckets: int = 32,
    salt_from: str | None = None,
) -> DataFrame:
    """General two-phase salted aggregation for algebraic aggregates.

    `partial_aggs` run per (keys, salt); `final_aggs` re-combine the
    partials per keys (they must reference the partial aliases, e.g.
    partial ``F.sum("x").alias("s")`` -> final ``F.sum("s").alias("sum_x")``).
    """
    salted = with_salt(df, buckets, salt_from)
    partial = salted.groupBy(*keys, SALT_COL).agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)
