"""Sort / limit / pagination operators (SURVEY §2.5 O1-O6, §2.1 S5).

The reference paginates with a predicate on an ordered column instead
of skip (`__order > (page-1)*size`, TupleController.js:27) — keyset
pagination. Spark equivalents: global ORDER BY + LIMIT plans as
TakeOrderedAndProject (no full sort); arbitrary-page access needs a
row_number window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def page(df: DataFrame, order_by: list[Column], page_number: int, page_size: int) -> DataFrame:
    """1-based page of rows under a total order (S5/O1).

    Includes the row number as `rn` for stable downstream joins. The
    order_by list must be a total order (add a key tiebreak) or page
    contents are nondeterministic.
    """
    w = Window.orderBy(*order_by)
    lo = (page_number - 1) * page_size
    return (
        df.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") > lo) & (F.col("rn") <= lo + page_size))
    )


def topk(df: DataFrame, order_by: list[Column], k: int) -> DataFrame:
    """Global top-k -> TakeOrderedAndProject (O2/O4)."""
    return df.orderBy(*order_by).limit(k)


def topk_per_group(
    df: DataFrame, group_cols: list[str], order_by: list[Column], k: int, rank_col: str = "rank"
) -> DataFrame:
    """Top-k within each group via row_number window (A6/O3)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).where(F.col(rank_col) <= k)
