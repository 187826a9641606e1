"""Exact heavy hitters without a full-NDV shuffle (two-phase pigeonhole).

``groupBy(col).count()`` over a 10^12-row corpus shuffles one group per
DISTINCT value — for token/URL/host-like columns that is billions of
groups, most of which are irrelevant to a "what dominates this corpus"
question. The classic two-phase answer:

phase 1 (candidates, ZERO shuffle): per input partition, count values
    exactly in an Arrow-batched ``mapInPandas`` pass and emit only values
    whose LOCAL count exceeds ``n_partition / inv_phi``, plus one row
    carrying the partition's row count. Pigeonhole guarantee: if a
    value's GLOBAL count exceeds ``N / inv_phi`` then in at least one
    partition its local count exceeds that partition's ``n_p / inv_phi``
    (otherwise summing the per-partition bound gives global <= N/inv_phi)
    — so no true heavy hitter is ever missed, regardless of how rows are
    distributed over partitions.
phase 2 (exact verify): broadcast the candidate set (tiny — at most
    ``inv_phi`` survivors per partition), semi-filter the corpus, count
    ONLY candidate values exactly, and keep those above the global
    threshold. The only shuffle keyed on values carries candidate rows.

The output is therefore EXACT: every value with ``count > N/inv_phi``,
with its exact count — same result as the full groupBy, a fraction of the
shuffle. No reference analog (beyond-reference pipeline operator); the
pattern is the Misra–Gries/SpaceSaving family specialised to Spark's
partitioned execution, with exact per-partition counts standing in for the
streaming summary (a partition fits in its task, so exactness is free).

100-TB shape: TWO scans total — phase 1's mapInPandas (which also yields
the global N as the sum of its per-partition count rows, so no third
count(*) scan) and phase 2's recount. Phase 1's output is
O(#partitions * inv_phi) rows and is persisted + materialized once so
candidates and N don't recompute the corpus pass; phase 2's scan prunes
via an AQE-broadcast semi join before its groupBy. Skewed values are
exactly the ones this finds — they appear once per partition in phase 1
(never concentrated), and phase 2's groupBy holds at most |candidates|
groups.
"""

from __future__ import annotations

from collections import Counter
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _phase1(df: DataFrame, col: str, inv_phi: int) -> DataFrame:
    """Raw phase-1 output: candidate rows ``(value, part_rows=null)`` plus
    one ``(value=null, part_rows=n_p)`` row per partition."""
    if inv_phi < 1:
        raise ValueError(f"inv_phi must be >= 1, got {inv_phi}")
    field = df.schema[col]
    out_schema = T.StructType(
        [
            T.StructField("value", field.dataType, True),
            T.StructField("part_rows", T.LongType(), True),
        ]
    )

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: Counter = Counter()
        n = 0
        for pdf in batches:
            s = pdf[col].dropna()
            n += len(pdf[col])
            counts.update(s.value_counts().to_dict())
        # strict >: mirrors the strict global threshold
        cand = [v for v, c in counts.items() if c * inv_phi > n]
        yield pd.DataFrame(
            {"value": cand + [None], "part_rows": [None] * len(cand) + [n]}
        )

    return df.select(col).mapInPandas(emit, schema=out_schema)


def heavy_hitter_candidates(
    df: DataFrame, col: str, inv_phi: int = 1000
) -> DataFrame:
    """Distinct candidate values: every value whose global count can
    exceed ``N / inv_phi`` (superset, by the pigeonhole bound above).

    One ``mapInPandas`` pass, no shuffle; output column is named
    ``value`` with the input column's type.
    """
    return (
        _phase1(df, col, inv_phi)
        .where(F.col("value").isNotNull())
        .select("value")
        .distinct()
    )


def heavy_hitters(df: DataFrame, col: str, inv_phi: int = 1000) -> DataFrame:
    """EXACT heavy hitters: ``(value, cnt)`` for every non-null value with
    ``cnt * inv_phi > N`` (N = total rows incl. null ``col``), ordered by
    ``cnt`` desc then ``value`` — identical to the full groupBy + HAVING,
    without shuffling the full distinct-value set and with only two
    corpus scans (candidates+N fused, then the recount).
    """
    p1 = _phase1(df, col, inv_phi).persist()
    try:
        p1.count()  # materialize once; both reads below hit the cache
        cands = p1.where(F.col("value").isNotNull()).select("value").distinct()
        total = p1.select(F.sum("part_rows").alias("__n"))
        counted = (
            df.select(F.col(col).alias("value"))
            .join(F.broadcast(cands), "value", "left_semi")
            .groupBy("value")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        out = (
            counted.join(F.broadcast(total))
            .where(F.col("cnt") * inv_phi > F.col("__n"))
            .drop("__n")
            .orderBy(F.desc("cnt"), "value")
        )
        # materialize the (tiny) result before releasing phase 1
        out = out.persist()
        out.count()
    finally:
        p1.unpersist()
    return out
