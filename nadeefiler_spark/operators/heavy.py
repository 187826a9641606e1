"""Exact heavy hitters without a full-NDV shuffle (two-phase pigeonhole).

``groupBy(col).count()`` over a 10^12-row corpus shuffles one group per
DISTINCT value — for token/URL/host-like columns that is billions of
groups, most of which are irrelevant to a "what dominates this corpus"
question. The classic two-phase answer:

phase 1 (candidates, ZERO shuffle): per input partition, count values
    exactly in an Arrow-batched ``mapInPandas`` pass and emit only values
    whose LOCAL count exceeds ``n_partition / inv_phi``. Pigeonhole
    guarantee: if a value's GLOBAL count exceeds ``N / inv_phi`` then in at
    least one partition its local count exceeds that partition's
    ``n_p / inv_phi`` (otherwise summing the per-partition bound gives
    global <= N/inv_phi) — so no true heavy hitter is ever missed,
    regardless of how rows are distributed over partitions.
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

100-TB shape: phase 1 is embarrassingly parallel and emits
O(#partitions * inv_phi) rows; phase 2's scan prunes via an AQE-broadcast
semi join before its groupBy. Skewed values are exactly the ones this
finds — they appear once per partition in phase 1 (never concentrated),
and phase 2's groupBy holds at most |candidates| groups.
"""

from __future__ import annotations

from collections import Counter
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def heavy_hitter_candidates(
    df: DataFrame, col: str, inv_phi: int = 1000
) -> DataFrame:
    """Distinct candidate values: every value whose global count can
    exceed ``N / inv_phi`` (superset, by the pigeonhole bound above).

    One ``mapInPandas`` pass, no shuffle; output column is named
    ``value`` with the input column's type.
    """
    if inv_phi < 1:
        raise ValueError(f"inv_phi must be >= 1, got {inv_phi}")
    field = df.schema[col]
    out_schema = T.StructType([T.StructField("value", field.dataType, True)])

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: Counter = Counter()
        n = 0
        for pdf in batches:
            s = pdf[col].dropna()
            n += len(pdf[col])
            counts.update(s.value_counts().to_dict())
        # strict >: mirrors the strict global threshold
        cand = [v for v, c in counts.items() if c * inv_phi > n]
        yield pd.DataFrame({"value": cand})

    return (
        df.select(col)
        .mapInPandas(emit, schema=out_schema)
        .distinct()
    )


def heavy_hitters(df: DataFrame, col: str, inv_phi: int = 1000) -> DataFrame:
    """EXACT heavy hitters: ``(value, cnt)`` for every non-null value with
    ``cnt * inv_phi > N`` (N = total rows incl. null ``col``), ordered by
    ``cnt`` desc then ``value`` — identical to the full groupBy + HAVING,
    without shuffling the full distinct-value set.
    """
    cands = heavy_hitter_candidates(df, col, inv_phi)
    total = df.select(F.count(F.lit(1)).alias("__n"))
    counted = (
        df.select(F.col(col).alias("value"))
        .join(F.broadcast(cands), "value", "left_semi")
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counted.join(F.broadcast(total))
        .where(F.col("cnt") * inv_phi > F.col("__n"))
        .drop("__n")
        .orderBy(F.desc("cnt"), "value")
    )
