"""Event sessionization: gap-based session assignment + per-session stats.

A training-data pipeline over interaction/event logs needs sessions as a
first-class unit (session-level dedup, per-session quality filters,
session sampling). The reference has no session operator — its jobs are
per-dataset batch profiles — but its event-shaped delivery model
(AMQP task stream, worker.js:31-52) is exactly the input this operator
structures.

Spark-first plan: ONE shuffle on the user key, ONE within-partition sort
by event time; the session index is a running sum over a lag-derived
boundary flag, and the per-session rollup reuses the same partitioning
(Catalyst plans the window + the downstream groupBy on (user, session)
without a second exchange because the groupBy keys are a superset of the
window partition key). Skew note: a single hyperactive user serializes
into one task — upstream hash_sample or a per-user event cap is the
100-TB mitigation; the operator itself adds no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_s: int = 1800,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Assign a per-user session index: a new session starts when the gap
    to the previous event exceeds ``gap_s`` seconds.

    Adds ``session_idx`` (1-based per user, ordered by event time).
    ``tiebreak_col`` makes ordering deterministic when timestamps tie.
    """
    order = [F.col(ts_col)]
    if tiebreak_col:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(user_col).orderBy(*order)
    ts = F.unix_timestamp(F.col(ts_col))
    prev = F.lag(ts).over(w)
    boundary = F.when(prev.isNull() | ((ts - prev) > gap_s), 1).otherwise(0)
    running = Window.partitionBy(user_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_idx", F.sum(boundary).over(running))


def session_stats(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_s: int = 1800,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-session rollup: (user, session_idx, n_events, t_start, t_end,
    dur_s). One shuffle total (see module docstring)."""
    s = sessionize(df, user_col, ts_col, gap_s, tiebreak_col)
    return (
        s.groupBy(F.col(user_col).alias("user"), "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("t_start"),
            F.max(ts_col).alias("t_end"),
            (
                F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))
            ).alias("dur_s"),
        )
    )
