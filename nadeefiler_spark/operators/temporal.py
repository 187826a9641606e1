"""Temporal joins Spark lacks as built-ins: as-of join and
interval–point range join, expressed as compositions of shuffle-once
DataFrame primitives (union + window carry-forward; bin-bucketed
equi-join).

The reference has no temporal join — its jobs are per-dataset batch
profiles — but validation over event-shaped data (its AMQP delivery
model, api/hooks/amqp.js:32-43 / profilers/worker.js:31-52) needs both:
"state as of this row's time" lookups (as-of) and "rows inside this
window" containment (range join). Training-data pipelines hit the same
two shapes constantly (attribution, session enrichment, leakage checks
against time-partitioned holdouts).

Scale notes (the 100-TB question):

* ``asof_join`` is ONE shuffle total: both sides union on the key and a
  single window pass carries the most recent right-side row forward.
  There is no range-condition join, so no nested-loop blow-up and no
  per-key quadratic work. Skew: one hyperactive key serializes into one
  task (same bound as any windowed op) — cap or pre-aggregate the right
  side per key upstream if a key is pathological.
* ``interval_point_join`` avoids the cartesian that a raw
  ``p.ts BETWEEN i.start AND i.end`` predicate join plans (Spark turns
  a pure inequality join into BroadcastNestedLoopJoin): both sides are
  bucketed into fixed-width time bins so the join is a plain hash
  equi-join on (bin [, keys]), then the exact containment predicate
  filters inside buckets. A point lives in exactly one bin, so each
  (interval, point) match is produced once — no dedup pass. Pick
  ``bin_s`` near the typical interval length: intervals explode to
  ``dur/bin_s + 1`` bucket rows, points to one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_T = "__asof_t"
_SIDE = "__asof_side"
_TB = "__asof_tb"
_RV = "__asof_rv"
_BIN = "__rj_bin"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    prefix: str = "r_",
    tiebreak_col: str | None = None,
    tolerance_s: int | None = None,
) -> DataFrame:
    """Backward as-of LEFT join: for every left row, attach the single
    most recent right row with the same key and ``right_ts <= left_ts``
    (exact-timestamp matches included). Left rows with no prior right
    row keep nulls — left-join semantics.

    Output: all left columns plus ``prefix + c`` for each ``c`` in
    ``right_cols``. Ties (two right rows at the same key and timestamp)
    resolve to the LARGEST ``tiebreak_col`` value, which pins the result
    deterministically (pandas ``merge_asof`` on a (ts, tiebreak)-sorted
    frame agrees — the twin test relies on this).

    ``tolerance_s`` nulls the match when the left row's timestamp is
    more than that many seconds after the matched right row (matching
    pandas merge_asof's ``tolerance``); the whole matched row nulls
    atomically, never a column mix.

    Plan: union both sides on the key, one window sorted by
    (ts, side, tiebreak) with right rows first at equal timestamps, and
    ``last(ignorenulls)`` over an unbounded-preceding frame carries the
    latest right-side row (as ONE struct, so columns can't mix across
    right rows) onto each left row. One exchange, one sort — the same
    cost as the groupBy a plain join would need, with no range
    explosion.
    """
    overlap = [prefix + c for c in right_cols if prefix + c in left.columns]
    if overlap:
        raise ValueError(f"prefixed right columns collide with left: {overlap}")
    rstruct = F.struct(
        F.col(right_ts).alias("__mt"), *[F.col(c).alias(c) for c in right_cols]
    )
    tb = F.col(tiebreak_col) if tiebreak_col else F.lit(0)
    r = right.select(
        *[F.col(k) for k in key_cols],
        F.col(right_ts).alias(_T),
        F.lit(0).alias(_SIDE),
        tb.cast("long").alias(_TB),
        rstruct.alias(_RV),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias(_T),
        F.lit(1).alias(_SIDE),
        F.lit(0).cast("long").alias(_TB),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(*key_cols)
        .orderBy(_T, _SIDE, _TB)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(_RV, ignorenulls=True).over(w)
    if tolerance_s is not None:
        lag = F.unix_timestamp(F.col(_T)) - F.unix_timestamp(carried["__mt"])
        carried = F.when(lag <= F.lit(tolerance_s), carried)

    out = u.withColumn(_RV, carried).where(F.col(_SIDE) == 1)
    keep = [c for c in left.columns]
    matched = [F.col(f"{_RV}.{c}").alias(prefix + c) for c in right_cols]
    return out.select(*keep, *matched)


def interval_point_join(
    intervals: DataFrame,
    points: DataFrame,
    start_col: str,
    end_col: str,
    ts_col: str,
    bin_s: int,
    keys: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Inner join of point rows into interval rows they fall inside
    (``start_col <= ts_col <= end_col``, bounds inclusive), optionally
    also matching on ``keys`` = [(interval_col, point_col), ...]
    equality pairs.

    Output: every (interval row, point row) containment match, all
    columns from both sides — schemas must be disjoint (rename point
    columns first). Each match appears exactly once: a point belongs to
    one time bin, and an interval lists each bin it touches once.

    Left/outer semantics, de-duplication to counts, etc. compose on
    top: aggregate the matches and join back to ``intervals``.
    """
    both = set(intervals.columns) & set(points.columns)
    if both:
        raise ValueError(f"interval/point column names must be disjoint: {sorted(both)}")

    def _bin(c: str) -> F.Column:
        return F.floor(F.unix_timestamp(F.col(c)) / F.lit(bin_s))

    iv = intervals.withColumn(
        _BIN, F.explode(F.sequence(_bin(start_col), _bin(end_col)))
    )
    pt = points.withColumn(_BIN, _bin(ts_col))
    cond = pt[_BIN] == iv[_BIN]
    for icol, pcol in keys or []:
        cond = cond & (iv[icol] == pt[pcol])
    return (
        iv.join(pt, cond)
        .where((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col)))
        .drop(iv[_BIN])
        .drop(pt[_BIN])
    )


def coverage_gaps(
    df: DataFrame,
    part_col: str,
    ts_col: str,
    max_gap_s: int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Time-coverage gap detection: per ``part_col`` partition, every
    consecutive-event gap exceeding ``max_gap_s`` seconds — the
    "is this feed actually continuous?" freshness/completeness check a
    validation engine runs before trusting per-window statistics
    (a silent 2-day ingestion outage makes every windowed drift verdict
    over that span vacuous, not green).

    Output: ``(part, gap_start, gap_end, gap_s)``, one row per violating
    gap. Gap seconds are whole-second (floor-epoch) differences so the
    result is exactly reproducible in ANSI SQL.

    Scale: ONE shuffle (window partitioned by ``part_col``), then a
    filter — rows out is #gaps, not #events. Skew note: a partition's
    events sort within one task, the same bound as sessionization
    (operators.sessions); salt or sub-bucket by time range upstream when
    a single partition key exceeds task memory.
    """
    order = [F.col(ts_col)]
    if tiebreak_col:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(part_col).orderBy(*order)
    prev = F.lag(ts_col).over(w)
    gap = F.unix_timestamp(ts_col) - F.unix_timestamp(prev)
    return (
        df.select(
            F.col(part_col).alias("part"),
            prev.alias("gap_start"),
            F.col(ts_col).alias("gap_end"),
            gap.alias("gap_s"),
        )
        .where(F.col("gap_s") > max_gap_s)
    )
