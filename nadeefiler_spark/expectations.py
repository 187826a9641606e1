"""Declarative expectation suites compiled to ONE aggregate scan.

The rule framework (rules/base.py) emits per-ROW violation rows; an
expectation suite asserts DATASET-level invariants — "o_custkey is
>=99.9% complete", "o_orderkey is unique", "mean price sits inside
[lo, hi]" — the contract a downstream consumer actually signs. The
design constraint at 10^12 rows is that N checks must cost ONE scan,
not N: every check contributes one aggregate expression to a single
``groupBy().agg()``, and the verdict table is unpivoted from the
aggregate row JVM-side (inline_outer over a struct array — no Python
in the loop, no second job).

``verify(df, checks, by=["part"])`` yields the north-star per-partition
pass/fail verdict shape: one row per (partition, check) with the
measured value, the declared bounds, and a never-NULL ``passed``
(a NULL metric — e.g. the mean of an all-NULL column — fails, it does
not vanish).

Reference analog: nadeefiler's per-profiler verdict rows stamped with
dataset + profiler (/root/reference/profilers/worker.js:84-100); the
declarative-suite shape follows the public Deequ/Great-Expectations
model re-expressed as Catalyst aggregates.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "Check",
    "completeness",
    "uniqueness",
    "distinctness",
    "mean_between",
    "min_at_least",
    "max_at_most",
    "values_in",
    "matches_regex",
    "size_between",
    "verify",
    "schema_conformance",
]


@dataclass(frozen=True)
class Check:
    """One expectation: an aggregate metric plus inclusive bounds.

    ``metric`` is any Spark aggregate expression evaluating to a
    numeric; ``passed`` is ``lo <= value <= hi`` with NULL -> False.
    Open bounds are +-inf, so single-sided checks stay one code path.
    """

    name: str
    column: str
    metric: Column
    lo: float = float("-inf")
    hi: float = float("inf")


def _ratio(pred: Column) -> Column:
    # avg over an int flag; NULL-safe because the flag itself is 0/1
    return F.avg(F.when(pred, 1).otherwise(0))


def completeness(column: str, min_ratio: float = 1.0) -> Check:
    return Check(
        f"completeness({column})", column,
        _ratio(F.col(column).isNotNull()), lo=min_ratio,
    )


def uniqueness(column: str, min_ratio: float = 1.0, exact: bool = True) -> Check:
    """distinct/count over NON-NULL values. exact=False swaps in the
    HLL sketch (approx_count_distinct) — at 10^12 rows the exact
    variant's count-distinct Expand is the expensive path and the
    sketch (~2% rsd) is the production default; the oracle-gated
    contract uses exact."""
    d = (
        F.countDistinct(F.col(column))
        if exact
        else F.approx_count_distinct(F.col(column))
    )
    n = F.count(F.col(column))
    return Check(
        f"uniqueness({column})", column,
        d / F.greatest(n, F.lit(1)), lo=min_ratio,
    )


def distinctness(column: str, lo: float = 0.0, hi: float = float("inf")) -> Check:
    """Distinct non-null count inside [lo, hi] — the NDV envelope."""
    return Check(
        f"distinctness({column})", column,
        F.countDistinct(F.col(column)).cast("double"), lo=lo, hi=hi,
    )


def mean_between(column: str, lo: float, hi: float) -> Check:
    return Check(f"mean({column})", column, F.avg(F.col(column)), lo=lo, hi=hi)


def min_at_least(column: str, lo: float) -> Check:
    return Check(
        f"min({column})", column, F.min(F.col(column)).cast("double"), lo=lo
    )


def max_at_most(column: str, hi: float) -> Check:
    return Check(
        f"max({column})", column, F.max(F.col(column)).cast("double"), hi=hi
    )


def values_in(column: str, allowed: Sequence[str], min_ratio: float = 1.0) -> Check:
    return Check(
        f"values_in({column})", column,
        _ratio(F.col(column).isin(list(allowed))), lo=min_ratio,
    )


def matches_regex(column: str, pattern: str, min_ratio: float = 1.0) -> Check:
    """Ratio of non-null values matching ``pattern`` (Java regex; keep
    to the Java-and-RE2-compatible subset documented in functions/pii.py
    if the suite needs a DuckDB twin)."""
    return Check(
        f"matches({column})", column,
        _ratio(F.col(column).isNotNull() & F.col(column).rlike(pattern)),
        lo=min_ratio,
    )


def size_between(lo: float, hi: float = float("inf")) -> Check:
    return Check("size", "*", F.count(F.lit(1)).cast("double"), lo=lo, hi=hi)


def verify(
    df: DataFrame, checks: Sequence[Check], by: Sequence[str] | None = None
) -> DataFrame:
    """Evaluate a suite in one scan; one verdict row per (group, check).

    Output: ``[*by, check, column, value, lo, hi, passed]`` with
    ``value`` the measured metric (NULL when the group had no usable
    input) and ``passed`` never NULL (NULL value fails). ``by=None``
    verifies globally (one row per check); ``by=["part"]`` is the
    per-partition verdict shape the engine's manifest model expects.

    Plan: partial aggregation map-side into one final aggregate per
    group, then ``inline_outer`` unpivots the metric row into verdict
    rows — a narrow projection, no shuffle beyond the grouping key's.
    """
    if not checks:
        raise ValueError("verify() needs at least one Check")
    names, aggs = agg_exprs(checks)
    grouped = df.groupBy(*[F.col(c) for c in by]) if by else df.groupBy()
    agg = grouped.agg(*aggs)
    keep = list(by) if by else []
    return agg.select(*keep, F.inline_outer(verdict_rows(checks, names)))


def agg_exprs(checks: Sequence[Check]) -> tuple[list[str], list[Column]]:
    """The suite's aggregate expressions (shared with the streaming
    windowed monitor — same checks, same metrics, one agg)."""
    names = [f"__m_{i}" for i in range(len(checks))]
    return names, [
        c.metric.cast("double").alias(n) for c, n in zip(checks, names)
    ]


def verdict_rows(checks: Sequence[Check], names: Sequence[str]) -> Column:
    """Struct-array unpivot of the aggregate row into verdict rows."""
    return F.array(
        *[
            F.struct(
                F.lit(c.name).alias("check"),
                F.lit(c.column).alias("column"),
                F.col(n).alias("value"),
                F.lit(float(c.lo)).alias("lo"),
                F.lit(float(c.hi)).alias("hi"),
                F.coalesce(
                    (F.col(n) >= F.lit(float(c.lo)))
                    & (F.col(n) <= F.lit(float(c.hi))),
                    F.lit(False),
                ).alias("passed"),
            )
            for c, n in zip(checks, names)
        ]
    )


def schema_conformance(
    df: DataFrame,
    expected: dict[str, str],
    allow_extra: bool = True,
) -> DataFrame:
    """Declared-schema contract check: presence + type per column.

    ``expected`` maps column name -> Spark DDL type (``"string"``,
    ``"int"``, ``"array<float>"``, …), the contract a producer signs
    (the input_hint table shape, for instance). Verdict rows:

    - ``column_present(col)`` / ``column_type(col)`` per expected
      column (a missing column fails BOTH — absence is not type
      conformance);
    - one ``no_extra_columns`` row when ``allow_extra=False``
      (schema-widening tolerated by default, matching Spark's own
      mergeSchema posture).

    Zero data scanned: the verdict is built from ``df.schema``
    driver-side and emitted as a VALUES relation (a
    ``createDataFrame(local_rows)`` plan is a parallelized Python RDD
    whose write pays a Python-worker round trip — VALUES is pure JVM,
    same reasoning as the engine's manifest commits).
    """
    from pyspark.sql.types import DataType

    actual = {f.name: f.dataType for f in df.schema.fields}
    rows: list[tuple[str, str, str, str, bool]] = []
    for col, ddl in expected.items():
        want = DataType.fromDDL(ddl)
        present = col in actual
        rows.append(
            ("column_present(%s)" % col, col, "present",
             "present" if present else "missing", present)
        )
        got = actual[col].simpleString() if present else "missing"
        rows.append(
            ("column_type(%s)" % col, col, want.simpleString(), got,
             present and actual[col] == want)
        )
    if not allow_extra:
        extras = sorted(set(actual) - set(expected))
        rows.append(
            ("no_extra_columns", "*", "none",
             ",".join(extras) if extras else "none", not extras)
        )

    def q(s: str) -> str:
        return "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"

    vals = ", ".join(
        "({}, {}, {}, {}, {})".format(
            q(c), q(col), q(exp), q(act), "true" if ok else "false"
        )
        for c, col, exp, act, ok in rows
    )
    return df.sparkSession.sql(
        f"SELECT col1 AS `check`, col2 AS `column`, col3 AS expected, "
        f"col4 AS actual, col5 AS passed FROM VALUES {vals}"
    )


def _suite_key_stats(profile: DataFrame) -> DataFrame:
    """Per-key pooled suite stats from a profile_summary long-format
    table — shared by suggest_checks (learn) and suite_regressions
    (re-evaluate). Sketch-sized input, one tiny aggregate."""
    num_min = F.col("min").try_cast("double")
    num_max = F.col("max").try_cast("double")
    return profile.groupBy("key").agg(
        F.sum("n_rows").alias("n"),
        F.sum("n_nulls").alias("nulls"),
        F.sum("ndv").alias("sum_ndv"),
        F.min(num_min).alias("min_num"),
        F.max(num_max).alias("max_num"),
        F.min((F.col("ndv") == F.col("n_rows") - F.col("n_nulls"))
              .cast("int")).alias("uniq_all"),
        F.min((num_min.isNotNull() & num_max.isNotNull()).cast("int"))
         .alias("is_num"),
    )


def suite_regressions(
    profile_old: DataFrame,
    profile_new: DataFrame,
    null_tolerance: float = 0.05,
    low_card_max: int = 20,
) -> DataFrame:
    """Data-CI between releases: the expectation suite release A
    already satisfies (suggest_checks on its profile), re-evaluated on
    release B's profile — one row per NEWLY-FAILING check, i.e. the
    data-quality regressions the new release introduces.

    Output (key, check, lo, hi, observed_lo, observed_hi): the learned
    bound plus what release B actually measures —

    - ``completeness``: fails when B's completeness drops below the
      learned lo; observed_lo = B's completeness.
    - ``uniqueness``: fails when any B partition has duplicate values;
      observed_lo = B's pooled ndv / non-null ratio (1.0 = still key-like).
    - ``range``: fails when B's numeric envelope escapes [lo, hi] or
      the column stopped parsing numeric; observed = B's envelope.
    - ``low_cardinality``: fails when B's summed per-partition NDV
      exceeds the learned bound; observed_hi = B's NDV sum.
    - A key absent from B entirely (column dropped) fails every check
      learned for it, with NULL observations.

    Both inputs are already-aggregated profiles, so the whole
    comparison is sketch-sized — the corpus scans happened in the two
    releases' profile stages; at 10^12 rows this join touches
    #cols x #checks rows. Rounding mirrors suggest_checks (6 dp) so a
    bound learned from A compares exactly against B re-measured by the
    same arithmetic on any engine.
    """
    sugg = suggest_checks(profile_old, null_tolerance, low_card_max)
    s = _suite_key_stats(profile_new)
    nonnull = F.col("n") - F.col("nulls")
    stats = s.select(
        "key",
        F.round(1.0 - F.col("nulls") / F.greatest(F.col("n"), F.lit(1)), 6)
         .alias("_compl"),
        F.col("uniq_all").alias("_uniq"),
        F.col("is_num").alias("_isnum"),
        F.round("min_num", 6).alias("_min"),
        F.round("max_num", 6).alias("_max"),
        F.col("sum_ndv").cast("double").alias("_ndv"),
        F.when(nonnull > 0, F.round(F.col("sum_ndv") / nonnull, 6))
         .alias("_uratio"),
        F.lit(1).alias("_present"),
    )
    j = sugg.join(stats, "key", "left")
    c = F.col("check")
    ok = (
        F.when(c == "completeness", F.col("_compl") >= F.col("lo"))
        .when(c == "uniqueness", F.col("_uniq") == 1)
        .when(
            c == "range",
            (F.col("_isnum") == 1)
            & (F.col("_min") >= F.col("lo"))
            & (F.col("_max") <= F.col("hi")),
        )
        .when(c == "low_cardinality", F.col("_ndv") <= F.col("hi"))
    )
    failed = j.where(F.col("_present").isNull() | ~F.coalesce(ok, F.lit(False)))
    obs_lo = (
        F.when(c == "completeness", F.col("_compl"))
        .when(c == "uniqueness", F.col("_uratio"))
        .when(c == "range", F.col("_min"))
    )
    obs_hi = (
        F.when(c == "range", F.col("_max"))
        .when(c == "low_cardinality", F.col("_ndv"))
    )
    return failed.select(
        "key", "check", "lo", "hi",
        obs_lo.alias("observed_lo"), obs_hi.alias("observed_hi"),
    )


def suggest_checks(
    profile: DataFrame,
    null_tolerance: float = 0.05,
    low_card_max: int = 20,
) -> DataFrame:
    """Constraint suggestion (the Deequ ConstraintSuggestion analog):
    read a profile_summary table (profiler.SUMMARY_SCHEMA long format)
    and propose the expectation suite the data currently satisfies —
    the profile→rules loop closed mechanically, so a new dataset's
    first suite is generated, reviewed, and pinned rather than written
    from scratch.

    One row per (column, check) suggested, (key, check, lo, hi):

    - ``completeness``: observed null ratio <= ``null_tolerance``;
      lo = the observed completeness (the bound the data already meets).
    - ``uniqueness``: ndv == non-null count in EVERY partition — a
      necessary (per-partition) condition for a key; global uniqueness
      still needs the uniqueness check itself to confirm (partitions
      could share values), which is exactly what the suggestion is for.
    - ``range``: min/max parse as numbers in every partition;
      lo/hi = the observed global envelope.
    - ``low_cardinality``: the summed per-partition NDV (an upper bound
      on global NDV) stays under ``low_card_max`` — a values_in
      candidate; hi carries the NDV bound.

    Input is the already-aggregated profile (rows ∝ #parts × #cols), so
    everything here is sketch-sized; the expensive scan happened in the
    profile stage. Doubles rounded to 6 dp.
    """
    k = _suite_key_stats(profile)
    null_ratio = F.col("nulls") / F.greatest(F.col("n"), F.lit(1))
    rows = [
        k.where(null_ratio <= null_tolerance).select(
            "key", F.lit("completeness").alias("check"),
            F.round(1.0 - null_ratio, 6).alias("lo"), F.lit(1.0).alias("hi"),
        ),
        k.where((F.col("uniq_all") == 1)
                & (F.col("n") - F.col("nulls") > 0)).select(
            "key", F.lit("uniqueness").alias("check"),
            F.lit(1.0).alias("lo"), F.lit(1.0).alias("hi"),
        ),
        k.where(F.col("is_num") == 1).select(
            "key", F.lit("range").alias("check"),
            F.round("min_num", 6).alias("lo"), F.round("max_num", 6).alias("hi"),
        ),
        k.where((F.col("sum_ndv") > 0)
                & (F.col("sum_ndv") <= low_card_max)).select(
            "key", F.lit("low_cardinality").alias("check"),
            F.lit(0.0).alias("lo"), F.col("sum_ndv").cast("double").alias("hi"),
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out
