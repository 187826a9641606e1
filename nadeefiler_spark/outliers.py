"""Outlier detection: the Spark analog of nadeefiler's dBoost profiler.

Reference (SURVEY §2.3 A9): the `outliers` profiler shells out to dBoost
with `--histogram 0.8 0.05 --discretestats 8 2`
(/root/reference/profilers/outliers/index.js:16-18) — per-column
histogram rarity + discrete stats driving outlier flags. dBoost itself
is an unfetched git submodule, so the tuned analogs here are:

- rare_values: categorical rarity — a value whose share of its
  (partition, column) histogram is below eps (dBoost's histogram
  statistical_threshold).
- zscore_outliers: numeric |x - mean| > k * stddev (dBoost's gaussian
  model).
- iqr_outliers: robust quartile fences [q1 - f*iqr, q3 + f*iqr].

Scale notes: rare_values consumes the already-aggregated histogram
table (rows ∝ bins). zscore/iqr compute per-partition moments with ONE
groupBy (map-side partial agg) and broadcast-join the tiny moments back
to the row scan — deliberately NOT a window over the raw rows (a window
would shuffle every row to sort within partitions; the join keeps the
row scan shuffle-free).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .rules.base import Rule, RuleContext


def rare_values(
    hist: DataFrame, eps: float = 0.005, min_total: int = 100
) -> DataFrame:
    """(part, key, value, count, share): histogram bins rarer than eps.

    `hist`: (part, key, kind, bin, count) from profiler.profile_histograms
    or any (part, key, value-ish, count) table.
    """
    tot = hist.groupBy("part", "key").agg(F.sum("count").alias("_tot"))
    return (
        hist.join(tot, ["part", "key"])
        .where(F.col("_tot") >= min_total)
        .withColumn("share", F.col("count") / F.col("_tot"))
        .where(F.col("share") < eps)
        .select("part", "key", F.col("bin").alias("value"), "count",
                F.round("share", 6).alias("share"))
    )


def _moments(df: DataFrame, col: str, part_col: str) -> DataFrame:
    return df.groupBy(F.col(part_col).alias("_p")).agg(
        F.avg(F.col(col)).alias("_mean"),
        F.stddev_pop(F.col(col)).alias("_sd"),
    )


def zscore_outliers(
    df: DataFrame, col: str, part_col: str, k: float = 3.0
) -> DataFrame:
    """Rows where |col - mean(part)| > k * stddev_pop(part).

    Adds a `z` column (signed z-score). Moments are broadcast back to
    the scan — no row shuffle.
    """
    m = _moments(df, col, part_col)
    joined = df.join(
        F.broadcast(m), df[part_col] == m["_p"], "inner"
    )
    z = (F.col(col) - F.col("_mean")) / F.col("_sd")
    return (
        joined.where(F.col("_sd") > 0)
        .where(F.abs(F.col(col) - F.col("_mean")) > k * F.col("_sd"))
        .select(*df.columns, F.round(z, 6).alias("z"))
    )


def iqr_outliers(
    df: DataFrame, col: str, part_col: str, factor: float = 1.5
) -> DataFrame:
    """Rows outside [q1 - f*iqr, q3 + f*iqr] per partition (exact
    percentiles; swap in approx_percentile at extreme scale)."""
    q = df.groupBy(F.col(part_col).alias("_p")).agg(
        F.percentile(F.col(col), F.lit(0.25)).alias("_q1"),
        F.percentile(F.col(col), F.lit(0.75)).alias("_q3"),
    )
    j = df.join(F.broadcast(q), df[part_col] == q["_p"], "inner")
    iqr = F.col("_q3") - F.col("_q1")
    lo, hi = F.col("_q1") - factor * iqr, F.col("_q3") + factor * iqr
    return j.where((F.col(col) < lo) | (F.col(col) > hi)).select(*df.columns)


@dataclass
class OutlierRule(Rule):
    """Numeric z-score outlier rule over a clips column (dBoost analog)."""

    column: str = "dur_ms"
    k: float = 4.0

    def __post_init__(self) -> None:
        self.name = self.name or f"{self.column}_outlier"
        self.stage = "drift"

    def violations(self, ctx: RuleContext) -> DataFrame:
        out = zscore_outliers(ctx.clips, self.column, ctx.part_col, self.k)
        detail = F.concat(
            F.lit(f"{self.column}="), F.col(self.column).cast("string"),
            F.lit(" z="), F.col("z").cast("string"),
        )
        return self.shape(out, ctx, self.name, detail)


def group_stat_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    threshold: float = 3.5,
) -> DataFrame:
    """Cross-group consistency check: which groups' mean of
    ``value_col`` deviates from the OTHER groups — the partition-level
    analog of dBoost's row-level gaussian model, and the check a 10^12
    validation run wants before trusting per-partition verdicts (one
    codec partition with a shifted duration mean is a pipeline bug, not
    10^9 row bugs).

    Robust scoring (median/MAD with the 0.6745 normal-consistency
    factor) so one bad group can't mask itself by dragging a mean/sd.
    Returns (grp, n, stat, z, is_outlier). When MAD is 0 (all other
    groups identical) z is NULL and any deviation from the median
    flags.

    Scale: one groupBy shuffle over the raw rows (map-side partial
    avg); everything after runs on #groups rows — the median/MAD
    aggregate collapses to one row broadcast back with a crossJoin.
    """
    stats = df.groupBy(F.col(group_col).cast("string").alias("grp")).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(value_col).alias("stat"),
    )
    med = stats.agg(F.percentile("stat", F.lit(0.5)).alias("__med"))
    dev = stats.crossJoin(F.broadcast(med)).withColumn(
        "__dev", F.abs(F.col("stat") - F.col("__med"))
    )
    mad = dev.agg(F.percentile("__dev", F.lit(0.5)).alias("__mad"))
    scored = dev.crossJoin(F.broadcast(mad))
    z = F.when(
        F.col("__mad") > 0,
        0.6745 * (F.col("stat") - F.col("__med")) / F.col("__mad"),
    )
    return scored.select(
        "grp",
        "n",
        F.round("stat", 6).alias("stat"),
        F.round(z, 6).alias("z"),
        F.coalesce(
            F.abs(z) > threshold, F.col("stat") != F.col("__med")
        ).alias("is_outlier"),
    )


def benford(
    df: DataFrame,
    cols: list[str],
    precision: int = 6,
) -> DataFrame:
    """First-significant-digit (Benford's law) profile per numeric
    column — the classic fabricated-/corrupted-numbers screen of the
    data-quality literature (public: Benford 1938; dBoost-adjacent in
    spirit — a distribution-shape check no pointwise rule can express).

    Returns one row per (column, digit 1..9):
      (col, digit, n, p_obs, p_benford)
    where p_obs is the digit's share among rows with a nonzero finite
    value and p_benford = log10(1 + 1/digit). NULLs and zeros carry no
    leading digit and are excluded (their count is visible as
    sum(n) vs the table's row count).

    Digit extraction is string-based on a DECIMAL(38,6) cast — decimals
    render in plain notation on every engine (a double cast can fall
    into scientific notation, where the first character lies), and the
    first [1-9] character IS the first significant digit, for values
    ≥ 1 and < 1 alike. No float log10 bucketing — a ULP disagreement
    between libm implementations would flip boundary digits.

    Scale: one scan, one map-side-combinable groupBy per column (all
    columns melted into a single groupBy via explode), shuffle ∝ 9 ×
    #cols.
    """
    structs = [
        F.struct(
            F.lit(c).alias("col"),
            F.regexp_extract(
                F.abs(F.col(c)).cast("decimal(38,6)").cast("string"),
                "[1-9]",
                0,
            ).alias("digit_s"),
        )
        for c in cols
    ]
    melted = df.select(F.explode(F.array(*structs)).alias("s")).select("s.*")
    digits = melted.where(F.col("digit_s") != "").select(
        "col", F.col("digit_s").cast("int").alias("digit")
    )
    counts = digits.groupBy("col", "digit").agg(F.count(F.lit(1)).alias("n"))
    tot = Window.partitionBy("col")
    return counts.select(
        "col",
        "digit",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("n") / F.sum("n").over(tot), precision).alias("p_obs"),
        F.round(
            F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit")), precision
        ).alias("p_benford"),
    )


def multivariate_outliers(
    df: DataFrame,
    cols: list[str],
    id_cols: list[str],
    threshold: float,
) -> DataFrame:
    """Record-LEVEL outlier score over several numeric columns at once.

    zscore_outliers flags one column at a time; a record that is only
    mildly unusual on each of four columns but unusual on ALL of them
    slips every univariate gate. The standard cheap multivariate score
    is the diagonal-covariance Mahalanobis distance squared:

        score = sum_c ((x_c - mean_c) / stddev_pop_c)^2

    (chi-square distributed with len(cols) degrees of freedom under
    normality, so thresholds have a principled scale — e.g. 18.47 is
    the 99.9th percentile at 4 dof).

    Two passes, both scan-shaped: one aggregate for all means/stddevs
    (a single 1-row result, broadcast back), then one scan computing
    the score — no row shuffle, no window over the corpus. NULL column
    values and zero-variance columns contribute 0 to the score (the
    record is judged on the evidence it has).

    Returns rows with score > threshold:
      (*id_cols, *cols, score, n_cols_used)

    Reference analog: dBoost's per-column histogram outliers
    (/root/reference/profilers/outliers/index.js:16-18) generalized to
    joint record scoring (beyond-reference operator).
    """
    stats = df.agg(
        *[F.avg(F.col(c).cast("double")).alias(f"_m_{c}") for c in cols],
        *[
            F.stddev_pop(F.col(c).cast("double")).alias(f"_sd_{c}")
            for c in cols
        ],
    )
    j = df.crossJoin(F.broadcast(stats))
    usable = [
        F.col(c).isNotNull() & (F.col(f"_sd_{c}") > 0) for c in cols
    ]
    terms = [
        F.when(
            u,
            F.pow(
                (F.col(c).cast("double") - F.col(f"_m_{c}"))
                / F.col(f"_sd_{c}"),
                F.lit(2),
            ),
        ).otherwise(F.lit(0.0))
        for c, u in zip(cols, usable)
    ]
    score = sum(terms[1:], terms[0])
    n_used = sum(
        (u.cast("int") for u in usable[1:]), usable[0].cast("int")
    )
    return (
        j.where(score > threshold)
        .select(
            *id_cols,
            *cols,
            F.round(score, 6).alias("score"),
            n_used.cast("int").alias("n_cols_used"),
        )
    )


@dataclass
class MultivariateOutlierRule(Rule):
    """Record-level joint-outlier rule over several clip columns.

    The multivariate complement of OutlierRule: flags clips whose
    diagonal-Mahalanobis score across ``columns`` (stats computed over
    the rule's scoped clips, broadcast back — no row shuffle) exceeds
    ``threshold``. Catches a clip mildly odd on every column at once
    (e.g. slightly long AND slightly low-rate AND slightly large) that
    no single-column z-gate trips on.
    """

    columns: tuple[str, ...] = ("sr_hz", "dur_ms")
    threshold: float = 30.0

    def __post_init__(self) -> None:
        self.name = self.name or "multivariate_outlier"
        self.stage = "drift"

    def violations(self, ctx: RuleContext) -> DataFrame:
        out = multivariate_outliers(
            ctx.clips,
            list(self.columns),
            [ctx.key_col, ctx.part_col],
            self.threshold,
        )
        detail = F.concat(
            F.lit("score="), F.col("score").cast("string"),
            F.lit(" cols="), F.lit(",".join(self.columns)),
        )
        return self.shape(out, ctx, self.name, detail)
