"""PII detection and redaction over text columns — expression-only.

A training-data pipeline gates corpora on personally identifiable
information before anything ships; the reference's value-level
profilers (``/root/reference/profilers/worker.js:121-144`` streams
every value through JS detector callbacks) are the semantic slot this
fills, re-expressed as Catalyst regexes so the scan stays inside
whole-stage codegen — no per-row Python anywhere.

Pattern notes: every regex uses only syntax shared by Java's engine
(Spark) and RE2 (DuckDB oracle): character classes, bounded repeats,
``\\b`` word boundaries — no lookaround. ``phone`` requires the
leading ``+`` of an international number so plain digit runs don't
triple-count against ``ssn``/``card``. Redaction applies patterns in
the fixed ``PII_PATTERNS`` order (email, ssn, phone, ipv4, card);
since ssn/ipv4/card are mutually exclusive by shape and email/phone
consume their text first, the chain is order-stable.

Scale story (10^12 rows): narrow projection + regex per row, no
shuffle at all for redaction; the scan aggregates map-side into one
row per group. The regexes are a compile-once constant per task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ordered: redaction applies in this order (see module docstring)
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "phone": r"\+[0-9][0-9 ()-]{7,}[0-9]",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "card": r"\b[0-9]{13,16}\b",
}


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def pii_count(c: Column | str, kind: str) -> Column:
    """Number of matches of one PII kind in the text (0 for NULL text)."""
    return F.coalesce(
        F.size(F.regexp_extract_all(_col(c), F.lit(PII_PATTERNS[kind]), 0)),
        F.lit(0),
    ).cast("bigint")


def has_pii(c: Column | str, kinds: list[str] | None = None) -> Column:
    """True iff any of the given kinds (default: all) matches."""
    ks = kinds or list(PII_PATTERNS)
    out = F.lit(False)
    for k in ks:
        out = out | (pii_count(c, k) > 0)
    return out


def redact(c: Column | str, kinds: list[str] | None = None) -> Column:
    """Replace every match with ``<KIND>`` tokens, in PII_PATTERNS
    order. NULL text stays NULL."""
    ks = [k for k in PII_PATTERNS if kinds is None or k in kinds]
    out = _col(c)
    for k in ks:
        out = F.regexp_replace(out, PII_PATTERNS[k], f"<{k.upper()}>")
    return out


def scan_pii(
    df: DataFrame,
    text_col: str,
    group_cols: list[str] | None = None,
    kinds: list[str] | None = None,
) -> DataFrame:
    """Per-group PII audit: one row per group with
    (n_rows, n_<kind>... total match counts, pii_rows, pii_rate).

    One scan, map-side combinable — the aggregate state is a handful of
    counters per group, so the shuffle is ∝ #groups regardless of corpus
    size. ``pii_rate`` is rounded to 6 places (oracle-stable)."""
    ks = kinds or list(PII_PATTERNS)
    keys = group_cols or []
    flag = has_pii(text_col, ks)
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.sum(pii_count(text_col, k)).alias(f"n_{k}") for k in ks],
        F.sum(flag.cast("bigint")).alias("pii_rows"),
        F.round(
            F.sum(flag.cast("bigint")) / F.count(F.lit(1)), 6
        ).alias("pii_rate"),
    )


def k_anonymity(
    df: DataFrame,
    qi_cols: list[str],
    k: int = 5,
    sensitive_col: str | None = None,
    l: int = 2,
) -> DataFrame:
    """Release-risk audit: the quasi-identifier groups that would leak.

    One row per QI combination that is at risk, with
    (qi_cols..., group_size, at_risk_k[, n_sensitive, at_risk_l]):

    - k-anonymity: ``group_size < k`` — fewer than k rows share this QI
      combination, so any one of them is re-identifiable by joining the
      QI columns against an external dataset.
    - l-diversity (only when ``sensitive_col`` is given): fewer than
      ``l`` DISTINCT sensitive values in the group — even a k-anonymous
      group discloses the sensitive attribute when everyone in it
      shares the same value.

    Rows that are in NO risky group are not returned; an empty result
    means the projection (df limited to qi_cols + sensitive_col) is
    safe to release at the chosen k/l. NULL is a QI value like any
    other (NULL-keyed groups risk-audit the same way — Spark and ANSI
    SQL agree on groupBy NULL semantics).

    Scale story (10^12 rows): one groupBy on the QI columns — partial
    aggregation map-side, shuffle ∝ #groups; the distinct-sensitive
    count is Spark's standard two-phase distinct rewrite on the same
    key. No joins, no window, nothing driver-side. Complements
    scan_pii/redact (free-text PII) with structured-column risk — the
    k-anonymity / l-diversity definitions are the published ones
    (Sweeney 2002; Machanavajjhala et al. 2007).
    """
    size = F.count(F.lit(1))
    aggs = [size.alias("group_size")]
    risk = F.col("group_size") < F.lit(k)
    if sensitive_col is not None:
        aggs.append(
            F.countDistinct(F.col(sensitive_col)).alias("n_sensitive")
        )
    out = df.groupBy(*[F.col(c) for c in qi_cols]).agg(*aggs)
    out = out.withColumn("at_risk_k", risk)
    if sensitive_col is not None:
        out = out.withColumn("at_risk_l", F.col("n_sensitive") < F.lit(l))
        return out.where(F.col("at_risk_k") | F.col("at_risk_l"))
    return out.where(F.col("at_risk_k"))


def entropy_l_diversity(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    l: float = 2.0,
) -> DataFrame:
    """Entropy l-diversity (Machanavajjhala et al. 2007, Def. 4.2) —
    the strict form of the distinct-count flag in :func:`k_anonymity`:
    a group passes iff the Shannon entropy of its sensitive values is
    at least ln(l). Distinct-count l-diversity is fooled by a group of
    100 rows with 99 "flu" and 1 "cancer" (2 distinct values, but an
    adversary is 99% sure); entropy is not.

    Returns one row per QI group: (qi_cols..., group_size, n_sensitive,
    entropy, at_risk) with ``at_risk = entropy < ln(l)`` (entropy in
    nats, rounded 6 dp; a single-value group has entropy exactly 0).
    NULL sensitive values form a value class like any other, matching
    k_anonymity's NULL-QI semantics.

    Plan: groupBy(qi..., value) counts, re-aggregated per group with
    H = ln(n) − Σ c·ln(c) / n (one pass, map-side combinable; the
    identity avoids computing per-value probabilities before the
    final division, keeping everything exact integer·log sums) — the
    same two-level histogram shape as :func:`t_closeness`, rows ∝
    #groups × NDV(sensitive).
    """
    import math as _math

    gh = df.groupBy(
        *[F.col(c) for c in qi_cols], F.col(sensitive_col).alias("_sv")
    ).agg(F.count(F.lit(1)).alias("c"))
    agg = gh.groupBy(*[F.col(c) for c in qi_cols]).agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("n_sensitive"),
        F.sum(F.col("c") * F.log(F.col("c").cast("double"))).alias("_clc"),
    )
    ent = F.log(F.col("n").cast("double")) - F.col("_clc") / F.col("n")
    return agg.select(
        *qi_cols,
        F.col("n").cast("bigint").alias("group_size"),
        F.col("n_sensitive").cast("bigint").alias("n_sensitive"),
        F.round(ent, 6).alias("entropy"),
        (ent < F.lit(_math.log(l))).alias("at_risk"),
    )


def t_closeness(
    df: DataFrame,
    qi_cols: list[str],
    sensitive: Column | str,
    t: float = 0.2,
    ordered: bool = True,
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007): per
    quasi-identifier group, the earth-mover distance between the
    group's SENSITIVE-value distribution and the whole table's — the
    member of the release-risk family :func:`k_anonymity` (and its
    l-diversity flag) cannot see: a group can be k-anonymous and
    l-diverse while its salary mix still screams "all executives".

    Distances follow the paper's two ground metrics:

    - ``ordered=True`` (numeric/ordinal sensitive attribute): EMD with
      equal rank steps over the table's distinct sensitive values,
      D = sum_i |CDF_p(i) - CDF_q(i)| / (m - 1) with m = #distinct
      values (0 when m == 1 — nothing can differ).
    - ``ordered=False`` (categorical): total variation distance,
      D = (1/2) sum_v |p(v) - q(v)|.

    Both are in [0, 1]. High-cardinality NUMERIC attributes should be
    pre-bucketed by passing an expression (e.g. ``F.floor(F.col("bal")
    / 1000)``) — rank-EMD over near-unique raw values measures row
    identity, not distribution shape.

    Returns ONE ROW PER GROUP (not only risky ones — the full table is
    the useful audit artifact): (qi_cols..., group_size, t_distance,
    at_risk_t) with ``at_risk_t = t_distance > t``. NULL sensitive
    values form a bin like any other (the paper's domain is whatever
    the release discloses; NULL is disclosed too); for ordered EMD the
    NULL bin sorts last, matching SQL NULLS LAST so the oracle agrees.

    Scale story (10^12 rows): one groupBy(qi..., value) over the scan
    (partial agg map-side; shuffle ∝ #groups x NDV(sensitive) — bounded
    by the bucketing contract above); the GLOBAL histogram re-aggregates
    that output (sketch-sized, no second scan), and the grid-align join
    + CDF window run entirely on histogram rows — the same shape as the
    drift family (drift.drift_metrics / wasserstein_drift), which this
    deliberately mirrors: t-closeness IS a drift test where "partition"
    means "QI group".
    """
    from pyspark.sql import Window

    s = _col(sensitive).alias("_sv")
    gh = df.groupBy(*[F.col(c) for c in qi_cols], s).agg(
        F.count(F.lit(1)).alias("c_p")
    )
    # global histogram and bin list derive from the group histogram —
    # sketch-sized re-aggregation, the table is scanned exactly once
    bins = gh.groupBy("_sv").agg(F.sum("c_p").alias("c_q"))
    groups = gh.groupBy(*[F.col(c) for c in qi_cols]).agg(
        F.sum("c_p").alias("group_size")
    )
    grid = groups.join(bins, how="cross")
    # null-safe join keys: NULL is a legitimate QI value AND a
    # legitimate sensitive bin (see docstring); a plain equi-join would
    # silently zero every NULL-keyed histogram cell
    ghr = gh.select(
        *[F.col(c).alias(f"_g_{c}") for c in qi_cols],
        F.col("_sv").alias("_g_sv"),
        "c_p",
    )
    cond = F.col("_sv").eqNullSafe(F.col("_g_sv"))
    for c in qi_cols:
        cond = cond & F.col(c).eqNullSafe(F.col(f"_g_{c}"))
    j = (
        grid.join(ghr, cond, "left")
        .drop("_g_sv", *[f"_g_{c}" for c in qi_cols])
        .fillna(0, subset=["c_p"])
    )

    gw = Window.partitionBy(*[F.col(c) for c in qi_cols])
    n_total = F.sum("c_q").over(gw)  # every partition carries all bins
    p = F.col("c_p") / F.col("group_size")
    q = F.col("c_q") / n_total
    if ordered:
        ow = gw.orderBy(F.col("_sv").asc_nulls_last()).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        gap = F.sum(p - q).over(ow)
        m = F.count(F.lit(1)).over(gw)
        contrib = j.select(
            *qi_cols, "group_size",
            F.abs(gap).alias("d"),
            (m > 1).cast("int").alias("has_steps"),
            m.alias("m"),
        )
        dist = F.when(
            F.max("has_steps") == 1,
            F.sum("d") / (F.max("m") - F.lit(1)),
        ).otherwise(F.lit(0.0))
    else:
        contrib = j.select(
            *qi_cols, "group_size", F.abs(p - q).alias("d")
        )
        dist = F.sum("d") / F.lit(2.0)
    out = contrib.groupBy(*[F.col(c) for c in qi_cols]).agg(
        F.max("group_size").cast("bigint").alias("group_size"),
        F.round(dist, 6).alias("t_distance"),
    )
    return out.withColumn("at_risk_t", F.col("t_distance") > F.lit(t))
