"""Sampling-based validation certificates: bound a violation RATE
without scanning (or decoding) everything.

At 10^12 clips a rule whose predicate is expensive — audio decode, an
LM score, a remote lookup — cannot run on every row every release.
The standard statistical escape is a certificate: evaluate the
predicate on a deterministic subsample and report a one-sided
confidence upper bound on the TRUE violation rate; if the bound is
under the tolerance, the partition is certified clean at confidence
1 − delta without touching the other 99% of rows.

The bound is Hoeffding's inequality (public, distribution-free):
with n sampled rows and sample rate p_hat,

    P( p_true > p_hat + sqrt( ln(1/delta) / (2n) ) ) <= delta

so ``rate_ub = min(1, p_hat + sqrt(ln(1/delta)/(2n)))`` is a valid
1 − delta upper confidence bound for ANY distribution of violations
across rows. No normality assumption, no variance estimate — the
price is conservatism (a Clopper-Pearson bound is tighter at tiny
p_hat, but needs the Beta inverse CDF, which neither Catalyst nor the
SQL oracle has natively; Hoeffding keeps the whole certificate a
closed-form column expression both engines compute bit-comparably).

Sampling is operators.sample.hash_sample — membership is a pure
function of (id, salt), so the certificate is reproducible at any
parallelism, the oracle recomputes the exact same sample, and
re-running with a different salt draws an independent check.

Scale story: ONE narrow scan (id + part + predicate inputs); the
sample filter runs inside scan-stage codegen, dropped rows never
reach the expensive predicate; the aggregation shuffles one partial
row per partition. Partitions with NO sampled rows still appear
(certified=false, rate_ub=1.0 — absence of evidence is not a
certificate), via a sketch-sized join with the distinct-partition
list.

No reference analog (beyond-reference operator); complements
expectations.verify (exact dataset contracts) with the
sampled-contract variant a decode-heavy rule needs.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .operators.sample import hash_sample


def sampled_violation_bound(
    df: DataFrame,
    id_col: str,
    violation_pred: Column,
    fraction: float,
    part_col: str | None = None,
    eps: float = 0.01,
    delta: float = 0.05,
    salt: int = 17,
) -> DataFrame:
    """Per-partition certificate: (part?, n_sampled, n_viol, rate_hat,
    rate_ub, certified) with ``certified = rate_ub <= eps`` at
    confidence 1 − ``delta``. ``violation_pred`` is a boolean Column
    over ``df``'s rows (NULL counts as a violation — an unevaluable
    row cannot be certified clean)."""
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    if not 0.0 < delta < 1.0:
        raise ValueError(f"delta must be in (0, 1), got {delta}")
    keys = [part_col] if part_col else []
    s = hash_sample(df, id_col, fraction, salt)
    agg = s.groupBy(*[F.col(c) for c in keys]).agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum(
            F.coalesce(violation_pred, F.lit(True)).cast("bigint")
        ).alias("n_viol"),
    )
    if part_col:
        parts = df.select(part_col).distinct()
        agg = (
            parts.join(agg, [part_col], "left")
            .fillna(0, subset=["n_sampled", "n_viol"])
        )
    return attach_bound(agg, eps, delta, keys=keys)


def attach_bound(
    agg: DataFrame, eps: float, delta: float, keys: list[str] | None = None
) -> DataFrame:
    """The closed-form tail shared by :func:`sampled_violation_bound`
    and the engine's sampled decode-certificate stage: given rows with
    ``n_sampled`` / ``n_viol`` counts (plus any key columns), append
    (rate_hat, rate_ub, certified) per the module's Hoeffding bound.
    n_sampled == 0 yields rate_ub 1.0 / certified false."""
    keys = keys if keys is not None else [
        c for c in agg.columns if c not in ("n_sampled", "n_viol")
    ]
    n = F.col("n_sampled")
    rate = F.when(n > 0, F.col("n_viol") / n).otherwise(F.lit(0.0))
    slack = F.sqrt(F.lit(math.log(1.0 / delta)) / (F.lit(2.0) * n))
    ub = F.when(n > 0, F.least(F.lit(1.0), rate + slack)).otherwise(F.lit(1.0))
    return agg.select(
        *keys,
        n.cast("bigint").alias("n_sampled"),
        F.col("n_viol").cast("bigint").alias("n_viol"),
        F.round(rate, 6).alias("rate_hat"),
        F.round(ub, 6).alias("rate_ub"),
        (ub <= F.lit(eps)).alias("certified"),
    )
