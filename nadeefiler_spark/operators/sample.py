"""Deterministic, engine-portable corpus sampling.

Training-data pipelines subsample corpora per source/language with
REPRODUCIBLE membership: re-running the job — at any parallelism, on
any engine — must pick the same rows, or every downstream artifact
(dedup keepers, shard manifests, eval splits) drifts. Spark's
``df.sample`` is none of that (seed + partition-layout dependent), so
sampling here is a pure expression on the row's id:

    key(id)  = ((id mod 2^31) * 2654435761 + salt) mod 2^31
    keep(f)  = key(id) < floor(f * 2^31)

- Deterministic & layout-independent: the key depends only on the id.
- Portable: plain int64 arithmetic — the DuckDB oracle computes the
  identical key (no engine hash function involved; fraction enters as a
  precomputed INTEGER threshold so no float crosses an engine boundary).
- Equidistributed: the multiplier (Knuth's 2654435761) is odd, hence
  coprime with 2^31; sequential ids map to a full-period arithmetic
  progression of keys, so any id range receives fraction*|range| ± 1
  rows per stratum.
- 100-TB shape: keep() is a scan-stage filter — it evaluates inside the
  scan's whole-stage codegen (the expression is too complex for parquet
  row-group PushedFilters, but nothing past the scan stage ever sees a
  dropped row), zero shuffle, zero driver state. Changing the salt draws
  an independent sample; ids must be non-negative (mod is
  engine-dependent below 0).

No reference analog (beyond-reference operator per the task mandate).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_MOD = 2**31
_MULT = 2654435761


def sample_key(id_col: Column | str, salt: int = 17) -> Column:
    """The row's deterministic sampling key in [0, 2^31)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return ((c.cast("long") % _MOD) * F.lit(_MULT) + F.lit(salt)) % _MOD


def threshold(fraction: float) -> int:
    """Integer keep-threshold for a fraction (what crosses engines)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return int(fraction * _MOD)


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, salt: int = 17
) -> DataFrame:
    """Uniform deterministic sample: rows whose key clears the
    fraction's threshold. Pure filter — no shuffle, scan-stage codegen."""
    return df.where(sample_key(id_col, salt) < F.lit(threshold(fraction)))


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: Mapping[str, float],
    default_fraction: float = 0.0,
    salt: int = 17,
) -> DataFrame:
    """Per-stratum deterministic sample: each stratum keeps its own
    fraction (rebalancing a source/language mix). Strata absent from
    ``fractions`` keep ``default_fraction``. Still one scan-stage
    filter — the per-stratum threshold is a CASE expression."""
    thr: Column = F.lit(threshold(default_fraction))
    for value, frac in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == value, F.lit(threshold(frac))).otherwise(thr)
    return df.where(sample_key(id_col, salt) < thr)


def _split_expr(key: Column, fractions: Mapping[str, float]) -> Column:
    """Cumulative-threshold CASE mapping a key in [0, 2^31) to a split
    name (NULL for the remainder)."""
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total}, must be <= 1")
    expr: Column | None = None
    cum = 0.0
    lo = 0
    for name, frac in fractions.items():
        cum += frac
        hi = threshold(min(cum, 1.0))
        cond = (key >= F.lit(lo)) & (key < F.lit(hi))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
        lo = hi
    if expr is None:
        raise ValueError("fractions must not be empty")
    return expr.otherwise(F.lit(None).cast("string"))


def with_split(
    df: DataFrame,
    id_col: str,
    fractions: Mapping[str, float],
    salt: int = 17,
) -> DataFrame:
    """df + deterministic ``split`` column (train/val/test, any names).

    ``fractions`` maps split name -> fraction; fractions must sum to
    <= 1 (± float eps), and any remainder is labeled NULL (excluded
    rows). Assignment partitions the key space by CUMULATIVE integer
    thresholds in insertion order, so it inherits every sample_key
    property: deterministic, layout/parallelism independent, portable
    to any engine as plain int64 arithmetic, and one scan-stage CASE
    expression — no shuffle, no driver state. Growing one split's
    fraction only MOVES rows across the adjacent boundary (membership
    is monotone in the thresholds), the property eval-split maintenance
    needs when a corpus is re-released.
    """
    return df.withColumn("split", _split_expr(sample_key(id_col, salt), fractions))


def uniform01(id_col: Column | str, salt: int = 17) -> Column:
    """The row's deterministic uniform draw in (0, 1): the sampling key
    mapped to the open unit interval as ``(2*key + 1) / 2^32``.

    The ratio is an exact dyadic rational, so it round-trips through
    IEEE double identically on every engine — no float is *computed*
    here, only represented."""
    return (sample_key(id_col, salt) * 2 + 1) / F.lit(float(2 * _MOD))


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: Column | str,
    k: int,
    strata_col: str | None = None,
    salt: int = 17,
) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement: the k rows
    (per stratum, if given) with the largest ``u^(1/w)``, u the row's
    deterministic uniform draw and w its positive weight — the
    Efraimidis–Spirakis A-ES scheme (public algorithm: "Weighted random
    sampling with a reservoir", IPL 2006). P(row in sample) is
    proportional-to-weight-without-replacement, yet membership is a
    pure function of (id, weight, salt): reproducible at any
    parallelism, on any engine, against the same corpus — the property
    every downstream artifact (mixing plans, quality-weighted eval
    sets) needs, and Spark's ``sampleBy`` lacks.

    Ranking uses ``ln(u)/w`` (monotone in ``u^(1/w)``, numerically flat
    where pow underflows for huge weights); ties beyond float
    resolution break on the id. 100-TB shape: one row_number window
    partitioned by stratum — a single shuffle keyed on the stratum, and
    Spark's WindowGroupLimit inserts a map-side partial top-k BELOW the
    exchange (verified on the executed plan), so the shuffle carries at
    most k rows per task per stratum; even a single global stratum
    ships only k x #tasks rows. Weights must be > 0 (rows with NULL/<=0
    weight are dropped, matching "zero weight = never sampled").

    No reference analog (beyond-reference operator per the task
    mandate)."""
    w_col = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    scored = df.where(w_col.isNotNull() & (w_col > 0)).withColumn(
        "es_score", F.ln(uniform01(id_col, salt)) / w_col.cast("double")
    )
    win = Window.partitionBy(*([strata_col] if strata_col else [])).orderBy(
        F.col("es_score").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("es_rank", F.row_number().over(win))
        .where(F.col("es_rank") <= k)
        .drop("es_score")
    )


def group_split_key(group_col: Column | str, salt: int = 17) -> Column:
    """Deterministic key in [0, 2^31) from a STRING group key: the
    first 15 hex digits of md5 parsed as int64 (portable — Spark
    ``conv`` and DuckDB's '0x' cast agree bit-for-bit), then the same
    affine scramble as sample_key."""
    c = F.col(group_col) if isinstance(group_col, str) else group_col
    h = F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")
    return ((h % _MOD) * F.lit(_MULT) + F.lit(salt)) % _MOD


def with_split_by_group(
    df: DataFrame,
    group_col: Column | str,
    fractions: Mapping[str, float],
    salt: int = 17,
) -> DataFrame:
    """df + ``split`` assigned by a GROUP key instead of the row id —
    the leakage-proof eval split.

    Splitting by row id puts two copies of one document in different
    splits whenever content duplicates span ids (what
    decontam.split_leakage measures after the fact); splitting by a
    content key — ``functions.text.fingerprint`` for exact dups, the
    dup-cluster root from components.connected_components for near
    dups — makes cross-split content leakage structurally impossible:
    equal key ⇒ equal split. Costs nothing over with_split: the key is
    one md5 expression in the same scan-stage CASE (no shuffle; the
    upstream clustering, if used, already paid its own cost). Split
    SIZES now deviate from the fractions by the dup-group size skew —
    by design: the alternative is leakage.
    """
    return df.withColumn(
        "split", _split_expr(group_split_key(group_col, salt), fractions)
    )


def neyman_allocation(
    stats: DataFrame,
    strata_cols: list[str],
    n_col: str,
    s_col: str,
    budget: int,
) -> DataFrame:
    """Optimal review-budget allocation across strata (Neyman 1934 —
    the classical stratified-sampling result): given each stratum's
    size N_h and within-stratum spread s_h, the variance-minimizing
    split of a fixed budget B is n_h ∝ N_h·s_h. The operational
    question it answers at 10^12 rows: "we can human-review B clips
    this week — how many from each language×codec cell?" Big noisy
    strata get reviewers; big homogeneous strata don't.

    Integerization is largest-remainder (Hamilton): floor every raw
    share, then +1 to the strata with the largest fractional parts
    until exactly ``budget`` is placed (ties broken by stratum order —
    deterministic). Two safeguards, both standard and documented in the
    output rather than silently patched:

    - all-zero spread (every s_h = 0): weights fall back to
      proportional-to-N (nothing distinguishes strata).
    - ``alloc`` is finally capped at N_h (cannot review more rows than
      exist); the capped remainder is NOT redistributed — the caller
      sees sum(alloc) < budget and decides (re-run on the uncapped
      strata, or bank the budget). One-pass contracts beat a hidden
      fixpoint loop here.

    Input ``stats`` is an already-aggregated per-stratum table (rows ∝
    #strata — from profile_summary or a one-line groupBy), so every
    window below runs on sketch-sized data. Returns
    (strata…, n_rows, spread, weight, alloc).
    """
    n, s = F.col(n_col).cast("double"), F.col(s_col).cast("double")
    w_all = Window.partitionBy()
    raw_w = n * F.coalesce(s, F.lit(0.0))
    tot_ns = F.sum(raw_w).over(w_all)
    tot_n = F.sum(n).over(w_all)
    weight = F.when(tot_ns > 0, raw_w / tot_ns).otherwise(n / tot_n)
    base = stats.select(
        *strata_cols,
        n.cast("bigint").alias("n_rows"),
        F.round(F.coalesce(s, F.lit(0.0)), 6).alias("spread"),
        weight.alias("_w"),
    ).select(
        "*",
        (F.lit(float(budget)) * F.col("_w")).alias("_raw"),
    )
    base = base.select(
        "*",
        F.floor("_raw").alias("_base"),
        (F.col("_raw") - F.floor("_raw")).alias("_frac"),
    )
    rk = Window.orderBy(F.col("_frac").desc(), *[F.col(c) for c in strata_cols])
    leftover = F.lit(budget) - F.sum("_base").over(w_all)
    alloc = F.col("_base") + (F.row_number().over(rk) <= leftover).cast("bigint")
    return base.select(
        *strata_cols,
        "n_rows",
        "spread",
        F.round("_w", 6).alias("weight"),
        F.least(alloc, F.col("n_rows")).cast("bigint").alias("alloc"),
    )
