"""Annotation-consistency validation over duplicate content.

Duplicate (or near-duplicate) content whose human-assigned metadata
disagrees — two copies of the same document tagged with different
languages, the same recording carrying two different transcripts — is
the classic signature of an annotation error, and one of the
highest-yield checks a training-data validation pass can run: the
content dedup stage has already paid for the grouping, so the label
comparison is a cheap aggregate on top of it.

Two shapes, matching the two shapes dedup output comes in:

- :func:`pair_attr_conflicts` — annotate a near-dup PAIR list
  (``ngram_jaccard_pairs``, ``minhash_pairs``, embedding pairs …) with
  per-attribute agreement flags. Two joins of the (small) pair list
  against the base table; no hint — AQE broadcasts the pair side when
  it fits, so the base table is never collected or re-shuffled.
- :func:`group_attr_conflicts` — per-attribute distinct counts inside
  content-keyed DUP GROUPS (md5 digests, audio fingerprints …). One
  shuffle on the group key, partial aggregation map-side; scale-safe
  at any corpus size because groups are bounded by the dedup key.

Reference analog: nadeefiler's verdict model emits one violation row
per offending tuple with the rule stamped on it
(/root/reference/profilers/worker.js:84-100 stores per-profiler result
rows); this module extends the same verdict shape to CROSS-row label
agreement, which the reference's per-document profilers cannot see.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["norm_text", "pair_attr_conflicts", "group_attr_conflicts", "label_agreement"]


def norm_text(c: Column | str) -> Column:
    """Whitespace/case-insensitive comparison key for free-text labels.

    lower + trim + collapse internal runs of whitespace: transcripts
    that differ only in casing or spacing are the SAME annotation, not
    a conflict.
    """
    col = F.col(c) if isinstance(c, str) else c
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def pair_attr_conflicts(
    pairs: DataFrame,
    base: DataFrame,
    id_col: str,
    attrs: list[str],
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Annotate near-dup pairs with per-attribute agreement flags.

    For every attribute ``a`` in ``attrs`` the result carries
    ``a_a``, ``a_b`` (the two sides' values) and ``a_match``
    (null-safe equality — NULL vs NULL agrees, NULL vs value does
    not), after all original ``pairs`` columns. Every input pair is
    kept; downstream filters on ``<attr>_match = false`` select the
    probable annotation errors.

    Plan shape: ``base`` is projected to (id, attrs) once per side and
    LEFT-joined onto the pair list. The pair list is the output of a
    dedup operator and therefore tiny relative to the corpus — no
    broadcast hint (an explicit hint is not overridden by AQE and
    would pin a 10^12-row side driver-side); AQE broadcasts the pair
    side when it fits and falls back to a shuffle join otherwise.
    """
    out = pairs
    for suffix, idc in (("a", id_a), ("b", id_b)):
        proj = base.select(
            F.col(id_col).alias(f"__cid_{suffix}"),
            *[F.col(a).alias(f"{a}_{suffix}") for a in attrs],
        )
        out = out.join(
            proj, out[idc] == proj[f"__cid_{suffix}"], "left"
        ).drop(f"__cid_{suffix}")
    matches = [
        F.col(f"{a}_a").eqNullSafe(F.col(f"{a}_b")).alias(f"{a}_match")
        for a in attrs
    ]
    side_cols = [c for a in attrs for c in (f"{a}_a", f"{a}_b")]
    return out.select(*pairs.columns, *side_cols, *matches)


def group_attr_conflicts(
    df: DataFrame,
    group_col: Column | str,
    id_col: str,
    attrs: Mapping[str, Column] | list[str],
    min_group: int = 2,
) -> DataFrame:
    """Per-attribute agreement inside content-keyed duplicate groups.

    ``attrs`` maps an output name to the comparison expression (pass a
    plain list to compare raw column values; pass
    ``{"transcript": norm_text("transcript")}`` to compare normalized
    ones). Output per group of >= ``min_group`` members:

    ``group_key, n_members, keeper_id, n_<attr>..., consistent``

    where ``n_<attr>`` is the distinct comparison-key count (NULLs
    excluded, as in SQL COUNT(DISTINCT)) and ``consistent`` is true
    iff every attribute has at most one distinct value in the group.
    Single shuffle on the group key; distinct counts aggregate
    map-side first, so group skew is bounded by the dedup key's
    collision rate, not by row count.
    """
    if not isinstance(attrs, Mapping):
        attrs = {a: F.col(a) for a in attrs}
    key = F.col(group_col) if isinstance(group_col, str) else group_col
    aggs = [
        F.count(F.lit(1)).alias("n_members"),
        F.min(id_col).alias("keeper_id"),
    ]
    for name, expr in attrs.items():
        aggs.append(F.countDistinct(expr).alias(f"n_{name}"))
    consistent = F.lit(True)
    for name in attrs:
        consistent = consistent & (F.col(f"n_{name}") <= F.lit(1))
    return (
        df.groupBy(key.alias("group_key"))
        .agg(*aggs)
        .where(F.col("n_members") >= F.lit(min_group))
        .withColumn("consistent", consistent)
    )


def label_agreement(
    df: DataFrame, col_a: Column | str, col_b: Column | str
) -> DataFrame:
    """Chance-corrected agreement between two label columns (Cohen's
    kappa): one row (n, observed, expected, kappa).

    Two annotation passes over the same items — two annotators, or a
    declared label vs a model/heuristic re-derivation — agree partly by
    chance; kappa corrects the raw agreement rate for the agreement the
    two marginal label distributions would produce independently::

        kappa = (po - pe) / (1 - pe)
        po = P(a = b),   pe = sum_c P(a = c) * P(b = c)

    100-TB shape: ONE full-table aggregation to the contingency table
    (groupBy both labels — partial aggregation collapses to
    |A|x|B| cells map-side), then marginals, the diagonal, and the
    chance term are all computed ON that tiny cell table (an inner
    self-join of the two marginal sums on label equality); nothing is
    collected, no per-row state. NULL labels count as their own
    category (groupBy keeps them), matching the SQL oracle's GROUP BY.
    When pe = 1 (both columns constant and equal) kappa is undefined;
    0.0 is returned with observed = 1, matching scikit-learn's
    convention for degenerate tables.
    """
    a = (F.col(col_a) if isinstance(col_a, str) else col_a).alias("a")
    b = (F.col(col_b) if isinstance(col_b, str) else col_b).alias("b")
    cells = df.select(a, b).groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    tot = cells.agg(
        F.sum("cnt").alias("n"),
        F.sum(F.when(F.col("a").eqNullSafe(F.col("b")), F.col("cnt"))
              .otherwise(F.lit(0))).alias("n_agree"),
    )
    ma = cells.groupBy("a").agg(F.sum("cnt").alias("na"))
    mb = cells.groupBy("b").agg(F.sum("cnt").alias("nb"))
    chance = (
        ma.join(mb, ma["a"].eqNullSafe(mb["b"]))
        .agg(F.sum(F.col("na") * F.col("nb")).alias("chance_mass"))
    )
    po = F.col("n_agree") / F.col("n")
    pe = F.coalesce(F.col("chance_mass"), F.lit(0)) / (F.col("n") * F.col("n"))
    return tot.crossJoin(chance).select(
        F.col("n").cast("bigint").alias("n"),
        F.round(po, 6).alias("observed"),
        F.round(pe, 6).alias("expected"),
        F.round(
            F.when(pe < 1.0, (po - pe) / (F.lit(1.0) - pe)).otherwise(0.0), 6
        ).alias("kappa"),
    )
