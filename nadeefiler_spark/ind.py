"""Inclusion-dependency (IND) discovery: for candidate column pairs
A ⊆ B, the fraction of A's distinct non-null values present in B.

Reference parity: nadeefiler's referential rule family checks ONE
declared link per rule (the reference models links per-dataset and
resolves them with per-row lookups, api/models/Dataset.js /
TupleController.js); IND *mining* is the discovery counterpart — the
same relationship, measured over every candidate pair so undeclared
foreign keys and broken ones surface from the data. Together with
``fd.mine_fds`` this fills the classical data-profiling pair
(FDs + INDs) the reference's ``fdminer`` cascade slot gestures at
(profilers/config.js:10-20).

Scale story (10^12 rows): each side collapses to its DISTINCT value set
first — one shuffle each with map-side partial aggregation, so shuffle
bytes ∝ NDV, not row count. The containment join then joins two
distinct sets; AQE broadcasts the small side (dimension-key sets are
tiny). Every candidate pair unions into ONE plan → one Spark job, one
result row per pair, nothing row-collected on the driver. High-NDV ×
high-NDV pairs are the expensive case — :func:`prune_candidates` drops
pairs a cheap HLL bound already refutes before any exact work.

NULL semantics match SQL foreign keys: NULL LHS values are ignored
(a null reference violates REQUIRED, not referential, rules). An empty
LHS set trivially holds with containment 1.0.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class IndCandidate:
    """One A ⊆ B hypothesis: (name, df, col) for each side. Names are
    labels for the result rows (DataFrames carry no table name). The
    two columns must be join-comparable types."""

    lhs_name: str
    lhs_df: DataFrame
    lhs_col: str
    rhs_name: str
    rhs_df: DataFrame
    rhs_col: str

    @property
    def lhs(self) -> str:
        return f"{self.lhs_name}.{self.lhs_col}"

    @property
    def rhs(self) -> str:
        return f"{self.rhs_name}.{self.rhs_col}"


def prune_candidates(
    cands: list[IndCandidate],
    min_containment: float = 1.0,
    slack: float = 0.15,
) -> list[IndCandidate]:
    """Drop pairs a cardinality bound already refutes: containment can
    never exceed ndv(B)/ndv(A), so if even the optimistic HLL estimate
    (inflated by ``slack`` to absorb sketch error) stays below
    ``min_containment``, the exact measurement is pointless. One
    approx_count_distinct scan per distinct (df, col) side."""
    ndv: dict[tuple[int, str], int] = {}
    for c in cands:
        for df, col in ((c.lhs_df, c.lhs_col), (c.rhs_df, c.rhs_col)):
            key = (id(df), col)
            if key not in ndv:
                ndv[key] = df.agg(F.approx_count_distinct(col)).first()[0]
    kept = []
    for c in cands:
        n_a = ndv[(id(c.lhs_df), c.lhs_col)]
        n_b = ndv[(id(c.rhs_df), c.rhs_col)]
        bound = 1.0 if n_a == 0 else (n_b / n_a) * (1.0 + slack)
        if bound >= min_containment:
            kept.append(c)
    return kept


def mine_inds(
    cands: list[IndCandidate],
    min_containment: float = 1.0,
) -> DataFrame:
    """Measure every candidate IND exactly.

    Returns one row per pair:
      (lhs, rhs, n_lhs, n_contained, containment, holds)
    where n_lhs is A's distinct non-null value count, n_contained how
    many of those exist in B, containment = n_contained / n_lhs
    (1.0 when A is empty), and holds = containment >= min_containment.
    """
    if not cands:
        raise ValueError("mine_inds needs at least one candidate")
    branches = []
    for c in cands:
        a = (
            c.lhs_df.select(F.col(c.lhs_col).alias("__v"))
            .where(F.col("__v").isNotNull())
            .distinct()
        )
        b = (
            c.rhs_df.select(F.col(c.rhs_col).alias("__v"))
            .where(F.col("__v").isNotNull())
            .distinct()
            .withColumn("__hit", F.lit(1))
        )
        branches.append(
            a.join(b, "__v", "left").agg(
                F.lit(c.lhs).alias("lhs"),
                F.lit(c.rhs).alias("rhs"),
                F.count(F.lit(1)).alias("n_lhs"),
                F.coalesce(F.sum("__hit"), F.lit(0)).alias("n_contained"),
            )
        )
    out = branches[0]
    for br in branches[1:]:
        out = out.unionByName(br)
    containment = F.when(F.col("n_lhs") == 0, F.lit(1.0)).otherwise(
        F.col("n_contained") / F.col("n_lhs")
    )
    return out.select(
        "lhs",
        "rhs",
        "n_lhs",
        "n_contained",
        containment.alias("containment"),
        (containment >= F.lit(min_containment)).alias("holds"),
    )
