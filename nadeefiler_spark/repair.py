"""Repair suggestions for FD violations: for every group violating
X → Y, the majority Y value and the rows that would change — NADEEF's
repair phase (the system nadeefiler descends from pairs every detected
violation with a candidate fix; the reference repo stops at detection,
so this completes the detect → explain → repair arc that
``fd.mine_fds`` and ``rules/denial.py`` open).

Semantics: within each X-group holding more than one distinct Y, the
suggested value is the modal Y (most frequent; ties break to the
SMALLEST value so the suggestion is deterministic — the same rule both
the tests and the SQL oracle encode). Rows already carrying the modal
value are not reported; NULL Y values count as a candidate value like
any other (repairing TO the majority may mean filling a null, and a
majority-null group suggests nulling — callers filter if they disagree).

Scale story (10^12 rows): one groupBy on (X, Y) with map-side partial
counts (shuffle ∝ distinct (X, Y) pairs, not rows), a window over the
tiny per-group value histogram to pick the mode, and ONE hash join of
the violating-group modes (broadcast when they fit — violations are
the minority by assumption) back to the row scan to emit per-row
suggestions. Nothing driver-side, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def suggest_fd_repairs(
    df: DataFrame,
    lhs: str | list[str],
    rhs: str,
    id_col: str,
) -> DataFrame:
    """One row per repairable cell: (id, lhs value(s), current,
    suggested, n_support, group_size) for every row whose ``rhs``
    differs from its ``lhs``-group's modal value (groups with a single
    distinct rhs are clean and produce nothing). ``n_support`` is the
    modal value's count, ``group_size`` the group's row count. ``lhs``
    may be one column or a list (composite FD determinant); the group
    key is the struct of all of them, NULL-safe."""
    lhs_cols = [lhs] if isinstance(lhs, str) else list(lhs)
    key = F.struct(*[F.col(c) for c in lhs_cols])
    counts = df.groupBy(
        key.alias("__lhs"), F.col(rhs).alias("__val")
    ).agg(F.count(F.lit(1)).alias("__cnt"))
    w = Window.partitionBy("__lhs")
    # mode per group: highest count, ties to smallest value (NULLs sort
    # last so a real value wins a tie against NULL)
    ranked = counts.withColumn(
        "__rk",
        F.row_number().over(
            w.orderBy(F.col("__cnt").desc(), F.col("__val").asc_nulls_last())
        ),
    ).withColumn("__nvals", F.count(F.lit(1)).over(w)).withColumn(
        "__gsize", F.sum("__cnt").over(w)
    )
    modes = ranked.where((F.col("__rk") == 1) & (F.col("__nvals") > 1)).select(
        "__lhs",
        F.col("__val").alias("suggested"),
        F.col("__cnt").alias("n_support"),
        F.col("__gsize").alias("group_size"),
    )
    # violating groups are the minority: broadcast their modes onto the
    # row scan (struct equality is NULL-safe per field under <=>, so
    # NULL-component groups repair too)
    rows = df.select(
        F.col(id_col).alias("id"),
        key.alias("__lhs"),
        F.col(rhs).alias("current"),
    )
    joined = rows.join(
        F.broadcast(modes), rows["__lhs"].eqNullSafe(modes["__lhs"])
    ).drop(modes["__lhs"])
    return joined.where(
        ~F.col("current").eqNullSafe(F.col("suggested"))
    ).select(
        "id",
        *[F.col(f"__lhs.{c}").alias(c) for c in lhs_cols],
        "current",
        "suggested",
        "n_support",
        "group_size",
    )


def apply_repairs(
    df: DataFrame,
    repairs: DataFrame,
    rhs: str,
    id_col: str,
) -> DataFrame:
    """Patch ``rhs`` with each row's suggested value — the apply half of
    the detect → suggest → repair → re-validate arc. Rows absent from
    ``repairs`` pass through untouched; a NULL suggestion is applied
    (majority-null groups repair TO null), which is why matching uses an
    explicit hit flag rather than a NULL-coalesce. The patch side is
    broadcast: repairs are the minority by assumption, and the output
    preserves ``df``'s column order and types.
    """
    patch = repairs.select(
        F.col("id").alias("__rid"),
        F.col("suggested").alias("__sugg"),
        F.lit(True).alias("__hit"),
    )
    joined = df.join(
        F.broadcast(patch), df[id_col] == F.col("__rid"), "left"
    )
    fixed = F.when(F.col("__hit"), F.col("__sugg")).otherwise(F.col(rhs))
    return joined.select(
        *[fixed.alias(c) if c == rhs else F.col(c) for c in df.columns]
    )
