"""Rule protocol — the Spark-native analog of nadeefiler's profiler plug-ins.

The reference validates a plug-in contract at load time
(``/root/reference/profilers/worker.js:197-222``): a module exports
``onFinish`` plus one of ``onFile | onTuple | onValue``, optionally a
custom input ``selector`` and a ``resultsCatcher`` sink. Here a rule is an
object that, given a :class:`RuleContext` (its "selector"), returns a
violations DataFrame (its "resultsCatcher" writes); expression-only rules
compile to Catalyst columns and never touch Python rows.

Cascade semantics (``/root/reference/profilers/config.js:10-20``,
``api/hooks/amqp.js:40-42``: profilers form a tree, children read their
parents' results) map to ``depends_on`` + :func:`topo_sort`; a dependent
rule reads the upstream stage's output table from the context.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VIOLATION_COLS = ("part", "rule", "clip_id", "detail")


@dataclass
class RuleContext:
    """Inputs a rule may select from (reference: the ``selector`` hook)."""

    spark: SparkSession
    clips: DataFrame
    refs: Optional[DataFrame] = None
    decoded: Optional[DataFrame] = None  # shared one-pass audio decode facts
    profile_summary: Optional[DataFrame] = None
    profile_hist: Optional[DataFrame] = None
    baseline_hist: Optional[DataFrame] = None  # drift comparison side
    key_col: str = "clip_id"
    part_col: str = "part"


@dataclass
class Rule:
    """Base rule. Subclasses override :meth:`violations`."""

    name: str = ""
    stage: str = "constraints"  # profile | constraints | audio | drift | semantic
    depends_on: tuple[str, ...] = field(default_factory=tuple)

    def violations(self, ctx: RuleContext) -> DataFrame:
        raise NotImplementedError

    def predicate(self, ctx: RuleContext):
        """Optional fast path: return ``(violation_pred, detail)`` Columns
        evaluated per clips row. Rules that implement this are folded by
        the engine into ONE shared scan per stage (the row-rule analog of
        the profiler's single-pass agg; reference runs each profiler as a
        separate pass over the dataset, profilers/worker.js:121-144).
        Return None (default) for rules needing joins/aggregation.
        """
        return None

    def prepare(self, df: DataFrame, ctx: RuleContext) -> DataFrame:
        """Optional staging step for the predicate fast path: append
        helper columns the :meth:`predicate` Columns reference (e.g. a
        materialized header slice), keeping each projection small enough
        for whole-stage codegen — a flat expression tree re-derived per
        reference can exceed Janino's 64 KB method limit and silently
        drop the whole shared scan to interpreted eval. The engine
        chains every folded rule's ``prepare`` over the shared scan, so
        helper columns must be uniquely named (``__<rule>``-prefixed by
        convention); they never reach the violations output (the fold
        projects only part/rule/clip_id/detail). Default: no staging."""
        return df

    @staticmethod
    def shape(df: DataFrame, ctx: RuleContext, rule_name: str, detail) -> DataFrame:
        """Project any row source onto the canonical violations schema."""
        return df.select(
            F.col(ctx.part_col).cast("string").alias("part"),
            F.lit(rule_name).alias("rule"),
            F.col(ctx.key_col).cast("string").alias("clip_id"),
            detail.cast("string").alias("detail"),
        )


def topo_sort(rules: list[Rule]) -> list[Rule]:
    """Stable topological order over ``depends_on`` (cascade tree analog).

    Duplicate names are an error, not a silent drop: the name keys the
    violations output, staged-column namespaces, and ``depends_on``
    edges, so two same-named instances would be indistinguishable
    downstream (and the visit-marking here would quietly skip the
    second one — ADVICE r4)."""
    by_name = {r.name: r for r in rules}
    if len(by_name) != len(rules):
        from collections import Counter

        dupes = sorted(
            n for n, c in Counter(r.name for r in rules).items() if c > 1
        )
        raise ValueError(
            f"duplicate rule name(s) {dupes}: give each rule instance a "
            "unique name (it keys violations rows and staged columns)"
        )
    seen: dict[str, int] = {}
    out: list[Rule] = []

    def visit(r: Rule, chain: tuple[str, ...]) -> None:
        state = seen.get(r.name)
        if state == 2:
            return
        if state == 1:
            raise ValueError(f"rule dependency cycle: {' -> '.join(chain + (r.name,))}")
        seen[r.name] = 1
        for dep in r.depends_on:
            if dep in by_name:
                visit(by_name[dep], chain + (r.name,))
        seen[r.name] = 2
        out.append(r)

    for r in rules:
        visit(r, ())
    return out
