"""Constant-CFD mining (fd.mine_constant_cfds) and order-dependency
checking (od.check_order_dependencies)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nadeefiler_spark import fd, od


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


# --------------------------------------------------------------------------
# constant CFDs


def test_cfd_tableau_consensus_and_confidence(spark):
    df = spark.createDataFrame(
        [("a1", "p")] * 3 + [("a1", "q")] + [("a2", "r")] * 2 + [("a3", "s")],
        "a string, y string",
    )
    out = fd.mine_constant_cfds(df, "a", "y", min_support=2)
    got = {r["lhs_value"]: r for r in out.collect()}
    assert set(got) == {"a1", "a2"}  # a3 below min_support
    a1 = got["a1"]
    assert (a1["consensus"], a1["support"], a1["n_violations"]) == ("p", 4, 1)
    assert a1["confidence"] == 0.75 and a1["holds"] is False
    a2 = got["a2"]
    assert (a2["consensus"], a2["n_violations"], a2["holds"]) == ("r", 0, True)
    assert a1["lhs"] == "a" and a1["rhs"] == "y"


def test_cfd_tie_breaks_to_smallest_value_nulls_last(spark):
    df = spark.createDataFrame(
        [("t", "q"), ("t", "p"), ("n", None), ("n", "z")],
        "a string, y string",
    )
    got = {r["lhs_value"]: r for r in fd.mine_constant_cfds(df, "a", "y").collect()}
    assert got["t"]["consensus"] == "p"  # count tie -> smallest string
    assert got["n"]["consensus"] == "z"  # real value beats NULL on tie


def test_cfd_min_confidence_threshold(spark):
    df = spark.createDataFrame(
        [("a", "p")] * 9 + [("a", "q")], "a string, y string"
    )
    out = fd.mine_constant_cfds(df, "a", "y", min_confidence=0.9)
    r = out.collect()[0]
    assert r["confidence"] == 0.9 and r["holds"] is True


def test_cfd_composite_lhs_and_part_scope(spark):
    df = spark.createDataFrame(
        [("P1", "u", 1, "x"), ("P1", "u", 1, "x"), ("P1", "u", 1, "y"),
         ("P2", "u", 1, "x")],
        "part string, a string, b int, y string",
    )
    out = fd.mine_constant_cfds(df, ["a", "b"], "y", part_col="part")
    got = {(r["part"], r["lhs_value"]): r for r in out.collect()}
    assert set(got) == {("P1", "u|1"), ("P2", "u|1")}
    assert got[("P1", "u|1")]["n_violations"] == 1
    assert got[("P2", "u|1")]["holds"] is True
    assert got[("P1", "u|1")]["lhs"] == "a,b"


def test_cfd_empty_input(spark):
    df = spark.createDataFrame([], "a string, y string")
    assert fd.mine_constant_cfds(df, "a", "y").count() == 0


# --------------------------------------------------------------------------
# order dependencies


def test_od_holds_and_fails(spark):
    # day determines month-order (holds); day does not order the id column
    rows = [(d, d // 10, (7 * d) % 30) for d in range(30)]
    df = spark.createDataFrame(rows, "day int, decade int, scrambled int")
    out = od.check_order_dependencies(
        df, [("day", "decade"), ("day", "scrambled")]
    )
    got = {r["ordered_col"]: r for r in out.collect()}
    assert got["decade"]["holds"] is True
    assert got["decade"]["n_groups"] == 30
    assert got["scrambled"]["holds"] is False
    assert got["scrambled"]["violating_pairs"] > 0


def test_od_interval_overlap_semantics(spark):
    # A=1 -> B in [1,5]; A=2 -> B in [3,8]: overlapping intervals violate
    df = spark.createDataFrame(
        [(1, 1), (1, 5), (2, 3), (2, 8)], "a int, b int"
    )
    r = od.check_order_dependencies(df, [("a", "b")]).collect()[0]
    assert r["violating_pairs"] == 1 and r["holds"] is False
    # equal boundary does NOT violate (ties allowed in non-decreasing order)
    df2 = spark.createDataFrame(
        [(1, 1), (1, 3), (2, 3), (2, 8)], "a int, b int"
    )
    r2 = od.check_order_dependencies(df2, [("a", "b")]).collect()[0]
    assert r2["violating_pairs"] == 0 and r2["holds"] is True


def test_od_part_scoped(spark):
    df = spark.createDataFrame(
        [("P1", 1, 10), ("P1", 2, 20), ("P2", 1, 20), ("P2", 2, 10)],
        "part string, a int, b int",
    )
    out = od.check_order_dependencies(df, [("a", "b")], part_col="part")
    got = {r["part"]: r for r in out.collect()}
    assert got["P1"]["holds"] is True
    assert got["P2"]["holds"] is False


def test_od_empty_pairs_and_empty_input(spark):
    df = spark.createDataFrame([], "a int, b int")
    empty = od.check_order_dependencies(df, [])
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == [
        "on_col", "ordered_col", "n_groups", "violating_pairs", "holds",
    ]
    r = od.check_order_dependencies(df, [("a", "b")]).collect()[0]
    assert r["n_groups"] == 0 and r["holds"] is True


def test_od_candidate_guard_excludes_high_ndv(spark):
    df = spark.createDataFrame(
        [(i, i % 3) for i in range(500)], "id int, code int"
    )
    assert od.candidate_on(df, ["id", "code"], max_ndv=50) == ["code"]
