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


def test_od_check_guards_high_ndv_ordering_column(spark):
    """A row-scale ordering column must not reach the global
    single-task window sort (VERDICT r4 #6): check_order_dependencies
    raises with the offending column named; part_col scoping, a raised
    limit, and the explicit opt-out all still run."""
    import pytest

    df = spark.createDataFrame(
        [(i, i % 3, i % 2) for i in range(500)],
        "id int, code int, part int",
    )
    with pytest.raises(ValueError, match="max_on_ndv.*id"):
        od.check_order_dependencies(df, [("id", "code")], max_on_ndv=50)
    # bounded ordering column passes under the same limit
    r = od.check_order_dependencies(df, [("code", "id")], max_on_ndv=50)
    assert r.count() == 1
    # part_col distributes the sort -> guard does not apply
    assert (
        od.check_order_dependencies(
            df, [("id", "code")], part_col="part", max_on_ndv=50
        ).count()
        == 2
    )
    # explicit opt-out
    assert (
        od.check_order_dependencies(
            df, [("id", "code")], max_on_ndv=None
        ).count()
        == 1
    )


# --------------------------------------------------------------------------
# sequential dependencies


def test_sequential_gap_bounds(spark):
    rows = [("u1", 0, 0.0), ("u1", 1, 10.0), ("u1", 2, 20.0), ("u1", 3, 2020.0),
            ("u2", 0, 5.0)]
    df = spark.createDataFrame(rows, "u string, seq int, v double")
    got = {
        r["group"]: r
        for r in od.check_sequential(df, "u", "seq", "v", lo=0, hi=1800).collect()
    }
    u1 = got["u1"]
    assert (u1["n_rows"], u1["n_gaps"], u1["violating_gaps"]) == (4, 3, 1)
    assert (u1["min_gap"], u1["max_gap"]) == (10.0, 2000.0)
    assert u1["holds"] is False
    u2 = got["u2"]  # single-row group: no gaps, trivially holds
    assert (u2["n_gaps"], u2["min_gap"], u2["holds"]) == (0, None, True)


def test_sequential_negative_gap_violates_lo(spark):
    df = spark.createDataFrame(
        [("u", 0, 100.0), ("u", 1, 50.0)], "u string, seq int, v double"
    )
    r = od.check_sequential(df, "u", "seq", "v", lo=0).collect()[0]
    assert r["violating_gaps"] == 1 and r["min_gap"] == -50.0


def test_sequential_null_values_never_violate(spark):
    df = spark.createDataFrame(
        [("u", 0, 1.0), ("u", 1, None), ("u", 2, 2.0)],
        "u string, seq int, v double",
    )
    r = od.check_sequential(df, "u", "seq", "v", lo=0, hi=10).collect()[0]
    # both gaps touching the NULL are NULL -> neither counted nor violating
    assert r["n_gaps"] == 0 and r["violating_gaps"] == 0 and r["holds"] is True


# --------------------------------------------------------------------------
# mutual information


def test_mutual_info_deterministic_and_independent(spark):
    from nadeefiler_spark.profiler import mutual_info

    import math

    # y = x % 2 (deterministic); z independent of x by construction
    rows = [(x, x % 2, z) for x in range(4) for z in range(2) for _ in range(3)]
    df = spark.createDataFrame(rows, "x int, y int, z int")
    got = {
        (r["col_x"], r["col_y"]): r
        for r in mutual_info(df, [("x", "y"), ("x", "z")]).collect()
    }
    dep = got[("x", "y")]
    assert dep["nmi"] == 1.0
    assert dep["mi"] == dep["h_y"] == round(math.log(2), 6)
    assert (dep["ndv_x"], dep["ndv_y"], dep["n_rows"]) == (4, 2, 24)
    ind = got[("x", "z")]
    assert ind["mi"] == 0.0 and ind["nmi"] == 0.0
    assert ind["h_x"] == round(math.log(4), 6)


def test_mutual_info_constant_column_and_nulls(spark):
    from nadeefiler_spark.profiler import mutual_info

    df = spark.createDataFrame(
        [(1, "k", None), (2, "k", "a"), (1, "k", None), (2, "k", "a")],
        "x int, const string, y string",
    )
    got = {
        (r["col_x"], r["col_y"]): r
        for r in mutual_info(df, [("x", "const"), ("x", "y")]).collect()
    }
    c = got[("x", "const")]
    assert c["h_y"] == 0.0 and c["nmi"] is None  # no entropy to normalize by
    n = got[("x", "y")]
    assert n["ndv_y"] == 2  # NULL forms a category
    assert n["nmi"] == 1.0  # x=1 <-> NULL, x=2 <-> 'a': deterministic
