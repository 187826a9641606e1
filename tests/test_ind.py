"""IND mining: exact containment on planted data (full, partial, empty,
null-LHS), and the HLL prune bound keeping/dropping the right pairs."""

from __future__ import annotations

from nadeefiler_spark.ind import IndCandidate, mine_inds, prune_candidates


def _frames(spark):
    child = spark.createDataFrame(
        [(1,), (2,), (3,), (7,), (None,), (2,)], "fk int"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,), (4,), (5,)], "pk int")
    empty = spark.createDataFrame([], "k int")
    return child, parent, empty


def test_mine_inds_full_partial_empty_and_nulls(spark):
    child, parent, empty = _frames(spark)
    out = mine_inds(
        [
            # partial: child {1,2,3,7} vs parent {1..5} -> 3/4
            IndCandidate("child", child, "fk", "parent", parent, "pk"),
            # full: the subset direction among contained values only
            IndCandidate("parent", parent, "pk", "parent", parent, "pk"),
            # empty LHS: trivially holds, containment 1.0
            IndCandidate("empty", empty, "k", "parent", parent, "pk"),
        ],
        min_containment=1.0,
    )
    rows = {r["lhs"]: r for r in out.collect()}
    r = rows["child.fk"]
    # NULL is ignored and the duplicate 2 counts once
    assert (r["n_lhs"], r["n_contained"]) == (4, 3)
    assert abs(r["containment"] - 0.75) < 1e-12 and r["holds"] is False
    r = rows["parent.pk"]
    assert (r["n_lhs"], r["n_contained"], r["holds"]) == (5, 5, True)
    r = rows["empty.k"]
    assert (r["n_lhs"], r["containment"], r["holds"]) == (0, 1.0, True)


def test_mine_inds_approximate_threshold(spark):
    child, parent, _ = _frames(spark)
    out = mine_inds(
        [IndCandidate("child", child, "fk", "parent", parent, "pk")],
        min_containment=0.7,
    )
    assert out.first()["holds"] is True


def test_prune_candidates_drops_refutable_pairs(spark):
    # lhs has 100 distinct values, rhs only 5: containment <= 0.05,
    # which no slack rescues against min_containment=1.0
    wide = spark.createDataFrame([(i,) for i in range(100)], "v int")
    narrow = spark.createDataFrame([(i,) for i in range(5)], "k int")
    doomed = IndCandidate("wide", wide, "v", "narrow", narrow, "k")
    viable = IndCandidate("narrow", narrow, "k", "wide", wide, "v")
    kept = prune_candidates([doomed, viable], min_containment=1.0)
    assert kept == [viable]
    # a loose threshold keeps both
    kept = prune_candidates([doomed, viable], min_containment=0.01)
    assert kept == [doomed, viable]
