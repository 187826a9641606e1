"""UCC/key mining: exact dup accounting on planted data (unique,
duplicated, null-bearing, empty), HLL prune keep/drop, and level-wise
minimal-key search with apriori superset pruning."""

from __future__ import annotations

from nadeefiler_spark.ucc import UccCandidate, mine_keys, mine_uccs, prune_candidates


def _frame(spark):
    # (a, b): a alone has dups and a null; (a, b) is unique but b has a
    # null row, so it is unique-but-not-key; c is a clean key.
    return spark.createDataFrame(
        [
            (1, 10, 100),
            (1, 20, 101),
            (2, 30, 102),
            (None, 40, 103),
            (2, None, 104),
        ],
        "a int, b int, c int",
    )


def test_mine_uccs_dup_null_and_key_verdicts(spark):
    df = _frame(spark)
    out = mine_uccs(
        [
            UccCandidate("t", df, ("a",)),
            UccCandidate("t", df, ("a", "b")),
            UccCandidate("t", df, ("c",)),
        ]
    )
    rows = {r["cols"]: r for r in out.collect()}
    r = rows["a"]
    # groups: {1:2, 2:2, NULL:1} -> 3 groups, 2 dup rows, 1 null row
    assert (r["n_rows"], r["n_nulls"], r["n_groups"], r["dup_rows"]) == (5, 1, 3, 2)
    assert r["is_unique"] is False and r["is_key"] is False
    r = rows["a,b"]
    # all 5 (a,b) pairs distinct, but 2 rows carry a NULL component
    assert (r["n_groups"], r["dup_rows"], r["n_nulls"]) == (5, 0, 2)
    assert r["is_unique"] is True and r["is_key"] is False
    r = rows["c"]
    assert r["is_unique"] is True and r["is_key"] is True


def test_mine_uccs_empty_input_trivially_holds(spark):
    empty = spark.createDataFrame([], "a int")
    r = mine_uccs([UccCandidate("e", empty, ("a",))]).first()
    assert (r["n_rows"], r["n_nulls"], r["n_groups"], r["dup_rows"]) == (0, 0, 0, 0)
    assert r["is_unique"] is True and r["is_key"] is True


def test_mine_uccs_dup_tolerance(spark):
    df = _frame(spark)
    r = mine_uccs([UccCandidate("t", df, ("a",))], max_dup_rate=0.5).first()
    # 2 dup rows of 5 <= 0.5 * 5 -> approximately unique, but the NULL
    # still blocks key status
    assert r["is_unique"] is True and r["is_key"] is False


def test_prune_candidates_refutes_low_ndv(spark):
    df = spark.createDataFrame([(i, i % 3) for i in range(300)], "u int, l int")
    unique_c = UccCandidate("t", df, ("u",))
    low_c = UccCandidate("t", df, ("l",))
    kept = prune_candidates([unique_c, low_c], max_dup_rate=0.0)
    assert kept == [unique_c]
    # a loose tolerance keeps both
    kept = prune_candidates([unique_c, low_c], max_dup_rate=0.999)
    assert kept == [unique_c, low_c]


def test_mine_keys_minimal_only(spark):
    # u is a key; (l, m) is a minimal composite key; any superset of u
    # must never be exact-checked (apriori pruning)
    df = spark.createDataFrame(
        [(i, i % 10, i // 10) for i in range(100)], "u int, l int, m int"
    )
    out = mine_keys(df, ["u", "l", "m"], name="t", max_arity=2)
    rows = {r["cols"]: r for r in out.collect()}
    assert rows["u"]["is_key"] is True
    assert rows["l,m"]["is_key"] is True
    assert "u,l" not in rows and "u,m" not in rows  # supersets of key u
    # singletons l, m are HLL-refuted (ndv 10 vs 100 rows) -> no row
    assert "l" not in rows and "m" not in rows
