"""FD repair suggestions: modal value per violating group, deterministic
tie-break, NULL handling, clean groups silent."""

from __future__ import annotations

from nadeefiler_spark.repair import suggest_fd_repairs


def test_majority_repair_and_clean_groups_silent(spark):
    df = spark.createDataFrame(
        [
            (1, "20095", "Hamburg"), (2, "20095", "Hamburg"),
            (3, "20095", "Altona"),                      # loses 2:1
            (4, "10115", "Berlin"), (5, "10115", "Berlin"),  # clean
            (6, "80331", None), (7, "80331", "Munich"),
            (8, "80331", "Munich"),                      # null loses 2:1
        ],
        "id int, zip string, city string",
    )
    got = {r["id"]: r for r in suggest_fd_repairs(df, "zip", "city", "id").collect()}
    assert set(got) == {3, 6}
    r = got[3]
    assert (r["current"], r["suggested"]) == ("Altona", "Hamburg")
    assert (r["n_support"], r["group_size"]) == (2, 3)
    assert got[6]["current"] is None and got[6]["suggested"] == "Munich"


def test_tie_breaks_to_smallest_value(spark):
    df = spark.createDataFrame(
        [(1, "z", "b"), (2, "z", "a")], "id int, k string, v string"
    )
    got = {r["id"]: r for r in suggest_fd_repairs(df, "k", "v", "id").collect()}
    # 1-1 tie: 'a' wins (smallest), so only the 'b' row is repairable
    assert set(got) == {1} and got[1]["suggested"] == "a"


def test_majority_null_suggests_null(spark):
    df = spark.createDataFrame(
        [(1, "k", None), (2, "k", None), (3, "k", "x")],
        "id int, k string, v string",
    )
    got = {r["id"]: r for r in suggest_fd_repairs(df, "k", "v", "id").collect()}
    assert set(got) == {3} and got[3]["suggested"] is None


def test_null_lhs_group_repairs(spark):
    df = spark.createDataFrame(
        [(1, None, "a"), (2, None, "a"), (3, None, "b")],
        "id int, k string, v string",
    )
    got = {r["id"]: r for r in suggest_fd_repairs(df, "k", "v", "id").collect()}
    assert set(got) == {3} and got[3]["suggested"] == "a"


def test_composite_lhs(spark):
    df = spark.createDataFrame(
        [
            (1, "c1", "d1", 10.0), (2, "c1", "d1", 10.0), (3, "c1", "d1", 99.0),
            (4, "c1", "d2", 5.0),  # different date -> different group, clean
        ],
        "id int, cust string, day string, total double",
    )
    got = {
        r["id"]: r
        for r in suggest_fd_repairs(df, ["cust", "day"], "total", "id").collect()
    }
    assert set(got) == {3}
    r = got[3]
    assert (r["cust"], r["day"], r["current"], r["suggested"]) == ("c1", "d1", 99.0, 10.0)


def test_apply_repairs_converges_and_preserves(spark):
    from nadeefiler_spark.repair import apply_repairs, suggest_fd_repairs

    df = spark.createDataFrame(
        [
            (1, "x", "a"), (2, "x", "a"), (3, "x", "b"),   # mode a
            (4, "y", None), (5, "y", None), (6, "y", "c"), # mode NULL
            (7, "z", "k"),                                  # clean
        ],
        "id bigint, lhs string, rhs string",
    )
    rep = suggest_fd_repairs(df, "lhs", "rhs", "id")
    out = apply_repairs(df, rep, "rhs", "id")
    got = {r["id"]: r["rhs"] for r in out.collect()}
    # violating rows take the modal value — including repair TO null
    assert got == {1: "a", 2: "a", 3: "a", 4: None, 5: None, 6: None, 7: "k"}
    assert out.columns == df.columns
    # convergence: re-suggesting on the patched table finds nothing
    assert suggest_fd_repairs(out, "lhs", "rhs", "id").isEmpty()
