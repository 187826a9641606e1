"""Instance-based column matching (operators/colmatch.py)."""

import hashlib

from pyspark.sql import functions as F

from nadeefiler_spark.operators import colmatch


def _old(spark):
    return spark.createDataFrame(
        [
            (1, "alice", "red", 10),
            (2, "bob", "green", 20),
            (3, "carol", "blue", 30),
            (4, "dave", "red", 40),
        ],
        "pk int, name string, color string, score int",
    )


def _new(spark):
    # renamed snapshot: name->full_name, color->hue; score dropped;
    # one row removed and one value changed
    return spark.createDataFrame(
        [
            (1, "alice", "red"),
            (2, "bob", "green"),
            (3, "carol", "purple"),
        ],
        "pk2 int, full_name string, hue string",
    )


def test_column_match_recovers_renames(spark):
    got = colmatch.column_match(
        _old(spark), _new(spark), ["name", "color", "score"], ["full_name", "hue"]
    )
    best = {r["col_old"]: r for r in got.where(F.col("rank") == 1).collect()}
    assert best["name"]["col_new"] == "full_name"
    assert best["color"]["col_new"] == "hue"
    assert "score" not in best  # zero overlap -> no candidate emitted
    # hand-computed: name ndv 4 vs 3, common 3 -> J = 3/4
    r = best["name"]
    assert (r["ndv_old"], r["ndv_new"], r["n_common"]) == (4, 3, 3)
    assert abs(r["jaccard"] - 0.75) < 1e-9
    # color: old {red,green,blue} new {red,green,purple} -> J = 2/4
    r = best["color"]
    assert (r["ndv_old"], r["ndv_new"], r["n_common"]) == (3, 3, 2)
    assert abs(r["jaccard"] - 0.5) < 1e-9


def test_column_match_min_jaccard_filters(spark):
    got = colmatch.column_match(
        _old(spark), _new(spark), ["name", "color"], ["full_name", "hue"],
        min_jaccard=0.6,
    )
    rows = got.collect()
    assert {r["col_old"] for r in rows} == {"name"}


def test_melt_sample_hex_matches_python_md5(spark):
    """The KMV-style value filter must keep exactly the values whose
    md5 hex (hashlib-computed) sorts below the threshold, on both
    columns identically."""
    df = _old(spark)
    kept = {
        (r["col"], r["value"])
        for r in colmatch.melt_distinct(df, ["name", "color"], sample_hex="8").collect()
    }
    expect = set()
    for col in ("name", "color"):
        for r in df.select(col).distinct().collect():
            v = r[col]
            if hashlib.md5(v.encode()).hexdigest() < "8":
                expect.add((col, v))
    assert kept == expect and kept  # non-degenerate: something survives


def test_column_match_sampled_still_ranks_rename_first(spark):
    # widen the corpus so a half-space sample keeps enough values
    rows = [(i, f"user{i}", ["red", "green", "blue"][i % 3]) for i in range(60)]
    old = spark.createDataFrame(rows, "pk int, name string, color string")
    new = (
        old.where(F.col("pk") % 5 != 0)
        .select(
            F.col("pk").alias("pk2"),
            F.col("name").alias("full_name"),
            F.col("color").alias("hue"),
        )
    )
    got = colmatch.column_match(
        old, new, ["name", "color"], ["full_name", "hue"], sample_hex="8"
    )
    best = {r["col_old"]: r["col_new"] for r in got.where(F.col("rank") == 1).collect()}
    assert best == {"name": "full_name", "color": "hue"}
