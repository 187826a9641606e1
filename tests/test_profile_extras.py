"""Benford first-digit profile (outliers.benford) and JSON key profile
(profiler.json_profile)."""

from __future__ import annotations

import math

from nadeefiler_spark.outliers import benford
from nadeefiler_spark.profiler import json_profile


def test_benford_digit_extraction_and_shares(spark):
    df = spark.createDataFrame(
        [(1.5,), (0.19,), (2000.0,), (-3.2,), (0.0,), (None,)],
        "x double",
    )
    rows = {r["digit"]: r for r in benford(df, ["x"]).collect()}
    # 0.0 and NULL carry no significant digit; 0.19 leads with 1
    assert set(rows) == {1, 2, 3}
    assert rows[1]["n"] == 2 and rows[1]["p_obs"] == 0.5
    assert rows[2]["n"] == 1 and rows[3]["n"] == 1
    assert rows[1]["p_benford"] == round(math.log10(2), 6)
    assert all(r["col"] == "x" for r in rows.values())


def test_benford_multi_column_melt(spark):
    df = spark.createDataFrame([(12.0, 900)], "a double, b int")
    rows = {(r["col"], r["digit"]) for r in benford(df, ["a", "b"]).collect()}
    assert rows == {("a", 1), ("b", 9)}


def test_json_profile_key_stats(spark):
    df = spark.createDataFrame(
        [
            ('{"a": 1, "b": "x"}',),
            ('{"a": 2.5, "b": true}',),
            ('{"a": null}',),
            ("not json",),
            (None,),
        ],
        "body string",
    )
    got = {r["key"]: r for r in json_profile(df, "body").collect()}
    assert set(got) == {"a", "b"}  # malformed/NULL docs contribute nothing
    a = got["a"]
    assert (a["n_entries"], a["n_null"], a["ndv"]) == (3, 1, 2)
    assert (a["n_int"], a["n_num"], a["n_bool"]) == (1, 1, 0)
    assert a["max_len"] == 3  # "2.5"
    b = got["b"]
    assert (b["n_entries"], b["n_null"], b["ndv"]) == (2, 0, 2)
    assert b["n_bool"] == 1 and b["max_len"] == 4  # "true"


def test_json_profile_all_null_key(spark):
    df = spark.createDataFrame([('{"n": null}',), ('{"n": null}',)], "b string")
    r = json_profile(df, "b").collect()[0]
    assert (r["n_entries"], r["n_null"], r["ndv"]) == (2, 2, 0)
    assert (r["n_int"], r["n_num"], r["n_bool"]) == (0, 0, 0)
    assert r["max_len"] is None


def test_merge_profiles_equals_direct_union_profile(spark):
    from pyspark.sql import functions as F

    from nadeefiler_spark.profiler import (
        ProfileConfig, merge_profiles, profile_summary,
    )

    df = spark.createDataFrame(
        [(i, float(i * i) if i % 5 else None, f"s{i % 7}") for i in range(40)],
        "id int, x double, s string",
    ).withColumn("part", F.lit("*"))
    cfg = ProfileConfig(exact_ndv=True, part_col="part")
    a = profile_summary(df.where("id < 15"), cfg)
    b = profile_summary(df.where("id >= 15"), cfg)
    merged = {r["key"]: r for r in merge_profiles(a, b).collect()}
    direct = {r["key"]: r for r in profile_summary(df, cfg).collect()}
    for key in ("id", "x", "s"):
        m, d = merged[key], direct[key]
        assert (m["n_rows"], m["n_nulls"]) == (d["n_rows"], d["n_nulls"])
        assert (m["min"], m["max"]) == (d["min"], d["max"])
        for stat in ("mean", "stddev", "avg_len"):
            if d[stat] is None:
                assert m[stat] is None
            else:
                assert abs(m[stat] - d[stat]) < 1e-9
        # ndv_ub is an upper bound, tight when sides are disjoint
        assert m["ndv_ub"] >= d["ndv"]
    assert merged["id"]["ndv_ub"] == direct["id"]["ndv"]  # ids disjoint


def test_merge_profiles_one_sided_key_passes_through(spark):
    from nadeefiler_spark.profiler import SUMMARY_SCHEMA, merge_profiles

    a = spark.createDataFrame(
        [("*", "only_a", 10, 1, 5, "1", "9", 4.0, 2.0, None)], SUMMARY_SCHEMA
    )
    b = spark.createDataFrame([], SUMMARY_SCHEMA)
    r = merge_profiles(a, b).collect()[0]
    assert (r["n_rows"], r["ndv_ub"], r["min"], r["max"]) == (10, 5, "1", "9")
    assert r["mean"] == 4.0 and r["stddev"] == 2.0


def test_embedding_qc_counts_and_mode(spark):
    from nadeefiler_spark.profiler import embedding_qc

    nan = float("nan")
    rows = [
        ("a", [1.0, 2.0]), ("a", [3.0, 4.0]), ("a", [5.0]),      # short dim
        ("a", [0.0, 0.0]),                                        # zero norm
        ("b", [nan, 1.0]), ("b", [2.0, 2.0]), ("b", None),        # nan + null
    ]
    df = spark.createDataFrame(rows, "g string, v array<double>")
    got = {r["g"]: r for r in embedding_qc(df, "v", group_col="g").collect()}
    a = got["a"]
    assert (a["n_vecs"], a["n_null"], a["dim_mode"]) == (4, 0, 2)
    assert a["dim_violations"] == 1 and a["zero_norm_vecs"] == 1
    assert a["holds"] is False
    b = got["b"]
    assert (b["n_null"], b["nonfinite_vecs"], b["dim_violations"]) == (1, 1, 0)
    assert b["holds"] is False


def test_embedding_qc_expected_dim_and_clean_global(spark):
    from nadeefiler_spark.profiler import embedding_qc

    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0],), ([4.0, 5.0, 6.0],)], "v array<double>"
    )
    clean = embedding_qc(df, "v").collect()[0]
    assert clean["holds"] is True and clean["dim_mode"] == 3
    strict = embedding_qc(df, "v", expected_dim=4).collect()[0]
    assert strict["dim_violations"] == 2 and strict["holds"] is False


def test_embedding_qc_all_null_group_survives(spark):
    from nadeefiler_spark.profiler import embedding_qc

    df = spark.createDataFrame([(None,), (None,)], "v array<double>")
    r = embedding_qc(df, "v").collect()[0]
    assert (r["n_vecs"], r["n_null"], r["dim_violations"]) == (2, 2, 0)
    assert r["dim_mode"] is None and r["holds"] is True
