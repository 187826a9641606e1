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
