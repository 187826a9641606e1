"""Slice finder (operators/slices.py): planted degraded slice, support
gate, NULL handling, z math."""

import math

import pytest
from pyspark.sql import functions as F

from nadeefiler_spark.operators.slices import quality_slices


def _df(spark):
    # source 'bad' carries metric 0.0, everything else 1.0
    rows = []
    for i in range(100):
        src = "bad" if i < 20 else f"ok{i % 4}"
        rows.append((i, src, 0.0 if src == "bad" else 1.0))
    return spark.createDataFrame(rows, "id long, source string, metric double")


def test_planted_bad_slice_is_most_negative(spark):
    got = {
        r["value"]: r
        for r in quality_slices(_df(spark), "metric", ["source"]).collect()
    }
    # corpus: mean 0.8, std_pop sqrt(0.8*0.2)=0.4
    bad = got["bad"]
    assert bad["n"] == 20
    assert bad["mean_metric"] == 0.0
    expected_z = (0.0 - 0.8) / (0.4 / math.sqrt(20))
    assert bad["z"] == pytest.approx(round(expected_z, 6))
    assert all(r["z"] > 0 for v, r in got.items() if v != "bad")
    assert min(r["z"] for r in got.values()) == bad["z"]


def test_support_gate_and_null_dims(spark):
    df = spark.createDataFrame(
        [(1, None, 1.0), (2, None, 0.5), (3, "a", 1.0), (4, "a", None)],
        "id long, source string, metric double",
    )
    rows = quality_slices(df, "metric", ["source"], min_support=2).collect()
    by_val = {r["value"]: r for r in rows}
    # NULL dim value forms its own slice
    assert by_val[None]["n"] == 2
    # NULL metric excluded from count/mean: slice 'a' has n=1 -> gated out
    assert "a" not in by_val


def test_constant_metric_z_zero(spark):
    df = spark.createDataFrame(
        [(i, "s", 2.0) for i in range(10)], "id long, source string, metric double"
    )
    r = quality_slices(df, "metric", ["source"]).collect()[0]
    assert r["z"] == 0.0 and r["mean_metric"] == 2.0


def test_dims_validated(spark):
    with pytest.raises(ValueError):
        quality_slices(_df(spark), "metric", [])
