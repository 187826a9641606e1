"""Outlier-detection tests (dBoost analog, SURVEY §2.3 A9)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from nadeefiler_spark import outliers, profiler
from nadeefiler_spark.rules.base import RuleContext


def _df(spark, values, part="a"):
    pdf = pd.DataFrame({
        "id": range(len(values)), "part": part, "x": values,
    })
    return spark.createDataFrame(pdf)


def test_zscore_outliers_flags_planted(spark):
    rng = np.random.default_rng(3)
    vals = list(rng.normal(100.0, 5.0, 500)) + [500.0, -300.0]
    df = _df(spark, vals)
    out = outliers.zscore_outliers(df, "x", "part", k=4.0)
    got = sorted(r["x"] for r in out.collect())
    assert got == [-300.0, 500.0]
    zs = {r["x"]: r["z"] for r in out.collect()}
    assert zs[500.0] > 4 and zs[-300.0] < -4


def test_zscore_constant_column_no_rows(spark):
    df = _df(spark, [5.0] * 100)
    assert outliers.zscore_outliers(df, "x", "part").count() == 0


def test_iqr_outliers(spark):
    vals = list(np.linspace(0, 100, 201)) + [10_000.0]
    df = _df(spark, vals)
    got = [r["x"] for r in outliers.iqr_outliers(df, "x", "part").collect()]
    assert got == [10_000.0]


def test_rare_values_from_histogram(spark):
    vals = [1.0] * 400 + [2.0] * 100 + [99.0]  # 99 appears once (share ~0.002)
    df = _df(spark, vals)
    cfg = profiler.ProfileConfig(part_col="part", bucket_hist_cols={"x": 1.0})
    hist = profiler.profile_histograms(df, cfg)
    rare = outliers.rare_values(hist, eps=0.005, min_total=100)
    rows = rare.collect()
    assert len(rows) == 1 and rows[0]["value"] == "99" and rows[0]["count"] == 1


def test_outlier_rule_shape(spark):
    vals = list(np.linspace(50, 60, 300)) + [10_000.0]
    df = _df(spark, vals).withColumnRenamed("id", "clip_id")
    ctx = RuleContext(spark=spark, clips=df, key_col="clip_id", part_col="part")
    v = outliers.OutlierRule(column="x", k=5.0).violations(ctx)
    rows = v.collect()
    assert len(rows) == 1
    assert rows[0]["rule"] == "x_outlier"
    assert rows[0]["detail"].startswith("x=10000.0 z=")


def test_group_stat_outliers_flags_shifted_group(spark):
    from nadeefiler_spark.outliers import group_stat_outliers

    rows = [
        (g, 100.0 + gi * 0.5 + i % 5)  # slightly different group means
        for gi, g in enumerate("abcdefg")
        for i in range(20)
    ]
    rows += [("h", 500.0 + i % 5) for i in range(20)]  # shifted group
    df = spark.createDataFrame(rows, "grp string, v double")
    out = {r["grp"]: r for r in group_stat_outliers(df, "grp", "v").collect()}
    assert out["h"]["is_outlier"] is True and abs(out["h"]["z"]) > 3.5
    assert all(out[g]["is_outlier"] is False for g in "abcdefg")


def test_group_stat_outliers_zero_mad(spark):
    from nadeefiler_spark.outliers import group_stat_outliers

    # all groups identical except one: MAD = 0, z NULL, deviation flags
    rows = [(g, 10.0) for g in "abcde"] + [("f", 11.0)]
    df = spark.createDataFrame(rows, "grp string, v double")
    out = {r["grp"]: r for r in group_stat_outliers(df, "grp", "v").collect()}
    assert out["f"]["z"] is None and out["f"]["is_outlier"] is True
    assert out["a"]["is_outlier"] is False


def test_multivariate_outliers_joint_vs_univariate(spark):
    """A record mildly off on EVERY column is caught jointly even though
    no single column crosses a 3-sigma univariate gate."""
    import random

    from nadeefiler_spark.outliers import multivariate_outliers

    rng = random.Random(7)
    rows = [
        (i, rng.gauss(0.0, 1.0), rng.gauss(10.0, 2.0), rng.gauss(-5.0, 0.5))
        for i in range(400)
    ]
    rows.append((900, 2.6, 15.2, -3.7))  # ~2.6 sigma on each of 3 cols
    df = spark.createDataFrame(rows, "id bigint, a double, b double, c double")
    out = multivariate_outliers(df, ["a", "b", "c"], ["id"], threshold=16.27)
    ids = [r["id"] for r in out.collect()]
    assert 900 in ids
    # univariate gate at the same 99.9% confidence misses it on every column
    from nadeefiler_spark.outliers import zscore_outliers

    from pyspark.sql import functions as F

    one = df.withColumn("p", F.lit("x"))
    for c in ("a", "b", "c"):
        hits = [r["id"] for r in zscore_outliers(one, c, "p", k=3.29).collect()]
        assert 900 not in hits


def test_multivariate_outliers_null_and_constant_cols(spark):
    from nadeefiler_spark.outliers import multivariate_outliers

    rows = [(i, float(i % 10), 5.0, None if i % 2 else float(i % 7)) for i in range(50)]
    rows.append((999, 1000.0, 5.0, None))
    df = spark.createDataFrame(rows, "id bigint, a double, k double, c double")
    out = {r["id"]: r for r in multivariate_outliers(
        df, ["a", "k", "c"], ["id"], threshold=20.0).collect()}
    assert list(out) == [999]
    # constant column k and NULL c contribute nothing; only a was usable
    assert out[999]["n_cols_used"] == 1
    assert out[999]["score"] > 20.0


def test_multivariate_outliers_score_formula(spark):
    """Score equals the numpy diagonal-Mahalanobis twin exactly."""
    import numpy as np

    from nadeefiler_spark.outliers import multivariate_outliers

    a = [1.0, 2.0, 3.0, 4.0, 100.0]
    b = [10.0, 11.0, 9.0, 10.5, -40.0]
    df = spark.createDataFrame(
        [(i, a[i], b[i]) for i in range(5)], "id bigint, a double, b double"
    )
    out = {r["id"]: r for r in multivariate_outliers(
        df, ["a", "b"], ["id"], threshold=0.0).collect()}
    za = (np.array(a) - np.mean(a)) / np.std(a)
    zb = (np.array(b) - np.mean(b)) / np.std(b)
    want = za**2 + zb**2
    for i in range(5):
        assert out[i]["score"] == round(float(want[i]), 6)


def test_multivariate_outlier_rule_shape(spark):
    from nadeefiler_spark import outliers
    from nadeefiler_spark.rules.base import RuleContext

    rows = [(f"c-{i}", "p1", float(i % 10), 100.0 + (i % 7)) for i in range(60)]
    rows.append(("c-bad", "p2", 90.0, 900.0))  # jointly extreme
    df = spark.createDataFrame(rows, "clip_id string, part string, a double, b double")
    ctx = RuleContext(spark=spark, clips=df, key_col="clip_id", part_col="part")
    rule = outliers.MultivariateOutlierRule(columns=("a", "b"), threshold=30.0)
    v = rule.violations(ctx).collect()
    assert [(r["clip_id"], r["part"], r["rule"]) for r in v] == [
        ("c-bad", "p2", "multivariate_outlier")
    ]
    assert "score=" in v[0]["detail"] and "cols=a,b" in v[0]["detail"]
