"""Hoeffding sampled-violation certificates: hand math + guarantees."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from nadeefiler_spark.certify import sampled_violation_bound


def test_full_sample_hand_math(spark):
    # fraction=1.0 -> p_hat is the exact rate; bound = p_hat + slack
    df = spark.createDataFrame(
        [(i, "a", float(i)) for i in range(100)], ["id", "part", "v"]
    )
    out = sampled_violation_bound(
        df, "id", F.col("v") >= 90.0, fraction=1.0,
        part_col="part", eps=0.5, delta=0.05,
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_sampled"], r["n_viol"]) == (100, 10)
    assert r["rate_hat"] == pytest.approx(0.10, abs=1e-9)
    slack = math.sqrt(math.log(1 / 0.05) / 200)
    assert r["rate_ub"] == pytest.approx(0.10 + slack, abs=1e-6)
    assert bool(r["certified"]) is True  # 0.222... <= 0.5


def test_certificate_is_conservative(spark):
    # true rate 0.3 > eps 0.2: with the FULL sample the bound can never
    # certify (p_hat alone already exceeds eps)
    df = spark.createDataFrame(
        [(i, float(i % 10)) for i in range(1000)], ["id", "v"]
    )
    r = sampled_violation_bound(
        df, "id", F.col("v") >= 7.0, fraction=1.0, eps=0.2, delta=0.05
    ).collect()[0]
    assert r["rate_hat"] == pytest.approx(0.3, abs=1e-9)
    assert bool(r["certified"]) is False


def test_unsampled_partition_not_certified_and_null_pred(spark):
    # one partition whose ids all miss the sample must still appear,
    # uncertified with rate_ub 1.0; NULL predicate counts as violation
    df = spark.createDataFrame(
        [(0, "hit", None), (1, "hit", 5.0)], ["id", "part", "v"]
    ).union(spark.createDataFrame([(2**30, "miss", 1.0)], ["id", "part", "v"]))
    # pick a salt/fraction where ids 0,1 sample in and 2^30 doesn't
    from nadeefiler_spark.operators.sample import sample_key, threshold

    thr = threshold(0.5)
    keys = {
        r["id"]: r["k"]
        for r in df.select("id", sample_key("id").alias("k")).collect()
    }
    assert keys[0] < thr and keys[1] < thr and keys[2**30] >= thr
    got = {
        r["part"]: r
        for r in sampled_violation_bound(
            df, "id", F.col("v") >= 4.0, fraction=0.5,
            part_col="part", eps=0.9, delta=0.05,
        ).collect()
    }
    m = got["miss"]
    assert (m["n_sampled"], m["rate_ub"], bool(m["certified"])) == (0, 1.0, False)
    h = got["hit"]
    # both sampled rows violate: 5.0 >= 4 and NULL -> violation
    assert (h["n_sampled"], h["n_viol"]) == (2, 2)


def test_determinism_across_parallelism(spark):
    df = spark.createDataFrame(
        [(i, float(i % 97)) for i in range(2000)], ["id", "v"]
    )
    a = sampled_violation_bound(
        df.repartition(1), "id", F.col("v") >= 90, fraction=0.3
    ).collect()[0]
    b = sampled_violation_bound(
        df.repartition(16), "id", F.col("v") >= 90, fraction=0.3
    ).collect()[0]
    assert a == b


def test_bad_params_raise(spark):
    df = spark.createDataFrame([(1, 1.0)], ["id", "v"])
    with pytest.raises(ValueError):
        sampled_violation_bound(df, "id", F.col("v") > 0, fraction=0.0)
    with pytest.raises(ValueError):
        sampled_violation_bound(df, "id", F.col("v") > 0, fraction=0.5, delta=1.0)
