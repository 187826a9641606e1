"""Bloom runtime-filter semi join, exact two-phase heavy hitters, and
time-coverage gap detection."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from nadeefiler_spark.operators.bloomjoin import (
    bloom_filter_rows,
    bloom_semi_join,
    key_bloom,
)
from nadeefiler_spark.operators.heavy import heavy_hitter_candidates, heavy_hitters
from nadeefiler_spark.operators.temporal import coverage_gaps


# ---------------------------------------------------------------- bloom

def test_bloom_no_false_negatives_and_semi_join_exact(spark):
    rng = random.Random(7)
    keys = [rng.randrange(10**9) for _ in range(2000)]
    big = spark.createDataFrame(
        [(i, keys[i % len(keys)] if i % 3 else rng.randrange(10**9))
         for i in range(6000)],
        "row_id bigint, k bigint",
    ).repartition(8)
    small = spark.createDataFrame(
        [(k,) for k in keys[:500]], "sk bigint"
    )

    exact = {
        r["row_id"]
        for r in big.join(
            small.select(F.col("sk").alias("k")).distinct(), "k", "left_semi"
        ).collect()
    }
    got = {
        r["row_id"]
        for r in bloom_semi_join(big, small, "k", "sk", n_bits=1 << 16).collect()
    }
    assert got == exact

    # the bloom stage alone never drops a true match (superset property)
    bloom = key_bloom(
        small.select(F.col("sk").alias("k")), "k", n_bits=1 << 16
    )
    survivors = {
        r["row_id"]
        for r in bloom_filter_rows(big, "k", bloom, n_bits=1 << 16).collect()
    }
    assert exact <= survivors


def test_bloom_prunes_disjoint_keys(spark):
    small = spark.range(0, 5000).select(F.col("id").alias("k"))
    # keys guaranteed disjoint from the bloom's
    big = spark.range(0, 20000).select((F.col("id") + 10**12).alias("k"))
    bloom = key_bloom(small, "k", n_bits=1 << 18, n_hashes=5)
    n_fp = bloom_filter_rows(big, "k", bloom, n_bits=1 << 18).count()
    # fpp at 5k keys / 2^18 bits / 5 hashes is ~1e-5; allow slack
    assert n_fp < 200


def test_bloom_null_keys_never_match(spark):
    big = spark.createDataFrame([(1, None), (2, 5)], "row_id bigint, k bigint")
    small = spark.createDataFrame([(5,), (None,)], "k bigint")
    out = bloom_semi_join(big, small, "k").collect()
    assert [r["row_id"] for r in out] == [2]


def test_bloom_rejects_non_pow2():
    with pytest.raises(ValueError):
        key_bloom(None, "k", n_bits=1000)


def test_bloom_deterministic_across_parallelism(spark):
    """Same bloom bits regardless of how the build side is partitioned —
    the N vs 4N invariance the north_rule demands of every operator."""
    keys = spark.range(0, 3000).select((F.col("id") * 17 % 999).alias("k"))
    w1 = key_bloom(keys.coalesce(1), "k", n_bits=1 << 14).collect()[0][0]
    w8 = key_bloom(keys.repartition(8), "k", n_bits=1 << 14).collect()[0][0]
    assert w1 == w8


# -------------------------------------------------------- heavy hitters

def _exact_heavy(df, col, inv_phi):
    n = df.count()
    return {
        (r["value"], r["cnt"])
        for r in df.select(F.col(col).alias("value"))
        .where(F.col("value").isNotNull())
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") * inv_phi > n)
        .collect()
    }


def test_heavy_hitters_match_exact_groupby(spark):
    rng = random.Random(3)
    # zipf-ish: token i appears ~ 3000/i times
    rows = []
    for i in range(1, 200):
        rows += [(f"tok{i}",)] * (3000 // i)
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "v string").repartition(8)
    got = [(r["value"], r["cnt"]) for r in heavy_hitters(df, "v", 100).collect()]
    assert set(got) == _exact_heavy(df, "v", 100)
    # ordering contract: cnt desc, then value
    assert got == sorted(got, key=lambda t: (-t[1], t[0]))


def test_heavy_hitters_adversarial_spread(spark):
    """A heavy value spread perfectly evenly across every partition (the
    case a per-partition top-k heuristic can miss) is still found: the
    pigeonhole bound is distribution-free."""
    # 8 partitions x 1000 rows each; 'hot' is 2% of every partition,
    # the rest unique values
    rows = []
    for p in range(8):
        rows += [("hot",)] * 20 + [(f"u{p}_{i}",) for i in range(980)]
    df = spark.createDataFrame(rows, "v string").repartition(8)
    out = heavy_hitters(df, "v", inv_phi=60)  # threshold: > 8000/60 = 133
    got = {(r["value"], r["cnt"]) for r in out.collect()}
    assert got == {("hot", 160)} == _exact_heavy(df, "v", 60)


def test_heavy_candidates_superset_and_nulls(spark):
    rows = [("a",)] * 50 + [("b",)] * 5 + [(None,)] * 45
    df = spark.createDataFrame(rows, "v string").repartition(4)
    cands = {r["value"] for r in heavy_hitter_candidates(df, "v", 3).collect()}
    assert "a" in cands and None not in cands
    # N includes null rows: threshold is > 100/3, 'a'=50 qualifies
    got = {(r["value"], r["cnt"]) for r in heavy_hitters(df, "v", 3).collect()}
    assert got == {("a", 50)}
    with pytest.raises(ValueError):
        heavy_hitter_candidates(df, "v", 0)


def test_heavy_hitters_bigint_column(spark):
    df = spark.range(0, 1000).select((F.col("id") % 7).alias("v"))
    got = {(r["value"], r["cnt"]) for r in heavy_hitters(df, "v", 10).collect()}
    assert got == _exact_heavy(df, "v", 10)
    assert all(isinstance(v, int) for v, _ in got)


# --------------------------------------------------------- coverage gaps

def test_coverage_gaps_golden(spark):
    rows = [
        ("a", "2024-01-01 00:00:00"),
        ("a", "2024-01-01 00:10:00"),   # 600 s
        ("a", "2024-01-01 02:10:00"),   # 7200 s  <-- gap
        ("b", "2024-01-01 00:00:00"),
        ("b", "2024-01-01 00:59:59"),   # 3599 s
    ]
    df = spark.createDataFrame(rows, "part string, ts string").select(
        "part", F.to_timestamp("ts").alias("ts")
    )
    out = coverage_gaps(df, "part", "ts", max_gap_s=3600).collect()
    assert [(r["part"], str(r["gap_start"]), str(r["gap_end"]), r["gap_s"])
            for r in out] == [
        ("a", "2024-01-01 00:10:00", "2024-01-01 02:10:00", 7200)
    ]


def test_coverage_gaps_none_when_dense(spark):
    df = spark.range(0, 100).select(
        F.lit("p").alias("part"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("base"),
        F.col("id"),
    ).select("part", F.expr("base + make_interval(0,0,0,0,0,0,id)").alias("ts"))
    assert coverage_gaps(df, "part", "ts", max_gap_s=5).count() == 0
