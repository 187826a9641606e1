"""Temporal join operators: as-of join pinned against pandas
merge_asof (an independent implementation of the same semantics), and
the bin-bucketed interval-point join pinned against a brute-force
cross-filter — including bin-boundary and tie cases the contract query's
data may not exercise."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from nadeefiler_spark.operators.temporal import asof_join, interval_point_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def asof_frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "a"),
            (1, _ts("2024-01-01 12:00:00"), "b"),
            (1, _ts("2024-01-01 09:00:00"), "early"),  # before any right row
            (2, _ts("2024-01-01 10:30:00"), "c"),
            (3, _ts("2024-01-01 10:00:00"), "no-right-key"),
        ],
        "k int, t timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:30:00"), 101, 1.0),
            (1, _ts("2024-01-01 10:00:00"), 102, 2.0),  # exact match with left 'a'
            (1, _ts("2024-01-01 10:00:00"), 103, 3.0),  # tie: larger id must win
            (1, _ts("2024-01-01 11:00:00"), 104, 4.0),
            (2, _ts("2024-01-01 08:00:00"), 201, 5.0),
        ],
        "k int, t timestamp, rid int, v double",
    )
    return left, right


def test_asof_backward_with_ties_and_left_semantics(asof_frames):
    left, right = asof_frames
    out = asof_join(
        left, right, ["k"], "t", "t", ["rid", "v"], tiebreak_col="rid"
    )
    got = {r["tag"]: (r["r_rid"], r["r_v"]) for r in out.collect()}
    assert got == {
        "a": (103, 3.0),  # exact-ts match allowed; tie -> largest rid
        "b": (104, 4.0),
        "early": (None, None),  # no right row at-or-before
        "c": (201, 5.0),
        "no-right-key": (None, None),  # key absent on the right
    }


def test_asof_matches_pandas_merge_asof(spark):
    # independent twin: pandas merge_asof over a deterministic random-ish
    # grid (hand-rolled LCG — no random module, keeps runs identical)
    seed = 12345
    def lcg():
        nonlocal seed
        seed = (seed * 1103515245 + 12345) % (1 << 31)
        return seed

    base = dt.datetime(2024, 1, 1)
    lrows = [
        (lcg() % 5, base + dt.timedelta(seconds=lcg() % 100_000), i)
        for i in range(120)
    ]
    rrows = [
        (lcg() % 5, base + dt.timedelta(seconds=lcg() % 100_000), 1000 + i)
        for i in range(200)
    ]
    left = spark.createDataFrame(lrows, "k int, t timestamp, lid int")
    right = spark.createDataFrame(rrows, "k int, t timestamp, rid int")
    out = asof_join(left, right, ["k"], "t", "t", ["rid"], tiebreak_col="rid")
    got = {r["lid"]: r["r_rid"] for r in out.collect()}

    lp = pd.DataFrame(lrows, columns=["k", "t", "lid"]).sort_values(["t", "lid"])
    rp = pd.DataFrame(rrows, columns=["k", "t", "rid"]).sort_values(["t", "rid"])
    exp = pd.merge_asof(lp, rp, on="t", by="k", direction="backward")
    want = {
        int(row.lid): (None if pd.isna(row.rid) else int(row.rid))
        for row in exp.itertuples()
    }
    assert got == want
    assert len(got) == 120


def test_asof_tolerance_nulls_stale_matches(asof_frames):
    left, right = asof_frames
    out = asof_join(
        left, right, ["k"], "t", "t", ["rid", "v"],
        tiebreak_col="rid", tolerance_s=3600,
    )
    got = {r["tag"]: r["r_rid"] for r in out.collect()}
    # 'c' at 10:30 matched 201 at 08:00 -> 9000s > 3600 -> nulled, atomically
    assert got["c"] is None
    assert got["a"] == 103 and got["b"] == 104
    row_c = [r for r in out.collect() if r["tag"] == "c"][0]
    assert row_c["r_v"] is None


def test_asof_prefix_collision_raises(asof_frames):
    left, right = asof_frames
    with pytest.raises(ValueError, match="collide"):
        asof_join(
            left.withColumn("r_rid", F.lit(0)),
            right, ["k"], "t", "t", ["rid"],
        )


@pytest.fixture(scope="module")
def range_frames(spark):
    # bin_s will be 3600: intervals deliberately cross bin boundaries,
    # and points sit exactly ON interval bounds (inclusive) and just
    # outside them.
    intervals = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:30:00"), _ts("2024-01-01 13:15:00")),  # 4 bins
            (2, _ts("2024-01-01 11:00:00"), _ts("2024-01-01 11:00:00")),  # zero-width
            (3, _ts("2024-01-02 00:00:00"), _ts("2024-01-02 01:00:00")),
        ],
        "iid int, t_start timestamp, t_end timestamp",
    )
    points = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 10:30:00")),  # == start of 1 (inclusive)
            (11, _ts("2024-01-01 13:15:00")),  # == end of 1 (inclusive)
            (12, _ts("2024-01-01 12:59:59")),  # inside 1, bin 3 of 4
            (13, _ts("2024-01-01 10:29:59")),  # just before 1, same bin as start
            (14, _ts("2024-01-01 11:00:00")),  # == zero-width interval 2 (and in 1)
            (15, _ts("2024-01-02 02:00:00")),  # after 3
        ],
        "pid int, p_ts timestamp",
    )
    return intervals, points


def test_interval_point_join_inclusive_bounds_and_bins(range_frames):
    intervals, points = range_frames
    out = interval_point_join(
        intervals, points, "t_start", "t_end", "p_ts", bin_s=3600
    )
    got = sorted((r["iid"], r["pid"]) for r in out.collect())
    # brute-force expectation
    iv = {r["iid"]: (r["t_start"], r["t_end"]) for r in intervals.collect()}
    pt = {r["pid"]: r["p_ts"] for r in points.collect()}
    want = sorted(
        (i, p) for i, (a, b) in iv.items() for p, t in pt.items() if a <= t <= b
    )
    assert got == want
    assert (1, 10) in got and (1, 11) in got          # inclusive bounds
    assert (2, 14) in got                              # zero-width interval
    assert (1, 13) not in got and (3, 15) not in got   # outside
    # each match exactly once despite multi-bin intervals
    assert len(got) == len(set(got))


def test_interval_point_join_with_keys(range_frames):
    intervals, points = range_frames
    iv = intervals.withColumn("ik", F.col("iid") % 2)
    pt = points.withColumn("pk", F.col("pid") % 2)
    out = interval_point_join(
        iv, pt, "t_start", "t_end", "p_ts", bin_s=3600, keys=[("ik", "pk")]
    )
    got = sorted((r["iid"], r["pid"]) for r in out.collect())
    base = {
        (i["iid"], p["pid"])
        for i in iv.collect()
        for p in pt.collect()
        if i["t_start"] <= p["p_ts"] <= i["t_end"] and i["ik"] == p["pk"]
    }
    assert got == sorted(base)


def test_asof_plan_is_one_exchange_no_nested_loop(asof_frames):
    # the whole point of the union+window formulation: one shuffle on
    # the key, and the range condition never reaches the planner (a
    # naive r.t <= l.t join plans BroadcastNestedLoopJoin)
    left, right = asof_frames
    out = asof_join(left, right, ["k"], "t", "t", ["rid"], tiebreak_col="rid")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_range_join_plan_is_hash_join_not_nested_loop(range_frames):
    intervals, points = range_frames
    out = interval_point_join(
        intervals, points, "t_start", "t_end", "p_ts", bin_s=3600
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_interval_point_join_disjoint_schema_required(range_frames):
    intervals, points = range_frames
    with pytest.raises(ValueError, match="disjoint"):
        interval_point_join(
            intervals,
            points.withColumnRenamed("pid", "iid"),
            "t_start", "t_end", "p_ts", bin_s=3600,
        )
