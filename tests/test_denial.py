"""Denial constraints: planted pair violations (symmetric FD-shaped and
ordered), blocking guard, hot-block cap, and the engine rule shape."""

from __future__ import annotations

import pytest

from nadeefiler_spark.rules.base import RuleContext
from nadeefiler_spark.rules.denial import DenialRule, Pred, violation_pairs


def _df(spark):
    # FD zip -> city holds except rows 2/3 (same zip, different city);
    # rows 4/5/6 share a zip+city (no violation among themselves)
    return spark.createDataFrame(
        [
            (1, "10115", "Berlin", 5.0),
            (2, "20095", "Hamburg", 7.0),
            (3, "20095", "Altona", 2.0),
            (4, "80331", "Munich", 1.0),
            (5, "80331", "Munich", 1.0),
            (6, "80331", "Munich", 9.0),
        ],
        "id int, zip string, city string, amount double",
    )


def test_symmetric_fd_shaped_dc(spark):
    pairs = violation_pairs(
        _df(spark),
        [Pred("zip", "="), Pred("city", "!=")],
        id_col="id",
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(2, 3)}


def test_ordered_dc_emits_directed_pairs(spark):
    # same zip+city but t1.amount > t2.amount: directed, excludes self
    pairs = violation_pairs(
        _df(spark),
        [Pred("zip", "="), Pred("city", "="), Pred("amount", ">")],
        id_col="id",
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(6, 4), (6, 5)}


def test_pure_inequality_dc_rejected(spark):
    with pytest.raises(ValueError, match="'=' predicate"):
        violation_pairs(_df(spark), [Pred("amount", ">")], id_col="id")


def test_max_block_drops_hot_groups(spark):
    # zip 80331 has 3 rows; capping blocks at 2 removes its pairs
    pairs = violation_pairs(
        _df(spark),
        [Pred("zip", "="), Pred("amount", ">")],
        id_col="id",
        max_block=2,
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(2, 3)}


def test_denial_rule_implicates_both_sides(spark):
    clips = spark.createDataFrame(
        [
            ("c1", "flac", "hello", 100),
            ("c2", "opus", "hello", 100),  # same transcript+dur, codec differs
            ("c3", "flac", "bye", 50),
        ],
        "clip_id string, part string, transcript string, dur_ms int",
    )
    rule = DenialRule(
        name="same_content_codec_consistent",
        preds=[Pred("transcript", "="), Pred("dur_ms", "="), Pred("part", "!=")],
    )
    got = rule.violations(RuleContext(spark, clips)).collect()
    by_id = {r["clip_id"]: r for r in got}
    assert set(by_id) == {"c1", "c2"}
    assert by_id["c1"]["detail"] == "pair with c2"
    assert by_id["c2"]["detail"] == "pair with c1"
    assert by_id["c1"]["part"] == "flac" and by_id["c2"]["part"] == "opus"
