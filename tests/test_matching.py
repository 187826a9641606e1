"""Matching-dependency pairs and the engine rule wrapper."""

from __future__ import annotations

from nadeefiler_spark.rules.matching import MatchingDependencyRule, md_violation_pairs


def test_md_pairs_only_disagreeing_near_matches(spark):
    df = spark.createDataFrame(
        [
            (1, "alphaname", "B1", "t"),
            (2, "alphanamX", "B1", "t"),   # near 1, agrees -> clean
            (3, "betaname!", "B1", "t"),
            (4, "betanameX", "B2", "t"),   # near 3, brand differs
            (5, "unrelatedzzz", "B9", "t"),
        ],
        "id int, name string, brand string, typ string",
    )
    out = md_violation_pairs(df, "id", "name", ["brand", "typ"], max_dist=2)
    rows = out.collect()
    assert [(r["id_a"], r["id_b"], r["mismatched"]) for r in rows] == [
        (3, 4, "brand")
    ]
    assert rows[0]["dist"] == 1


def test_md_null_consequent_semantics(spark):
    df = spark.createDataFrame(
        [
            (1, "samename1", None),
            (2, "samename2", None),   # NULL vs NULL -> agree
            (3, "othernam1", "x"),
            (4, "othernam2", None),   # NULL vs value -> mismatch
        ],
        "id int, name string, v string",
    )
    out = md_violation_pairs(df, "id", "name", ["v"], max_dist=2)
    assert [(r["id_a"], r["id_b"]) for r in out.collect()] == [(3, 4)]


def test_md_multiple_mismatched_columns_listed(spark):
    df = spark.createDataFrame(
        [(1, "abcdefgh1", "x", "p"), (2, "abcdefgh2", "y", "q")],
        "id int, name string, a string, b string",
    )
    r = md_violation_pairs(df, "id", "name", ["a", "b"], max_dist=2).collect()[0]
    assert r["mismatched"] == "a,b"


def test_md_rule_implicates_both_members(spark):
    from nadeefiler_spark.rules.base import RuleContext

    clips = spark.createDataFrame(
        [
            ("c1", "P1", "transcript one!", "opus"),
            ("c2", "P2", "transcript one?", "flac"),
            ("c3", "P1", "something else entirely", "opus"),
        ],
        "clip_id string, part string, transcript string, codec string",
    )
    ctx = RuleContext(spark=spark, clips=clips)
    rule = MatchingDependencyRule(rhs_cols=("codec",), max_dist=2)
    assert rule.name == "transcript_md"
    out = {r["clip_id"]: r for r in rule.violations(ctx).collect()}
    assert set(out) == {"c1", "c2"}
    assert out["c1"]["detail"] == "near c2 differs on codec"
    assert out["c1"]["part"] == "P1" and out["c2"]["part"] == "P2"
