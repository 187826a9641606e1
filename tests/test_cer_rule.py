"""CerRule: tolerance-aware transcript agreement (character error rate
via built-in codepoint levenshtein, lowercase+whitespace normalized)."""

from __future__ import annotations

from nadeefiler_spark.rules.base import RuleContext
from nadeefiler_spark.rules.constraints import CerRule


def _ctx(spark, clip_rows, ref_rows):
    clips = spark.createDataFrame(
        clip_rows, "clip_id string, part string, transcript string"
    )
    refs = spark.createDataFrame(ref_rows, "clip_id string, transcript string")
    return RuleContext(spark=spark, clips=clips, refs=refs,
                       key_col="clip_id", part_col="part")


def test_cer_rule_thresholds_and_normalization(spark):
    ctx = _ctx(
        spark,
        [
            ("a", "p", "the quick brown fox"),
            ("b", "p", "the quick brown fox"),
            ("c", "p", "completely different words here"),
            ("d", "p", "short"),
            ("e", "p", None),
        ],
        [
            # casing + whitespace only: normalizes equal -> cer 0
            ("a", "  The   QUICK brown fox "),
            # one substitution in 19 chars -> cer ~0.05, under 0.2
            ("b", "the quick brawn fox"),
            # nothing in common -> way over threshold
            ("c", "zzzz"),
            # 2 edits / 5 chars = 0.4 -> flagged
            ("d", "shrt!"),
            # NULL parent side: skipped (RequiredRule territory)
            ("e", "anything"),
        ],
    )
    out = {r["clip_id"]: r["detail"] for r in CerRule().violations(ctx).collect()}
    assert set(out) == {"c", "d"}
    assert out["d"] == "cer=0.4"
    # python twin for the c pair: lev('zzzz' norm, ...)/len(ref norm)
    assert out["c"].startswith("cer=")


def test_cer_rule_unicode_is_codepoint_level(spark):
    # 'héllo' vs 'hello': ONE codepoint substitution over 5 chars = 0.2,
    # not the byte-level 2/6 — pinned so a byte-level regression shows
    ctx = _ctx(
        spark,
        [("u", "p", "hello")],
        [("u", "héllo")],
    )
    out = CerRule(max_cer=0.19).violations(ctx).collect()
    assert len(out) == 1 and out[0]["detail"] == "cer=0.2"
    assert CerRule(max_cer=0.2).violations(ctx).isEmpty()  # > is strict


def test_cer_rule_duplicate_parents_no_fanout(spark):
    clips = [("a", "p", "one two three"), ("a", "p", "one two three")]
    refs = [("a", "totally different sentence")]
    out = CerRule().violations(_ctx(spark, clips, refs)).collect()
    assert len(out) == 1
