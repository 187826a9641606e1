"""Engine expectations stage: the default suite's verdicts over the
planted corpus, per-partition resume, and the job CLI flag."""

from __future__ import annotations

import pytest

from nadeefiler_spark.engine import ValidationEngine
from nadeefiler_spark.presets import default_clip_expectations
from nadeefiler_spark.profiler import default_clips_config


@pytest.fixture(scope="module")
def exp(spark, clips_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("exp_out"))
    eng = ValidationEngine(spark, out, rules=[], profile_cfg=default_clips_config())
    clips = spark.read.parquet(f"{clips_dir}/clips")
    verdicts = eng.run_expectations(clips, run_id="e1")
    return eng, clips, verdicts


def test_expectation_results_match_planted_defects(exp):
    eng, clips, _ = exp
    res = {
        (r["part"], r["check"]): r for r in eng.expectation_results().collect()
    }
    parts = [r[0] for r in clips.select("part").distinct().collect()]
    assert len(res) == len(parts) * len(default_clip_expectations())
    # datagen plants duplicate clip_ids -> uniqueness fails exactly on
    # the partitions holding a duplicated id
    dup_parts = {
        r["part"]
        for r in clips.groupBy("part", "clip_id").count()
        .where("count > 1").select("part").distinct().collect()
    }
    assert dup_parts  # the corpus really is dirty
    for p in parts:
        row = res[(p, "uniqueness(clip_id)")]
        assert row["passed"] == (p not in dup_parts)
    # planted invalid sr_hz (0 / 12345) fails the domain ratio somewhere
    sr_fails = {p for p in parts if not res[(p, "values_in(sr_hz)")]["passed"]}
    assert sr_fails
    # bytes are always present
    assert all(res[(p, "completeness(bytes)")]["passed"] for p in parts)


def test_expectation_verdicts_count_failed_checks(exp):
    eng, _, verdicts = exp
    v = {r["part"]: r for r in verdicts.collect()}
    assert v and all(r["stage"] == "expectations" for r in v.values())
    res = eng.expectation_results().collect()
    fails_by_part: dict[str, int] = {}
    for r in res:
        if not r["passed"]:
            fails_by_part[r["part"]] = fails_by_part.get(r["part"], 0) + 1
    for p, row in v.items():
        assert row["n_violations"] == fails_by_part.get(p, 0)
    assert sum(fails_by_part.values()) > 0


def test_expectation_resume_skips(exp):
    eng, clips, _ = exp
    again = eng.run_expectations(clips, run_id="e2", resume=True)
    assert again.count() == 0
    manifest = eng.manifest().where("stage = 'expectations'").collect()
    assert all(r["run_id"] == "e1" for r in manifest)


def test_job_cli_expect_flag(spark, clips_dir, tmp_path_factory):
    from nadeefiler_spark import job

    out = str(tmp_path_factory.mktemp("exp_cli_out"))
    summary = job.main(
        [
            "--clips", f"{clips_dir}/clips", "--out", out,
            "--no-audio", "--no-drift", "--expect",
        ],
        spark=spark,
    )
    assert "expectations" in summary["stages"]
    eng = ValidationEngine(spark, out, rules=[])
    assert eng.expectation_results().count() > 0


def test_suite_regression_stage(spark, clips_dir, tmp_path_factory):
    """Data-CI stage: suite learned from release A's profile regresses
    on release B's planted breaks; resume unit is the baseline id."""
    import pyspark.sql.functions as F

    clips = spark.read.parquet(f"{clips_dir}/clips")
    out_a = str(tmp_path_factory.mktemp("rel_a"))
    out_b = str(tmp_path_factory.mktemp("rel_b"))
    eng_a = ValidationEngine(spark, out_a, rules=[],
                             profile_cfg=default_clips_config())
    eng_a.run(clips, run_id="a1")

    # release B: a duration escapes the learned envelope and a novel
    # codec value appears
    clips_b = clips.withColumns({
        "dur_ms": F.when(F.col("clip_id").endswith("3"), F.lit(10_000_000))
                   .otherwise(F.col("dur_ms")),
        "codec": F.when(F.col("clip_id").endswith("7"), F.lit("zz_new"))
                  .otherwise(F.col("codec")),
    })
    eng_b = ValidationEngine(spark, out_b, rules=[],
                             profile_cfg=default_clips_config())

    # guard: regression before profiling must refuse, not lie
    with pytest.raises(ValueError):
        eng_b.run_suite_regression(eng_a.profile_summary(), "relA")

    eng_b.run(clips_b, run_id="b1")
    v = eng_b.run_suite_regression(
        eng_a.profile_summary(), "relA", low_card_max=100, run_id="r1"
    ).collect()
    assert [r["part"] for r in v] == ["relA"]
    assert v[0]["stage"] == "suite_regression" and v[0]["n_violations"] > 0

    res = {(r["key"], r["check"]): r
           for r in eng_b.suite_regression_results().collect()}
    assert ("dur_ms", "range") in res
    assert res[("dur_ms", "range")]["observed_hi"] == 10_000_000.0
    assert ("codec", "low_cardinality") in res
    # nothing regressed for untouched sr_hz's envelope
    assert ("sr_hz", "range") not in res

    # same baseline id resumes (no second manifest row)
    n_manifest = eng_b.manifest().where(
        F.col("stage") == "suite_regression").count()
    eng_b.run_suite_regression(eng_a.profile_summary(), "relA", run_id="r2")
    assert eng_b.manifest().where(
        F.col("stage") == "suite_regression").count() == n_manifest
