"""Engine discovery stage: mined keys/INDs over the planted corpus must
agree with what the datagen planted (duplicate clip_ids, orphan refs),
resume must skip a completed run, and the job CLI must expose it."""

from __future__ import annotations

import pytest

from nadeefiler_spark.engine import ValidationEngine
from nadeefiler_spark.profiler import default_clips_config


@pytest.fixture(scope="module")
def disc(spark, clips_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("disc_out"))
    eng = ValidationEngine(spark, out, rules=[], profile_cfg=default_clips_config())
    clips = spark.read.parquet(f"{clips_dir}/clips")
    refs = spark.read.parquet(f"{clips_dir}/transcript_refs")
    verdicts = eng.run_discovery(clips, refs=refs, run_id="d1")
    return eng, clips, refs, verdicts


def test_discovery_matches_planted_facts(spark, disc):
    eng, clips, refs, _ = disc
    rows = {
        (r["kind"], r["lhs"], r["rhs"]): r
        for r in eng.discovery_results().collect()
    }
    # clip_id survives the HLL prune (near-unique) but the datagen
    # plants exact duplicates -> not a key, with exact dup accounting
    r = rows[("ucc", "clip_id", None)]
    n_dups = clips.count() - clips.select("clip_id").distinct().count()
    assert r["holds"] is False and r["n_bad"] == n_dups > 0
    # orphan refs break refs.clip_id <= clips.clip_id
    r = rows[("ind", "refs.clip_id", "clips.clip_id")]
    assert r["holds"] is False and r["n_bad"] > 0
    assert 0.0 < r["metric"] < 1.0
    # low-NDV columns are HLL-refuted, never exact-checked -> no row
    assert ("ucc", "codec", None) not in rows
    # every stored row is global
    assert all(r["part"] == "*" for r in rows.values())


def test_discovery_verdicts_and_lineage(disc):
    eng, clips, _, verdicts = disc
    v = verdicts.collect()
    assert v and all(r["stage"] == "discovery" for r in v)
    # manifest lineage counts clips carrying a duplicated clip_id
    dup_clips = (
        clips.groupBy("clip_id").count().where("count > 1")
        .selectExpr("sum(count)").first()[0]
    )
    assert sum(r["n_violations"] for r in v) == dup_clips


def test_discovery_resume_skips(spark, disc, clips_dir):
    eng, clips, refs, _ = disc
    again = eng.run_discovery(clips, refs=refs, run_id="d2", resume=True)
    # all partitions already in the manifest -> nothing recomputed,
    # no verdicts under the new run_id
    assert again.count() == 0


def test_discovery_od_and_cfd_kinds(spark, clips_dir, tmp_path_factory):
    from pyspark.sql import functions as F

    out = str(tmp_path_factory.mktemp("disc_odcfd"))
    eng = ValidationEngine(spark, out, rules=[], profile_cfg=default_clips_config())
    clips = spark.read.parquet(f"{clips_dir}/clips").withColumn(
        "dur_bucket", (F.col("dur_ms") / 100).cast("int")
    )
    eng.run_discovery(
        clips,
        od_pairs=[("dur_ms", "dur_bucket"), ("dur_ms", "clip_id")],
        cfd_rules=[("codec", "sr_hz")],
        run_id="d1",
    )
    rows = eng.discovery_results().collect()
    ods = {r["rhs"]: r for r in rows if r["kind"] == "od"}
    # dur_bucket is a monotone function of the ordering column -> holds
    assert ods["dur_bucket"]["holds"] is True and ods["dur_bucket"]["metric"] == 1.0
    # clip_id strings are not duration-ordered -> violations counted
    assert ods["clip_id"]["holds"] is False and ods["clip_id"]["n_bad"] > 0
    cfds = [r for r in rows if r["kind"] == "cfd"]
    assert cfds and all(
        r["lhs"].startswith("codec=") and r["rhs"] == "sr_hz" for r in cfds
    )
    assert all(0.0 < r["metric"] <= 1.0 and r["n"] >= 2 for r in cfds)
    assert all(r["holds"] == (r["n_bad"] == 0) for r in cfds)


def test_job_cli_discover(spark, clips_dir, tmp_path_factory):
    from nadeefiler_spark import job

    out = str(tmp_path_factory.mktemp("disc_job"))
    summary = job.main(
        [
            "--clips", f"{clips_dir}/clips",
            "--refs", f"{clips_dir}/transcript_refs",
            "--out", out,
            "--discover", "--no-audio", "--no-drift",
        ],
        spark=spark,
    )
    assert "discovery" in summary["stages"]
    eng = ValidationEngine(spark, out, rules=[], profile_cfg=default_clips_config())
    assert eng.discovery_results().where("kind = 'ind'").count() == 2
