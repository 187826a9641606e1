"""Two-tier engine mode: with triage_sample_pct set, the decode tier
runs only on probe-flagged rows plus the audit sample; at 100% sampling
it must exactly reproduce the full-decode run, and at 0% the audio-stage
violations must be the full run's restricted to probe-flagged clips."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nadeefiler_spark import datagen
from nadeefiler_spark.engine import ValidationEngine
from nadeefiler_spark.operators.headerprobe import header_findings
from nadeefiler_spark.presets import default_clip_rules
from nadeefiler_spark.profiler import default_clips_config

CFG = datagen.GenConfig(n_rows=1200, seed=31, dur_min_ms=40, dur_max_ms=160)

AUDIO_RULES = ("audio_codec", "audio_sample_rate", "audio_duration", "audio_snr")


@pytest.fixture(scope="module")
def data(spark):
    return datagen.clips_df(spark, CFG), datagen.refs_df(spark, CFG)


def _run(spark, data, out, **kw):
    clips, refs = data
    eng = ValidationEngine(
        spark, out,
        rules=default_clip_rules(with_drift=False, with_header_triage=True),
        profile_cfg=default_clips_config(),
        **kw,
    )
    eng.run(clips, refs, run_id="r1")
    return eng


def _audio_viols(eng):
    return {
        (r["rule"], r["clip_id"], r["detail"])
        for r in eng.violations().where(F.col("rule").isin(*AUDIO_RULES)).collect()
    }


@pytest.fixture(scope="module")
def full(spark, data, tmp_path_factory):
    return _run(spark, data, str(tmp_path_factory.mktemp("full")))


def test_triage_at_full_sampling_equals_full_decode(spark, data, tmp_path_factory, full):
    triaged = _run(
        spark, data, str(tmp_path_factory.mktemp("t100")),
        triage_sample_pct=100.0,
    )
    assert _audio_viols(triaged) == _audio_viols(full)
    # every stage verdict identical
    v = lambda e: {
        (r["part"], r["stage"], r["passed"], r["n_violations"])
        for r in e.verdicts().collect()
    }
    assert v(triaged) == v(full)


def test_triage_at_zero_sampling_scopes_decode_to_flagged(spark, data, tmp_path_factory, full):
    triaged = _run(
        spark, data, str(tmp_path_factory.mktemp("t0")),
        triage_sample_pct=0.0,
    )
    clips, _ = data
    flagged = {
        r["clip_id"]
        for r in header_findings(clips)
        .where(F.col("hdr_finding").isNotNull())
        .collect()
    }
    expected = {
        (rule, cid, det)
        for (rule, cid, det) in _audio_viols(full)
        if cid in flagged
    }
    assert _audio_viols(triaged) == expected
    # the probe's own findings still cover the container mismatches at
    # the constraints stage, full coverage
    probe_rows = {
        r["clip_id"]
        for r in triaged.violations()
        .where(F.col("rule") == "header_triage")
        .collect()
    }
    assert probe_rows == flagged


def test_triage_profile_outputs_match_full(spark, data, tmp_path_factory, full):
    triaged = _run(
        spark, data, str(tmp_path_factory.mktemp("tprof")),
        triage_sample_pct=0.0,
    )
    cols = ["part", "key", "stat", "value"]
    have = set(c for c in full.profile_summary().columns)
    sel = [c for c in cols if c in have] or full.profile_summary().columns
    a = {tuple(r) for r in full.profile_summary().select(*sel).collect()}
    b = {tuple(r) for r in triaged.profile_summary().select(*sel).collect()}
    assert a == b


def test_job_triage_flag(spark, tmp_path, tmp_path_factory):
    from nadeefiler_spark import job

    base = tmp_path_factory.mktemp("triagejob")
    datagen.write_clips(spark, str(base), datagen.GenConfig(n_rows=400))
    out = str(tmp_path / "out")
    summary = job.main(
        [
            "--clips", f"{base}/clips",
            "--refs", f"{base}/transcript_refs",
            "--out", out,
            "--no-drift",
            "--triage", "0.0",
        ],
        spark=spark,
    )
    assert not summary["passed"]
    eng = ValidationEngine(spark, out)
    rules = {r["rule"] for r in eng.violations().select("rule").distinct().collect()}
    # the probe's findings are in the violations table, and the decode
    # tier still flags the routed (probe-flagged) rows
    assert "header_triage" in rules
    assert rules & set(AUDIO_RULES)
