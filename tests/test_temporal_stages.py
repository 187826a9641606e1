"""Engine temporal-lineage stages: incident sessionization and as-of
screen attribution over the manifest's run history.

These give the temporal operator family (operators.sessions /
operators.temporal — the event_sessions / asof_attribution contract
queries) engine-level lineage: manifest stage rows, per-partition
replace, resume, and invalidate-to-reopen — the same cascade mechanics
as the dedup/probe stages (VERDICT r3 directive 8).
"""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from nadeefiler_spark.engine import MANIFEST_SCHEMA, ValidationEngine
from nadeefiler_spark.profiler import default_clips_config


def _eng(spark, out):
    return ValidationEngine(
        spark, str(out), rules=[], profile_cfg=default_clips_config()
    )


def _seed(eng, rows):
    """Append crafted manifest rows: (run_id, part, stage, iso_ts,
    n_rows, n_violations)."""
    df = eng.spark.createDataFrame(
        [
            (r[0], r[1], r[2], datetime.fromisoformat(r[3]), r[4], r[5], 0)
            for r in rows
        ],
        schema=MANIFEST_SCHEMA,
    )
    eng.io.append(df, "manifest", coalesce=1)


def test_incident_sessions_groups_violating_runs(spark, tmp_path):
    eng = _eng(spark, tmp_path / "out")
    _seed(eng, [
        # p1/audio: two violating runs 1h apart (one incident), then a
        # clean run, then a violating run 30h after the first burst (a
        # SECOND incident at the default 24h gap)
        ("r1", "p1", "audio", "2026-01-01T00:00:00", 100, 3),
        ("r2", "p1", "audio", "2026-01-01T01:00:00", 100, 1),
        ("r3", "p1", "audio", "2026-01-01T02:00:00", 100, 0),
        ("r4", "p1", "audio", "2026-01-02T07:00:00", 100, 2),
        # p1/constraints: its own violating run -> separate incident key
        ("r1", "p1", "constraints", "2026-01-01T00:30:00", 100, 5),
        # p2: never violates -> no incidents, no manifest row
        ("r1", "p2", "audio", "2026-01-01T00:00:00", 100, 0),
    ])
    eng.run_incident_sessions(run_id="inc1")
    inc = {
        (r["part"], r["v_stage"], r["incident_idx"]): r
        for r in eng.incident_sessions().collect()
    }
    assert set(inc) == {
        ("p1", "audio", 1), ("p1", "audio", 2), ("p1", "constraints", 1)
    }
    burst = inc[("p1", "audio", 1)]
    assert burst["n_runs"] == 2 and burst["dur_s"] == 3600
    late = inc[("p1", "audio", 2)]
    assert late["n_runs"] == 1 and late["dur_s"] == 0
    m = {r["part"]: r for r in eng.manifest()
         .where(F.col("stage") == "incidents").collect()}
    assert set(m) == {"p1"}
    # n_rows = violating history rows, n_violations = incidents
    assert (m["p1"]["n_rows"], m["p1"]["n_violations"]) == (4, 3)


def test_incident_sessions_resume_and_invalidate(spark, tmp_path):
    eng = _eng(spark, tmp_path / "out")
    _seed(eng, [("r1", "p1", "audio", "2026-01-01T00:00:00", 100, 1)])
    eng.run_incident_sessions(run_id="inc1")
    assert eng.incident_sessions().count() == 1
    # resume skips the completed partition even though history grew
    _seed(eng, [("r2", "p1", "audio", "2026-02-01T00:00:00", 100, 1)])
    v2 = eng.run_incident_sessions(run_id="inc2")
    assert v2.count() == 0
    assert eng.incident_sessions().count() == 1
    # invalidate re-opens the unit; the re-run sees the new history
    assert eng.invalidate(["p1"], stages=("incidents",)) == 1
    eng.run_incident_sessions(run_id="inc3")
    assert eng.incident_sessions().count() == 2


def test_screen_attribution_asof_and_unscreened(spark, tmp_path):
    eng = _eng(spark, tmp_path / "out")
    _seed(eng, [
        ("c1", "p1", "certificate", "2026-01-01T00:00:00", 50, 0),
        ("a1", "p1", "audio", "2026-01-01T01:00:00", 100, 2),
        ("c2", "p1", "certificate", "2026-01-01T02:00:00", 50, 0),
        ("a2", "p1", "audio", "2026-01-01T03:00:00", 100, 0),
        # p2 decodes with no screen ever -> unscreened lineage gap
        ("a1", "p2", "audio", "2026-01-01T01:00:00", 100, 0),
    ])
    eng.run_screen_attribution(run_id="sc1")
    att = {
        (r["part"], r["run_id"]): r
        for r in eng.screen_attribution().collect()
    }
    assert att[("p1", "a1")]["screen_run_id"] == "c1"
    assert att[("p1", "a1")]["screen_lag_s"] == 3600
    assert att[("p1", "a2")]["screen_run_id"] == "c2"
    assert att[("p1", "a2")]["screen_lag_s"] == 3600
    assert att[("p2", "a1")]["screen_run_id"] is None
    m = {r["part"]: r for r in eng.manifest()
         .where(F.col("stage") == "screen").collect()}
    assert (m["p1"]["n_rows"], m["p1"]["n_violations"]) == (2, 0)
    assert (m["p2"]["n_rows"], m["p2"]["n_violations"]) == (1, 1)


def test_screen_attribution_resume_skips(spark, tmp_path):
    eng = _eng(spark, tmp_path / "out")
    _seed(eng, [
        ("c1", "p1", "certificate", "2026-01-01T00:00:00", 50, 0),
        ("a1", "p1", "audio", "2026-01-01T01:00:00", 100, 0),
    ])
    eng.run_screen_attribution(run_id="sc1")
    v2 = eng.run_screen_attribution(run_id="sc2")
    assert v2.count() == 0
    assert eng.screen_attribution().count() == 1


def test_recheck_uncertified_requires_certify():
    from nadeefiler_spark.job import build_parser, main

    with pytest.raises(SystemExit):
        main(["--clips", "/nonexistent", "--out", "/tmp/x",
              "--recheck-uncertified"])
    # the flag parses fine when --certify is present
    args = build_parser().parse_args(
        ["--clips", "c", "--out", "o", "--certify", "0.1",
         "--recheck-uncertified"]
    )
    assert args.recheck_uncertified and args.certify == 0.1
