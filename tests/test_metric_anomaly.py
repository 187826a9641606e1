"""Trailing-window metric anomaly detection (drift.metric_anomaly):
planted spike, warm-up suppression, zero-spread series, per-key
isolation."""

from nadeefiler_spark.drift import metric_anomaly


def _series(spark):
    # key 'a': flat 10s then a spike at t=6 then recovery
    # key 'b': constant 5s then one tiny step at t=5 (zero-spread window)
    rows = [("a", t, 10.0) for t in range(6)] + [("a", 6, 100.0), ("a", 7, 10.0)]
    rows += [("b", t, 5.0) for t in range(5)] + [("b", 5, 6.0)]
    return spark.createDataFrame(rows, "k string, t int, v double")


def test_spike_flagged_warmup_not(spark):
    got = {
        (r["k"], r["t"]): r
        for r in metric_anomaly(
            _series(spark), "v", "t", key_cols=("k",), window=7, k=2.0
        ).collect()
    }
    assert len(got) == 14  # every input row kept
    # warm-up rows (fewer than 3 trailing points) are never anomalies
    assert not got[("a", 0)]["anomaly"] and not got[("a", 2)]["anomaly"]
    assert got[("a", 2)]["n_prev"] == 2 and got[("a", 2)]["z"] == 0.0
    # the spike: trailing window is six 10s -> zero spread -> departure
    assert got[("a", 6)]["anomaly"] and got[("a", 6)]["mean_prev"] == 10.0
    # recovery point: window now contains the 100 -> huge std, 10 is fine
    assert not got[("a", 7)]["anomaly"]
    # zero-spread series: the 6.0 departs from constant 5s
    assert got[("b", 5)]["anomaly"] and got[("b", 5)]["z"] == 0.0
    assert not got[("b", 4)]["anomaly"]


def test_z_math_with_spread(spark):
    df = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 1, 2.0), ("a", 2, 3.0), ("a", 3, 2.0),
         ("a", 4, 8.0)],
        "k string, t int, v double",
    )
    got = {
        r["t"]: r
        for r in metric_anomaly(
            df, "v", "t", key_cols=("k",), window=7, k=2.0
        ).collect()
    }
    # t=4: prev = 1,2,3,2 -> mean 2, std_samp sqrt(2/3); z = 6/std
    import math

    std = math.sqrt(2.0 / 3.0)
    assert got[4]["z"] == round(6.0 / std, 6)
    assert got[4]["anomaly"]
    # t=3: prev 1,2,3 -> mean 2, std 1, z 0 -> fine
    assert got[3]["z"] == 0.0 and not got[3]["anomaly"]


def test_engine_run_history_screen(spark, tmp_path):
    """engine.metric_anomalies over the manifest: a planted violation
    spike in one partition's run history flags; the quiet series never
    does."""
    from nadeefiler_spark.engine import ValidationEngine
    from nadeefiler_spark.profiler import ProfileConfig

    eng = ValidationEngine(
        spark, str(tmp_path / "hist"), rules=[],
        profile_cfg=ProfileConfig(part_col="part"),
    )
    for i in range(8):
        eng._commit(f"r{i}", "profile", ["p", "q"],
                    {"p": 10, "q": 10},
                    {"p": 2, "q": 50 if i == 7 else 2}, 5)
    got = eng.metric_anomalies(window=7, k=2.0).collect()
    flagged = {(r["part"], r["value"]) for r in got if r["anomaly"]}
    assert flagged == {("q", 50.0)}
    assert len(got) == 16  # every manifest row screened


def test_engine_metric_changepoints_reads_manifest(spark, tmp_path):
    """smoke the engine composition: enough runs to admit a split."""
    from nadeefiler_spark import datagen
    from nadeefiler_spark.engine import ValidationEngine
    from nadeefiler_spark.presets import default_clip_rules
    from nadeefiler_spark.profiler import default_clips_config

    clips = datagen.clips_df(spark, datagen.GenConfig(n_rows=120))
    refs = datagen.refs_df(spark, datagen.GenConfig(n_rows=120))
    eng = ValidationEngine(
        spark, str(tmp_path / "out"),
        rules=default_clip_rules(with_drift=False, with_audio=False),
        profile_cfg=default_clips_config(),
    )
    for run in range(5):
        eng.run(clips, refs, resume=False, run_id=f"r{run}")
    out = eng.metric_changepoints()
    rows = out.collect()
    assert rows  # series of 5 runs admit a split (n > 2*min_seg)
    assert set(out.columns) == {
        "part", "stage", "split_at", "n", "mean_before", "mean_after", "score"
    }
    for r in rows:
        assert r["n"] == 5
