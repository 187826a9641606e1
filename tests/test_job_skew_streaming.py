"""Tests for the spark-submit job entrypoint, salted aggregation, and
streaming incremental validation."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pytest

from nadeefiler_spark import datagen, job, skew
from nadeefiler_spark.engine import ValidationEngine
from nadeefiler_spark.presets import default_clip_rules
from nadeefiler_spark.profiler import default_clips_config
from nadeefiler_spark.streaming import StreamingValidator


@pytest.fixture(scope="module")
def clips_dirs(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("jobdata")
    datagen.write_clips(spark, str(base), datagen.GenConfig(n_rows=400))
    return str(base)


def test_job_main_runs_and_summarizes(spark, clips_dirs, tmp_path):
    out = str(tmp_path / "out")
    summary = job.main(
        [
            "--clips", f"{clips_dirs}/clips",
            "--refs", f"{clips_dirs}/transcript_refs",
            "--out", out,
            "--no-drift",
        ],
        spark=spark,
    )
    assert summary["n_violations"] > 0  # planted violations found
    assert not summary["passed"]
    assert set(summary["stages"]) == {"profile", "constraints", "audio"}
    # resumed run does no extra work and returns no new verdict rows
    summary2 = job.main(
        [
            "--clips", f"{clips_dirs}/clips",
            "--refs", f"{clips_dirs}/transcript_refs",
            "--out", out,
            "--no-drift",
        ],
        spark=spark,
    )
    assert summary2["partitions"] == []


def test_job_partition_filter(spark, clips_dirs, tmp_path):
    out = str(tmp_path / "out_part")
    summary = job.main(
        ["--clips", f"{clips_dirs}/clips", "--out", out,
         "--no-audio", "--no-drift", "--partitions", "flac"],
        spark=spark,
    )
    assert summary["partitions"] == ["flac"]


def test_salted_count_equals_plain_groupby(spark, clips_dirs):
    clips = spark.read.parquet(f"{clips_dirs}/clips")
    plain = {
        (r["codec"],): r["count"]
        for r in clips.groupBy("codec").count().collect()
    }
    salted = {
        (r["codec"],): r["count"]
        for r in skew.salted_count(
            clips, ["codec"], buckets=8, salt_from="clip_id"
        ).collect()
    }
    assert plain == salted


def test_salted_agg_general(spark, clips_dirs):
    clips = spark.read.parquet(f"{clips_dirs}/clips")
    out = skew.salted_agg(
        clips,
        ["codec"],
        partial_aggs=[F.sum("dur_ms").alias("s"), F.max("dur_ms").alias("m")],
        final_aggs=[F.sum("s").alias("sum_dur"), F.max("m").alias("max_dur")],
        buckets=8,
        salt_from="clip_id",
    )
    expect = clips.groupBy("codec").agg(
        F.sum("dur_ms").alias("sum_dur"), F.max("dur_ms").alias("max_dur")
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, expect.collect()))


def test_streaming_incremental_validation(spark, tmp_path):
    base = tmp_path / "stream"
    datagen.write_clips(spark, str(base), datagen.GenConfig(n_rows=300))
    out = str(base / "out")
    eng = ValidationEngine(
        spark, out,
        rules=default_clip_rules(with_refs=True, with_audio=False, with_drift=False),
        profile_cfg=default_clips_config(),
    )
    sv = StreamingValidator(
        spark=spark,
        clips_dir=f"{base}/clips",
        refs_dir=f"{base}/transcript_refs",
        checkpoint_dir=str(base / "ckpt"),
        engine=eng,
    )
    q = sv.start(available_now=True)
    q.awaitTermination(120)

    verdicts = eng.verdicts()
    assert verdicts.count() > 0
    viols = eng.violations()
    assert viols.where(F.col("rule") == "unique_clip_id").count() > 0

    # batch-equivalent run on the same input produces the same violation set
    out2 = str(base / "out_batch")
    eng2 = ValidationEngine(
        spark, out2,
        rules=default_clip_rules(with_refs=True, with_audio=False, with_drift=False),
        profile_cfg=default_clips_config(),
    )
    eng2.run(
        spark.read.parquet(f"{base}/clips"),
        refs=spark.read.parquet(f"{base}/transcript_refs"),
        resume=False,
    )
    a = sorted(map(tuple, viols.select("part", "rule", "clip_id").collect()))
    b = sorted(map(tuple, eng2.violations().select("part", "rule", "clip_id").collect()))
    assert a == b


def test_streaming_partition_spans_batches(spark, tmp_path):
    """Regression: files for ONE partition arriving across MULTIPLE
    micro-batches must not clobber earlier results — each batch
    revalidates the full current partition contents, so cross-batch
    duplicates ARE detected and the final state equals a batch run."""
    import pandas as pd

    base = tmp_path / "mb"
    cfg = datagen.GenConfig(n_rows=300)

    def pdf(lo: int, hi: int) -> pd.DataFrame:
        specs = [datagen.row_spec(i, cfg) for i in range(lo, hi)]
        return pd.DataFrame(
            {
                "clip_id": [s["clip_id"] for s in specs],
                "bytes": [datagen.render_row_bytes(s) for s in specs],
                "sr_hz": pd.array([s["sr_hz"] for s in specs], dtype="int32"),
                "dur_ms": pd.array([s["dur_ms"] for s in specs], dtype="int32"),
                "codec": [s["codec"] for s in specs],
                "transcript": [s["transcript"] for s in specs],
                "part": [s["part"] for s in specs],
            }
        )

    # row 212 is datagen's planted duplicate of row 211 — split the pair
    # across the two files so the duplicate can only meet cross-batch
    clips_dir = str(base / "clips")
    for lo, hi in ((0, 212), (212, 300)):
        spark.createDataFrame(pdf(lo, hi), datagen.CLIPS_SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(clips_dir)

    eng = ValidationEngine(
        spark, str(base / "out"),
        rules=default_clip_rules(with_refs=False, with_audio=False, with_drift=False),
        profile_cfg=default_clips_config(),
    )
    sv = StreamingValidator(
        spark=spark,
        clips_dir=clips_dir,
        checkpoint_dir=str(base / "ckpt"),
        engine=eng,
        max_files_per_trigger=1,  # forces the pair into separate batches
    )
    q = sv.start(available_now=True)
    q.awaitTermination(180)

    viol = eng.violations().toPandas()
    dup_ids = set(viol[viol["rule"] == "unique_clip_id"]["clip_id"])
    assert "clip-000000000211" in dup_ids  # the cross-batch duplicate

    # final state == one-shot batch validation of the same input
    eng2 = ValidationEngine(
        spark, str(base / "out_batch"),
        rules=default_clip_rules(with_refs=False, with_audio=False, with_drift=False),
        profile_cfg=default_clips_config(),
    )
    eng2.run(spark.read.parquet(clips_dir), resume=False)
    a = sorted(map(tuple, viol[["part", "rule", "clip_id"]].values.tolist()))
    b = sorted(
        map(tuple, eng2.violations().select("part", "rule", "clip_id").collect())
    )
    assert a == b


def test_get_spark_honors_master_env():
    """SPARK_GRAFT_MASTER overrides the local[] default (the
    spark-submit cluster path sets it to 'external'); verified in a
    fresh process because a JVM's master is fixed at startup."""
    import subprocess
    import sys

    code = (
        "import os, sys; sys.path.insert(0, '/root/repo'); "
        "os.environ['SPARK_GRAFT_MASTER'] = 'local[2]'; "
        "from nadeefiler_spark.session import get_spark; "
        "s = get_spark(parallelism=8); "
        "print('MASTER=' + s.sparkContext.master)"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=180)
    assert "MASTER=local[2]" in out.stdout, out.stderr[-500:]


def test_job_semantic_kb_stage(spark, clips_dirs, tmp_path):
    kb_path = str(tmp_path / "kb")
    spark.createDataFrame(
        [("pcm_s16le", ["wikicat_PCM_Audio"]), ("opus", ["wikicat_Compressed"])],
        "subject string, objects array<string>",
    ).write.parquet(kb_path)
    out = str(tmp_path / "out_sem")
    summary = job.main(
        ["--clips", f"{clips_dirs}/clips", "--out", out,
         "--no-audio", "--no-drift", "--semantic-kb", kb_path],
        spark=spark,
    )
    assert "semantic" in summary["stages"]
    # the cascade stage commits real manifest rows (resume grain)
    eng = ValidationEngine(spark, out)
    sem_manifest = eng.manifest().where(F.col("stage") == "semantic").toPandas()
    assert len(sem_manifest) > 0
    assert (sem_manifest["n_rows"] > 0).all()


def test_job_fd_stage(spark, clips_dirs, tmp_path):
    """--fd-cols runs the FD cascade stage end-to-end through the CLI:
    fd_results table rows + stage='fd' manifest rows + resume skip."""
    out = str(tmp_path / "out_fd")
    summary = job.main(
        ["--clips", f"{clips_dirs}/clips", "--out", out,
         "--no-audio", "--no-drift", "--fd-cols"],
        spark=spark,
    )
    assert "fd" in summary["stages"]
    eng = ValidationEngine(spark, out)
    fd_pd = eng.fd_results().toPandas()
    assert len(fd_pd) > 0
    # datagen plants codec-named partitions: within a partition the codec
    # column is constant, so every lhs -> codec FD holds trivially
    codec_rhs = fd_pd[fd_pd["rhs"] == "codec"]
    assert len(codec_rhs) > 0 and codec_rhs["holds"].all()
    manifest = eng.manifest().where(F.col("stage") == "fd").toPandas()
    assert set(manifest["part"]) == set(fd_pd["part"])
    # resumed run skips all fd partitions
    summary2 = job.main(
        ["--clips", f"{clips_dirs}/clips", "--out", out,
         "--no-audio", "--no-drift", "--fd-cols"],
        spark=spark,
    )
    assert summary2["partitions"] == []


def test_windowed_event_stats_stream_equals_batch(spark, tmp_path):
    """ONE definition, two execution modes: the windowed aggregation run
    as a real stream (file source, one file per micro-batch, complete
    mode) converges to exactly the batch answer over the same rows."""
    import datetime as dt

    from nadeefiler_spark.streaming import windowed_event_stats

    def h(hour, minute=0):
        return dt.datetime(2026, 1, 1, hour, minute)

    src = str(tmp_path / "ev")
    f1 = [
        (h(0, 5), "click", 1.0),
        (h(0, 40), "click", 3.0),
        (h(0, 50), "view", 7.0),
        (h(1, 10), "click", 5.0),
    ]
    f2 = [
        (h(1, 30), "click", -1.0),
        (h(2, 15), "view", 4.0),
    ]
    schema = "ts timestamp, event_type string, value double"
    for rows in (f1, f2):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        windowed_event_stats(stream)
        .writeStream.format("memory")
        .queryName("win_complete")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    def canon(df):
        return sorted(
            (str(r["window_start"]), r["event_type"], r["n_events"],
             round(r["avg_value"], 9))
            for r in df.collect()
        )

    batch = windowed_event_stats(spark.read.parquet(src))
    assert canon(spark.table("win_complete")) == canon(batch)
    assert len(canon(batch)) == 4  # (h0,click) (h0,view) (h1,click) (h2,view)


def test_windowed_event_stats_null_values_use_nonnull_avg(spark):
    """avg() semantics under NULLs: NULL values are ABSENT from the
    mean (denominator = non-null count), not zeros — while n_events
    stays count(*). An all-NULL window yields avg_value NULL, not a
    division blow-up (ADVICE r4: the decimal-sum rewrite must not
    silently change the denominator to count(*))."""
    import datetime as dt

    from nadeefiler_spark.streaming import windowed_event_stats

    rows = [
        (dt.datetime(2026, 1, 1, 0, 5), "click", 2.0),
        (dt.datetime(2026, 1, 1, 0, 10), "click", None),
        (dt.datetime(2026, 1, 1, 0, 40), "click", 4.0),
        (dt.datetime(2026, 1, 1, 1, 5), "view", None),
        (dt.datetime(2026, 1, 1, 1, 6), "view", None),
    ]
    df = spark.createDataFrame(
        rows, "ts timestamp, event_type string, value double"
    )
    out = {
        (str(r["window_start"]), r["event_type"]): r
        for r in windowed_event_stats(df).collect()
    }
    mixed = out[("2026-01-01 00:00:00", "click")]
    assert mixed["n_events"] == 3
    assert abs(mixed["avg_value"] - 3.0) < 1e-12  # (2+4)/2, not /3
    allnull = out[("2026-01-01 01:00:00", "view")]
    assert allnull["n_events"] == 2
    assert allnull["avg_value"] is None
    assert allnull["min_value"] is None


def test_windowed_event_stats_watermark_drops_late_rows(spark, tmp_path):
    """Append mode + watermark: a window is emitted once the watermark
    passes its end, and a row arriving LATER than the watermark (across
    a checkpoint-restart) is dropped instead of reopening the finalized
    window — the state-bounding behavior that keeps event-time
    aggregation runnable forever at ingest scale."""
    import datetime as dt

    from nadeefiler_spark.streaming import windowed_event_stats

    def h(hour, minute=0):
        return dt.datetime(2026, 1, 1, hour, minute)

    src = tmp_path / "late_ev"
    src.mkdir()
    sink = str(tmp_path / "late_out")
    ckpt = str(tmp_path / "late_ckpt")
    schema = "ts timestamp, event_type string, value double"

    def drain():
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            windowed_event_stats(stream, watermark="2 hours")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: two rows in the hour-0 window plus one at hour 10 that
    # advances the watermark to hour 8, finalizing (and emitting) hour 0
    spark.createDataFrame(
        [(h(0, 10), "click", 1.0), (h(0, 45), "click", 3.0),
         (h(10, 0), "view", 9.0)],
        schema,
    ).coalesce(1).write.mode("append").parquet(str(src))
    drain()

    # batch 2 (fresh query restarted from the checkpoint — the watermark
    # is restored, not reset): a LATE hour-0 row behind the watermark
    # must be dropped; hour 11 keeps its window open (never emitted)
    spark.createDataFrame(
        [(h(0, 20), "click", 100.0), (h(11, 0), "view", 2.0)], schema
    ).coalesce(1).write.mode("append").parquet(str(src))
    drain()

    got = pd.read_parquet(sink)
    assert len(got) == 1  # only the finalized hour-0 window ever emitted
    row = got.iloc[0]
    assert str(row["window_start"]).startswith("2026-01-01 00:00:00")
    assert row["event_type"] == "click"
    assert row["n_events"] == 2  # late 100.0 row NOT re-aggregated
    assert abs(row["avg_value"] - 2.0) < 1e-12


def test_streaming_stateful_dedup(spark, tmp_path):
    """Cross-batch dedup state: a duplicate arriving in a LATER batch —
    after a full query restart from the checkpoint — is flagged against
    the original keeper."""
    from nadeefiler_spark.streaming import streaming_exact_dedup

    src = tmp_path / "docs"
    src.mkdir()
    sink = str(tmp_path / "dedup_out")
    ckpt = str(tmp_path / "dedup_ckpt")

    def drain():
        stream = spark.readStream.schema("doc_id long, text string").json(str(src))
        q = (
            streaming_exact_dedup(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: in-batch duplicate (doc 3 repeats doc 1's content; keeper
    # must be the LOWEST id, not arrival order — listed 3 before 1)
    pd.DataFrame(
        {"doc_id": [3, 1, 2], "text": ["hello", "hello", "world"]}
    ).to_json(src / "b1.json", orient="records", lines=True)
    drain()

    # batch 2, separate query restarted from the checkpoint: doc 4
    # repeats batch-1 content, doc 5 is fresh
    pd.DataFrame(
        {"doc_id": [4, 5], "text": ["hello", "fresh"]}
    ).to_json(src / "b2.json", orient="records", lines=True)
    drain()

    got = (
        pd.read_parquet(sink)
        .sort_values("doc_id")
        .set_index("doc_id")[["keeper_id", "is_dup"]]
    )
    assert len(got) == 5
    assert not got.loc[1, "is_dup"] and got.loc[1, "keeper_id"] == 1
    assert not got.loc[2, "is_dup"]
    assert got.loc[3, "is_dup"] and got.loc[3, "keeper_id"] == 1
    # the cross-batch case: state survived the restart
    assert got.loc[4, "is_dup"] and got.loc[4, "keeper_id"] == 1
    assert not got.loc[5, "is_dup"] and got.loc[5, "keeper_id"] == 5


def test_job_content_dedup_flag(spark, clips_dirs, tmp_path):
    out = str(tmp_path / "out_cd")
    summary = job.main(
        ["--clips", f"{clips_dirs}/clips", "--out", out,
         "--no-audio", "--no-drift", "--content-dedup"],
        spark=spark,
    )
    assert "content_dedup" in summary["stages"]
    from nadeefiler_spark.engine import ValidationEngine

    eng = ValidationEngine(spark, out, rules=[])
    assert eng.content_dups().count() > 0  # planted exact dups grouped


def test_job_embedding_dedup_flag(spark, clips_dirs, tmp_path):
    out = str(tmp_path / "out_ed")
    summary = job.main(
        ["--clips", f"{clips_dirs}/clips", "--out", out,
         "--no-audio", "--no-drift", "--embedding-dedup", "0.99"],
        spark=spark,
    )
    assert "embedding_dedup" in summary["stages"]
    from nadeefiler_spark.engine import ValidationEngine

    eng = ValidationEngine(spark, out, rules=[])
    clusters = eng.embedding_dups().toPandas()
    # planted exact duplicates (datagen i%211) are cos=1 pairs at minimum
    assert len(clusters) > 0
    assert (clusters["cluster_size"] >= 2).all()


def test_drift_monitor_stream_equals_batch(spark, tmp_path):
    """Continuous drift monitoring: the streamed monitor (append mode,
    watermark-finalized windows, PSI/KS in foreachBatch) produces for
    every FINALIZED window exactly the batch windowed_drift_metrics
    answer against the same baseline, and flags the planted drifted
    hour."""
    import datetime as dt

    from nadeefiler_spark import drift
    from nadeefiler_spark.streaming import (
        drift_monitor, windowed_drift_hist, windowed_drift_metrics,
    )

    def h(hour, minute=0):
        return dt.datetime(2026, 1, 1, hour, minute)

    schema = "ts timestamp, value double"
    src = str(tmp_path / "ev")
    # hour 0: values in buckets 0 and 5 — matches the baseline mix
    f1 = [(h(0, m), float(v)) for m, v in
          [(1, 1.0), (5, 2.0), (10, 6.0), (20, 3.0), (30, 7.0), (40, 1.5)]]
    # hour 1: values in bucket 50 — drifted
    f2 = [(h(1, m), 52.0) for m in (5, 15, 25, 35)]
    # flush: advances the watermark past hours 0 and 1 (its own window
    # stays open and must NOT appear in the monitor output)
    f3 = [(h(10, 0), 1.0)]
    for rows in (f1, f2, f3):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    # static baseline: the hour-0 distribution
    base = drift.global_baseline(
        windowed_drift_hist(
            spark.createDataFrame(f1, schema), bucket_hist_cols={"value": 5.0}
        )
    ).persist()

    out_path = str(tmp_path / "drift_out")
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        drift_monitor(
            stream, base, out_path, str(tmp_path / "ckpt"),
            bucket_hist_cols={"value": 5.0},
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        str(r["window_start"]): r
        for r in spark.read.parquet(out_path).collect()
    }
    assert set(got) == {str(h(0)), str(h(1))}  # open hour-10 window absent
    assert not got[str(h(0))]["drifted"]  # matches baseline: psi ~ 0
    assert got[str(h(1))]["drifted"]      # planted drift flagged

    # finalized windows match the batch answer exactly
    batch = windowed_drift_metrics(
        windowed_drift_hist(
            spark.read.parquet(src), bucket_hist_cols={"value": 5.0}
        ),
        base,
    )
    want = {
        str(r["window_start"]): r
        for r in batch.collect() if str(r["window_start"]) in got
    }
    for w, row in got.items():
        assert round(row["psi"], 6) == round(want[w]["psi"], 6)
        assert round(row["ks_d"], 6) == round(want[w]["ks_d"], 6)
    base.unpersist()


def test_drift_monitor_with_engine_baseline(spark, tmp_path):
    """End-to-end tie: a validated batch's engine profile histograms
    (ValidationEngine.drift_baseline) serve directly as the streaming
    monitor's baseline — bins align because both sides share
    profiler.hist_entry_exprs. An identical-mix hour passes, an
    all-one-codec hour drifts."""
    import datetime as dt

    from nadeefiler_spark.profiler import ProfileConfig
    from nadeefiler_spark.streaming import drift_monitor

    def h(hour, minute=0):
        return dt.datetime(2026, 1, 1, hour, minute)

    codecs0 = ["flac", "mp3", "flac", "opus", "flac", "mp3"]
    batch = spark.createDataFrame(
        [(f"c{i}", c, c) for i, c in enumerate(codecs0)],
        "clip_id string, codec string, part string",
    )
    eng = ValidationEngine(
        spark, str(tmp_path / "out"), rules=[],
        profile_cfg=ProfileConfig(value_hist_cols=("codec",)),
    )
    eng.run(batch, resume=False)
    base = eng.drift_baseline().persist()

    f1 = [(h(0, i), c) for i, c in enumerate(codecs0)]  # same mix: psi ~ 0
    f2 = [(h(1, i), "mp3") for i in range(6)]           # all-mp3 hour: drift
    f3 = [(h(10), "flac")]                              # watermark flush
    src = str(tmp_path / "s")
    for rows in (f1, f2, f3):
        spark.createDataFrame(rows, "ts timestamp, codec string").coalesce(
            1
        ).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("ts timestamp, codec string")
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        drift_monitor(
            stream, base, str(tmp_path / "dout"), str(tmp_path / "ck"),
            value_hist_cols=("codec",),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        str(r["window_start"]): r
        for r in spark.read.parquet(str(tmp_path / "dout")).collect()
    }
    assert set(got) == {str(h(0)), str(h(1))}
    assert not got[str(h(0))]["drifted"]
    assert got[str(h(1))]["drifted"]
    base.unpersist()


def test_windowed_text_quality_stream_equals_batch(spark, tmp_path):
    import datetime as dt

    from nadeefiler_spark.streaming import windowed_text_quality

    def h(hour, minute=0):
        return dt.datetime(2026, 1, 1, hour, minute)

    src = str(tmp_path / "docs")
    f1 = [
        (h(0, 5), "a perfectly normal document with plenty of words " * 3),
        (h(0, 40), "short"),
        (h(1, 10), "contact me at leak@example.com for the real data"),
    ]
    f2 = [
        (h(1, 30), "another ordinary body of text that goes on a bit " * 2),
        (h(2, 15), "!!! ??? ... ;;; :::"),
    ]
    schema = "ts timestamp, text string"
    for rows in (f1, f2):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        windowed_text_quality(stream)
        .writeStream.format("memory")
        .queryName("wtq_complete")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    def canon(df):
        return sorted(
            (str(r["window_start"]), r["n_docs"], r["pii_docs"],
             r["avg_quality"], r["avg_tokens"])
            for r in df.collect()
        )

    batch = windowed_text_quality(spark.read.parquet(src))
    got = canon(spark.table("wtq_complete"))
    assert got == canon(batch)
    assert len(got) == 3  # hours 0, 1, 2
    by_hour = {g[0]: g for g in got}
    assert by_hour[str(h(1))][2] == 1  # the email doc's window flags PII
    assert by_hour[str(h(0))][2] == 0


def test_job_admit_flag(spark, clips_dirs, tmp_path):
    out = str(tmp_path / "out_adm")
    # delivery batch: one byte copy of a corpus clip + one fresh clip
    from nadeefiler_spark import audio

    clips = spark.read.parquet(f"{clips_dirs}/clips")
    row = clips.limit(1).collect()[0]
    pcm = audio.render_pcm("cli-admit-new", 16000, 120)
    batch_path = str(tmp_path / "delivery-0042")
    spark.createDataFrame(
        [("adm-copy", bytes(row["bytes"])),
         ("adm-new", audio.encode(pcm, 16000, "pcm_s16le"))],
        "clip_id string, bytes binary",
    ).write.parquet(batch_path)

    summary = job.main(
        ["--clips", f"{clips_dirs}/clips", "--out", out,
         "--no-audio", "--no-drift", "--admit", batch_path],
        spark=spark,
    )
    assert "admission" in summary["stages"]
    assert "delivery-0042" in summary["partitions"]  # batch id = basename
    from nadeefiler_spark.engine import ValidationEngine

    eng = ValidationEngine(spark, out, rules=[])
    adm = eng.admissions().toPandas()
    got = dict(zip(adm["id"], adm["disposition"]))
    assert got == {"adm-copy": "exact_corpus", "adm-new": "accept"}


def test_streaming_admission_monitor(spark, tmp_path):
    """Deliveries landing as batch=<id> dirs are classified per delivery;
    replays/new arrivals are idempotent through the per-delivery replace."""
    from nadeefiler_spark import audio
    from nadeefiler_spark.streaming import AdmissionMonitor

    base = tmp_path / "adm_stream"
    datagen.write_clips(
        spark, str(base), datagen.GenConfig(n_rows=200, dur_min_ms=60)
    )
    corpus = spark.read.parquet(f"{base}/clips")
    row = corpus.limit(1).collect()[0]
    deliveries = str(base / "deliveries")

    def write_delivery(did: str, rows):
        spark.createDataFrame(rows, "clip_id string, bytes binary").coalesce(
            1
        ).write.parquet(f"{deliveries}/batch={did}")

    pcm = audio.render_pcm("stream-new-1", 16000, 120)
    write_delivery("d1", [("c-copy", bytes(row["bytes"]))])
    write_delivery("d2", [("c-new", audio.encode(pcm, 16000, "flac"))])

    eng = ValidationEngine(spark, str(base / "out"), rules=[])
    mon = AdmissionMonitor(
        spark=spark,
        corpus=corpus,
        deliveries_dir=deliveries,
        checkpoint_dir=str(base / "ckpt"),
        engine=eng,
    )
    q = mon.start(available_now=True)
    q.awaitTermination(120)

    adm = eng.admissions().toPandas()
    got = {(r.part, r.id): r.disposition for r in adm.itertuples()}
    assert got == {
        ("d1", "c-copy"): "exact_corpus",
        ("d2", "c-new"): "accept",
    }

    # a third delivery arrives: draining again admits ONLY the new one
    # (checkpoint skips processed files) and earlier rows are unchanged
    write_delivery("d3", [("c-copy2", bytes(row["bytes"]))])
    q = mon.start(available_now=True)
    q.awaitTermination(120)
    adm2 = eng.admissions().toPandas()
    got2 = {(r.part, r.id): r.disposition for r in adm2.itertuples()}
    assert got2 == {**got, ("d3", "c-copy2"): "exact_corpus"}
    # one manifest admission row per (delivery, drain-run) that ran
    m = eng.manifest().where(F.col("stage") == "admission").toPandas()
    assert sorted(m["part"]) == ["d1", "d2", "d3"]


def test_job_index_then_admit(spark, clips_dirs, tmp_path):
    """--index builds the fp_index; --admit in the same invocation
    classifies against it (content tier green without corpus re-decode)."""
    from nadeefiler_spark import audio

    out = str(tmp_path / "out_idx_adm")
    clips = spark.read.parquet(f"{clips_dirs}/clips")
    row = clips.limit(1).collect()[0]
    _c, sr, pcm = audio.decode(bytes(row["bytes"]))
    batch_path = str(tmp_path / "delivery-idx")
    spark.createDataFrame(
        [("re-enc", audio.encode(pcm, int(sr), "opus"))],
        "clip_id string, bytes binary",
    ).write.parquet(batch_path)

    summary = job.main(
        ["--clips", f"{clips_dirs}/clips", "--out", out,
         "--no-audio", "--no-drift", "--index", "--admit", batch_path],
        spark=spark,
    )
    assert {"fp_index", "admission"} <= set(summary["stages"])
    from nadeefiler_spark.engine import ValidationEngine

    eng = ValidationEngine(spark, out, rules=[])
    assert eng.fp_index().count() == clips.count()
    adm = eng.admissions().toPandas()
    assert list(adm["disposition"]) == ["content_corpus"]


def test_windowed_expectations_stream_equals_batch(spark, tmp_path):
    import datetime as dt

    from nadeefiler_spark import expectations as E
    from nadeefiler_spark.streaming import windowed_expectations

    def h(hour, minute=0):
        return dt.datetime(2026, 1, 1, hour, minute)

    src = str(tmp_path / "exp_events")
    f1 = [
        (h(0, 5), "view", 10.0),
        (h(0, 40), "click", None),      # hour 0 fails completeness
        (h(1, 10), "view", 30.0),
    ]
    f2 = [
        (h(1, 30), "bogus", 40.0),      # hour 1 fails values_in
        (h(2, 15), "view", 900.0),      # hour 2 fails max
    ]
    schema = "ts timestamp, event_type string, value double"
    for rows in (f1, f2):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    suite = [
        E.size_between(1),
        E.completeness("value", 1.0),
        E.max_at_most("value", 100.0),
        E.values_in("event_type", ["view", "click"], 1.0),
    ]
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        windowed_expectations(stream, suite)
        .writeStream.format("memory")
        .queryName("wexp_complete")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    def canon(df):
        return sorted(
            (str(r["window_start"]), r["check"], r["value"], r["passed"])
            for r in df.collect()
        )

    batch = windowed_expectations(spark.read.parquet(src), suite)
    got = canon(spark.table("wexp_complete"))
    assert got == canon(batch)
    verdict = {(g[0], g[1]): g[3] for g in got}
    assert len(verdict) == 12  # 3 hours x 4 checks
    assert verdict[(str(h(0)), "completeness(value)")] is False
    assert verdict[(str(h(1)), "values_in(event_type)")] is False
    assert verdict[(str(h(2)), "max(value)")] is False
    assert verdict[(str(h(1)), "completeness(value)")] is True


def test_job_vad_flag(spark, clips_dirs, tmp_path):
    out = str(tmp_path / "out_vad")
    summary = job.main(
        ["--clips", f"{clips_dirs}/clips", "--out", out,
         "--no-audio", "--no-drift", "--vad"],
        spark=spark,
    )
    assert "vad" in summary["stages"]
    from nadeefiler_spark.engine import ValidationEngine

    eng = ValidationEngine(spark, out, rules=[])
    stats = eng.vad_stats()
    assert stats.count() == spark.read.parquet(f"{clips_dirs}/clips").count()
    assert stats.where("speech_ratio IS NOT NULL").count() > 0


def test_job_history_anomalies_flag(spark, clips_dirs, tmp_path):
    out = str(tmp_path / "hist_out")
    args = ["--clips", f"{clips_dirs}/clips", "--out", out,
            "--no-audio", "--no-drift", "--history-anomalies"]
    summary = job.main(args, spark=spark)
    # two runs of history: far below min_history, nothing can flag
    summary2 = job.main(args + ["--no-resume"], spark=spark)
    assert summary["history_anomalies"] == []
    assert summary2["history_anomalies"] == []


def test_job_embedding_drift_and_mvo_flags(spark, clips_dirs, tmp_path):
    """--embedding-drift runs the centroid-drift stage (MIN_COS far below
    any real centroid so nothing flags on the homogeneous synthetic
    corpus); --mvo adds the multivariate outlier rule to the drift
    stage."""
    out = str(tmp_path / "out_edr")
    summary = job.main(
        [
            "--clips", f"{clips_dirs}/clips",
            "--out", out,
            "--no-audio",
            "--mvo",
            "--embedding-drift", "0.0",
        ],
        spark=spark,
    )
    assert "embedding_drift" in summary["stages"]
    eng = ValidationEngine(spark, out, rules=[])
    rep = eng.embedding_drift().toPandas()
    assert len(rep) > 0 and not rep["drifted"].any()
    # the mvo rule ran inside the drift stage (violation rows or not,
    # the rule name must be a known rule of the run's manifest stage)
    assert "drift" in summary["stages"]


def test_embedding_drift_monitor_stream_equals_batch(spark, tmp_path):
    """Vector sibling of the drift monitor: windowed centroid sums
    finalize at the watermark, each finalized window's cosine/shift vs
    the static baseline centroid matches the batch answer exactly, and
    the planted drifted hour (vectors pointing elsewhere) flags."""
    import datetime as dt

    from nadeefiler_spark.drift import embedding_baseline
    from nadeefiler_spark.streaming import (
        embedding_drift_monitor,
        windowed_embedding_drift,
        windowed_embedding_sums,
    )

    def h(hour, minute=0):
        return dt.datetime(2026, 1, 1, hour, minute)

    DIM = 4
    schema = "ts timestamp, v array<float>"
    src = str(tmp_path / "vecs")
    # hour 0: vectors near [1,1,0,0]; one NULL (n_bad) — healthy
    f1 = [(h(0, m), [1.0, 1.0 + 0.01 * m, 0.0, 0.0]) for m in range(6)]
    f1.append((h(0, 59), None))
    # hour 1: vectors near [0,0,1,1] — drifted
    f2 = [(h(1, m), [0.0, 0.0, 1.0, 1.0 + 0.01 * m]) for m in range(4)]
    # flush: advances the watermark past hours 0 and 1
    f3 = [(h(10, 0), [1.0, 1.0, 0.0, 0.0])]
    for rows in (f1, f2, f3):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    # static baseline: the healthy hour-0 corpus
    base = embedding_baseline(
        spark.createDataFrame(f1, schema), "v", DIM
    )

    out_path = str(tmp_path / "edrift_out")
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        embedding_drift_monitor(
            stream, base, out_path, str(tmp_path / "edrift_ckpt"),
            vec_col="v", dim=DIM, min_cos=0.9,
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        str(r["window_start"]): r
        for r in spark.read.parquet(out_path).collect()
    }
    assert set(got) == {str(h(0)), str(h(1))}  # open hour-10 window absent
    assert not got[str(h(0))]["drifted"]
    assert got[str(h(0))]["n_bad"] == 1  # the NULL vector
    assert got[str(h(1))]["drifted"]
    assert got[str(h(1))]["global_cos"] < 0.1  # orthogonal centroid

    # finalized windows match the batch answer exactly
    batch = windowed_embedding_drift(
        windowed_embedding_sums(spark.read.parquet(src), "v", DIM),
        base, DIM, min_cos=0.9,
    )
    want = {
        str(r["window_start"]): r
        for r in batch.collect() if str(r["window_start"]) in got
    }
    for k, wr in want.items():
        gr = got[k]
        for c in ("n_vecs", "n_bad", "centroid_norm", "global_cos",
                  "centroid_shift", "drifted"):
            assert gr[c] == wr[c], (k, c, gr[c], wr[c])


def test_job_regress_baseline_flag(spark, clips_dirs, tmp_path):
    """--regress-baseline runs the data-CI stage against a previous
    run's out_dir and lands regressions in suite_regression_results."""
    out_a = str(tmp_path / "rel_a")
    job.main(
        ["--clips", f"{clips_dirs}/clips", "--out", out_a,
         "--no-drift", "--no-audio"],
        spark=spark,
    )
    # release B: same corpus with an escaped duration
    clips_b = (
        spark.read.parquet(f"{clips_dirs}/clips")
        .withColumn(
            "dur_ms",
            F.when(F.col("clip_id").endswith("3"), F.lit(10_000_000))
             .otherwise(F.col("dur_ms")),
        )
    )
    b_dir = str(tmp_path / "clips_b")
    clips_b.write.parquet(b_dir)
    out_b = str(tmp_path / "rel_b")
    summary = job.main(
        ["--clips", b_dir, "--out", out_b, "--no-drift", "--no-audio",
         "--regress-baseline", out_a, "--regress-id", "relA"],
        spark=spark,
    )
    assert "suite_regression" in summary["stages"]
    eng = ValidationEngine(spark, out_b, rules=[],
                           profile_cfg=default_clips_config())
    res = {(r["key"], r["check"]) for r in
           eng.suite_regression_results().collect()}
    assert ("dur_ms", "range") in res
    assert eng.manifest().where(
        (F.col("stage") == "suite_regression") & (F.col("part") == "relA")
    ).count() == 1


def test_job_certify_flag(spark, clips_dirs, tmp_path):
    out = str(tmp_path / "out_cert")
    summary = job.main(
        ["--clips", f"{clips_dirs}/clips", "--out", out,
         "--no-audio", "--no-drift", "--certify", "0.4",
         "--certify-eps", "0.05"],
        spark=spark,
    )
    assert "certificate" in summary["stages"]
    from nadeefiler_spark.engine import ValidationEngine

    eng = ValidationEngine(spark, out, rules=[])
    cert = eng.io.read("certificates").collect()
    clips = spark.read.parquet(f"{clips_dirs}/clips")
    parts = {r[0] for r in clips.select("part").distinct().collect()}
    assert {r["part"] for r in cert} == parts
    n_total = clips.count()
    n_sampled = sum(r["n_sampled"] for r in cert)
    assert 0 < n_sampled < n_total  # genuinely a subsample
    # datagen plants decode violations -> uncertified at a tight eps
    assert all(r["rate_ub"] > 0 for r in cert)
