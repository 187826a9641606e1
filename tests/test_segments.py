"""Fixed-window segmentation manifest (operators/segments.py): planted
window math, tiling invariants over real datagen clips, bytes-free plan."""

import pytest
from pyspark.sql import functions as F

from nadeefiler_spark.operators.segments import segment_manifest


def test_planted_windows(spark):
    df = spark.createDataFrame(
        [("a", 100, 16000), ("b", 40, 8000), ("c", 25, 8000), ("z", 0, 8000)],
        "clip_id string, dur_ms int, sr_hz int",
    )
    rows = {
        (r["id"], r["seg_idx"]): (r["start_ms"], r["end_ms"], r["n_samples"])
        for r in segment_manifest(
            df, "clip_id", "dur_ms", "sr_hz", window_ms=40, overlap_ms=8
        ).collect()
    }
    # a: dur 100, stride 32 -> starts 0,32,64 (64+40 >= 100)
    assert rows[("a", 0)] == (0, 40, 640)
    assert rows[("a", 1)] == (32, 72, 640)
    assert rows[("a", 2)] == (64, 100, 576)
    assert ("a", 3) not in rows
    # b: exactly one window
    assert rows[("b", 0)] == (0, 40, 320)
    assert ("b", 1) not in rows
    # c: shorter than a window -> one clamped segment
    assert rows[("c", 0)] == (0, 25, 200)
    # z: zero duration -> no segments
    assert not any(k[0] == "z" for k in rows)


def test_tiling_invariants_on_datagen_clips(spark, tiny_cfg, clips_dir):
    # datagen plants duplicate clip_ids (the uniqueness-rule fixture);
    # dedupe so the per-id grouping below is well-defined
    clips = (
        spark.read.parquet(f"{clips_dir}/clips")
        .dropDuplicates(["clip_id"])
    )
    segs = segment_manifest(
        clips, "clip_id", "dur_ms", "sr_hz", window_ms=50, overlap_ms=10
    )
    joined = segs.join(
        clips.select(F.col("clip_id").alias("id"), "dur_ms", "sr_hz"), "id"
    )
    bad = joined.where(
        (F.col("start_ms") < 0)
        | (F.col("end_ms") > F.col("dur_ms"))
        | (F.col("end_ms") <= F.col("start_ms"))
        | (F.col("n_samples")
           != ((F.col("end_ms") - F.col("start_ms")) * F.col("sr_hz") / 1000)
           .cast("bigint"))
    )
    assert bad.count() == 0
    # full coverage: per clip, max end == dur and min start == 0
    cov = joined.groupBy("id").agg(
        F.min("start_ms").alias("mn"),
        F.max("end_ms").alias("mx"),
        F.first("dur_ms").alias("dur"),
    )
    assert cov.where((F.col("mn") != 0) | (F.col("mx") != F.col("dur"))).count() == 0
    # every positive-duration clip appears
    assert cov.count() == clips.where(F.col("dur_ms") > 0).count()


def test_bytes_never_in_plan(spark, clips_dir):
    clips = spark.read.parquet(f"{clips_dir}/clips")
    segs = segment_manifest(
        clips, "clip_id", "dur_ms", "sr_hz", window_ms=50, overlap_ms=0
    )
    plan = segs._jdf.queryExecution().executedPlan().toString()
    assert "bytes" not in plan  # manifest never reads the audio payload


def test_overlap_validated(spark):
    df = spark.createDataFrame([("a", 100, 16000)], "clip_id string, dur_ms int, sr_hz int")
    with pytest.raises(ValueError):
        segment_manifest(df, "clip_id", "dur_ms", "sr_hz", 40, 40)
