import numpy as np

from nadeefiler_spark import audio, datagen
from nadeefiler_spark.datagen import GenConfig


def test_row_spec_deterministic(tiny_cfg):
    a = datagen.row_spec(17, tiny_cfg)
    b = datagen.row_spec(17, tiny_cfg)
    assert a == b


def test_duplicates_are_exact_copies(tiny_cfg):
    dup = datagen.row_spec(212, tiny_cfg)  # 212 % 211 == 1
    orig = datagen.row_spec(211, tiny_cfg)
    assert dup == orig


def test_golden_violation_counts(tiny_cfg):
    g = datagen.golden_violations(tiny_cfg)
    for rule in [
        "unique_clip_id", "sr_domain", "transcript_required", "audio_duration",
        "audio_sample_rate", "audio_codec", "audio_snr", "ref_integrity",
        "transcript_equality",
    ]:
        assert len(g[rule]) > 0, rule
    # planted rates are small
    assert len(g["unique_clip_id"]) < tiny_cfg.n_rows * 0.03


def test_clips_df_schema_and_content(spark, tiny_cfg, clips_dir):
    df = spark.read.parquet(f"{clips_dir}/clips")
    assert set(df.columns) == {"clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript", "part"}
    assert df.count() == tiny_cfg.n_rows
    # codec skew: majority codec ~70%
    top = df.groupBy("codec").count().orderBy("count", ascending=False).first()
    assert top["codec"] == "pcm_s16le"
    assert top["count"] > tiny_cfg.n_rows * 0.6

    # a clean row decodes back to the reference render with infinite SNR
    row = df.filter("clip_id = 'clip-000000000000'").first()
    codec, sr, pcm = audio.decode(bytes(row["bytes"]))
    spec = datagen.row_spec(0, tiny_cfg)
    assert sr == spec["enc_sr"] and codec == spec["enc_codec"]
    ref = audio.render_pcm("clip-000000000000", spec["enc_sr"], spec["enc_dur_ms"])
    assert audio.snr_db(ref, pcm) == np.inf


def test_generation_parallelism_invariant(spark):
    """Same rows regardless of task count — required for the N-vs-4N bench."""
    cfg = GenConfig(n_rows=97, dur_min_ms=40, dur_max_ms=80)
    a = datagen.clips_df(spark, cfg).orderBy("clip_id").collect()
    c = datagen.clips_df(spark, cfg).repartition(3).orderBy("clip_id").collect()
    assert [r["clip_id"] for r in a] == [r["clip_id"] for r in c]
    assert [bytes(r["bytes"]) for r in a] == [bytes(r["bytes"]) for r in c]


def test_refs_have_orphans(spark, tiny_cfg, clips_dir):
    refs = spark.read.parquet(f"{clips_dir}/transcript_refs")
    orphans = refs.filter("clip_id like 'orphan-%'").count()
    assert orphans == len(datagen.golden_violations(tiny_cfg)["ref_integrity"])
