"""Audio feature extraction + resampling (operators/audio_features.py),
including the composition that justifies them: audio -> embedding column
-> the existing ANN toolchain finds a re-encoded copy as nearest
neighbor."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from nadeefiler_spark import audio
from nadeefiler_spark.operators import ann, audio_features as AFE


def _corpus(spark):
    rows = []
    for i in range(12):
        pcm = audio.render_pcm(f"corp-{i}", 16000, 400)
        rows.append((f"corp-{i}", audio.encode(pcm, 16000, "pcm_s16le")))
    # a cross-codec re-encode of corp-3: its nearest neighbor by content
    pcm3 = audio.render_pcm("corp-3", 16000, 400)
    rows.append(("corp-3-re", audio.encode(pcm3, 16000, "flac")))
    rows.append(("junk", b"\x01nope"))
    return spark.createDataFrame(rows, "clip_id string, bytes binary")


def test_features_invariance_and_errors(spark):
    feats = {r["id"]: r for r in AFE.audio_features(_corpus(spark)).collect()}
    assert feats["junk"]["features"] is None and feats["junk"]["feat_error"]
    a, b = feats["corp-3"]["features"], feats["corp-3-re"]["features"]
    assert a == b  # identical decoded PCM -> identical embedding
    # L2-normalized
    assert abs(sum(x * x for x in a) - 1.0) < 1e-5
    assert len(a) == AFE.N_FEATURE_BANDS


def test_ann_over_audio_features(spark):
    """The composition: featurize audio, then the EXISTING embedding ANN
    finds the re-encoded copy as the top neighbor with cos ~ 1."""
    emb = (
        AFE.audio_features(_corpus(spark))
        .where(F.col("features").isNotNull())
        .select(F.col("id").alias("vec_id"), F.col("features").alias("embedding"))
    )
    q = emb.where(F.col("vec_id") == "corp-3-re")
    top = ann.brute_force_topk(emb, q, k=1).collect()
    assert len(top) == 1
    assert top[0]["neighbor_id"] == "corp-3" and top[0]["cos"] == 1.0


def test_resample_clips_roundtrip(spark):
    out = {
        r["clip_id"]: r
        for r in AFE.resample_clips(_corpus(spark), target_sr=8000).collect()
    }
    assert out["junk"]["bytes"] is None and out["junk"]["resample_error"]
    r = out["corp-0"]
    codec, sr, pcm = audio.decode(bytes(r["bytes"]))
    assert (codec, sr) == ("pcm_s16le", 8000)
    # duration preserved: 400 ms at 16 kHz -> 3200 samples at 8 kHz
    assert abs(len(pcm) - 3200) <= 1 and r["dur_ms"] == 400
    # content preserved where it matters: the synthetic tones live below
    # 4 kHz, so the CONTINUOUS feature vector barely moves (the
    # sign-quantized fingerprint is deliberately not used here — linear
    # interpolation has no anti-alias filter, and folded noise-floor
    # energy flips its delicate quiet-band comparisons; measured
    # hamming ~24 while the feature cosine stays ~0.99997)
    orig = audio.render_pcm("corp-0", 16000, 400)
    cos = float(np.dot(
        AFE.band_energy_features(orig, 16000),
        AFE.band_energy_features(pcm, 8000),
    ))
    assert cos > 0.99, cos  # unrelated clips measure ~0.11 mean cosine
    # and the passband content itself round-trips at >20 dB SNR
    rt = AFE.resample_pcm(pcm, 8000, 16000)
    n = min(len(rt), len(orig))
    assert audio.snr_db(orig[:n], rt[:n]) > 20.0


def test_resample_kernel_identity():
    pcm = audio.render_pcm("id-check", 8000, 300)
    assert np.array_equal(AFE.resample_pcm(pcm, 8000, 8000), pcm)
    up = AFE.resample_pcm(pcm, 8000, 16000)
    assert abs(len(up) - 2 * len(pcm)) <= 1


def _dup_corpus(spark, n=120, plant_every=10):
    """Synthetic clips + an 8 kHz resample of every plant_every-th clip."""
    rows, planted = [], []
    for i in range(n):
        pcm = audio.render_pcm(f"dup-{i}", 16000, 300)
        rows.append((f"dup-{i}", audio.encode(pcm, 16000, "pcm_s16le")))
        if i % plant_every == 0:
            rs = AFE.resample_pcm(pcm, 16000, 8000)
            rows.append((f"dup-{i}-rs8k", audio.encode(rs, 8000, "pcm_s16le")))
            planted.append((f"dup-{i}", f"dup-{i}-rs8k"))
    return spark.createDataFrame(rows, "clip_id string, bytes binary"), planted


def test_audio_embedding_dup_pairs(spark):
    """Blocked audio near-dup: every planted resample variant is paired
    with its original, and the LSH-blocked pairs are a subset of the
    exact brute-force pairs at the same threshold."""
    from nadeefiler_spark.operators.dedup import embedding_cosine_pairs

    corpus, planted = _dup_corpus(spark)
    blocked = {
        (r["id_a"], r["id_b"])
        for r in AFE.audio_embedding_dup_pairs(corpus).collect()
    }
    emb = (
        AFE.audio_features(corpus)
        .where(F.col("features").isNotNull())
    )
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_cosine_pairs(emb, "id", "features", 0.98).collect()
    }
    assert blocked <= exact
    for a, b in planted:
        pair = (a, b) if a < b else (b, a)
        assert pair in blocked, pair


def test_dup_pairs_are_semantically_near():
    """Non-planted high-cosine pairs must be GENUINE near-content: the
    synthetic waveform is fully characterized by its fundamental f0
    (audio.render_pcm), so any pair at cos >= 0.98 must have f0s within
    one log band (the feature's resolution: log(4000/60)/16 ~ 30% in
    frequency at 16 bands). Guards against the embedding regressing to
    pre-mean-centering behavior where spectrally-DISTANT clips scored
    0.99 off shared loudness envelope alone."""
    band_log_width = np.log(AFE._HI_HZ / AFE._LO_HZ) / AFE.N_FEATURE_BANDS
    vecs, f0s = {}, {}
    for i in range(150):
        cid = f"sem-{i}"
        vecs[cid] = AFE.band_energy_features(audio.render_pcm(cid, 16000, 300), 16000)
        f0s[cid] = 80.0 + (audio.clip_seed(cid) % 800)
    ids = list(vecs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if float(vecs[a] @ vecs[b]) >= 0.98:
                log_gap = abs(np.log(f0s[a] / f0s[b]))
                assert log_gap < band_log_width, (a, b, f0s[a], f0s[b])


def test_engine_embedding_dedup_stage(spark, tmp_path_factory):
    """Engine cascade stage: embedding_dups table + manifest lineage +
    global-recompute resume — over a planted cross-partition RESAMPLE,
    the variant class the exact-PCM fingerprint stage cannot group."""
    from nadeefiler_spark.engine import ValidationEngine

    rows = []
    for i in range(40):
        pcm = audio.render_pcm(f"eng-{i}", 16000, 300)
        rows.append((f"eng-{i}", audio.encode(pcm, 16000, "pcm_s16le"), "pcm_s16le"))
    # 8 kHz resample of eng-3, landing in a DIFFERENT (flac) partition
    rs = AFE.resample_pcm(audio.render_pcm("eng-3", 16000, 300), 16000, 8000)
    rows.append(("eng-3-rs8k", audio.encode(rs, 8000, "flac"), "flac"))
    clips = spark.createDataFrame(
        rows, "clip_id string, bytes binary, part string"
    )

    out = str(tmp_path_factory.mktemp("engine_ed"))
    eng = ValidationEngine(spark, out, rules=[])
    v = eng.run_embedding_dedup(clips, threshold=0.99, run_id="ed1").toPandas()
    assert set(v["stage"]) == {"embedding_dedup"}

    clusters = eng.embedding_dups().toPandas()
    by_id = clusters.set_index("id")
    assert by_id.loc["eng-3-rs8k", "cluster_id"] == "eng-3"  # keeper = min id
    assert by_id.loc["eng-3", "cluster_size"] >= 2
    # lineage: n_violations per partition == implicated clips there
    viol = dict(zip(v["part"], v["n_violations"]))
    assert viol["flac"] == 1
    assert viol["pcm_s16le"] == int(
        (clusters["id"].str.len() > 0).sum() - 1
    )  # every other implicated clip sits in the pcm partition

    # resume with no new partitions is a no-op
    eng.run_embedding_dedup(clips, threshold=0.99, run_id="ed2")
    m = eng.manifest().toPandas()
    assert set(m[m["stage"] == "embedding_dedup"]["run_id"]) == {"ed1"}


def test_feature_contrast():
    """Mean-centering must keep unrelated clips well-separated — the
    property that makes ANN over audio features meaningful (without it
    all vectors crowd one cap of the sphere at cos ~0.99)."""
    vecs = np.array([
        AFE.band_energy_features(audio.render_pcm(f"m-{i}", 16000, 400), 16000)
        for i in range(30)
    ])
    sims = vecs @ vecs.T
    off = sims[~np.eye(30, dtype=bool)]
    assert off.mean() < 0.5, off.mean()


def test_bandwidth_stats_twin(spark):
    """Spark-side bandwidth audit must equal the pure-numpy rolloff on
    the planted calibration clips, and the physics must hold: full-band
    noise fills the declared rate, the 8 kHz-squeezed copy does not."""
    import numpy as np

    import __spark_entry__ as entry
    from nadeefiler_spark.operators.audio_features import (
        bandwidth_stats,
        resample_pcm,
        spectral_rolloff,
    )

    clips = entry._bandwidth_planted_clips(spark)
    got = {r["clip_id"]: r for r in bandwidth_stats(clips).collect()}

    sr, n = 16000, 3200
    t = np.arange(n)
    noise = ((((t * 2654435761 + 12345) % 65536) - 32768) * 0.3).astype(np.int16)
    waves = {
        "bw-noise": noise,
        "bw-upsampled": resample_pcm(resample_pcm(noise, sr, 8000), 8000, sr),
        "bw-tone": np.round(8000 * np.sin(2 * np.pi * 440.0 * t / sr)).astype(np.int16),
    }
    from nadeefiler_spark.operators.audio_features import spectral_flatness

    for cid, pcm in waves.items():
        r = spectral_rolloff(pcm, sr)
        assert got[cid]["rolloff_hz"] == round(r, 6)
        assert got[cid]["bw_ratio"] == round(r / (sr / 2.0), 6)
        assert got[cid]["flatness"] == round(spectral_flatness(pcm), 6)
    # provenance physics: hash noise is full-band; squeezing it through
    # 8 kHz removes everything above the old Nyquist (and linear-interp
    # imaging stays weak), so the ratio collapses; a tone is narrowband
    assert got["bw-noise"]["bw_ratio"] > 0.9
    assert got["bw-upsampled"]["bw_ratio"] < got["bw-noise"]["bw_ratio"] - 0.3
    assert got["bw-tone"]["rolloff_hz"] == 440.0
    # tonality physics: the 440 Hz tone is spectrally flat-0; the LCG
    # ramp is harmonic-rich (a structured sawtooth, honestly mid-low
    # flatness) yet orders of magnitude above the tone — the
    # disambiguation flatness adds to a low rolloff
    assert got["bw-tone"]["flatness"] < 1e-6
    assert got["bw-noise"]["flatness"] > 0.05
    assert got["bw-upsampled"]["flatness"] > 0.01
    # true white noise reads near 1 (band averaging beats chi-square nulls)
    rng_noise = np.random.default_rng(7).integers(
        -20000, 20000, n
    ).astype(np.int16)
    assert spectral_flatness(rng_noise) > 0.9


def test_spectral_flatness_edges():
    import numpy as np

    from nadeefiler_spark.operators.audio_features import spectral_flatness

    assert spectral_flatness(np.array([], dtype=np.int16)) == 0.0
    assert spectral_flatness(np.zeros(1000, dtype=np.int16)) == 0.0
    # DC-only: energy sits in the excluded bin 0; the rest is float32
    # FFT leakage -> essentially zero, never read as content
    assert spectral_flatness(1000 * np.ones(1000, dtype=np.int16)) < 1e-3


def test_spectral_rolloff_edges():
    import numpy as np

    from nadeefiler_spark.operators.audio_features import spectral_rolloff

    assert spectral_rolloff(np.array([], dtype=np.int16), 16000) == 0.0
    assert spectral_rolloff(np.zeros(1000, dtype=np.int16), 16000) == 0.0
    # DC-only signal: all energy in bin 0
    assert spectral_rolloff(1000 * np.ones(1000, dtype=np.int16), 16000) == 0.0


def test_features_carry_cols(spark):
    """carry_cols passes clip columns through the featurize batches so
    callers avoid a corpus-sized join back on id."""
    clips = _corpus(spark).withColumn("part", F.lit("px"))
    out = AFE.audio_features(clips, carry_cols=("part",))
    assert out.columns == ["id", "features", "feat_error", "part"]
    rows = out.collect()
    assert {r["part"] for r in rows} == {"px"} and len(rows) == 14


def test_engine_embedding_drift_stage(spark, tmp_path_factory):
    """Engine cascade stage: embedding_drift table + lineage + resume.
    Planted: partition 'tone' carries narrowband sine clips whose
    band-energy centroid points away from the broadband corpus centroid
    (measured cos ~0.55 vs ~0.9 for the normal partitions — the
    int16 quantization noise floor spreads some energy across bands), plus one
    undecodable clip counted as n_bad."""
    import numpy as np

    from nadeefiler_spark.engine import ValidationEngine

    rows = []
    for i in range(20):
        pcm = audio.render_pcm(f"ed-{i}", 16000, 300)
        part = "a" if i < 10 else "b"
        rows.append((f"ed-{i}", audio.encode(pcm, 16000, "pcm_s16le"), part))
    t = np.arange(int(16000 * 0.3)) / 16000.0
    for i in range(8):
        # int16 scale: audio.encode quantizes, a [-1, 1] float truncates to silence
        pcm = (16000 * np.sin(2 * np.pi * (200 + 5 * i) * t)).astype(np.int16)
        rows.append((f"tone-{i}", audio.encode(pcm, 16000, "pcm_s16le"), "tone"))
    rows.append(("junk", b"\x00nope", "a"))
    clips = spark.createDataFrame(rows, "clip_id string, bytes binary, part string")

    out = str(tmp_path_factory.mktemp("engine_edr"))
    eng = ValidationEngine(spark, out, rules=[])
    v = eng.run_embedding_drift(clips, min_cos=0.7, run_id="edr1").toPandas()
    assert set(v["stage"]) == {"embedding_drift"}

    rep = eng.embedding_drift().toPandas().set_index("corpus_part")
    assert bool(rep.loc["tone", "drifted"]) is True
    assert bool(rep.loc["a", "drifted"]) is False
    assert bool(rep.loc["b", "drifted"]) is False
    assert int(rep.loc["a", "n_bad"]) == 1  # the undecodable clip
    assert int(rep.loc["tone", "n_vecs"]) == 8
    assert rep.loc["tone", "global_cos"] < 0.7 < rep.loc["a", "global_cos"]

    # lineage: every clip of the drifted partition is implicated
    viol = dict(zip(v["part"], v["n_violations"]))
    assert viol == {"a": 0, "b": 0, "tone": 8}

    # resume with no new partitions is a no-op
    eng.run_embedding_drift(clips, min_cos=0.7, run_id="edr2")
    m = eng.manifest().toPandas()
    assert set(m[m["stage"] == "embedding_drift"]["run_id"]) == {"edr1"}
