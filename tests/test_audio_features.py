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
