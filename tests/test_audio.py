import numpy as np
import pytest

from nadeefiler_spark import audio


def test_wav_roundtrip():
    pcm = audio.render_pcm("clip-000000000001", 16000, 100)
    blob = audio.encode(pcm, 16000, "pcm_s16le")
    codec, sr, out = audio.decode(blob)
    assert codec == "pcm_s16le" and sr == 16000
    assert np.array_equal(pcm, out)
    assert audio.sniff_codec(blob) == "pcm_s16le"


@pytest.mark.parametrize("codec", audio.FAKE_CODECS)
def test_fake_codec_roundtrip(codec):
    pcm = audio.render_pcm("clip-x", 8000, 80)
    blob = audio.encode(pcm, 8000, codec)
    got_codec, sr, out = audio.decode(blob)
    assert got_codec == codec and sr == 8000
    assert np.array_equal(pcm, out)


def test_render_deterministic():
    a = audio.render_pcm("clip-7", 22050, 90)
    b = audio.render_pcm("clip-7", 22050, 90)
    assert np.array_equal(a, b)
    c = audio.render_pcm("clip-8", 22050, 90)
    assert not np.array_equal(a, c)


def test_snr():
    ref = audio.render_pcm("clip-9", 16000, 100)
    assert audio.snr_db(ref, ref) == np.inf
    noisy = ref + np.random.default_rng(0).integers(-8000, 8000, len(ref)).astype(np.int16)
    assert audio.snr_db(ref, noisy) < 30
    slightly = ref + np.random.default_rng(0).integers(-5, 5, len(ref)).astype(np.int16)
    assert audio.snr_db(ref, slightly) > 30
    # truncated tail is penalized
    assert audio.snr_db(ref, ref[: len(ref) // 2]) < 10


def test_real_codec_stub():
    with pytest.raises(NotImplementedError):
        audio.decode_real_codec(b"xxxx", "flac")


def test_real_bitstream_routing_contract():
    """Plug-point contract (can't rot silently): a REAL compressed
    bitstream — recognized by its public magic — must route through
    decode_real_codec, whose sandbox NotImplementedError names the
    production dependency; garbage still raises ValueError."""
    for magic, codec in audio.REAL_BITSTREAM_MAGIC:
        blob = magic + b"\x00" * 64
        assert audio.sniff_codec(blob) == codec
        with pytest.raises(NotImplementedError, match="soundfile"):
            audio.decode(blob)
    with pytest.raises(ValueError, match="unrecognized"):
        audio.decode(b"\x01\x02garbage-not-any-container")
    assert audio.sniff_codec(b"\x01\x02garbage") == ""


def test_real_bitstream_becomes_decode_error_row(spark):
    """End-to-end routing: a clip whose bytes are a real FLAC bitstream
    produces a decode_error fact naming the plug-point (the engine
    flags it instead of crashing), matching the documented sandbox
    behavior."""
    import pandas as pd

    from nadeefiler_spark.rules.audio_rules import decode_facts

    pdf = pd.DataFrame({
        "part": ["flac"], "clip_id": ["clip-real"],
        "sr_hz": pd.array([16000], dtype="int32"),
        "dur_ms": pd.array([100], dtype="int32"),
        "codec": ["flac"], "bytes": [b"fLaC" + b"\x00" * 64],
    })
    df = spark.createDataFrame(
        pdf,
        "part string, clip_id string, sr_hz int, dur_ms int, codec string, bytes binary",
    )
    row = decode_facts(df).collect()[0]
    assert row["decode_error"] is not None
    assert "soundfile" in row["decode_error"]


def test_snr_f32_reference():
    ref16 = audio.render_pcm_samples("clip-9", 16000, 1600)
    ref32 = audio.render_wave_f32("clip-9", 16000, 1600)
    assert np.array_equal(ref32.astype(np.int16), ref16)  # same waveform
    # pristine decode: quantization-noise-bounded, far above threshold
    assert audio.snr_db_f32(ref32, ref16) > 60
    noisy = np.clip(
        ref16.astype(np.int32)
        + np.random.default_rng(0).integers(-8000, 8000, len(ref16)),
        -32768, 32767,
    ).astype(np.int16)
    assert audio.snr_db_f32(ref32, noisy) < 30
    # truncated tail penalized, empty edge cases
    assert audio.snr_db_f32(ref32, ref16[:800]) < 10
    assert audio.snr_db_f32(ref32[:0], ref16[:0]) == np.inf
    assert audio.snr_db_f32(ref32, ref16[:0]) == -np.inf
    # agrees with the int16-reference kernel within quantization effects
    a = audio.snr_db(ref16, noisy)
    b = audio.snr_db_f32(ref32, noisy)
    assert abs(a - b) < 0.1
