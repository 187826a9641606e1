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
