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
