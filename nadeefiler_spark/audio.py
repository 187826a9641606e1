"""Deterministic audio synthesis + codec layer for the clips table.

The engine's audio-aware rules (BASELINE.json input_hint: decoded-PCM
allclose SNR>=30dB, decoded duration vs dur_ms, codec/sr consistency)
need a decode step. Real compressed-codec libraries (soundfile, ffmpeg,
opus, lame) are NOT installed in this container, so:

- ``pcm_s16le`` is a REAL RIFF/WAVE PCM16 mono container, encoded and
  decoded here with struct + numpy (public WAV spec).
- ``flac`` / ``opus`` / ``mp3`` use a clearly-marked DETERMINISTIC FAKE
  container (magic ``NDF1`` + codec tag + header + raw PCM16). The
  Spark-side plumbing — binary column, Arrow batching, UDF signatures,
  SNR math — is real and tested; only the codec bitstream is faked.
  ``decode_real_codec`` shows where a production build plugs in
  soundfile/ffmpeg and raises NotImplementedError in the sandbox.

Everything is seeded off clip_id so any executor can re-render the
reference PCM for a clip independently (no driver state, no broadcast of
waveforms) — that is what makes the SNR check embarrassingly parallel at
10^12 clips.

Reference parity: nadeefiler hands whole-dataset CSV files to
out-of-process profilers (``/root/reference/profilers/worker.js:160-175``,
``profilers/outliers/index.js:15-42``); here the analogous "external
analysis" runs inside Arrow-vectorized pandas UDFs instead.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

FAKE_MAGIC = b"NDF1"
REAL_CODECS = ("pcm_s16le",)
FAKE_CODECS = ("flac", "opus", "mp3")
ALL_CODECS = REAL_CODECS + FAKE_CODECS
VALID_SR = (8000, 16000, 22050, 44100, 48000)

# Magic prefixes of REAL compressed bitstreams (public container specs):
# blobs with these headers route to :func:`decode_real_codec` — the
# production plug-point — instead of the sandbox fake container.
REAL_BITSTREAM_MAGIC = (
    (b"fLaC", "flac"),   # FLAC stream marker
    (b"OggS", "opus"),   # Ogg capture pattern (opus-in-ogg)
    (b"ID3", "mp3"),     # MP3 with ID3v2 tag
)


def clip_seed(clip_id: str) -> int:
    """Stable 32-bit seed for a clip — crc32, identical on every executor."""
    return zlib.crc32(clip_id.encode("utf-8")) & 0xFFFFFFFF


def render_pcm(clip_id: str, sr_hz: int, dur_ms: int) -> np.ndarray:
    """Deterministic mono int16 waveform: seeded sine mix + noise."""
    return render_pcm_samples(clip_id, sr_hz, max(int(sr_hz * dur_ms / 1000), 1))


def render_wave_f32(clip_id: str, sr_hz: int, n: int) -> np.ndarray:
    """The reference waveform as float32 (pre-int16-quantization).

    float32 end-to-end: at 32 parallel decode workers the pipeline is
    memory-bandwidth-bound, not FLOP-bound (measured: 2.5x core-second
    inflation at local[32] vs local[8] with float64 temporaries); float32
    halves the streamed bytes. The SNR validator compares decoded int16
    PCM against THIS array directly (:func:`snr_db_f32`) — skipping the
    int16 cast + re-promotion saves two full-array materializations per
    clip on the hottest path."""
    seed = clip_seed(clip_id)
    rng = np.random.default_rng(seed)
    f0 = np.float32(80.0 + (seed % 800))
    t = np.arange(n, dtype=np.float32)
    t /= np.float32(sr_hz)
    two_pi = np.float32(2 * np.pi)
    wave = np.float32(0.6) * np.sin(two_pi * f0 * t)
    wave += np.float32(0.2) * np.sin(two_pi * np.float32(2.7) * f0 * t)
    wave += np.float32(0.02) * rng.standard_normal(n, dtype=np.float32)
    wave *= np.float32(16384.0)
    np.clip(wave, -32768, 32767, out=wave)
    return wave


def render_pcm_samples(clip_id: str, sr_hz: int, n: int) -> np.ndarray:
    """Render exactly n int16 samples — lets a validator re-create the
    reference waveform for a decoded clip independently on any executor
    (generation and validation share the same :func:`render_wave_f32`)."""
    return render_wave_f32(clip_id, sr_hz, n).astype(np.int16)


# --- containers -------------------------------------------------------------

def _wav_encode(pcm: np.ndarray, sr_hz: int) -> bytes:
    data = pcm.astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16,
        1, 1, sr_hz, sr_hz * 2, 2, 16, b"data", len(data),
    )
    return hdr + data


def _wav_decode(blob: bytes) -> tuple[int, np.ndarray]:
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    sr = struct.unpack_from("<I", blob, 24)[0]
    dlen = struct.unpack_from("<I", blob, 40)[0]
    pcm = np.frombuffer(blob, dtype="<i2", count=dlen // 2, offset=44)
    return sr, pcm


def _fake_encode(pcm: np.ndarray, sr_hz: int, codec: str) -> bytes:
    data = pcm.astype("<i2").tobytes()
    hdr = FAKE_MAGIC + codec.encode().ljust(10, b"\0") + struct.pack("<II", sr_hz, len(pcm))
    return hdr + data


def _fake_decode(blob: bytes) -> tuple[str, int, np.ndarray]:
    codec = blob[4:14].rstrip(b"\0").decode()
    sr, n = struct.unpack_from("<II", blob, 14)
    pcm = np.frombuffer(blob, dtype="<i2", count=n, offset=22)
    return codec, sr, pcm


def encode(pcm: np.ndarray, sr_hz: int, codec: str) -> bytes:
    if codec == "pcm_s16le":
        return _wav_encode(pcm, sr_hz)
    if codec in FAKE_CODECS:
        return _fake_encode(pcm, sr_hz, codec)
    raise ValueError(f"unknown codec {codec!r}")


def sniff_codec(blob: bytes) -> str:
    """Codec tag from the container header ('' if unrecognized)."""
    if blob is None or len(blob) < 14:
        return ""
    if blob[:4] == b"RIFF":
        return "pcm_s16le"
    if blob[:4] == FAKE_MAGIC:
        return blob[4:14].rstrip(b"\0").decode(errors="replace")
    for magic, codec in REAL_BITSTREAM_MAGIC:
        if blob[: len(magic)] == magic:
            return codec
    return ""


def decode(blob: bytes) -> tuple[str, int, np.ndarray]:
    """-> (codec_tag, sample_rate, int16 pcm). Raises on garbage.

    Real compressed bitstreams (fLaC/OggS/ID3 magic) route to
    :func:`decode_real_codec` — NotImplementedError in the sandbox,
    soundfile/ffmpeg in a production deployment; everything downstream
    (SNR math, rules, profiling) is codec-agnostic.
    """
    if blob[:4] == b"RIFF":
        sr, pcm = _wav_decode(blob)
        return "pcm_s16le", sr, pcm
    if blob[:4] == FAKE_MAGIC:
        return _fake_decode(blob)
    for magic, codec in REAL_BITSTREAM_MAGIC:
        if blob[: len(magic)] == magic:
            sr, pcm = decode_real_codec(blob, codec)
            return codec, sr, pcm
    raise ValueError("unrecognized audio container")


def decode_real_codec(blob: bytes, codec: str) -> tuple[int, np.ndarray]:  # pragma: no cover
    """Production decode hook for real flac/opus/mp3 bitstreams.

    STUB: the sandbox container has no audio codec libraries. A
    production deployment ships soundfile/ffmpeg on the executors and
    this function routes to them; the rest of the engine is unchanged.
    """
    try:
        import soundfile  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "real codec decode requires soundfile/ffmpeg on executors; "
            "sandbox uses the deterministic NDF1 fake container instead"
        ) from exc
    raise NotImplementedError("route to soundfile.read(BytesIO(blob))")


def snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    """Signal-to-noise ratio of `test` against reference `ref` (dB).

    Per-row invariant from BASELINE.json input_hint: decoded-PCM allclose
    asserted as SNR >= 30 dB. Length mismatch => compare common prefix and
    penalize missing tail as pure noise.
    """
    n = min(len(ref), len(test))
    if n == 0:
        return -np.inf if len(ref) else np.inf
    # exact int32 difference (int16 - int16 fits), then float32 dot
    # products: no float64 temporaries — the SNR pass is bandwidth-bound
    # at high worker counts, and 1e-6 relative accumulation error is
    # irrelevant against the 30 dB threshold.
    noise = ref[:n].astype(np.int32)
    np.subtract(noise, test[:n], out=noise)
    noise_f = noise.astype(np.float32)
    ref_f = ref.astype(np.float32)
    noise_power = float(np.dot(noise_f, noise_f)) + float(
        np.dot(ref_f[n:], ref_f[n:])
    )
    sig_power = float(np.dot(ref_f, ref_f))
    if noise_power == 0.0:
        return np.inf
    if sig_power == 0.0:
        return -np.inf
    return 10.0 * np.log10(sig_power / noise_power)


def snr_db_f32(ref_f: np.ndarray, test: np.ndarray) -> float:
    """SNR of int16 ``test`` against the float32 pre-quantization
    reference (:func:`render_wave_f32`), minimizing materializations:
    one float32 noise temp + three BLAS dot products — no int16 ref, no
    int32 diff, no promotion copies. The ~0.3-LSB quantization noise this
    admits bounds a perfect clip's SNR near 90 dB instead of +inf —
    irrelevant against the 30 dB pass threshold, and the memory-traffic
    saving is the point: the decode pass is bandwidth-bound at high
    worker counts (BENCH/BASELINE.md)."""
    n = min(len(ref_f), len(test))
    if n == 0:
        return -np.inf if len(ref_f) else np.inf
    noise = ref_f[:n] - test[:n]
    noise_power = float(np.dot(noise, noise)) + float(np.dot(ref_f[n:], ref_f[n:]))
    sig_power = float(np.dot(ref_f, ref_f))
    if noise_power == 0.0:
        return np.inf
    if sig_power == 0.0:
        return -np.inf
    return 10.0 * np.log10(sig_power / noise_power)
