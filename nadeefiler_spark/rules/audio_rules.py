"""Audio-aware rules: decode ONCE per clip in an Arrow-batched pandas
pass, then express every check as a cheap Catalyst filter over the
decoded-facts DataFrame.

Reference parity: nadeefiler's non-JS profilers run as child processes
fed a re-materialized CSV (``/root/reference/profilers/worker.js:160-175``,
``profilers/outliers/index.js:15-42``); the Spark-first design replaces
that with ``mapInPandas`` — the decode runs inside executors on Arrow
batches, no per-row Python (input_hint), no temp files, no process hops.

The expensive part (binary decode + SNR vs an independently re-rendered
reference waveform) happens exactly once regardless of how many audio
rules are registered — the same decode-once-check-many shape as the
reference's dedupe-before-expensive-work optimization
(``profilers/messystreams.js:91-107``, SURVEY §4).

Scale notes: the decode pass is embarrassingly parallel (narrow — no
shuffle), bytes never leave the executor, and Arrow batch size is
capped via spark.sql.execution.arrow.maxRecordsPerBatch so a batch of
max-duration clips fits executor memory.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .base import Rule, RuleContext

DECODED_SCHEMA = (
    "part string, clip_id string, sr_hz int, dur_ms int, codec string, "
    "n_bytes int, dec_codec string, dec_sr int, dec_n bigint, dec_ms int, "
    "snr_db double, decode_error string"
)

SNR_PASS_DB = 30.0  # input_hint: decoded-PCM allclose asserted as SNR>=30dB


VAD_FRAME_S = 0.02  # 20 ms frames, the conventional VAD hop
VAD_RMS_THRESHOLD = 655.0  # ~2% of int16 full scale, matches the QC gate


def vad_stats(pcm: "np.ndarray", sr_hz: int) -> tuple[float, int, int]:
    """(speech_ratio, n_speech_runs, longest_silence_ms) by 20 ms
    frame-RMS gating — the energy-threshold voice-activity detector.

    Frames are non-overlapping ``VAD_FRAME_S`` windows (a trailing
    partial frame is dropped; a clip shorter than one frame is one
    frame). A frame is speech when its RMS exceeds
    ``VAD_RMS_THRESHOLD``. Deterministic integer/np.float32 math so the
    pure-Python twin test reproduces it exactly.
    """
    if pcm is None or len(pcm) == 0 or sr_hz <= 0:
        return 0.0, 0, 0
    flen = max(1, int(sr_hz * VAD_FRAME_S))
    n_fr = max(1, len(pcm) // flen)
    x = pcm[: n_fr * flen].astype(np.float32).reshape(n_fr, -1)
    rms = np.sqrt(np.mean(x * x, axis=1))
    speech = rms > VAD_RMS_THRESHOLD
    ratio = float(speech.mean())
    n_runs = int(speech[0]) + int(np.sum(~speech[:-1] & speech[1:]))
    sil = ~speech
    if sil.any():
        edges = np.flatnonzero(
            np.diff(np.concatenate(([False], sil, [False])).astype(np.int8))
        )
        longest = int((edges[1::2] - edges[0::2]).max())
    else:
        longest = 0
    return ratio, n_runs, int(round(longest * flen * 1000.0 / sr_hz))


def decode_facts(
    clips: DataFrame, with_snr: bool = True, with_fp: bool = False,
    with_qc: bool = False, with_vad: bool = False,
    with_loudness: bool = False,
) -> DataFrame:
    """One narrow mapInPandas pass: bytes -> decoded facts per clip.

    ``snr_db`` compares decoded PCM against an independent deterministic
    re-render of the clip's reference waveform (the sandbox stand-in for
    a reference decoder; see nadeefiler_spark.audio module docstring).

    ``with_fp`` appends the 64-bit content fingerprint
    (``operators.audio_fp.pcm_fingerprint64``) computed from the SAME
    decoded PCM — content dedup then costs one extra rFFT per clip on
    the shared scan instead of a second full-table binary decode pass
    (the decode-once-check-many invariant, engine binary-scan fusion).

    ``with_vad`` appends energy-threshold voice-activity stats from the
    SAME decoded PCM (:func:`vad_stats`): ``speech_ratio``,
    ``n_speech_runs``, ``longest_silence_ms``. Off by default — the
    default engine pass stays on the measured hot path; a corpus
    speech-coverage audit opts in and still pays ZERO extra decodes.

    ``with_qc`` appends signal-quality stats from the SAME decoded PCM
    (same fusion rationale): ``clip_ratio`` (fraction of samples at or
    above 32000 of int16 full scale — digital clipping), ``silence_ratio``
    (fraction within 1% of full scale of zero — dead air), and
    ``dc_offset`` (mean sample / 32768 — a miswired capture chain).

    ``with_loudness`` appends level stats from the SAME decoded PCM:
    ``rms_dbfs`` / ``peak_dbfs`` relative to int16 full scale, floored
    at −120 dBFS (digital silence) — the inputs to a gain-normalization
    manifest (:func:`loudness_stats`). Off by default like the other
    opt-ins.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from nadeefiler_spark import audio  # import on executor

        if with_fp:
            from nadeefiler_spark.operators.audio_fp import pcm_fingerprint64

        for pdf in batches:
            out = {k: [] for k in (
                "part", "clip_id", "sr_hz", "dur_ms", "codec", "n_bytes",
                "dec_codec", "dec_sr", "dec_n", "dec_ms", "snr_db", "decode_error",
            )}
            if with_fp:
                out["fp"] = []
            if with_qc:
                out["clip_ratio"] = []
                out["silence_ratio"] = []
                out["dc_offset"] = []
            if with_vad:
                out["speech_ratio"] = []
                out["n_speech_runs"] = []
                out["longest_silence_ms"] = []
            if with_loudness:
                out["rms_dbfs"] = []
                out["peak_dbfs"] = []
            for part, cid, sr, dur, codec, blob in zip(
                pdf["part"], pdf["clip_id"], pdf["sr_hz"], pdf["dur_ms"],
                pdf["codec"], pdf["bytes"],
            ):
                out["part"].append(part)
                out["clip_id"].append(cid)
                out["sr_hz"].append(sr)
                out["dur_ms"].append(dur)
                out["codec"].append(codec)
                # byte length feeds the profile stage's `bytes` column
                # stats (all length-derived), so profiling never has to
                # re-scan the binary column (engine._run_profile)
                out["n_bytes"].append(len(blob) if blob is not None else None)
                try:
                    dec_codec, dec_sr, pcm = audio.decode(bytes(blob))
                    dec_ms = int(round(1000.0 * len(pcm) / dec_sr)) if dec_sr else 0
                    if with_snr:
                        # float32 reference, fused SNR: two fewer
                        # full-array materializations per clip (the
                        # decode pass is memory-bandwidth-bound)
                        ref = audio.render_wave_f32(cid, int(dec_sr), len(pcm))
                        snr = audio.snr_db_f32(ref, pcm)
                        snr = float(np.clip(snr, -1e6, 1e6))  # inf -> finite sentinel
                    else:
                        snr = None
                    out["dec_codec"].append(dec_codec)
                    out["dec_sr"].append(int(dec_sr))
                    out["dec_n"].append(len(pcm))
                    out["dec_ms"].append(dec_ms)
                    out["snr_db"].append(snr)
                    out["decode_error"].append(None)
                    if with_fp:
                        out["fp"].append(pcm_fingerprint64(pcm, int(dec_sr)))
                    if with_qc:
                        if len(pcm):
                            ax = np.abs(pcm.astype(np.int32))
                            out["clip_ratio"].append(float(np.mean(ax >= 32000)))
                            out["silence_ratio"].append(float(np.mean(ax <= 327)))
                            out["dc_offset"].append(float(pcm.mean()) / 32768.0)
                        else:
                            out["clip_ratio"].append(0.0)
                            out["silence_ratio"].append(1.0)
                            out["dc_offset"].append(0.0)
                    if with_vad:
                        ratio, runs, sil_ms = vad_stats(pcm, int(dec_sr))
                        out["speech_ratio"].append(ratio)
                        out["n_speech_runs"].append(runs)
                        out["longest_silence_ms"].append(sil_ms)
                    if with_loudness:
                        if len(pcm):
                            x = pcm.astype(np.float64) / 32768.0
                            rms = float(np.sqrt(np.mean(x * x)))
                            peak = float(np.max(np.abs(x)))
                        else:
                            rms = peak = 0.0
                        out["rms_dbfs"].append(
                            max(-120.0, 20.0 * float(np.log10(rms)))
                            if rms > 0 else -120.0
                        )
                        out["peak_dbfs"].append(
                            max(-120.0, 20.0 * float(np.log10(peak)))
                            if peak > 0 else -120.0
                        )
                except Exception as exc:  # garbage container
                    out["dec_codec"].append(None)
                    out["dec_sr"].append(None)
                    out["dec_n"].append(None)
                    out["dec_ms"].append(None)
                    out["snr_db"].append(None)
                    out["decode_error"].append(str(exc)[:200])
                    if with_fp:
                        out["fp"].append(None)
                    if with_qc:
                        out["clip_ratio"].append(None)
                        out["silence_ratio"].append(None)
                        out["dc_offset"].append(None)
                    if with_vad:
                        out["speech_ratio"].append(None)
                        out["n_speech_runs"].append(None)
                        out["longest_silence_ms"].append(None)
                    if with_loudness:
                        out["rms_dbfs"].append(None)
                        out["peak_dbfs"].append(None)
            if with_fp:
                out["fp"] = pd.array(out["fp"], dtype="Int64")
            yield pd.DataFrame(out)

    cols = ["part", "clip_id", "sr_hz", "dur_ms", "codec", "bytes"]
    schema = DECODED_SCHEMA + (", fp bigint" if with_fp else "")
    if with_qc:
        schema += ", clip_ratio double, silence_ratio double, dc_offset double"
    if with_vad:
        schema += ", speech_ratio double, n_speech_runs int, longest_silence_ms int"
    if with_loudness:
        schema += ", rms_dbfs double, peak_dbfs double"
    return clips.select(*cols).mapInPandas(run, schema)


def loudness_stats(clips: DataFrame, target_dbfs: float = -20.0) -> DataFrame:
    """Gain-normalization manifest: per clip, the measured level and the
    gain that would bring it to ``target_dbfs`` RMS.

    (part, clip_id, rms_dbfs, peak_dbfs, gain_db, would_clip,
    decode_error): ``gain_db = target_dbfs − rms_dbfs`` and
    ``would_clip`` is true when applying that gain pushes the measured
    peak above full scale — those clips need a limiter (or a lower
    target) rather than plain gain. The level stats ride the shared
    decode pass (``decode_facts(with_loudness=True)`` — zero extra
    decodes); this wrapper is pure column math. Doubles rounded to 6 dp.
    """
    facts = decode_facts(clips, with_snr=False, with_loudness=True)
    gain = F.lit(target_dbfs) - F.col("rms_dbfs")
    return facts.select(
        "part",
        "clip_id",
        F.round("rms_dbfs", 6).alias("rms_dbfs"),
        F.round("peak_dbfs", 6).alias("peak_dbfs"),
        F.round(gain, 6).alias("gain_db"),
        F.coalesce(
            (F.col("peak_dbfs") + gain) > 0.0, F.lit(False)
        ).alias("would_clip"),
        "decode_error",
    )


@dataclass
class _AudioRule(Rule):
    def __post_init__(self) -> None:
        self.stage = "audio"

    def _facts(self, ctx: RuleContext) -> DataFrame:
        assert ctx.decoded is not None, "engine must supply ctx.decoded for audio rules"
        return ctx.decoded


@dataclass
class CodecConsistencyRule(_AudioRule):
    """Container codec must match the codec column."""

    name: str = "audio_codec"

    def violations(self, ctx: RuleContext) -> DataFrame:
        d = self._facts(ctx)
        bad = d.where(
            F.col("decode_error").isNotNull() | (F.col("dec_codec") != F.col("codec"))
        )
        detail = F.coalesce(
            F.concat(F.lit("decode_error:"), F.col("decode_error")),
            F.concat(F.lit("container="), F.col("dec_codec"), F.lit(" column="), F.col("codec")),
        )
        return self.shape(bad, ctx, self.name, detail)


@dataclass
class SampleRateConsistencyRule(_AudioRule):
    """Decoded sample rate must equal sr_hz column."""

    name: str = "audio_sample_rate"

    def violations(self, ctx: RuleContext) -> DataFrame:
        d = self._facts(ctx)
        bad = d.where(F.col("decode_error").isNull() & (F.col("dec_sr") != F.col("sr_hz")))
        return self.shape(
            bad, ctx, self.name,
            F.concat(F.lit("decoded="), F.col("dec_sr"), F.lit(" column="), F.col("sr_hz")),
        )


@dataclass
class DurationConsistencyRule(_AudioRule):
    """Decoded duration must match dur_ms within tolerance
    max(abs_tol_ms, rel_tol * dur_ms)."""

    name: str = "audio_duration"
    abs_tol_ms: int = 20
    rel_tol: float = 0.02

    def violations(self, ctx: RuleContext) -> DataFrame:
        d = self._facts(ctx)
        tol = F.greatest(F.lit(float(self.abs_tol_ms)), F.lit(self.rel_tol) * F.col("dur_ms"))
        bad = d.where(
            F.col("decode_error").isNull()
            & (F.abs(F.col("dec_ms") - F.col("dur_ms")) > tol)
        )
        return self.shape(
            bad, ctx, self.name,
            F.concat(F.lit("decoded_ms="), F.col("dec_ms"), F.lit(" dur_ms="), F.col("dur_ms")),
        )


@dataclass
class SnrRule(_AudioRule):
    """Decoded PCM must match the reference waveform: SNR >= 30 dB."""

    name: str = "audio_snr"
    min_snr_db: float = SNR_PASS_DB

    def violations(self, ctx: RuleContext) -> DataFrame:
        d = self._facts(ctx)
        bad = d.where(F.col("decode_error").isNull() & (F.col("snr_db") < self.min_snr_db))
        return self.shape(
            bad, ctx, self.name,
            F.concat(F.lit("snr_db="), F.round(F.col("snr_db"), 2)),
        )


@dataclass
class AudioQcRule(_AudioRule):
    """Signal-quality gate over the decoded PCM: flags digital clipping
    (clip_ratio above ``max_clip_ratio``), dead air (silence_ratio above
    ``max_silence_ratio``), and DC offset (|dc_offset| above
    ``max_abs_dc``) — the capture-chain defects a transcription corpus
    must catch before training. Reads the QC columns when the shared
    decode pass carried them (``decode_facts(with_qc=True)``), else runs
    its own narrow QC-only decode (no SNR render — the cheap shape).

    NOT in default_audio_rules: the deterministic datagen renders a
    clean 0.8-of-half-scale waveform (audio.render_wave_f32), so no
    synthetic clip can trip these thresholds and the default engine run
    would measure nothing — same reasoning as SpeakingRateRule in
    presets.py. Wire it explicitly for corpora with real capture
    defects."""

    name: str = "audio_qc"
    max_clip_ratio: float = 0.01
    max_silence_ratio: float = 0.9
    max_abs_dc: float = 0.05

    def violations(self, ctx: RuleContext) -> DataFrame:
        d = ctx.decoded
        if d is None or "clip_ratio" not in d.columns:
            d = decode_facts(ctx.clips, with_snr=False, with_qc=True)
        clipped = F.col("clip_ratio") > self.max_clip_ratio
        silent = F.col("silence_ratio") > self.max_silence_ratio
        dc = F.abs(F.col("dc_offset")) > self.max_abs_dc
        bad = d.where(
            F.col("decode_error").isNull() & (clipped | silent | dc)
        )
        detail = F.concat_ws(
            ",",
            F.when(clipped, F.concat(F.lit("clip_ratio="), F.round("clip_ratio", 4))),
            F.when(silent, F.concat(F.lit("silence_ratio="), F.round("silence_ratio", 4))),
            F.when(dc, F.concat(F.lit("dc_offset="), F.round("dc_offset", 4))),
        )
        return self.shape(bad, ctx, self.name, detail)


@dataclass
class HeaderTriageRule(Rule):
    """Scan-speed header/metadata cross-check — the decode-free tier.

    Pure-expression probe of the container header
    (operators.headerprobe.finding_expr): codec magic, header sample
    rate / sample count vs the declared columns, and declared-vs-actual
    byte length (catches truncated payloads no decode-tier rule sees
    until numpy errors out). Runs in the cheap ``constraints`` stage via
    the predicate fast-path, so it folds into that stage's single shared
    scan instead of adding a pass; real compressed bitstreams
    (fLaC/OggS/ID3) report ``needs_decode`` only when ``flag_real_codecs``
    — by default they are left to the decode tier silently.

    NOT in default presets: on the synthetic corpus the planted residues
    (datagen.row_spec i%227/229/233) are caught by BOTH tiers, and the
    pinned golden violation sets assume the decode-tier rules own them.
    Wire it explicitly (presets ``with_header_triage=True``) for the
    two-tier layout where the decode stage runs on flagged + sampled
    rows only (operators.headerprobe.triage_route)."""

    name: str = "header_triage"
    stage: str = "constraints"
    bytes_col: str = "bytes"
    abs_tol_ms: int = 20
    rel_tol: float = 0.02
    flag_real_codecs: bool = False

    @property
    def _staged_prefix(self) -> str:
        # per-instance namespace for the staged helper columns: the
        # engine chains every folded rule's prepare() over ONE shared
        # scan, so a second triage instance (different tolerances,
        # distinct name) or clips that already carry hdr_* columns must
        # not collide with this instance's staging (ADVICE r4)
        return f"__{self.name}_"

    def prepare(self, df: DataFrame, ctx: RuleContext) -> DataFrame:
        # stage the probe (slice -> parse, two projections) so the
        # predicate below reads MATERIALIZED probe columns — folding the
        # flat finding_expr tree into the shared constraints scan is the
        # exact shape that busts Janino's 64 KB codegen limit and drops
        # the whole stage to interpreted eval (see header_probe)
        from ..operators.headerprobe import staged_probe

        return staged_probe(df, self.bytes_col, prefix=self._staged_prefix)

    def predicate(self, ctx: RuleContext):
        from ..operators.headerprobe import staged_finding_expr

        finding = staged_finding_expr(
            abs_tol_ms=self.abs_tol_ms,
            rel_tol=self.rel_tol,
            prefix=self._staged_prefix,
        )
        pred = finding.isNotNull()
        if not self.flag_real_codecs:
            pred = pred & (finding != F.lit("needs_decode"))
        return pred, finding

    def violations(self, ctx: RuleContext) -> DataFrame:
        pred, detail = self.predicate(ctx)
        staged = self.prepare(ctx.clips, ctx)
        return self.shape(staged.where(pred), ctx, self.name, detail)


def default_audio_rules() -> list[Rule]:
    return [
        CodecConsistencyRule(),
        SampleRateConsistencyRule(),
        DurationConsistencyRule(),
        SnrRule(),
    ]
