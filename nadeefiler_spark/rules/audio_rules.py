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


def decode_facts(
    clips: DataFrame, with_snr: bool = True, with_fp: bool = False
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
                except Exception as exc:  # garbage container
                    out["dec_codec"].append(None)
                    out["dec_sr"].append(None)
                    out["dec_n"].append(None)
                    out["dec_ms"].append(None)
                    out["snr_db"].append(None)
                    out["decode_error"].append(str(exc)[:200])
                    if with_fp:
                        out["fp"].append(None)
            if with_fp:
                out["fp"] = pd.array(out["fp"], dtype="Int64")
            yield pd.DataFrame(out)

    cols = ["part", "clip_id", "sr_hz", "dur_ms", "codec", "bytes"]
    schema = DECODED_SCHEMA + (", fp bigint" if with_fp else "")
    return clips.select(*cols).mapInPandas(run, schema)


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


def default_audio_rules() -> list[Rule]:
    return [
        CodecConsistencyRule(),
        SampleRateConsistencyRule(),
        DurationConsistencyRule(),
        SnrRule(),
    ]
