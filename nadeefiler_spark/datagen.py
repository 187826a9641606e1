"""Deterministic synthetic data for the clips engine (FIXTURES.md).

Every field of every row is a pure function of ``(seed, row_index)`` —
generation runs distributed via ``mapInPandas`` (a 10^12-row table can be
rendered by executors with no driver state), yet the test suite can
compute golden expected violations in plain Python from the same
``row_spec`` function without Spark.

Planted violations (FIXTURES.md §1-2):
  - duplicate clip_id            -> uniqueness rule
  - sr_hz outside the valid set  -> domain rule
  - encoded duration != dur_ms   -> audio duration rule (pandas UDF)
  - encoded rate != sr_hz        -> audio sample-rate rule
  - container codec != codec col -> codec consistency rule
  - corrupted PCM (SNR < 30 dB)  -> decoded-PCM allclose rule
  - empty / NULL transcript      -> transcript completeness rule
  - orphan transcript_refs rows  -> referential rule (anti join)
  - mutated ref transcript       -> transcript equality rule

The codec distribution is intentionally skewed (~70% one codec) so the
skew-handling path (AQE + salting) is exercised, per FIXTURES.md §1.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd

from . import audio

CLIPS_SCHEMA = (
    "clip_id string, bytes binary, sr_hz int, dur_ms int, "
    "codec string, transcript string, part string"
)
REFS_SCHEMA = "clip_id string, transcript string, part string"

_VOCAB = (
    "the a and of to in is was for on with audio clip sound noise speech "
    "signal data quality check rate codec sample hello world test alpha "
    "beta gamma delta river stone cloud light dark fast slow north south "
    "east west zero one two three"
).split()

_CODECS = ("pcm_s16le", "flac", "opus", "mp3")
_CODEC_CUM = (0.70, 0.85, 0.95, 1.0)  # skewed: 70% pcm_s16le
_SR_CHOICES = (8000, 16000, 22050, 44100, 48000)
_SR_CUM = (0.15, 0.50, 0.60, 0.85, 1.0)


@dataclass(frozen=True)
class GenConfig:
    n_rows: int = 2000
    seed: int = 42
    dur_min_ms: int = 60
    dur_max_ms: int = 400
    n_ref_rows: int | None = None  # default n_rows

    @property
    def ref_rows(self) -> int:
        return self.n_ref_rows if self.n_ref_rows is not None else self.n_rows


def _pick(cum: tuple[float, ...], u: float) -> int:
    for j, c in enumerate(cum):
        if u < c:
            return j
    return len(cum) - 1


def row_spec(i: int, cfg: GenConfig) -> dict:
    """Full deterministic spec for clip row i (no waveform rendering)."""
    if i > 0 and i % 211 == 1:  # exact duplicate of the previous row
        return row_spec(i - 1, cfg)

    rng = np.random.default_rng([cfg.seed, i])
    u = rng.random(8)

    clip_id = f"clip-{i:012d}"

    codec = _CODECS[_pick(_CODEC_CUM, u[0])]
    sr_hz = _SR_CHOICES[_pick(_SR_CUM, u[1])]
    # log-uniform-ish duration, skewed toward the low end
    span = np.log(cfg.dur_max_ms) - np.log(cfg.dur_min_ms)
    dur_ms = int(np.exp(np.log(cfg.dur_min_ms) + span * u[2] ** 1.6))

    enc_sr, enc_dur, enc_codec, corrupt = sr_hz, dur_ms, codec, False
    if i % 223 == 2:  # invalid sr_hz domain value; bytes rendered at 16k
        sr_hz = 0 if i % 2 == 0 else 12345
        enc_sr = 16000
    if i % 227 == 3:  # encoded duration mismatch
        enc_dur = max(int(dur_ms * 0.6), 10)
    if i % 229 == 4:  # encoded rate mismatch
        enc_sr = _SR_CHOICES[(_SR_CHOICES.index(enc_sr) + 1) % len(_SR_CHOICES)]
    if i % 233 == 5:  # container codec != codec column
        enc_codec = _CODECS[(_CODECS.index(codec) + 1) % len(_CODECS)]
    if i % 239 == 6:  # corrupted PCM -> SNR < 30 dB
        corrupt = True

    n_words = 3 + int(u[3] * 9)
    words = [_VOCAB[int(x * len(_VOCAB))] for x in rng.random(n_words)]
    transcript: str | None = " ".join(words)
    if i % 61 == 7:
        transcript = ""
    elif i % 67 == 8:
        transcript = None

    return {
        "i": i,
        "clip_id": clip_id,
        "sr_hz": int(sr_hz),
        "dur_ms": int(dur_ms),
        "codec": codec,
        "transcript": transcript,
        "part": codec,
        "enc_sr": int(enc_sr),
        "enc_dur_ms": int(enc_dur),
        "enc_codec": enc_codec,
        "corrupt": corrupt,
    }


def render_row_bytes(spec: dict) -> bytes:
    pcm = audio.render_pcm(spec["clip_id"], spec["enc_sr"], spec["enc_dur_ms"])
    if spec["corrupt"]:
        rng = np.random.default_rng([spec["i"], 999])
        pcm = np.clip(
            pcm.astype(np.int32) + (rng.standard_normal(len(pcm)) * 12000).astype(np.int32),
            -32768, 32767,
        ).astype(np.int16)
    return audio.encode(pcm, spec["enc_sr"], spec["enc_codec"])


def ref_spec(i: int, cfg: GenConfig) -> dict:
    """Spec for transcript_refs row i (FIXTURES.md §2)."""
    base = row_spec(i % cfg.n_rows, cfg)
    clip_id, transcript = base["clip_id"], base["transcript"]
    if i % 101 == 7:  # orphan: fabricated id not in clips
        clip_id = f"orphan-{i:012d}"
    elif i % 103 == 11 and transcript:  # mutated transcript
        transcript = transcript + " MUTATED"
    return {"clip_id": clip_id, "transcript": transcript, "part": base["part"]}


# --- Spark-side distributed generation --------------------------------------

def clips_df(spark, cfg: GenConfig):
    """Distributed clips DataFrame: spark.range -> mapInPandas render."""
    cfg_tuple = (cfg.n_rows, cfg.seed, cfg.dur_min_ms, cfg.dur_max_ms, cfg.n_ref_rows)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = GenConfig(*cfg_tuple)
        for pdf in batches:
            specs = [row_spec(int(i), c) for i in pdf["id"]]
            yield pd.DataFrame(
                {
                    "clip_id": [s["clip_id"] for s in specs],
                    "bytes": [render_row_bytes(s) for s in specs],
                    "sr_hz": pd.array([s["sr_hz"] for s in specs], dtype="int32"),
                    "dur_ms": pd.array([s["dur_ms"] for s in specs], dtype="int32"),
                    "codec": [s["codec"] for s in specs],
                    "transcript": [s["transcript"] for s in specs],
                    "part": [s["part"] for s in specs],
                }
            )

    n_tasks = max(spark.sparkContext.defaultParallelism * 2, 8)
    return spark.range(0, cfg.n_rows, numPartitions=n_tasks).mapInPandas(gen, CLIPS_SCHEMA)


def refs_df(spark, cfg: GenConfig):
    cfg_tuple = (cfg.n_rows, cfg.seed, cfg.dur_min_ms, cfg.dur_max_ms, cfg.n_ref_rows)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = GenConfig(*cfg_tuple)
        for pdf in batches:
            specs = [ref_spec(int(i), c) for i in pdf["id"]]
            yield pd.DataFrame(
                {
                    "clip_id": [s["clip_id"] for s in specs],
                    "transcript": [s["transcript"] for s in specs],
                    "part": [s["part"] for s in specs],
                }
            )

    n_tasks = max(spark.sparkContext.defaultParallelism * 2, 8)
    return spark.range(0, cfg.ref_rows, numPartitions=n_tasks).mapInPandas(gen, REFS_SCHEMA)


def write_clips(spark, out_dir: str, cfg: GenConfig) -> None:
    """Materialize clips + transcript_refs, partitioned by `part` (codec).

    Stand-in for the Iceberg table of BASELINE.json (no Iceberg runtime
    jar in the sandbox); dynamic-partition-overwrite parquet gives the
    same idempotent per-partition write semantics the engine relies on.
    """
    clips_df(spark, cfg).write.mode("overwrite").partitionBy("part").parquet(f"{out_dir}/clips")
    refs_df(spark, cfg).write.mode("overwrite").partitionBy("part").parquet(f"{out_dir}/transcript_refs")


# --- detector-fidelity fixtures (FIXTURES.md §3-4) ---------------------------

def tuples_typed_pdf(n_rows: int = 400, seed: int = 42) -> pd.DataFrame:
    """All-string table exercising the messystreams detector cascade."""
    rng = np.random.default_rng(seed)

    def pick(options, i):
        return options[int(rng.integers(0, len(options)))]

    bools = ["true", "False", "T", "f", "YES", "no", "y", "N", "1", "0", "maybe", "truish"]
    ints = ["5", "+5", "-17", "1e2", "12E3", "007", "5.", "123456789"]
    floats = ["3.14", "-0.5", "1.23e1", "2.5E-3", "0.0", "3.0", "+2.75"]
    pcts = ["15%", "3.5%", "-2%", "100%", "0.1%"]
    dates = ["2/29/2000", "4/30/1999", "12/31/2024", "1/1/1900", "02/9/2001", "13/1/2000"]
    strings = ["alpha", "new york", "blue whale", "12ab", "a1", "N/A", "-", "paris"]
    nullmix = ["", "", "", "42", "x", "", "7", "zed"]

    rows = {
        "col_bool": [pick(bools, i) for i in range(n_rows)],
        "col_int": [pick(ints, i) for i in range(n_rows)],
        "col_float": [pick(floats, i) for i in range(n_rows)],
        "col_percent": [pick(pcts, i) for i in range(n_rows)],
        "col_date": [pick(dates, i) for i in range(n_rows)],
        "col_string": [pick(strings, i) for i in range(n_rows)],
        "col_nullmix": [pick(nullmix, i) for i in range(n_rows)],
    }
    return pd.DataFrame(rows)


def yago_types_pdf() -> pd.DataFrame:
    """Broadcast-sized knowledge base shaped like yagoSimpleTypes
    (/root/reference/import-yago.js:43-48): normalized subject ->
    objects array. Subjects overlap tuples_typed.col_string."""
    rows = [
        ("new york", ["wikicat_Cities_in_New_York", "wikicat_Populated_places"]),
        ("paris", ["wikicat_Capitals_in_Europe", "wikicat_Cities_in_France"]),
        ("blue whale", ["wikicat_Baleen_whales", "wikicat_Mammals"]),
        ("alpha", ["wikicat_Greek_letters"]),
        ("london", ["wikicat_Capitals_in_Europe"]),
        ("red fox", ["wikicat_Mammals"]),
    ]
    return pd.DataFrame(rows, columns=["subject", "objects"])


# --- golden expectations (pure Python, no Spark) -----------------------------

def golden_violations(cfg: GenConfig) -> dict[str, set[str]]:
    """rule -> set of offending clip_ids, derived from the same specs the
    generator uses. This is the tests' oracle for engine output."""
    specs = [row_spec(i, cfg) for i in range(cfg.n_rows)]
    out: dict[str, set[str]] = {
        "unique_clip_id": set(), "sr_domain": set(), "transcript_required": set(),
        "audio_duration": set(), "audio_sample_rate": set(), "audio_codec": set(),
        "audio_snr": set(), "ref_integrity": set(), "transcript_equality": set(),
    }
    seen: dict[str, int] = {}
    for s in specs:
        seen[s["clip_id"]] = seen.get(s["clip_id"], 0) + 1
    for s in specs:
        cid = s["clip_id"]
        if seen[cid] > 1:
            out["unique_clip_id"].add(cid)
        if s["sr_hz"] not in audio.VALID_SR:
            out["sr_domain"].add(cid)
        if not s["transcript"]:
            out["transcript_required"].add(cid)
        dec_ms = int(round(1000 * int(s["enc_sr"] * s["enc_dur_ms"] / 1000) / s["enc_sr"]))
        if abs(dec_ms - s["dur_ms"]) > max(20, 0.02 * s["dur_ms"]):
            out["audio_duration"].add(cid)
        if s["enc_sr"] != s["sr_hz"]:
            out["audio_sample_rate"].add(cid)
        if s["enc_codec"] != s["codec"]:
            out["audio_codec"].add(cid)
        if s["corrupt"]:
            out["audio_snr"].add(cid)
    clip_ids = {s["clip_id"] for s in specs}
    for i in range(cfg.ref_rows):
        r = ref_spec(i, cfg)
        if r["clip_id"] not in clip_ids:
            out["ref_integrity"].add(r["clip_id"])
        elif r["transcript"] and r["transcript"].endswith(" MUTATED"):
            out["transcript_equality"].add(r["clip_id"])
    return out
