"""Fixed-window audio segmentation manifest.

ASR/audio-model training consumes fixed-duration windows, not raw
clips; the prep step is a SEGMENT MANIFEST — one row per training
window with its clip, time span, and sample count — that the decode /
feature-extraction stage then executes. Computing the manifest needs
only METADATA (dur_ms, sr_hz): it is a pure Catalyst expression pass
(sequence → transform → explode), no decode, no UDF, no shuffle — at
100 TB the manifest job never touches the `bytes` column (column
pruning keeps it out of the scan entirely; same audit as PLANS.md's
bookkeeping-projection note).

Window semantics match functions.text.token_chunks (the text analog):
``window_ms`` per segment, consecutive segments share ``overlap_ms``
(stride = window − overlap); a clip shorter than one window yields one
segment covering the whole clip; a trailing remainder still appears
(no audio is dropped) with its end clamped to the clip duration.
Sample counts use integer arithmetic (``span_ms * sr_hz // 1000``) so
every engine reproduces them bit-for-bit.

Reference analog: the reference profiles whole files per row
(/root/reference/profilers/worker.js one-doc-at-a-time); windowing is
a beyond-reference training-pipeline operator per the task mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["segment_manifest"]


def segment_manifest(
    df: DataFrame,
    id_col: str,
    dur_ms_col: str,
    sr_hz_col: str,
    window_ms: int,
    overlap_ms: int = 0,
) -> DataFrame:
    """(id, seg_idx, start_ms, end_ms, n_samples) — one row per
    training window; see module docstring for the window semantics."""
    if not 0 <= overlap_ms < window_ms:
        raise ValueError(
            f"need 0 <= overlap_ms < window_ms, got {overlap_ms=} {window_ms=}"
        )
    stride = window_ms - overlap_ms
    dur = F.col(dur_ms_col).cast("bigint")
    sr = F.col(sr_hz_col).cast("bigint")
    # last start: smallest s in {0, stride, 2*stride, ...} with
    # s + window >= dur; one full-clip segment when dur <= window
    d = dur - window_ms
    last = F.when(dur <= window_ms, F.lit(0)).otherwise(
        d + (F.lit(stride) - d % stride) % stride
    )
    starts = F.sequence(F.lit(0).cast("bigint"), F.greatest(last, F.lit(0)),
                        F.lit(stride).cast("bigint"))
    seg = F.transform(
        starts,
        lambda s: F.struct(
            s.alias("start_ms"),
            F.least(s + window_ms, dur).alias("end_ms"),
        ),
    )
    return (
        df.where(dur > 0)
        .select(
            F.col(id_col).alias("id"),
            sr.alias("__sr"),
            F.posexplode(seg).alias("seg_idx", "w"),
        )
        .select(
            "id",
            F.col("seg_idx").cast("bigint").alias("seg_idx"),
            F.col("w.start_ms").alias("start_ms"),
            F.col("w.end_ms").alias("end_ms"),
            ((F.col("w.end_ms") - F.col("w.start_ms")) * F.col("__sr") / 1000)
            .cast("bigint")
            .alias("n_samples"),
        )
    )
