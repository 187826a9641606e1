"""Incremental (streaming) validation of arriving clip batches.

The reference's only streaming behavior is incremental DELIVERY: results
are pushed row-by-row as profilers compute them and forwarded to
subscribed dashboards (/root/reference/profilers/worker.js:70-83,
api/hooks/amqp.js:32-43). The reference has no watermarks or event-time
windows to reproduce; :func:`windowed_event_stats` adds them as a
beyond-reference operator (task mandate: watermarks + windowed aggs for
late data). The Spark-native analog of the reference's delivery loop is
micro-batch ingestion:

    readStream (file source over the clips directory)
      -> foreachBatch: run the SAME resumable ValidationEngine stages
         on the partitions present in the batch
      -> results land in the same violations/manifest/profile tables,
         visible to readers incrementally (per-partition appends)

Exactly-once per (partition, stage) comes from two layers: Spark's
streaming checkpoint (a file is processed by at most one batch) and the
engine's delete-before-write per partition (reference worker.js:97-100),
so replays after a crash cannot duplicate violations.

Scale notes: maxFilesPerTrigger bounds batch size; each micro-batch runs
the engine's one-job-per-stage plans over only the partitions touched by
the batch (partition-pruned scans).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .datagen import CLIPS_SCHEMA, REFS_SCHEMA
from .engine import ValidationEngine


@dataclass
class StreamingValidator:
    """Continuously validate clips as files arrive in a directory."""

    spark: SparkSession
    clips_dir: str
    checkpoint_dir: str
    engine: ValidationEngine  # owns the output tables (violations/manifest)
    refs_dir: str | None = None
    max_files_per_trigger: int | None = None

    def _read_stream(self) -> DataFrame:
        reader = (
            self.spark.readStream.schema(CLIPS_SCHEMA)  # includes `part`
            .format("parquet")
            .option("recursiveFileLookup", "false")
        )
        if self.max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", self.max_files_per_trigger)
        # basePath keeps the `part=` dir as a partition column
        reader = reader.option("basePath", self.clips_dir)
        return reader.load(self.clips_dir)

    def _process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        parts = [r[0] for r in batch_df.select("part").distinct().collect()]
        # The micro-batch contains only NEWLY ARRIVED files, but the
        # engine's delete-before-write replaces each touched partition's
        # outputs wholesale. Validating the batch rows alone would drop
        # every prior result for a partition whose files arrive across
        # batches (and cross-batch duplicates would never meet). So:
        # re-read the FULL current contents of the touched partitions
        # (partition-pruned scan — untouched partitions cost nothing) and
        # revalidate those. Idempotent under replays; converges to the
        # batch-equivalent result whatever the file->batch grouping.
        full = (
            self.spark.read.schema(CLIPS_SCHEMA)
            .option("basePath", self.clips_dir)
            .parquet(self.clips_dir)
            .where(F.col("part").isin(parts))
        )
        refs = None
        if self.refs_dir is not None:
            refs = self.spark.read.schema(REFS_SCHEMA).parquet(self.refs_dir).where(
                F.col("part").isin(parts)
            )
        self.engine.run(
            full, refs=refs, resume=False, run_id=f"stream-{batch_id}"
        )

    def start(self, available_now: bool = True):
        """Start the stream. available_now=True drains what exists and
        stops (test/batch-catchup mode); False runs continuously."""
        writer = (
            self._read_stream()
            .writeStream.foreachBatch(self._process_batch)
            .option("checkpointLocation", self.checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()


DELIVERY_SCHEMA = "clip_id string, bytes binary"


@dataclass
class AdmissionMonitor:
    """Continuously admit clip deliveries as they land in a directory.

    Layout: ``deliveries_dir/batch=<delivery_id>/*.parquet`` with
    (clip_id, bytes) rows — the ``batch=`` partition directory carries
    the delivery id, exactly how an upstream crawler would stage
    hand-offs. Each micro-batch re-reads the FULL current contents of
    the touched deliveries (a delivery's files can arrive across
    micro-batches — same reasoning as StreamingValidator) and runs
    ``engine.run_admission`` with resume=False: the admissions table's
    per-delivery replace makes replays and re-arrivals idempotent, and
    each delivery converges to its complete classification whatever the
    file->batch grouping.

    The corpus fingerprint index is computed ONCE (lazily, persisted) —
    or passed in via ``corpus_fps`` from the engine's shared decode
    pass — so steady-state streaming cost per delivery is decoding the
    DELIVERY only, never the corpus.
    """

    spark: SparkSession
    corpus: DataFrame
    deliveries_dir: str
    checkpoint_dir: str
    engine: ValidationEngine
    corpus_fps: DataFrame | None = None
    max_files_per_trigger: int | None = None

    def _fps(self) -> DataFrame:
        if self.corpus_fps is None:
            from .rules.audio_rules import decode_facts

            fps = decode_facts(
                self.corpus, with_snr=False, with_fp=True
            ).select("clip_id", "fp").persist()
            fps.count()
            self.corpus_fps = fps
        return self.corpus_fps

    def _read_stream(self) -> DataFrame:
        reader = (
            self.spark.readStream.schema(DELIVERY_SCHEMA)
            .format("parquet")
            .option("basePath", self.deliveries_dir)  # keep batch= column
        )
        if self.max_files_per_trigger:
            reader = reader.option(
                "maxFilesPerTrigger", self.max_files_per_trigger
            )
        return reader.load(self.deliveries_dir)

    def _process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        touched = [r[0] for r in batch_df.select("batch").distinct().collect()]
        full = (
            self.spark.read.schema(DELIVERY_SCHEMA)
            .option("basePath", self.deliveries_dir)
            .parquet(self.deliveries_dir)
            .where(F.col("batch").isin(touched))
        )
        fps = self._fps()
        for delivery in sorted(map(str, touched)):
            self.engine.run_admission(
                self.corpus,
                full.where(F.col("batch") == delivery).select(
                    "clip_id", "bytes"
                ),
                batch_id=delivery,
                corpus_fps=fps,
                resume=False,
                run_id=f"stream-{batch_id}-{delivery}",
            )

    def start(self, available_now: bool = True):
        """Start the stream. available_now=True drains what exists and
        stops (test/batch-catchup mode); False runs continuously."""
        writer = (
            self._read_stream()
            .writeStream.foreachBatch(self._process_batch)
            .option("checkpointLocation", self.checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()


# ---------------------------------------------------------------------------
# Event-time windowed aggregation with a watermark
# ---------------------------------------------------------------------------


def windowed_event_stats(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling event-time window stats per key: (window_start,
    window_end, key, n_events, avg/min/max of ``value_col``).

    ONE definition serves both execution modes — the logical plan is
    identical, only the sink semantics differ:

    - **Batch** DataFrame: the watermark is a no-op (Spark defines
      ``withWatermark`` as identity on batch plans); the result is the
      exact full-input answer — this is what the ``windowed_event_stats``
      contract query oracles against DuckDB.
    - **Streaming** DataFrame: ``withWatermark`` bounds the state store —
      a window's state is emitted (append mode) and dropped once the
      watermark (max observed event time − ``watermark``) passes the
      window end, and rows arriving LATER than the watermark are dropped
      instead of reopening finalized windows. State is therefore
      O(open windows × keys), not O(events) — the property that keeps an
      event-time aggregation runnable forever at 10^12-row scale.
      Covered by tests: batch/stream result equality and the late-row
      drop (tests/test_job_skew_streaming.py).

    Tumbling windows are epoch-aligned (Spark ``F.window`` semantics), so
    for whole-unit windows the batch twin is ``date_trunc`` in ANSI SQL.
    """
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(
            F.window(F.col(ts_col), window).alias("w"), F.col(key_col)
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # order-independent mean: exact DECIMAL sum (associative),
            # then ONE double division. A float avg() is summation-
            # order-dependent — at sf0.1 row counts it diverges from
            # the DuckDB oracle by 1 ulp, which flips the rounded 6th
            # decimal and fails a hash-canonical gate (caught by the
            # round-4 sf0.1 strict sweep). The decimal cast truncates
            # the same IEEE double identically on both engines.
            # Denominator is the NON-NULL count (avg() semantics: NULL
            # values are absent, not zero) — n_events stays count(*).
            F.sum(F.col(value_col).cast("decimal(30,8)")).alias("_vsum"),
            F.count(F.col(value_col)).alias("_vn"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col(key_col),
            "n_events",
            F.when(
                F.col("_vn") > 0, F.col("_vsum").cast("double") / F.col("_vn")
            ).alias("avg_value"),
            "min_value",
            "max_value",
        )
    )


def windowed_text_quality(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling event-time corpus-quality monitor: per window,
    (window_start, window_end, n_docs, pii_docs, avg_quality,
    avg_tokens) — the ingestion gate a continuously-fed training
    corpus needs: is this hour's crawl suddenly shorter, dirtier, or
    leaking PII?

    Same dual-mode contract as :func:`windowed_event_stats`: ONE
    definition — batch (watermark is identity, exact full-input answer,
    oracled by the ``windowed_text_quality`` contract query) and
    streaming (append mode, state bounded to open windows by the
    watermark). All metrics are expression-only (functions.text +
    functions.pii), so the streaming aggregate is a plain built-in
    windowed agg — no foreachBatch math, no custom state.
    """
    from .functions.pii import has_pii
    from .functions.text import quality_score, token_count

    src = docs.withWatermark(ts_col, watermark) if docs.isStreaming else docs
    return (
        src.groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(has_pii(text_col).cast("bigint")).alias("pii_docs"),
            # decimal-sum mean: quality_score is per-row 6dp, so the
            # DECIMAL(30,8) cast is exact and the sum associative —
            # float avg() order-divergence fails the hash gate at
            # sf0.1 (see windowed_event_stats). Denominator = non-null
            # doc count (quality_score is NULL iff the text is NULL),
            # so NULL docs are absent from the mean, not zeros.
            F.round(
                F.sum(quality_score(text_col).cast("decimal(30,8)"))
                .cast("double")
                / F.nullif(F.count(F.col(text_col)), F.lit(0)),
                6,
            ).alias("avg_quality"),
            # token counts are integer-valued: their double sum is
            # exact (and order-independent) up to 2^53
            F.round(
                F.avg(token_count(text_col).cast("double")), 6
            ).alias("avg_tokens"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_docs",
            "pii_docs",
            "avg_quality",
            "avg_tokens",
        )
    )


def windowed_expectations(
    df: DataFrame,
    checks,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Continuous expectation monitoring: the SAME declarative suite
    `expectations.verify` runs per partition, evaluated per event-time
    window — (window_start, window_end, check, column, value, lo, hi,
    passed), the contract gate over an arriving stream ("did this
    hour's delivery break completeness / domain / size?").

    Dual-mode like :func:`windowed_event_stats`: ONE definition — in
    batch the watermark is identity and the answer is exact (oracled by
    the ``windowed_expectations`` contract query); streaming runs the
    identical plan in append mode with state bounded to open windows.
    Streaming restriction: Spark does not support exact count-distinct
    in streaming aggregations, so suites destined for a stream must use
    ``uniqueness(..., exact=False)`` (the HLL variant — also the scale
    default) or ``distinctness``-free checks; everything else in the
    check vocabulary is an algebraic aggregate and streams as-is.
    """
    from . import expectations as ex

    names, aggs = ex.agg_exprs(checks)
    src = df.withWatermark(ts_col, watermark) if df.isStreaming else df
    return (
        src.groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(*aggs)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.inline_outer(ex.verdict_rows(checks, names)),
        )
    )


# ---------------------------------------------------------------------------
# Stateful streaming dedup (applyInPandasWithState)
# ---------------------------------------------------------------------------

DEDUP_OUT_SCHEMA = "digest string, doc_id bigint, keeper_id bigint, is_dup boolean"
DEDUP_STATE_SCHEMA = "keeper_id bigint, n_seen bigint"


def streaming_exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", content_col: str = "text"
) -> DataFrame:
    """Cross-batch exact dedup over a stream: flag every document whose
    content digest was already seen — in THIS batch or ANY earlier one.

    The batch operator (operators.dedup.exact_dup_groups) answers "what
    is duplicated in this corpus"; a training-data INGEST pipeline needs
    the streaming form — "is this arriving document new" — without
    re-scanning the corpus per batch. State is the Spark state store
    keyed by digest: one (keeper_id, n_seen) row per distinct content,
    partitioned across executors by the groupBy(digest) shuffle and
    checkpointed with the stream (restart-safe — covered by tests).
    At 10^12 scale the state store (RocksDB-backed in prod configs)
    holds only distinct digests, not documents.

    Determinism: all same-digest rows co-group regardless of
    parallelism; within a first-seen batch the keeper is the LOWEST id
    (sorted before emit), not arrival order.

    Returns a streaming DataFrame (digest, doc_id, keeper_id, is_dup);
    one row per input row, appended each micro-batch.
    """
    keyed = docs.select(
        F.md5(F.col(content_col).cast("binary")).alias("digest"),
        F.col(id_col).cast("long").alias("doc_id"),
    ).groupBy("digest")

    def dedupe(key, pdfs, state):
        import pandas as pd

        ids: list[int] = []
        for pdf in pdfs:
            ids.extend(int(x) for x in pdf["doc_id"])
        ids.sort()
        if state.exists:
            keeper, n_seen = state.get
            is_dup = [True] * len(ids)  # content already kept earlier
        else:
            keeper, n_seen = ids[0], 0
            is_dup = [i != keeper for i in ids]
        state.update((keeper, n_seen + len(ids)))
        yield pd.DataFrame(
            {
                "digest": key[0],
                "doc_id": ids,
                "keeper_id": keeper,
                "is_dup": is_dup,
            }
        )

    return keyed.applyInPandasWithState(
        dedupe, DEDUP_OUT_SCHEMA, DEDUP_STATE_SCHEMA, "append", "NoTimeout"
    )


def session_event_stats(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based session stats via Spark's native ``session_window``:
    (user, session_start, session_end, n_events).

    ONE definition, both modes (same contract as
    :func:`windowed_event_stats`):

    - **Batch**: full-input sessions — cross-validated in pytest against
      the independent window/lag implementation in
      ``operators.sessions.session_stats`` (two different formulations,
      same sessions).
    - **Streaming**: the watermark closes a session once no event can
      extend it (max event time − watermark > last event + gap); its
      state is emitted (append) and dropped, later rows are discarded.
      State is O(OPEN sessions), not O(events) — the property that lets
      per-user sessionization run forever at 10^12 events.

    Note ``session_window.end`` is last-event-time + gap (Spark
    semantics); the last EVENT time is end − gap.
    """
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"), F.col(user_col)
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(user_col).alias("user"),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# Continuous drift monitoring (windowed histograms -> PSI/KS vs baseline)
# ---------------------------------------------------------------------------

def windowed_drift_hist(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    value_hist_cols: tuple[str, ...] = (),
    bucket_hist_cols: dict[str, float] | None = None,
) -> DataFrame:
    """Event-time-windowed histograms: (window_start, key, kind, bin,
    count), binned EXACTLY like the batch profiler
    (profiler.hist_entry_exprs — shared definition, so windowed bins
    align with a profile_hist-derived baseline).

    ONE definition, both modes (contract of windowed_event_stats):
    batch = exact full-input histograms (watermark is identity);
    streaming = append mode, a window's bins finalize and their state
    drops once the watermark passes the window end. State is
    O(open windows x bins) — a histogram sketch, never O(events).
    """
    from .profiler import hist_entry_exprs

    entries = hist_entry_exprs(tuple(value_hist_cols), bucket_hist_cols or {})
    if not entries:
        raise ValueError("no histogram columns configured")
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.select(
            F.window(F.col(ts_col), window).alias("w"),
            F.explode(F.array(*entries)).alias("h"),
        )
        .groupBy("w", "h.key", "h.kind", "h.bin")
        .agg(F.count(F.lit(1)).alias("count"))
        .select(F.col("w.start").alias("window_start"), "key", "kind", "bin", "count")
    )


def windowed_drift_metrics(hist: DataFrame, baseline: DataFrame) -> DataFrame:
    """PSI/KS per (window_start, key) vs a static baseline — a thin
    adapter over drift.drift_metrics with the window standing in for the
    partition. `hist`: windowed_drift_hist output; `baseline`:
    (key, kind, bin, count), e.g. drift.global_baseline of a known-good
    profile_hist or of the hist itself."""
    from .drift import drift_metrics

    m = drift_metrics(hist.withColumnRenamed("window_start", "part"), baseline)
    return m.withColumnRenamed("part", "window_start")


def drift_monitor(
    events: DataFrame,
    baseline: DataFrame,
    out_path: str,
    checkpoint: str,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    value_hist_cols: tuple[str, ...] = (),
    bucket_hist_cols: dict[str, float] | None = None,
    psi_threshold: float = 0.25,
    ks_threshold: float = 0.2,
):
    """Continuous validation: stream -> windowed histograms (append mode,
    finalized by the watermark) -> each finalized window PSI/KS-tested
    against the static baseline inside foreachBatch -> drift rows
    appended to ``out_path`` (window_start, key, kind, psi, ks_d,
    drifted).

    The streaming side holds only open-window histogram state; the PSI/KS
    math runs batch-side per micro-batch over finalized (tiny,
    sketch-sized) histogram rows — the same drift.drift_metrics used by
    the batch DriftRule, so alert semantics match the engine's exactly.
    Returns the DataStreamWriter; call .trigger(...).start() to run.
    """
    hist = windowed_drift_hist(
        events, ts_col, window, watermark, value_hist_cols, bucket_hist_cols
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = windowed_drift_metrics(batch_df, baseline).select(
            "window_start", "key", "kind",
            F.round("psi", 6).alias("psi"),
            F.round("ks_d", 6).alias("ks_d"),
            (
                (F.col("psi") > psi_threshold) | (F.col("ks_d") > ks_threshold)
            ).alias("drifted"),
        )
        out.write.mode("append").parquet(out_path)

    return (
        hist.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(process)
    )


def windowed_embedding_sums(
    df: DataFrame,
    vec_col: str,
    dim: int,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time-windowed embedding-centroid sums: (window_start,
    n_vecs, n_bad, _s0.._s{dim-1}) via drift.embedding_sum_exprs —
    per-dimension conditional sums, MERGEABLE, so streaming state per
    open window is dim doubles + two counts, never a row per vector.

    ONE definition, both modes (the windowed_event_stats contract):
    batch = exact per-window sums; streaming = append mode, a window
    finalizes and drops state when the watermark passes its end.
    """
    from .drift import embedding_sum_exprs

    src = df.withWatermark(ts_col, watermark) if df.isStreaming else df
    return (
        src.select(F.window(F.col(ts_col), window).alias("w"), vec_col)
        .groupBy("w")
        .agg(*embedding_sum_exprs(vec_col, dim))
        .select(F.col("w.start").alias("window_start"), "*")
        .drop("w")
    )


def windowed_embedding_drift(
    sums: DataFrame, baseline: list, dim: int, min_cos: float = 0.98
) -> DataFrame:
    """Per finalized window, the centroid's cosine / L2 shift vs a
    STATIC baseline centroid (drift.embedding_baseline of a known-good
    corpus) — the same drift.centroid_metric_cols math the batch
    embedding_drift stage uses, so alerts match the engine's exactly.
    ``drifted`` = cos < min_cos, or a degenerate zero-norm centroid."""
    from .drift import centroid_metric_cols

    gn, gsums = baseline[0], baseline[1:]
    j = sums.where(F.col("n_vecs") > 0).select(
        "*",
        F.lit(float(gn)).alias("_gn"),
        *[F.lit(float(g)).alias(f"_g{i}") for i, g in enumerate(gsums)],
    )
    norm, cos, shift = centroid_metric_cols(dim)
    return j.select(
        "window_start",
        F.col("n_vecs").cast("bigint").alias("n_vecs"),
        F.col("n_bad").cast("bigint").alias("n_bad"),
        F.round(norm, 6).alias("centroid_norm"),
        F.round(cos, 6).alias("global_cos"),
        F.round(shift, 6).alias("centroid_shift"),
        F.coalesce(cos < min_cos, F.lit(True)).alias("drifted"),
    )


def embedding_drift_monitor(
    df: DataFrame,
    baseline: list,
    out_path: str,
    checkpoint: str,
    vec_col: str,
    dim: int,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    min_cos: float = 0.98,
):
    """Continuous validation for VECTOR columns: stream -> windowed
    centroid sums (append mode, finalized by the watermark) -> each
    finalized window compared against the static baseline centroid
    inside foreachBatch -> drift rows appended to ``out_path``.

    The vector sibling of drift_monitor: streaming state is O(open
    windows x dim), the compare runs batch-side per micro-batch over
    finalized sketch rows, and the math is drift.centroid_metric_cols
    — identical to the engine's run_embedding_drift stage. Returns the
    DataStreamWriter; call .trigger(...).start() to run.

    A dozen-line lit() of the baseline sums is fine here (dim ~16-64
    scalars — NOT the large-literal trap recorded for the bloom probe,
    which was 16k array children).
    """
    sums = windowed_embedding_sums(df, vec_col, dim, ts_col, window, watermark)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        windowed_embedding_drift(batch_df, baseline, dim, min_cos).write.mode(
            "append"
        ).parquet(out_path)

    return (
        sums.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(process)
    )


def windowed_probe_stats(
    clips: DataFrame,
    ts_col: str = "ts",
    bytes_col: str = "bytes",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling event-time ingest gate on the header probe: per window,
    clip count, probe-flagged count, per-finding counts, and the
    flagged rate — the FIRST check a continuously-fed audio corpus
    should run, because it is decode-free (operators.headerprobe: pure
    scan-stage byte arithmetic) yet catches truncation, container/
    metadata mismatches, and junk deliveries at the door.

    Same dual-mode contract as :func:`windowed_event_stats`: ONE
    definition — batch (exact full-input answer) and streaming (append
    mode, state bounded to open windows by the watermark). The probe
    columns are plain expressions, so the streaming side is a built-in
    windowed agg — no foreachBatch, no custom state.
    """
    from .operators.headerprobe import header_findings, probe_stat_exprs

    src = clips.withWatermark(ts_col, watermark) if clips.isStreaming else clips
    return (
        header_findings(src, bytes_col)
        .groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(*probe_stat_exprs())
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "*",
        )
        .drop("w")
    )
