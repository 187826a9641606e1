"""Validation engine: stages, idempotent writes, checkpoint manifest.

Job model mapped from the reference (SURVEY §2.8):
- task grain (dataset × profiler) -> (partition × stage); lineage columns
  stamped on every output row (reference stamps {dataset, profiler,
  createdAt} on results, ``/root/reference/profilers/worker.js:72``).
- idempotent re-run = delete-before-write per (stage, partition)
  (reference ``worker.js:97-100`` deleteMany before recompute) —
  delegated to a pluggable table-IO backend (``tableio`` module):
  parquet partition-directory replace in the sandbox, transactional
  Iceberg ``DELETE`` + append when an Iceberg catalog is configured.
- cascade DAG (``profilers/config.js:10-20``) -> fixed stage order +
  rule ``depends_on``; a later stage reads earlier stages' output tables
  (the semantic profiler reads messystreams results the same way,
  ``profilers/semantic.js:50-55``).
- resume (north_rule) = checkpoint manifest table of completed
  (partition, stage) with metrics; a re-run skips completed pairs.

Scale notes: each stage runs ONE Spark job covering all pending
partitions (partition-pruned scan), not a job per partition — at 10^5
partitions per-partition jobs would be scheduler-bound. Per-partition
metrics still come out of the same job via groupBy(part). Driver state
is O(#partitions), never O(rows).
"""

from __future__ import annotations

import os
import threading
import time
import uuid
from concurrent.futures import ThreadPoolExecutor, as_completed
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import profiler as prof
from .rules.base import Rule, RuleContext, topo_sort
from .rules.audio_rules import decode_facts
from .tableio import default_io

STAGE_ORDER = ("profile", "constraints", "audio", "drift", "semantic")

MANIFEST_SCHEMA = (
    "run_id string, part string, stage string, completed_at timestamp, "
    "n_rows bigint, n_violations bigint, wall_ms bigint"
)
VERDICT_SCHEMA = (
    "part string, stage string, passed boolean, n_rows bigint, "
    "n_violations bigint, wall_ms bigint, run_id string"
)


VIOLATIONS_SCHEMA = "part string, rule string, clip_id string, detail string, stage string"
PROFILE_HIST_SCHEMA = "part string, key string, kind string, bin string, count bigint"


@dataclass
class ValidationEngine:
    spark: SparkSession
    out_dir: str
    rules: list[Rule] = field(default_factory=list)
    profile_cfg: prof.ProfileConfig | None = None
    key_col: str = "clip_id"
    part_col: str = "part"
    # manifest compaction threshold: every (stage, run) commit appends one
    # small file; without compaction the manifest listing is O(#runs)
    manifest_compact_files: int = 64
    # table backend: ParquetDirIO under out_dir by default; an Iceberg
    # catalog (if configured on the session) is picked up automatically,
    # giving transactional per-partition replace (tableio module doc)
    io: object | None = None
    # Row-level decode triage (None = off, full decode — the default and
    # the exact-parity mode). When set to a percentage (e.g. 1.0), the
    # audio stage decodes ONLY clips the header probe flags
    # (operators.headerprobe.triage_route) plus that percentage of the
    # probe-clean population as a deterministic audit sample: the
    # expensive pandas-UDF tier shrinks from |corpus| to |flagged| +
    # |sample|, the only viable shape at 10^12 clips. Tradeoffs are
    # explicit: decode-tier rules report violations only for routed
    # rows (PCM-level defects such as SNR corruption on unsampled clean
    # rows go unseen — bound that risk with run_certificate, whose
    # partition-level Hoeffding bound complements this row-level gate),
    # and the profile stage computes its binary stats with the direct
    # expression path instead of the fused decode pass (same values:
    # tests pin fused == direct). Pair with
    # default_clip_rules(with_header_triage=True) so the probe's own
    # findings land in the violations table at the constraints stage.
    triage_sample_pct: float | None = None

    def __post_init__(self) -> None:
        if self.io is None:
            self.io = default_io(self.spark, self.out_dir)

    # --- output tables -------------------------------------------------
    def manifest(self) -> DataFrame:
        return self.io.read("manifest", MANIFEST_SCHEMA)

    def verdicts(self) -> DataFrame:
        """Per-(partition, stage) pass/fail — a projection of the manifest
        (single source of truth; avoids a second commit write per stage)."""
        return self.manifest().select(
            "part", "stage",
            (F.col("n_violations") == 0).alias("passed"),
            "n_rows", "n_violations", "wall_ms", "run_id",
        )

    def violations(self) -> DataFrame:
        return self.io.read("violations", VIOLATIONS_SCHEMA)

    def profile_summary(self) -> DataFrame:
        return self.io.read("profile_summary", prof.SUMMARY_SCHEMA)

    def profile_hist(self) -> DataFrame:
        return self.io.read("profile_hist", PROFILE_HIST_SCHEMA)

    def drift_baseline(self) -> DataFrame:
        """Known-good baseline for the streaming drift monitor: the
        global aggregate of this engine's profile histograms (bins
        already align — streaming.windowed_drift_hist bins with the same
        profiler.hist_entry_exprs that produced profile_hist)."""
        from .drift import global_baseline

        return global_baseline(self.profile_hist())

    def metric_anomalies(
        self,
        value_col: str = "n_violations",
        window: int = 7,
        k: float = 3.0,
        min_history: int = 3,
    ) -> DataFrame:
        """Screen this engine's own run history for anomalies: each
        (part, stage) series of ``value_col`` (n_violations, n_rows, or
        wall_ms from the manifest) against its trailing-window mean ±
        k·σ (drift.metric_anomaly) — "which partition's violation count
        jumped this run", the repeated-validation check that catches
        upstream regressions a single run's pass/fail cannot. The
        manifest is sketch-sized (#parts × #stages × #runs), so this is
        driver-cheap at any corpus scale."""
        from .drift import metric_anomaly

        return metric_anomaly(
            self.manifest(),
            value_col,
            "completed_at",
            key_cols=("part", "stage"),
            window=window,
            k=k,
            min_history=min_history,
        )

    def metric_changepoints(
        self, value_col: str = "n_violations", min_seg: int = 2
    ) -> DataFrame:
        """Date the regime change in each (part, stage) metric series:
        :func:`drift.changepoint_scan` over the same manifest history
        :meth:`metric_anomalies` screens — anomaly says THIS run broke,
        this says the series' level shifted at run K (e.g. an upstream
        pipeline change quietly doubling a partition's violation rate).
        Driver-cheap at any corpus scale (manifest is sketch-sized)."""
        from .drift import changepoint_scan

        return changepoint_scan(
            self.manifest(), value_col, "completed_at",
            key_cols=("part", "stage"), min_seg=min_seg,
        )

    # --- run -------------------------------------------------------------
    def run(
        self,
        clips: DataFrame,
        refs: DataFrame | None = None,
        baseline_hist: DataFrame | None = None,
        resume: bool = True,
        run_id: str | None = None,
        fail_stage: str | None = None,  # test hook: raise before this stage commits
    ) -> DataFrame:
        """Execute all stages over partitions not yet in the manifest.

        Returns the verdicts DataFrame for this run.
        """
        run_id = run_id or uuid.uuid4().hex[:12]
        cfg = self.profile_cfg or prof.ProfileConfig(part_col=self.part_col)
        all_parts = [r[0] for r in clips.select(self.part_col).distinct().collect()]

        done: set[tuple[str, str]] = set()
        if resume:
            done = {
                (r["part"], r["stage"])
                for r in self.manifest().select("part", "stage").distinct().collect()
            }

        rules_by_stage: dict[str, list[Rule]] = {}
        for r in topo_sort(self.rules):
            rules_by_stage.setdefault(r.stage, []).append(r)

        rule_stages: list[str] = [s for s in STAGE_ORDER[1:] if rules_by_stage.get(s)]

        pending_of = {
            s: [p for p in all_parts if (str(p), s) not in done]
            for s in ("profile", *rule_stages)
        }

        # Decode ONCE for the union of the profile and audio pending sets:
        # the binary column is by far the widest thing scanned, and its
        # profile stats are entirely length-derived, so one mapInPandas
        # pass feeds BOTH the audio rules and the profile stage's `bytes`
        # summary row — halving full-table binary scans per run. SNR is
        # rendered only when the audio stage actually needs it.
        decoded: DataFrame | None = None
        if rules_by_stage.get("audio") and "bytes" in clips.columns:
            decode_parts = sorted(
                {str(p) for p in pending_of.get("audio", [])}
                | ({str(p) for p in pending_of["profile"]}
                   if self.triage_sample_pct is None else set())
            )
            if decode_parts:
                decode_src = clips.where(
                    F.col(self.part_col).cast("string").isin(decode_parts)
                )
                if self.triage_sample_pct is not None:
                    # two-tier mode: the decode tier sees only rows the
                    # header probe flagged plus the deterministic audit
                    # sample; everything else is vouched for at scan
                    # speed (see triage_sample_pct field doc)
                    from .operators.headerprobe import triage_route

                    decode_src = triage_route(
                        decode_src,
                        key_col=self.key_col,
                        sample_pct=self.triage_sample_pct,
                    ).where(F.col("route") == "decode").select(*clips.columns)
                decoded = decode_facts(
                    decode_src, with_snr=bool(pending_of.get("audio"))
                ).persist()

        rows_cache: dict[str, int] = {}  # filled by the profile stage
        commit_lock = threading.Lock()

        def run_stage(stage: str) -> None:
            pending = pending_of[stage]
            if not pending:
                return
            if fail_stage == stage:
                raise RuntimeError(f"injected failure before stage {stage!r}")
            t0 = time.monotonic()
            scoped = clips.where(F.col(self.part_col).isin(pending))
            refs_scoped = refs
            if refs is not None and self.part_col in refs.columns:
                refs_scoped = refs.where(F.col(self.part_col).isin(pending))
            stage_decoded = None
            if decoded is not None and stage in ("profile", "audio"):
                if stage == "profile" and self.triage_sample_pct is not None:
                    # triage decode is a row subset: its length stats
                    # would under-count, so profile keeps the direct
                    # expression path (pinned equal to the fused path)
                    stage_decoded = None
                else:
                    stage_decoded = decoded.where(
                        F.col("part").isin([str(p) for p in pending])
                    )

            if stage == "profile":
                n_rows_by_part, n_viol_by_part = self._run_profile(
                    scoped, cfg, pending, decoded=stage_decoded
                )
                rows_cache.update(n_rows_by_part)
            else:
                ctx = RuleContext(
                    spark=self.spark,
                    clips=scoped,
                    refs=refs_scoped,
                    decoded=stage_decoded,
                    profile_summary=self.profile_summary(),
                    profile_hist=self.profile_hist(),
                    baseline_hist=baseline_hist,
                    key_col=self.key_col,
                    part_col=self.part_col,
                )
                n_viol_by_part = self._run_rule_stage(stage, rules_by_stage[stage], ctx, pending)
                if all(str(p) in rows_cache for p in pending):
                    n_rows_by_part = {str(p): rows_cache[str(p)] for p in pending}
                else:  # resumed run that skipped the profile stage
                    n_rows_by_part = self._rows_by_part(pending)
                    rows_cache.update(n_rows_by_part)

            wall_ms = int((time.monotonic() - t0) * 1000)
            with commit_lock:
                self._commit(run_id, stage, pending, n_rows_by_part, n_viol_by_part, wall_ms)

        # profile runs first: every later stage may read its outputs
        try:
            self._run_stages(run_stage, rule_stages, fail_stage)
        finally:
            if decoded is not None:
                decoded.unpersist()

        return self.verdicts().where(F.col("run_id") == run_id)

    def _run_stages(self, run_stage, rule_stages, fail_stage) -> None:
        run_stage("profile")

        # Later stages CAN run concurrently when their rules have no
        # dependencies on rules in other pending stages. Default: ON for
        # cluster masters, OFF for local[*] — measured both ways:
        # at local[32] concurrent submission contends on the single
        # local-mode driver (14-16s serial vs 23-46s concurrent), but on
        # a real standalone cluster overlapping constraints/audio/drift
        # hides stage latency (96k clips: 2,248-2,479 -> 2,630 clips/s
        # at one 8-core executor, 3,837-4,063 -> 4,464 at four;
        # BENCH/BASELINE.md run 5). NADEEFILER_CONCURRENT_STAGES=1/0
        # overrides either way. Cascades (cross-stage depends_on,
        # reference profilers/config.js:10-20) always run serially in
        # topological order.
        stage_of = {r.name: r.stage for r in self.rules}
        cross_dep = any(
            stage_of.get(dep) not in (None, r.stage, "profile")
            for r in self.rules
            for dep in r.depends_on
        )
        env_val = os.environ.get("NADEEFILER_CONCURRENT_STAGES", "")
        is_local = self.spark.sparkContext.master.startswith("local")
        concurrent_env = env_val == "1" or (env_val == "" and not is_local)
        if cross_dep or not concurrent_env or fail_stage is not None or len(rule_stages) <= 1:
            for stage in rule_stages:
                run_stage(stage)
        else:
            with ThreadPoolExecutor(max_workers=len(rule_stages)) as pool:
                futures = {pool.submit(run_stage, s): s for s in rule_stages}
                errs = []
                for fut in as_completed(futures):
                    if fut.exception() is not None:
                        errs.append((futures[fut], fut.exception()))
                if errs:
                    raise errs[0][1]

    # --- cascade stage: semantic typing ------------------------------------
    def run_semantic(
        self,
        kb: DataFrame,
        top_k: int = 10,
        resume: bool = True,
        run_id: str | None = None,
    ) -> DataFrame:
        """Cascade profiler stage: semantic-type scores per (partition,
        column) from the PROFILE stage's value histograms — the engine
        analog of the reference's `semantic` profiler, which reads the
        messystreams profiler's histogram RESULTS rather than raw rows
        (``/root/reference/profilers/semantic.js:50-55``,
        cascade ``profilers/config.js:10-20``).

        Reads only the (tiny) profile_hist table, scores against the
        broadcast KB, writes the ``semantic_scores`` output table with
        per-partition replace, and commits manifest rows under
        stage='semantic' (so resume and verdicts work like any stage).
        Requires the profile stage to have run (it is the cascade
        parent).
        """
        from . import semantic as sem

        run_id = run_id or uuid.uuid4().hex[:12]
        hist = self.profile_hist().where(F.col("kind") == "value")
        all_parts = [r[0] for r in hist.select("part").distinct().collect()]
        done: set[str] = set()
        if resume:
            done = {
                r["part"]
                for r in self.manifest().where(F.col("stage") == "semantic")
                .select("part").distinct().collect()
            }
        pending = [p for p in all_parts if p not in done]
        if not pending:
            return self.verdicts().where(
                (F.col("stage") == "semantic") & (F.col("run_id") == run_id)
            )
        t0 = time.monotonic()
        string_hist = hist.where(F.col("part").isin(pending)).select(
            "part", "key", F.col("bin").alias("value"), "count"
        )
        scores = sem.semantic_scores(
            string_hist, kb, top_k=top_k, group_cols=("part", "key")
        )
        self.io.replace_partitions(scores, "semantic_scores", "part", pending)
        rows = self._rows_by_part(pending)
        wall_ms = int((time.monotonic() - t0) * 1000)
        self._commit(run_id, "semantic", pending, rows, {p: 0 for p in pending}, wall_ms)
        return self.verdicts().where(
            (F.col("stage") == "semantic") & (F.col("run_id") == run_id)
        )

    def semantic_scores_table(self) -> DataFrame:
        return self.io.read(
            "semantic_scores",
            "key string, object string, score double, rank int, part string",
        )

    # --- cascade stage: FD mining ------------------------------------------
    def run_fd(
        self,
        clips: DataFrame,
        cols: list[str] | None = None,
        max_ndv_frac: float = 0.5,
        max_violation_rate: float = 0.0,
        resume: bool = True,
        run_id: str | None = None,
    ) -> DataFrame:
        """Cascade profiler stage: per-partition single-column FD mining
        over ``cols`` (defaults to every non-binary column). Fills the
        reference's registered-but-stubbed ``fdminer`` cascade slot
        (``/root/reference/profilers/config.js:10-20``,
        ``profilers/fdminer/index.js:17-21``) as an engine stage: output
        table ``fd_results`` with per-partition replace, manifest rows
        under stage='fd' (resume/verdicts like any stage). One Spark job
        regardless of partition count — mining groups on
        (part, lhs) instead of looping partitions on the driver.
        """
        from . import fd as fdm

        run_id = run_id or uuid.uuid4().hex[:12]
        if cols is None:
            cols = [
                f.name for f in clips.schema.fields
                if f.name != self.part_col and "Binary" not in str(f.dataType)
            ]
        all_parts = [r[0] for r in clips.select(self.part_col).distinct().collect()]
        done: set[str] = set()
        if resume:
            done = {
                r["part"]
                for r in self.manifest().where(F.col("stage") == "fd")
                .select("part").distinct().collect()
            }
        pending = [p for p in all_parts if str(p) not in done]
        if not pending:
            return self.verdicts().where(
                (F.col("stage") == "fd") & (F.col("run_id") == run_id)
            )
        t0 = time.monotonic()
        scoped = clips.where(F.col(self.part_col).isin(pending))
        mined = fdm.mine_fds(
            scoped, cols, max_ndv_frac=max_ndv_frac,
            max_violation_rate=max_violation_rate, part_col=self.part_col,
        ).withColumn(self.part_col, F.col(self.part_col).cast("string"))
        if self.part_col != "part":
            mined = mined.withColumnRenamed(self.part_col, "part")
        self.io.replace_partitions(mined, "fd_results", "part", [str(p) for p in pending])
        rows = self._rows_by_part(pending)
        wall_ms = int((time.monotonic() - t0) * 1000)
        self._commit(
            run_id, "fd", [str(p) for p in pending],
            rows, {str(p): 0 for p in pending}, wall_ms,
        )
        return self.verdicts().where(
            (F.col("stage") == "fd") & (F.col("run_id") == run_id)
        )

    def fd_results(self) -> DataFrame:
        return self.io.read(
            "fd_results",
            "lhs string, rhs string, n_groups bigint, violating_groups bigint, "
            "holds boolean, part string",
        )

    # --- cascade stage: audio content dedup ---------------------------------
    def run_content_dedup(
        self,
        clips: DataFrame,
        resume: bool = True,
        run_id: str | None = None,
    ) -> DataFrame:
        """Cascade stage: cross-partition audio CONTENT dedup.

        Decoded-PCM fingerprint groups (operators.audio_fp) as an engine
        stage — output table ``content_dups``, manifest rows under
        stage='content_dedup' with per-partition lineage (n_violations =
        clips in that partition belonging to a duplicate-content group).

        Semantics are deliberately GLOBAL, unlike the per-partition rule
        stages: a re-encoded copy lands in a DIFFERENT codec partition
        than its original, so duplicate groups span partitions. Any
        pending partition therefore triggers a full recompute and a
        whole-table replace; a resumed run with no new partitions skips
        entirely. The decode runs once in the same narrow shape as the
        shared decode pass (decode_facts with_fp, no SNR render).
        """
        from .operators.audio_fp import dup_groups_from_facts

        def compute():
            facts = decode_facts(clips, with_snr=False, with_fp=True).persist()
            groups = dup_groups_from_facts(facts, id_col="clip_id").withColumn(
                "part", F.lit("*")
            )
            # per-partition lineage: clips implicated in any dup group
            # (the fp side of the join is tiny — one row per dup group)
            implicated = (
                facts.where(F.col("fp").isNotNull())
                .join(F.broadcast(groups.select("fp")), "fp")
                .select(F.col("part").alias(self.part_col))
            )
            return groups, implicated, facts.unpersist

        return self._run_global_stage(
            clips, "content_dedup", "content_dups", compute, resume, run_id
        )

    def run_embedding_dedup(
        self,
        clips: DataFrame,
        threshold: float = 0.98,
        resume: bool = True,
        run_id: str | None = None,
    ) -> DataFrame:
        """Cascade stage: cross-partition PERCEPTUAL audio dedup.

        LSH-blocked embedding-cosine pairs
        (operators.audio_features.audio_embedding_dup_pairs) clustered
        into connected components (operators.components.dup_clusters) —
        catches resample / noise-floor variants the exact-PCM
        fingerprint stage cannot. Output table ``embedding_dups``:
        (id, cluster_id, cluster_size) per implicated clip, cluster_id =
        keeper (min member id). Same GLOBAL semantics and manifest
        lineage as run_content_dedup (stage='embedding_dedup',
        n_violations = implicated clips per partition).
        """
        from .operators.audio_features import audio_embedding_dup_pairs
        from .operators.components import dup_clusters

        def compute():
            pairs = audio_embedding_dup_pairs(
                clips, id_col="clip_id", threshold=threshold
            )
            clusters = dup_clusters(pairs).persist()
            groups = clusters.withColumn("part", F.lit("*"))
            # implicated side is duplicates-only (tiny) -> broadcast it,
            # never shuffle the corpus
            implicated = clips.select(
                F.col("clip_id").alias("id"), self.part_col
            ).join(F.broadcast(clusters.select("id")), "id").select(self.part_col)
            return groups, implicated, clusters.unpersist

        return self._run_global_stage(
            clips, "embedding_dedup", "embedding_dups", compute, resume, run_id
        )

    def run_embedding_drift(
        self,
        clips: DataFrame,
        min_cos: float = 0.98,
        resume: bool = True,
        run_id: str | None = None,
    ) -> DataFrame:
        """Cascade stage: embedding-SPACE drift per corpus partition.

        The scalar drift stage (PSI/KS over histograms) watches declared
        columns; this stage watches the DECODED SIGNAL — each
        partition's audio-embedding centroid (operators.audio_features
        band-energy vectors, one narrow decode+featurize pass with the
        partition column carried through) against the corpus-wide
        centroid (drift.embedding_drift). A recording-condition change,
        codec/bandwidth shift, or content-domain swap in one delivery
        moves that partition's centroid even when sr_hz/dur_ms
        histograms look identical.

        GLOBAL semantics (the global centroid depends on every
        partition), so resume recomputes the whole table when any
        partition is pending — same contract as the dedup stages.
        Output table ``embedding_drift``: one row per corpus partition
        (corpus_part, n_vecs, n_bad, centroid_norm, global_cos,
        centroid_shift, drifted); ``drifted`` = global_cos < min_cos
        (or a degenerate zero-norm centroid). Manifest lineage counts
        every clip of a drifted partition as implicated.
        """
        from .drift import embedding_drift
        from .operators.audio_features import N_FEATURE_BANDS, audio_features

        def compute():
            feats = audio_features(clips, carry_cols=(self.part_col,))
            report = embedding_drift(
                feats, "features", self.part_col, dim=N_FEATURE_BANDS
            ).persist()
            drifted = F.coalesce(F.col("global_cos") < min_cos, F.lit(True))
            groups = report.select(
                F.col(self.part_col).cast("string").alias("corpus_part"),
                "n_vecs", "n_bad", "centroid_norm", "global_cos",
                "centroid_shift", drifted.alias("drifted"),
            ).withColumn("part", F.lit("*"))
            implicated = clips.select("clip_id", self.part_col).join(
                F.broadcast(
                    report.where(drifted).select(self.part_col)
                ),
                self.part_col,
            ).select(self.part_col)
            return groups, implicated, report.unpersist

        return self._run_global_stage(
            clips, "embedding_drift", "embedding_drift", compute, resume, run_id
        )

    def run_fp_index(
        self,
        clips: DataFrame,
        resume: bool = True,
        run_id: str | None = None,
    ) -> DataFrame:
        """Cascade stage: materialize the corpus fingerprint index.

        One (clip_id, fp, decode_error, part) row per corpus clip in
        the ``fp_index`` table — the maintained index ``run_admission``
        and ``streaming.AdmissionMonitor`` consume so deliveries never
        re-decode the corpus. Unlike the global dedup stages the index
        is a PER-PARTITION property: new corpus partitions index
        incrementally (per-partition replace + manifest resume,
        stage='fp_index') — the "maintained at ingest" shape; at 10^12
        clips the full-corpus decode is paid once, then each ingest
        pays only its own partitions. n_violations = undecodable clips
        in the partition (they can never content-match an admission).
        """
        run_id = run_id or uuid.uuid4().hex[:12]
        all_parts = [
            r[0] for r in clips.select(self.part_col).distinct().collect()
        ]
        done: set[str] = set()
        if resume:
            done = {
                r["part"]
                for r in self.manifest().where(F.col("stage") == "fp_index")
                .select("part").distinct().collect()
            }
        pending = [p for p in all_parts if str(p) not in done]
        if not pending:
            return self.verdicts().where(
                (F.col("stage") == "fp_index") & (F.col("run_id") == run_id)
            )
        t0 = time.monotonic()
        scoped = clips.where(F.col(self.part_col).isin(pending))
        idx = decode_facts(scoped, with_snr=False, with_fp=True).select(
            "clip_id", "fp", "decode_error", F.col("part").alias(self.part_col)
        ).persist()
        try:
            self.io.replace_partitions(idx, "fp_index", self.part_col, pending)
            stats = {
                str(r[0]): (r["n"], r["bad"])
                for r in idx.groupBy(self.part_col).agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.col("fp").isNull().cast("bigint")).alias("bad"),
                ).collect()
            }
        finally:
            idx.unpersist()
        wall_ms = int((time.monotonic() - t0) * 1000)
        self._commit(
            run_id, "fp_index", [str(p) for p in pending],
            {p: int(stats.get(p, (0, 0))[0]) for p in map(str, pending)},
            {p: int(stats.get(p, (0, 0))[1] or 0) for p in map(str, pending)},
            wall_ms,
        )
        return self.verdicts().where(
            (F.col("stage") == "fp_index") & (F.col("run_id") == run_id)
        )

    def run_vad(
        self,
        clips: DataFrame,
        resume: bool = True,
        run_id: str | None = None,
    ) -> DataFrame:
        """Cascade stage: per-clip voice-activity stats.

        One (clip_id, speech_ratio, n_speech_runs, longest_silence_ms,
        decode_error, part) row per clip in the ``vad_stats`` table
        (rules.audio_rules.vad_stats over the decode pass,
        decode_facts with_vad — SNR is not rendered). Per-partition
        property like fp_index: new partitions audit incrementally
        (per-partition replace + manifest resume, stage='vad').
        n_violations = clips with no detectable speech (undecodable or
        speech_ratio == 0) — the dead-corpus members a speech-training
        ingest wants surfaced.
        """
        run_id = run_id or uuid.uuid4().hex[:12]
        all_parts = [
            r[0] for r in clips.select(self.part_col).distinct().collect()
        ]
        done: set[str] = set()
        if resume:
            done = {
                r["part"]
                for r in self.manifest().where(F.col("stage") == "vad")
                .select("part").distinct().collect()
            }
        pending = [p for p in all_parts if str(p) not in done]
        if not pending:
            return self.verdicts().where(
                (F.col("stage") == "vad") & (F.col("run_id") == run_id)
            )
        t0 = time.monotonic()
        scoped = clips.where(F.col(self.part_col).isin(pending))
        vad = decode_facts(scoped, with_snr=False, with_vad=True).select(
            "clip_id", "speech_ratio", "n_speech_runs", "longest_silence_ms",
            "decode_error", F.col("part").alias(self.part_col),
        ).persist()
        try:
            self.io.replace_partitions(vad, "vad_stats", self.part_col, pending)
            stats = {
                str(r[0]): (r["n"], r["bad"])
                for r in vad.groupBy(self.part_col).agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(
                        (
                            F.col("decode_error").isNotNull()
                            | (F.col("speech_ratio") == 0.0)
                        ).cast("bigint")
                    ).alias("bad"),
                ).collect()
            }
        finally:
            vad.unpersist()
        wall_ms = int((time.monotonic() - t0) * 1000)
        self._commit(
            run_id, "vad", [str(p) for p in pending],
            {p: int(stats.get(p, (0, 0))[0]) for p in map(str, pending)},
            {p: int(stats.get(p, (0, 0))[1] or 0) for p in map(str, pending)},
            wall_ms,
        )
        return self.verdicts().where(
            (F.col("stage") == "vad") & (F.col("run_id") == run_id)
        )

    def run_certificate(
        self,
        clips: DataFrame,
        fraction: float,
        eps: float = 0.01,
        delta: float = 0.05,
        abs_tol_ms: int = 20,
        rel_tol: float = 0.02,
        salt: int = 17,
        resume: bool = True,
        run_id: str | None = None,
    ) -> DataFrame:
        """Cascade stage: sampled decode-health CERTIFICATE per partition.

        The full audio stage decodes every pending clip; at 10^12 clips
        a release gate cannot afford that every run. This stage decodes
        only the deterministic ``fraction`` hash sample of each pending
        partition — the sample filter runs BEFORE decode_facts, so the
        binary column of unsampled rows is never decoded — and writes a
        Hoeffding 1−``delta`` upper confidence bound on each partition's
        decode-violation rate (certify.attach_bound) to the
        ``certificates`` table: (part, n_sampled, n_viol, rate_hat,
        rate_ub, certified) with ``certified = rate_ub <= eps``.

        A sampled violation is the core decode-health triple the exact
        audio rules check row-by-row: decode failure, decoded sample
        rate != sr_hz, or |decoded − declared| duration beyond
        max(abs_tol_ms, rel_tol·dur_ms) (SNR is deliberately NOT
        rendered — the certificate is the cheap pre-gate; a failed
        certificate routes the partition to the full audio stage).

        Sampling keys on xxhash64(key_col) folded to [0, 2^31) — string
        clip ids hash deterministically at any parallelism, so re-runs
        certify the identical subset and a different ``salt`` draws an
        independent check. Resume unit = partition (stage
        ='certificate'); manifest n_rows = sampled clips, n_violations
        = sampled violating clips. Partitions whose sample is empty
        surface uncertified (rate_ub 1.0) rather than vanishing.
        """
        from .certify import attach_bound
        from .operators.sample import sample_key, threshold

        run_id = run_id or uuid.uuid4().hex[:12]
        all_parts = [
            r[0] for r in clips.select(self.part_col).distinct().collect()
        ]
        done: set[str] = set()
        if resume:
            done = {
                r["part"]
                for r in self.manifest().where(F.col("stage") == "certificate")
                .select("part").distinct().collect()
            }
        pending = [p for p in all_parts if str(p) not in done]
        if not pending:
            return self.verdicts().where(
                (F.col("stage") == "certificate") & (F.col("run_id") == run_id)
            )
        t0 = time.monotonic()
        scoped = clips.where(F.col(self.part_col).isin(pending))
        key = F.pmod(F.xxhash64(F.col(self.key_col)), F.lit(2**31))
        sampled = scoped.where(
            sample_key(key, salt) < F.lit(threshold(fraction))
        )
        facts = decode_facts(sampled, with_snr=False)
        tol = F.greatest(
            F.lit(float(abs_tol_ms)), F.lit(rel_tol) * F.col("dur_ms")
        )
        viol = (
            F.col("decode_error").isNotNull()
            | (F.col("dec_sr") != F.col("sr_hz"))
            | (F.abs(F.col("dec_ms") - F.col("dur_ms")) > tol)
        )
        agg = facts.groupBy("part").agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum(viol.cast("bigint")).alias("n_viol"),
        )
        parts_df = self.spark.createDataFrame(
            [(str(p),) for p in pending], "part string"
        )
        agg = parts_df.join(agg, ["part"], "left").fillna(
            0, subset=["n_sampled", "n_viol"]
        )
        cert = (
            attach_bound(agg, eps, delta, keys=["part"])
            .withColumnRenamed("part", self.part_col)
            .persist()
        )
        try:
            self.io.replace_partitions(
                cert, "certificates", self.part_col, [str(p) for p in pending]
            )
            stats = {
                str(r[self.part_col]): (r["n_sampled"], r["n_viol"])
                for r in cert.collect()
            }
        finally:
            cert.unpersist()
        wall_ms = int((time.monotonic() - t0) * 1000)
        self._commit(
            run_id, "certificate", [str(p) for p in pending],
            {p: int(stats.get(p, (0, 0))[0]) for p in map(str, pending)},
            {p: int(stats.get(p, (0, 0))[1] or 0) for p in map(str, pending)},
            wall_ms,
        )
        return self.verdicts().where(
            (F.col("stage") == "certificate") & (F.col("run_id") == run_id)
        )

    def run_probe_stats(
        self,
        clips: DataFrame,
        resume: bool = True,
        run_id: str | None = None,
    ) -> DataFrame:
        """Cascade stage: per-partition header-probe health table.

        One decode-free pass (operators.headerprobe.probe_stats — pure
        scan-stage byte arithmetic) writes the ``probe_health`` table:
        per partition, clip count, probe-flagged count, one column per
        finding kind, and the flagged rate — the corpus-integrity
        dashboard row the streaming ingest gate
        (streaming.windowed_probe_stats) computes per window, here as a
        resumable batch stage (stage='probe', resume unit = partition;
        manifest n_rows = clips probed, n_violations = flagged clips).
        """
        from .operators.headerprobe import probe_stats

        run_id = run_id or uuid.uuid4().hex[:12]
        all_parts = [
            r[0] for r in clips.select(self.part_col).distinct().collect()
        ]
        done: set[str] = set()
        if resume:
            done = {
                r["part"]
                for r in self.manifest().where(F.col("stage") == "probe")
                .select("part").distinct().collect()
            }
        pending = [p for p in all_parts if str(p) not in done]
        if not pending:
            return self.verdicts().where(
                (F.col("stage") == "probe") & (F.col("run_id") == run_id)
            )
        t0 = time.monotonic()
        scoped = clips.where(F.col(self.part_col).isin(pending))
        stats = probe_stats(scoped, by=(self.part_col,)).persist()
        try:
            self.io.replace_partitions(
                stats, "probe_health", self.part_col,
                [str(p) for p in pending],
            )
            by_part = {
                str(r[self.part_col]): (r["n_clips"], r["n_flagged"])
                for r in stats.collect()
            }
        finally:
            stats.unpersist()
        wall_ms = int((time.monotonic() - t0) * 1000)
        self._commit(
            run_id, "probe", [str(p) for p in pending],
            {p: int(by_part.get(p, (0, 0))[0]) for p in map(str, pending)},
            {p: int(by_part.get(p, (0, 0))[1] or 0) for p in map(str, pending)},
            wall_ms,
        )
        return self.verdicts().where(
            (F.col("stage") == "probe") & (F.col("run_id") == run_id)
        )

    def probe_health(self) -> DataFrame:
        from .operators.headerprobe import FINDING_KINDS

        cols = ", ".join(f"n_{k} bigint" for k in FINDING_KINDS)
        return self.io.read(
            "probe_health",
            f"{self.part_col} string, n_clips bigint, n_flagged bigint, "
            f"{cols}, flagged_rate double",
        )

    # stages derived FROM the manifest history itself — excluded from the
    # temporal-lineage inputs below so they never self-reference
    _META_STAGES = ("incidents", "screen")

    def run_incident_sessions(
        self,
        gap_s: int = 86400,
        resume: bool = True,
        run_id: str | None = None,
    ) -> DataFrame:
        """Cascade stage: sessionize each partition's violation history
        into incident episodes (stage='incidents', resume unit =
        partition; re-open with :meth:`invalidate` after new runs land,
        same model as the probe stage).

        The temporal operators get engine-level lineage here: gap-based
        sessionization (operators.sessions.session_stats — the
        event_sessions contract query's operator) over the manifest's
        per-(part, stage) run history. Consecutive violating runs closer
        than ``gap_s`` form ONE incident with a start, an end, and a
        run count — the unit an on-call rotation reasons about, instead
        of a flat run list. Output table ``incident_sessions``; manifest
        n_rows = violating history rows, n_violations = incidents.

        Scale: the manifest is sketch-sized (#parts × #stages × #runs),
        so the one sessionization shuffle is trivially bounded at any
        corpus size — this stage costs the same at 10^12 clips as at
        10^4.
        """
        from .operators.sessions import session_stats

        run_id = run_id or uuid.uuid4().hex[:12]
        hist = self.manifest().where(~F.col("stage").isin(*self._META_STAGES))
        ev = hist.where(F.col("n_violations") > 0)
        all_parts = [r[0] for r in ev.select("part").distinct().collect()]
        done: set[str] = set()
        if resume:
            done = {
                r["part"]
                for r in self.manifest().where(F.col("stage") == "incidents")
                .select("part").distinct().collect()
            }
        pending = [p for p in all_parts if str(p) not in done]
        if not pending:
            return self.verdicts().where(
                (F.col("stage") == "incidents") & (F.col("run_id") == run_id)
            )
        t0 = time.monotonic()
        scoped = ev.where(F.col("part").isin(pending))
        key = F.concat_ws("\x1f", "part", "stage")
        sess = session_stats(
            scoped.withColumn("__k", key), "__k", "completed_at",
            gap_s=gap_s, tiebreak_col="run_id",
        ).select(
            F.split("user", "\x1f").getItem(0).alias("part"),
            F.split("user", "\x1f").getItem(1).alias("v_stage"),
            F.col("session_idx").cast("bigint").alias("incident_idx"),
            F.col("n_events").cast("bigint").alias("n_runs"),
            "t_start", "t_end",
            F.col("dur_s").cast("bigint").alias("dur_s"),
        ).persist()
        try:
            self.io.replace_partitions(
                sess, "incident_sessions", "part", [str(p) for p in pending]
            )
            agg = {
                r["part"]: (r["n_runs"], r["n_inc"])
                for r in sess.groupBy("part").agg(
                    F.sum("n_runs").alias("n_runs"),
                    F.count(F.lit(1)).alias("n_inc"),
                ).collect()
            }
        finally:
            sess.unpersist()
        wall_ms = int((time.monotonic() - t0) * 1000)
        self._commit(
            run_id, "incidents", [str(p) for p in pending],
            {p: int(agg.get(p, (0, 0))[0] or 0) for p in map(str, pending)},
            {p: int(agg.get(p, (0, 0))[1] or 0) for p in map(str, pending)},
            wall_ms,
        )
        return self.verdicts().where(
            (F.col("stage") == "incidents") & (F.col("run_id") == run_id)
        )

    def incident_sessions(self) -> DataFrame:
        return self.io.read(
            "incident_sessions",
            "part string, v_stage string, incident_idx bigint, "
            "n_runs bigint, t_start timestamp, t_end timestamp, dur_s bigint",
        )

    def run_screen_attribution(
        self,
        screen_stage: str = "certificate",
        target_stages: tuple[str, ...] = ("audio",),
        resume: bool = True,
        run_id: str | None = None,
    ) -> DataFrame:
        """Cascade stage: as-of attribution of each expensive-tier run
        to the screen that vouched for it (stage='screen', resume unit =
        partition, re-open via :meth:`invalidate`).

        The backward as-of join (operators.temporal.asof_join — the
        asof_attribution contract query's operator) attaches to every
        ``target_stages`` manifest row the most recent ``screen_stage``
        row for the same partition at or before it: "which certificate
        screened this decode pass, and how stale was it?". A target run
        with NO prior screen is the lineage gap the stage flags
        (manifest n_violations = unscreened runs; n_rows = target
        runs). Output table ``screen_attribution``.

        Scale: manifest-sized input, one as-of exchange on part — cost
        independent of corpus size.
        """
        from .operators.temporal import asof_join

        run_id = run_id or uuid.uuid4().hex[:12]
        hist = self.manifest()
        target = hist.where(F.col("stage").isin(*target_stages))
        # one screen per (part, ts): two screen commits stamped the same
        # instant would otherwise make the as-of carry nondeterministic
        # (max run_id wins — deterministic on both engines)
        screens = (
            hist.where(F.col("stage") == screen_stage)
            .groupBy("part", "completed_at")
            .agg(F.max("run_id").alias("run_id"))
            .select("part", "completed_at", "run_id")
        )
        all_parts = [r[0] for r in target.select("part").distinct().collect()]
        done: set[str] = set()
        if resume:
            done = {
                r["part"]
                for r in self.manifest().where(F.col("stage") == "screen")
                .select("part").distinct().collect()
            }
        pending = [p for p in all_parts if str(p) not in done]
        if not pending:
            return self.verdicts().where(
                (F.col("stage") == "screen") & (F.col("run_id") == run_id)
            )
        t0 = time.monotonic()
        scoped = target.where(F.col("part").isin(pending)).select(
            "part", "stage", "run_id", "completed_at", "n_violations"
        )
        # no tiebreak: commit timestamps are per-(stage, run) and the
        # asof tiebreak casts to long (run_id is a hex string)
        att = asof_join(
            scoped, screens, ["part"], "completed_at", "completed_at",
            ["run_id", "completed_at"], prefix="screen_",
        ).select(
            "part", F.col("stage").alias("t_stage"), "run_id",
            "completed_at", "n_violations",
            "screen_run_id", "screen_completed_at",
            (
                F.unix_timestamp("completed_at")
                - F.unix_timestamp("screen_completed_at")
            ).cast("bigint").alias("screen_lag_s"),
        ).persist()
        try:
            self.io.replace_partitions(
                att, "screen_attribution", "part", [str(p) for p in pending]
            )
            agg = {
                r["part"]: (r["n"], r["n_unscreened"])
                for r in att.groupBy("part").agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(
                        F.col("screen_run_id").isNull().cast("bigint")
                    ).alias("n_unscreened"),
                ).collect()
            }
        finally:
            att.unpersist()
        wall_ms = int((time.monotonic() - t0) * 1000)
        self._commit(
            run_id, "screen", [str(p) for p in pending],
            {p: int(agg.get(p, (0, 0))[0] or 0) for p in map(str, pending)},
            {p: int(agg.get(p, (0, 0))[1] or 0) for p in map(str, pending)},
            wall_ms,
        )
        return self.verdicts().where(
            (F.col("stage") == "screen") & (F.col("run_id") == run_id)
        )

    def screen_attribution(self) -> DataFrame:
        return self.io.read(
            "screen_attribution",
            "part string, t_stage string, run_id string, "
            "completed_at timestamp, n_violations bigint, "
            "screen_run_id string, screen_completed_at timestamp, "
            "screen_lag_s bigint",
        )

    def invalidate(self, parts, stages: tuple[str, ...] = ("audio",)) -> int:
        """Drop manifest completion rows for (part, stage) pairs so the
        next :meth:`run` re-executes exactly those units; returns rows
        removed. Violations need no cleanup — each stage write is a
        per-(stage, part) replace, so the re-run rewrites them
        idempotently.

        Completes the certificate loop: ``run_certificate`` bounds each
        partition's decode-violation rate from a sample;
        ``uncertified_parts`` names the partitions whose bound failed;
        ``invalidate(bad, stages=("audio",))`` re-opens just their
        audio-stage units; the next ``run`` decodes only those — the
        cheap-screen → full-rescan escalation a 10^12-clip corpus needs
        (the reference re-runs whole profilers per dataset,
        profilers/worker.js:121-144; per-unit re-open is the Spark-side
        refinement).
        """
        parts = [str(p) for p in parts]
        if not parts or not stages:
            return 0

        def q(s: str) -> str:
            return "'" + str(s).replace("\\", "\\\\").replace("'", "''") + "'"

        cond = "part IN ({}) AND stage IN ({})".format(
            ", ".join(q(p) for p in parts), ", ".join(q(s) for s in stages)
        )
        return self.io.delete_matching("manifest", cond, MANIFEST_SCHEMA)

    def uncertified_parts(self) -> list[str]:
        """Partitions whose latest certificate did NOT certify — the
        routing list the certificate stage exists to produce: feed
        these to the full audio stage (run() re-scopes itself via the
        manifest) and skip the rest this release. Reads the
        certificates table only (sketch-sized)."""
        cert = self.io.read(
            "certificates",
            f"{self.part_col} string, n_sampled bigint, n_viol bigint, "
            "rate_hat double, rate_ub double, certified boolean",
        )
        if cert.isEmpty():
            return []
        return [
            r[self.part_col]
            for r in cert.where(~F.col("certified"))
            .select(self.part_col).distinct().collect()
        ]

    def run_admission(
        self,
        clips: DataFrame,
        batch: DataFrame,
        batch_id: str,
        max_hamming: int = 3,
        corpus_fps: DataFrame | None = None,
        resume: bool = True,
        run_id: str | None = None,
    ) -> DataFrame:
        """Cascade stage: incremental admission of a delivery batch.

        ``operators.audio_fp.incremental_clip_admission`` as an engine
        stage: each batch clip's disposition lands in the ``admissions``
        table partitioned by the delivery (part=batch_id) — re-running a
        batch replaces exactly its rows, and with ``resume`` a batch id
        already in the manifest is skipped (stage='admission',
        part=batch_id, n_violations = batch clips NOT accepted).

        Unlike the corpus-keyed global stages, the resume unit here is
        the DELIVERY: a new batch id always runs, the same batch id
        never re-runs. The corpus fingerprint index defaults to the
        shared decode pass over ``clips`` (decode_facts with_fp, no SNR
        render); pass ``corpus_fps`` to reuse a maintained index — on a
        production corpus the index is written at ingest and only the
        batch is decoded per delivery.
        """
        from .operators.audio_fp import incremental_clip_admission

        run_id = run_id or uuid.uuid4().hex[:12]
        if resume and not self.manifest().where(
            (F.col("stage") == "admission") & (F.col("part") == batch_id)
        ).isEmpty():
            return self.verdicts().where(
                (F.col("stage") == "admission") & (F.col("run_id") == run_id)
            )
        t0 = time.monotonic()
        if corpus_fps is None:
            # prefer the maintained fp_index when it covers every current
            # corpus partition (freshness is partition-granular — the
            # engine's resume unit everywhere); otherwise decode inline
            idx_parts = {
                r[0]
                for r in self.manifest().where(F.col("stage") == "fp_index")
                .select("part").distinct().collect()
            }
            cur_parts = {
                str(r[0])
                for r in clips.select(self.part_col).distinct().collect()
            }
            if cur_parts and cur_parts <= idx_parts:
                corpus_fps = self.fp_index().select("clip_id", "fp")
            else:
                corpus_fps = decode_facts(
                    clips, with_snr=False, with_fp=True
                ).select("clip_id", "fp")
        raw = incremental_clip_admission(
            clips, batch, max_hamming=max_hamming, corpus_fps=corpus_fps
        )
        adm = raw.withColumn("part", F.lit(batch_id))
        try:
            self.io.replace_partitions(adm, "admissions", "part", [batch_id])
            agg = raw.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    (F.col("disposition") != "accept").cast("bigint")
                ).alias("v"),
            ).collect()[0]
        finally:
            raw.unpersist()
        wall_ms = int((time.monotonic() - t0) * 1000)
        self._commit(
            run_id, "admission", [batch_id],
            {batch_id: int(agg["n"])}, {batch_id: int(agg["v"] or 0)}, wall_ms,
        )
        return self.verdicts().where(
            (F.col("stage") == "admission") & (F.col("run_id") == run_id)
        )

    def _run_global_stage(
        self,
        clips: DataFrame,
        stage: str,
        table: str,
        compute,
        resume: bool,
        run_id: str | None,
    ) -> DataFrame:
        """Shared scaffolding for GLOBAL (cross-partition) cascade stages:
        resume from the manifest, recompute the whole table when any
        partition is pending (dup groups span partitions), commit
        per-partition lineage. ``compute() -> (table_df, implicated_df,
        cleanup)`` where table_df carries part='*', implicated_df has one
        row per implicated clip with its partition column, and cleanup
        releases any persisted intermediates after the write + count."""
        run_id = run_id or uuid.uuid4().hex[:12]
        all_parts = [r[0] for r in clips.select(self.part_col).distinct().collect()]
        done: set[str] = set()
        if resume:
            done = {
                r["part"]
                for r in self.manifest().where(F.col("stage") == stage)
                .select("part").distinct().collect()
            }
        pending = [p for p in all_parts if str(p) not in done]
        if not pending:
            return self.verdicts().where(
                (F.col("stage") == stage) & (F.col("run_id") == run_id)
            )
        t0 = time.monotonic()
        groups, implicated, cleanup = compute()
        try:
            self.io.replace_partitions(groups, table, "part", ["*"])
            viol = {
                str(r[0]): r["c"]
                for r in implicated.groupBy(self.part_col)
                .agg(F.count(F.lit(1)).alias("c")).collect()
            }
        finally:
            cleanup()
        rows = self._rows_by_part(pending)
        wall_ms = int((time.monotonic() - t0) * 1000)
        self._commit(
            run_id, stage, [str(p) for p in pending],
            rows, {str(p): viol.get(str(p), 0) for p in pending}, wall_ms,
        )
        return self.verdicts().where(
            (F.col("stage") == stage) & (F.col("run_id") == run_id)
        )

    # --- cascade stage: schema discovery (keys + INDs) ----------------------
    def run_discovery(
        self,
        clips: DataFrame,
        refs: DataFrame | None = None,
        key_cols: list[str] | None = None,
        max_arity: int = 1,
        id_col: str = "clip_id",
        od_pairs: list[tuple[str, str]] | None = None,
        cfd_rules: list[tuple[str | list[str], str]] | None = None,
        cfd_min_support: int = 2,
        resume: bool = True,
        run_id: str | None = None,
    ) -> DataFrame:
        """Cascade stage: mine the schema facts the declared rules assert
        — candidate keys (ucc.mine_keys over ``key_cols``, lattice up to
        ``max_arity``) and the clip↔transcript inclusion dependencies in
        BOTH directions (ind.mine_inds) — so undeclared keys and broken
        declared ones surface from the data, the discovery counterpart of
        the uniqueness + referential validators (reference declares these
        per-dataset, api/models/Rule.js semantics; here they're mined).

        GLOBAL semantics like the dedup stages: keys and containment are
        whole-table properties, so any pending partition recomputes the
        table (stage='discovery', output ``discovery_results``). Rows are
        normalized across kinds: (kind, lhs, rhs, n, n_bad, metric,
        holds) — for kind='ucc', n=rows, n_bad=dup+null rows blocking key
        status, metric=dup-free fraction; for kind='ind', n=LHS distinct
        values, n_bad=uncontained ones, metric=containment. Optional
        ``od_pairs`` adds kind='od' rows (od.check_order_dependencies:
        n=ordering groups, n_bad=overlapping adjacent intervals,
        metric=clean boundary fraction) and ``cfd_rules`` — a list of
        (lhs, rhs) specs — adds kind='cfd' tableau rows
        (fd.mine_constant_cfds: lhs='col=value', n=support,
        n_bad=non-consensus rows, metric=confidence). Candidates
        the HLL bound refutes cheaply carry no row (they were never
        plausibly keys); manifest lineage counts clips whose ``id_col``
        value is duplicated — the declared-key violation discovery found.
        """
        from . import fd as fdm
        from . import ucc as uccm
        from .ind import IndCandidate, mine_inds

        def compute():
            cols = key_cols
            if cols is None:
                cols = [
                    f.name for f in clips.schema.fields
                    if f.name != self.part_col
                    and "Binary" not in str(f.dataType)
                ]
            mined = uccm.mine_keys(clips, cols, name="clips", max_arity=max_arity)
            uccs = mined.select(
                F.lit("ucc").alias("kind"),
                F.col("cols").alias("lhs"),
                F.lit(None).cast("string").alias("rhs"),
                F.col("n_rows").alias("n"),
                (F.col("dup_rows") + F.col("n_nulls")).alias("n_bad"),
                F.when(F.col("n_rows") == 0, F.lit(1.0))
                .otherwise(F.col("n_groups") / F.col("n_rows"))
                .alias("metric"),
                F.col("is_key").alias("holds"),
            )
            out = uccs
            if refs is not None:
                inds = mine_inds(
                    [
                        IndCandidate("refs", refs, id_col, "clips", clips, id_col),
                        IndCandidate("clips", clips, id_col, "refs", refs, id_col),
                    ]
                ).select(
                    F.lit("ind").alias("kind"),
                    "lhs",
                    "rhs",
                    F.col("n_lhs").alias("n"),
                    (F.col("n_lhs") - F.col("n_contained")).alias("n_bad"),
                    F.col("containment").alias("metric"),
                    "holds",
                )
                out = out.unionByName(inds)
            if od_pairs:
                from .od import check_order_dependencies

                ods = check_order_dependencies(clips, od_pairs).select(
                    F.lit("od").alias("kind"),
                    F.col("on_col").alias("lhs"),
                    F.col("ordered_col").alias("rhs"),
                    F.col("n_groups").alias("n"),
                    F.col("violating_pairs").alias("n_bad"),
                    # clean fraction of the adjacent-group boundary checks
                    (
                        F.lit(1.0)
                        - F.col("violating_pairs")
                        / F.greatest(F.col("n_groups") - 1, F.lit(1))
                    ).alias("metric"),
                    "holds",
                )
                out = out.unionByName(ods)
            for lhs, rhs in cfd_rules or []:
                cfds = fdm.mine_constant_cfds(
                    clips, lhs, rhs, min_support=cfd_min_support
                ).select(
                    F.lit("cfd").alias("kind"),
                    F.concat_ws("=", "lhs", "lhs_value").alias("lhs"),
                    "rhs",
                    F.col("support").alias("n"),
                    F.col("n_violations").alias("n_bad"),
                    F.col("confidence").alias("metric"),
                    "holds",
                )
                out = out.unionByName(cfds)
            groups = out.withColumn("part", F.lit("*"))
            # lineage: clips carrying a duplicated declared-key value —
            # the dup-id set is tiny, broadcast it, never shuffle clips
            dup_ids = (
                clips.groupBy(id_col)
                .agg(F.count(F.lit(1)).alias("__c"))
                .where(F.col("__c") > 1)
                .select(id_col)
            )
            implicated = clips.select(id_col, self.part_col).join(
                F.broadcast(dup_ids), id_col
            ).select(self.part_col)
            return groups, implicated, (lambda: None)

        return self._run_global_stage(
            clips, "discovery", "discovery_results", compute, resume, run_id
        )

    def discovery_results(self) -> DataFrame:
        return self.io.read(
            "discovery_results",
            "kind string, lhs string, rhs string, n bigint, n_bad bigint, "
            "metric double, holds boolean, part string",
        )

    # --- cascade stage: expectation suites ----------------------------------
    def run_expectations(
        self,
        clips: DataFrame,
        checks=None,
        resume: bool = True,
        run_id: str | None = None,
    ) -> DataFrame:
        """Per-partition declarative expectation suite
        (expectations.verify): the whole suite costs ONE aggregate scan
        of the pending partitions, grouped by the partition column, and
        writes one verdict row per (partition, check) to
        ``expectation_results`` with per-partition replace + manifest
        resume (stage='expectations'). Manifest ``n_violations`` counts
        FAILED CHECKS per partition — dataset-contract breaches, the
        coarse sibling of the per-row violation rows the rule stages
        emit. ``checks`` defaults to presets.default_clip_expectations()
        for the input_hint clips schema.
        """
        from . import expectations as ex

        if checks is None:
            from .presets import default_clip_expectations

            checks = default_clip_expectations()
        run_id = run_id or uuid.uuid4().hex[:12]
        all_parts = [r[0] for r in clips.select(self.part_col).distinct().collect()]
        done: set[str] = set()
        if resume:
            done = {
                r["part"]
                for r in self.manifest().where(F.col("stage") == "expectations")
                .select("part").distinct().collect()
            }
        pending = [p for p in all_parts if str(p) not in done]
        if not pending:
            return self.verdicts().where(
                (F.col("stage") == "expectations") & (F.col("run_id") == run_id)
            )
        t0 = time.monotonic()
        scoped = clips.where(F.col(self.part_col).isin(pending))
        out = ex.verify(scoped, checks, by=[self.part_col]).select(
            F.col(self.part_col).cast("string").alias("part"),
            "check", "column", "value", "lo", "hi", "passed",
        )
        self.io.replace_partitions(
            out, "expectation_results", "part", [str(p) for p in pending]
        )
        # failed-check counts from the (tiny, #parts x #checks) result
        # table — never a second scan of clips
        res = self.expectation_results().where(
            F.col("part").isin([str(p) for p in pending])
        )
        viol = {
            r["part"]: int(r["c"])
            for r in res.where(~F.col("passed"))
            .groupBy("part").agg(F.count(F.lit(1)).alias("c")).collect()
        }
        rows = self._rows_by_part(pending)
        wall_ms = int((time.monotonic() - t0) * 1000)
        self._commit(
            run_id, "expectations", [str(p) for p in pending],
            rows, {str(p): viol.get(str(p), 0) for p in pending}, wall_ms,
        )
        return self.verdicts().where(
            (F.col("stage") == "expectations") & (F.col("run_id") == run_id)
        )

    def run_suite_regression(
        self,
        baseline_profile: DataFrame,
        baseline_id: str,
        null_tolerance: float = 0.05,
        low_card_max: int = 20,
        resume: bool = True,
        run_id: str | None = None,
    ) -> DataFrame:
        """Data-CI stage: the expectation suite the BASELINE release's
        profile satisfies (expectations.suggest_checks), re-evaluated
        against THIS run's materialized ``profile_summary`` — each
        newly-failing check lands in ``suite_regression_results``
        (part=baseline_id). Requires the profile stage to have run
        first (raises otherwise rather than reporting every baseline
        column as dropped).

        Like run_admission, the resume unit is LOGICAL — the baseline
        identity: the same baseline_id never re-runs, a new baseline
        always does. Everything here is sketch-sized (two profile
        tables joined on #cols x #checks rows); the corpus scans
        happened in the two releases' profile stages — which is the
        whole point of doing data-CI on profiles at 10^12 rows.
        Manifest n_violations = number of regressed checks.
        """
        from . import expectations as ex

        run_id = run_id or uuid.uuid4().hex[:12]
        if resume and not self.manifest().where(
            (F.col("stage") == "suite_regression")
            & (F.col("part") == baseline_id)
        ).isEmpty():
            return self.verdicts().where(
                (F.col("stage") == "suite_regression")
                & (F.col("run_id") == run_id)
            )
        current = self.profile_summary()
        if current.isEmpty():
            raise ValueError(
                "run_suite_regression needs a materialized profile_summary — "
                "run the profile stage first"
            )
        t0 = time.monotonic()
        out = ex.suite_regressions(
            baseline_profile, current,
            null_tolerance=null_tolerance, low_card_max=low_card_max,
        ).select(
            F.lit(baseline_id).alias("part"),
            "key", "check", "lo", "hi", "observed_lo", "observed_hi",
        )
        self.io.replace_partitions(
            out, "suite_regression_results", "part", [baseline_id]
        )
        # counts from the (tiny) result table, never a re-scan
        n = self.suite_regression_results().where(
            F.col("part") == baseline_id
        ).count()
        wall_ms = int((time.monotonic() - t0) * 1000)
        self._commit(
            run_id, "suite_regression", [baseline_id],
            {baseline_id: int(n)}, {baseline_id: int(n)}, wall_ms,
        )
        return self.verdicts().where(
            (F.col("stage") == "suite_regression") & (F.col("run_id") == run_id)
        )

    def clean_clips(
        self,
        clips: DataFrame,
        rules: list[str] | None = None,
        drop_failed_partitions: bool = False,
    ) -> DataFrame:
        """The validated corpus: ``clips`` minus every row some rule
        flagged — the artifact a downstream consumer actually asks the
        engine for. ``rules`` restricts which rules disqualify (default:
        all); ``drop_failed_partitions=True`` additionally removes WHOLE
        partitions whose latest verdict failed (the coarse gate for
        consumers that only trust fully-green partitions).

        Plan shape: LEFT ANTI join of clips against the DISTINCT
        flagged-id projection of the violations table. The violations
        side is aggregated to ids before the join (violations carry one
        row per (rule, clip), so the distinct bounds the join input by
        corpus size, not violation multiplicity); no hint — AQE
        broadcasts the id set when it fits. Partition pruning for the
        verdict gate happens driver-side on the (tiny) manifest, so the
        anti join is the only clips-sized work.
        """
        viol = self.violations()
        if rules is not None:
            viol = viol.where(F.col("rule").isin(rules))
        bad_ids = viol.select(F.col("clip_id").alias(self.key_col)).distinct()
        out = clips.join(bad_ids, self.key_col, "left_anti")
        if drop_failed_partitions:
            failed = {
                r["part"]
                for r in self.verdicts().where(~F.col("passed"))
                .select("part").distinct().collect()
            }
            if failed:
                out = out.where(
                    ~F.col(self.part_col).cast("string").isin(sorted(failed))
                )
        return out

    def violation_samples(self, k: int = 5) -> DataFrame:
        """Top-k example violation rows per (partition, rule) — the
        triage view a human opens first: every failing rule shows a few
        concrete offending clips instead of a bare count. Deterministic
        (ordered by clip_id inside each group) and cheap at any scale:
        a row_number window partitioned by (part, rule) over the
        violations table — one shuffle of violations only, never of
        clips. Ranked ``rank`` 1..k, reference result-pagination analog
        (TupleController.js keyset reads)."""
        from .operators.topk import topk_per_group

        return topk_per_group(
            self.violations(),
            ["part", "rule"],
            [F.col("clip_id").asc_nulls_last(), F.col("detail")],
            k,
        )

    def expectation_results(self) -> DataFrame:
        return self.io.read(
            "expectation_results",
            "part string, check string, column string, value double, "
            "lo double, hi double, passed boolean",
        )

    def suite_regression_results(self) -> DataFrame:
        return self.io.read(
            "suite_regression_results",
            "part string, key string, check string, lo double, hi double, "
            "observed_lo double, observed_hi double",
        )

    def content_dups(self) -> DataFrame:
        return self.io.read(
            "content_dups",
            "fp bigint, n_clips bigint, keeper_id string, "
            "clip_ids array<string>, part string",
        )

    def embedding_dups(self) -> DataFrame:
        return self.io.read(
            "embedding_dups",
            "id string, cluster_id string, cluster_size bigint, part string",
        )

    def embedding_drift(self) -> DataFrame:
        return self.io.read(
            "embedding_drift",
            "corpus_part string, n_vecs bigint, n_bad bigint, "
            "centroid_norm double, global_cos double, "
            "centroid_shift double, drifted boolean, part string",
        )

    def admissions(self) -> DataFrame:
        return self.io.read(
            "admissions",
            "id string, disposition string, match_id string, hamming int, "
            "part string",
        )

    def fp_index(self) -> DataFrame:
        return self.io.read(
            "fp_index",
            "clip_id string, fp bigint, decode_error string, part string",
        )

    def vad_stats(self) -> DataFrame:
        return self.io.read(
            "vad_stats",
            "clip_id string, speech_ratio double, n_speech_runs int, "
            "longest_silence_ms int, decode_error string, part string",
        )

    # --- stage bodies -----------------------------------------------------
    def _run_profile(self, scoped, cfg, pending, decoded=None):
        # idempotent per-partition replace (reference delete-before-write,
        # worker.js:97-100) via the table-IO backend
        fuse = (
            decoded is not None
            and "bytes" in scoped.columns
            and "bytes" not in cfg.skip_cols
        )
        if fuse:
            # binary stats are all length-derived — take them from the
            # shared decode pass instead of re-scanning the binary column
            from dataclasses import replace as _replace

            cfg_narrow = _replace(cfg, skip_cols=tuple(cfg.skip_cols) + ("bytes",))
            summary = prof.profile_summary(scoped, cfg_narrow).unionByName(
                self._bytes_summary_from_decoded(decoded, cfg)
            )
        else:
            summary = prof.profile_summary(scoped, cfg)
        self.io.replace_partitions(summary, "profile_summary", "part", pending)
        if cfg.value_hist_cols or cfg.bucket_hist_cols:
            hist = prof.profile_histograms(scoped, cfg)
            self.io.replace_partitions(hist, "profile_hist", "part", pending)
        n_rows = self._rows_by_part(pending)
        return n_rows, {p: 0 for p in pending}

    @staticmethod
    def _bytes_summary_from_decoded(decoded: DataFrame, cfg) -> DataFrame:
        """The `bytes` column's profile row, computed from the decode
        pass's n_bytes (int, same type as F.length(binary) so the HLL
        sketch matches the direct-scan path bit-for-bit)."""
        nb = F.col("n_bytes")
        ndv = (F.count_distinct(nb) if cfg.exact_ndv
               else F.approx_count_distinct(nb))
        return decoded.groupBy("part").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(nb.isNull().cast("long")).alias("n_nulls"),
            ndv.alias("ndv"),
            F.min(nb).cast("string").alias("min"),
            F.max(nb).cast("string").alias("max"),
            F.avg(nb.cast("double")).alias("mean"),
            F.stddev_pop(nb.cast("double")).alias("stddev"),
            F.avg(nb.cast("double")).alias("avg_len"),
        ).select(
            "part", F.lit("bytes").alias("key"), "n_rows", "n_nulls", "ndv",
            "min", "max", "mean", "stddev", "avg_len",
        )

    def _run_rule_stage(self, stage, rules, ctx, pending):
        # Fold all predicate-style rules (pure row filters) into ONE
        # shared scan: array<struct(rule, bad, detail)> -> filter -> explode.
        # Join/agg rules keep their own branch; everything unions into a
        # single write job.
        folded: list[F.Column] = []
        branches: list[DataFrame] = []
        # rules with staged helper columns (Rule.prepare) chain their
        # staging over the shared scan; the predicates then reference
        # MATERIALIZED columns, keeping each projection's generated code
        # small (the flat header-probe tree busts Janino's 64 KB limit)
        scan = ctx.clips
        for rule in rules:
            pd_ = rule.predicate(ctx)
            if pd_ is not None:
                scan = rule.prepare(scan, ctx)
                # prepare() chains over the SHARED scan — a helper
                # column colliding with an input column or another
                # rule's staging makes every downstream reference
                # ambiguous; fail loudly with attribution instead of
                # letting the whole stage die on AMBIGUOUS_REFERENCE
                from collections import Counter

                dups = [c for c, n in Counter(scan.columns).items() if n > 1]
                if dups:
                    raise ValueError(
                        f"rule {rule.name!r}: prepare() staged duplicate "
                        f"column(s) {dups} onto the shared {stage} scan; "
                        "namespace helper columns per rule instance "
                        "(__<rule.name>_ prefix convention, rules/base.py)"
                    )
                pred, detail = pd_
                folded.append(F.struct(
                    F.lit(rule.name).alias("rule"),
                    pred.alias("bad"),
                    detail.cast("string").alias("detail"),
                ))
            else:
                branches.append(rule.violations(ctx))
        if folded:
            hits = scan.select(
                F.col(ctx.part_col).cast("string").alias("part"),
                F.col(ctx.key_col).cast("string").alias("clip_id"),
                F.filter(F.array(*folded), lambda s: s["bad"]).alias("vs"),
            ).where(F.size("vs") > 0)
            branches.append(
                hits.select(
                    "part",
                    F.explode("vs").alias("v"),
                    "clip_id",
                ).select("part", F.col("v.rule").alias("rule"), "clip_id",
                         F.col("v.detail").alias("detail"))
            )
        out = branches[0]
        for b in branches[1:]:
            out = out.unionByName(b)

        # Per-part violation counts ride along on the write job via the
        # Observation API (conditional sums) — no second job. Falls back
        # to a read-back aggregation when the pending set is large (the
        # observe expression list is O(#parts)).
        to_write = out.select("part", "rule", "clip_id", "detail")
        obs = None
        if len(pending) <= 64:
            from pyspark.sql import Observation

            obs = Observation(f"viol_{stage}")
            to_write = to_write.observe(
                obs,
                *[
                    F.coalesce(
                        F.sum(F.when(F.col("part") == str(p), 1).otherwise(0)), F.lit(0)
                    ).alias(f"n_{i}")
                    for i, p in enumerate(pending)
                ],
            )
        # stage pinned as a fixed partition level: the parquet backend
        # gives each stage its own directory root (concurrent stage
        # writers never share a _temporary staging dir); Iceberg commits
        # the same shape transactionally
        self.io.replace_partitions(
            to_write, "violations", "part", pending, fixed={"stage": stage}
        )
        if obs is not None:
            got = obs.get
            return {p: int(got[f"n_{i}"]) for i, p in enumerate(pending)}
        written = self.violations().where(
            (F.col("stage") == stage)
            & F.col("part").isin([str(p) for p in pending])
        )
        counts = {r["part"]: r["n"] for r in
                  written.groupBy("part").agg(F.count(F.lit(1)).alias("n")).collect()}
        return {p: int(counts.get(str(p), 0)) for p in pending}

    def _rows_by_part(self, pending):
        summary = self.profile_summary().where(
            F.col("part").isin([str(p) for p in pending])
        )
        rows = summary.groupBy("part").agg(F.max("n_rows").alias("n")).collect()
        return {r["part"]: int(r["n"]) for r in rows}

    # --- commit ------------------------------------------------------------
    def _commit(self, run_id, stage, pending, n_rows_by_part, n_viol_by_part, wall_ms):
        # Build the manifest rows as a pure-JVM VALUES relation: a
        # createDataFrame(local_rows) plan is a 32-slice parallelized
        # Python RDD whose write pays a Python-worker round trip per
        # slice (~4s per commit measured at local[32]); VALUES is free.
        def q(s: str) -> str:
            # Spark's parser treats backslash as an escape inside string
            # literals (escapedStringLiterals default) — escape it FIRST,
            # then quotes; the engine is generic over partition values.
            return "'" + str(s).replace("\\", "\\\\").replace("'", "''") + "'"

        vals = ", ".join(
            "({}, {}, {}, {}, {}, {})".format(
                q(run_id), q(p), q(stage),
                int(n_rows_by_part.get(str(p), n_rows_by_part.get(p, 0))),
                int(n_viol_by_part.get(str(p), n_viol_by_part.get(p, 0))),
                wall_ms,
            )
            for p in pending
        )
        mdf = self.spark.sql(
            f"SELECT col1 AS run_id, col2 AS part, col3 AS stage, "
            f"current_timestamp() AS completed_at, "
            f"CAST(col4 AS BIGINT) AS n_rows, CAST(col5 AS BIGINT) AS n_violations, "
            f"CAST(col6 AS BIGINT) AS wall_ms FROM VALUES {vals}"
        )
        # one small file per (stage, run); compaction bounds the listing
        # (verdicts()/resume re-read the whole manifest — O(#runs) files
        # without it)
        self.io.append(mdf, "manifest", coalesce=1)
        self.io.compact("manifest", self.manifest_compact_files, MANIFEST_SCHEMA)
