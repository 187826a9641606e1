"""Corpus curation pipeline: the composed filter→dedup path a training
-data pipeline runs over a raw document crawl.

This stitches the engine's document-level primitives (functions.text
quality / language heuristics, the exact-dedup keeper rule of
operators.dedup.exact_dup_groups) into ONE auditable operator:

    annotate (quality, lang, fingerprint)      pure Catalyst expressions
      -> gate on language + quality            pushed-down filters
      -> exact dedup on the order-insensitive  one shuffle, on the md5
         token fingerprint (keeper = min id)   fingerprint only

Filter-before-dedup is deliberate: at 100 TB the gates drop the bulk of
the corpus with zero shuffle (expression-only, evaluated in the scan
stage), so the single fingerprint groupBy shuffles only survivors.
`curation_disposition` returns the per-document audit trail (why each
doc was kept or dropped) — the lineage a curation run must emit; tested
row-for-row against a DuckDB oracle (`curation_disposition` contract
query). Near-dup pruning (MinHash) composes downstream over the `kept`
set via operators.dedup.minhash_lsh_pairs.

Beyond-reference operator (task mandate); reference analogs are the
per-column profiling gates (/root/reference/profilers/messystreams.js)
— this is the document-level, corpus-scale equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as tx


def curate_annotate(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """df + (quality, lang, fp) annotation columns (expression-only).

    The three names are RESERVED: same-named input columns (e.g. a
    crawl-declared `lang`) are replaced by the computed values — the
    pipeline gates on what the text says, not what the source claimed.
    """
    return df.drop("quality", "lang", "fp").select(
        "*",
        tx.quality_score(text_col).alias("quality"),
        tx.lang_id(text_col).alias("lang"),
        tx.fingerprint(text_col).alias("fp"),
    )


def _with_keepers(
    df: DataFrame, id_col: str, text_col: str,
    min_quality: float, langs: tuple[str, ...],
) -> tuple[DataFrame, DataFrame]:
    ann = curate_annotate(df, id_col, text_col)
    passed = ann.where(
        F.col("lang").isin(list(langs)) & (F.col("quality") >= min_quality)
    )
    # keeper = min id per fingerprint AMONG GATE SURVIVORS: a duplicate
    # of a quality-rejected doc is not a duplicate of anything kept
    keepers = passed.groupBy("fp").agg(F.min(id_col).alias("keeper_id"))
    return ann, keepers


def curate(
    df: DataFrame, id_col: str, text_col: str,
    min_quality: float = 0.5, langs: tuple[str, ...] = ("en",),
) -> DataFrame:
    """Surviving documents (original columns + annotations)."""
    ann, keepers = _with_keepers(df, id_col, text_col, min_quality, langs)
    passed = ann.where(
        F.col("lang").isin(list(langs)) & (F.col("quality") >= min_quality)
    )
    # the fp join reuses the groupBy's hash partitioning (no extra
    # shuffle of the keeper side); equality on id picks the survivor
    return (
        passed.join(keepers, "fp")
        .where(F.col(id_col) == F.col("keeper_id"))
        .drop("keeper_id")
    )


def curation_disposition(
    df: DataFrame, id_col: str, text_col: str,
    min_quality: float = 0.5, langs: tuple[str, ...] = ("en",),
) -> DataFrame:
    """Per-document audit: (id, quality, lang, disposition, keeper_id).

    disposition ∈ {kept, lang, quality, duplicate}; keeper_id is the
    surviving duplicate for dropped duplicates (NULL otherwise).
    """
    ann, keepers = _with_keepers(df, id_col, text_col, min_quality, langs)
    gated = ~F.col("lang").isin(list(langs))
    lowq = F.col("quality") < min_quality
    dup = F.col("keeper_id").isNotNull() & (F.col(id_col) != F.col("keeper_id"))
    return (
        ann.join(keepers, "fp", "left")
        .select(
            id_col,
            "quality",
            "lang",
            F.when(gated, "lang")
            .when(lowq, "quality")
            .when(dup, "duplicate")
            .otherwise("kept")
            .alias("disposition"),
            F.when(~gated & ~lowq & dup, F.col("keeper_id")).alias("dup_of"),
        )
    )


def corpus_card(
    df: DataFrame, id_col: str, text_col: str, lang_col: str
) -> DataFrame:
    """One-row dataset "data card": the corpus-level summary a release
    audit or dataset README leads with.

    (n_docs, total_tokens, avg_quality, en_frac, n_dup_docs, avg_chars)
    — document count, whitespace-token total, mean heuristic quality,
    share of documents declared English (NULL lang counts as
    non-English), exact-content duplicate count (docs minus distinct
    order-insensitive token-set fingerprints — the same md5 fingerprint
    exact dedup keys on), and mean character length.

    100-TB shape: ONE aggregation over the corpus; every statistic is
    an O(1)-state aggregate except the dup count's exact
    count(distinct fp), which is the same one-exchange exact-distinct
    the profiler's NDV option pays (HLL is the cheap alternative when
    ±2% is acceptable — profiler.approx variants). Nothing is
    collected; output is one row.
    """
    en = F.coalesce(
        (F.col(lang_col) == "en").cast("double"), F.lit(0.0)
    )
    return df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(tx.token_count(text_col).cast("bigint")).alias("total_tokens"),
        F.round(F.avg(tx.quality_score(text_col)), 6).alias("avg_quality"),
        F.round(F.avg(en), 6).alias("en_frac"),
        (F.count(F.lit(1)) - F.countDistinct(tx.fingerprint(text_col)))
        .cast("bigint")
        .alias("n_dup_docs"),
        F.round(F.avg(F.length(text_col)), 6).alias("avg_chars"),
    )


def mixing_plan(
    df: DataFrame,
    text_col: str,
    source_col: str,
    weights: "dict[str, float]",
    token_budget: int,
) -> DataFrame:
    """Pre-training data-mixing plan: per source, the measured token
    supply vs the tokens the target mix asks for, and the repeat factor
    (epochs) that closes the gap.

    ``weights`` maps source name -> target share of ``token_budget``
    (sources absent from the map get weight 0 — excluded from the mix);
    the Pile/Llama-style recipe where each source is up/down-sampled to
    hit a prescribed share. Output one row per source present in the
    corpus: (source, n_docs, n_tokens, weight, target_tokens, epochs) —
    ``epochs`` > 1 means the source repeats (oversampled), < 1 means a
    ``sample.hash_sample`` at that fraction implements the plan.

    One aggregation over the corpus (groupBy(source), map-side partial
    agg); the weights enter as a CASE literal so the plan is one scan
    at any scale. Doubles rounded to 6 dp; a zero-token source reports
    0.0 epochs.
    """
    w = F.lit(0.0)
    for name, frac in sorted(weights.items()):
        w = F.when(F.col(source_col) == name, F.lit(float(frac))).otherwise(w)
    return (
        df.groupBy(F.col(source_col).alias("source"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(tx.token_count(text_col)).alias("n_tokens"),
        )
        .select(
            "source",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.round(w, 6).alias("weight"),
            F.round(w * F.lit(float(token_budget))).cast("bigint").alias(
                "target_tokens"
            ),
            F.round(
                F.when(
                    F.col("n_tokens") > 0,
                    w * F.lit(float(token_budget)) / F.col("n_tokens"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("epochs"),
        )
    )
