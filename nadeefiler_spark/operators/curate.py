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
