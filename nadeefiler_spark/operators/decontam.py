"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark corpus.

The training-data-pipeline step behind "we removed eval overlap": any
corpus document containing an n-gram that also appears in a benchmark
item is contamination (the GPT-3 appendix-C recipe — long-n-gram
collision; n=8..13 in practice, parameterized here). Distinct from
dedup (operators.dedup): the comparison is CROSS-corpus and asymmetric
— the corpus side is the 100-TB table, the benchmark side is tiny
(thousands of items), which fixes the physical plan:

    corpus  --explode distinct n-grams-->   (map-side only, in-scan)
    bench   --explode distinct n-grams-->   broadcast (MBs)
    hash join on the shingle, NO corpus shuffle
    groupBy (corpus_id, bench_id) over MATCHES ONLY (contamination is
    rare, so the one real shuffle moves ~nothing)

The benchmark side is broadcast by construction — this is not a
heuristic hint on a maybe-large table (cf. the round-2 advice on
ngram_jaccard's sizes table): a benchmark suite is small by definition,
and callers with a pathological "benchmark" can pass broadcast=False.

No reference analog (beyond-reference operator per the task mandate);
the shingle machinery is shared with operators.dedup via
functions.text.word_shingles.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as tx


def _shingle_rows(
    df: DataFrame, id_col: str, text_col: str, n: int, out_id: str
) -> DataFrame:
    """(out_id, shingle) — one row per DISTINCT n-gram per document.

    Expression-only (tokens → slice windows → array_distinct → explode),
    so shingling runs inside the scan stage's codegen; documents shorter
    than n tokens contribute nothing.
    """
    return df.select(
        F.col(id_col).alias(out_id),
        F.explode(F.array_distinct(tx.word_shingles(text_col, n))).alias("shingle"),
    )


def benchmark_contamination(
    corpus: DataFrame,
    bench: DataFrame,
    corpus_id: str = "doc_id",
    bench_id: str = "bench_id",
    corpus_text: str = "text",
    bench_text: str = "text",
    n: int = 8,
    min_common: int = 1,
    broadcast: bool = True,
) -> DataFrame:
    """Contaminated (corpus doc, benchmark item) pairs.

    Returns (corpus_id, bench_id, n_common, frac_bench):
    ``n_common`` distinct n-grams shared; ``frac_bench`` the fraction of
    the benchmark item's distinct n-grams found in the document (1.0 =
    the document contains the whole benchmark item), rounded to 6 dp.
    Pairs below ``min_common`` shared n-grams are dropped.
    """
    if corpus_id == bench_id:
        raise ValueError(
            f"corpus_id and bench_id must differ (both {corpus_id!r}); "
            "alias the benchmark id column first"
        )
    c_sh = _shingle_rows(corpus, corpus_id, corpus_text, n, corpus_id)
    b_sh = _shingle_rows(bench, bench_id, bench_text, n, bench_id)
    b_sizes = b_sh.groupBy(bench_id).agg(F.count(F.lit(1)).alias("n_bench_sh"))
    if broadcast:
        b_sh, b_sizes = F.broadcast(b_sh), F.broadcast(b_sizes)
    hits = (
        c_sh.join(b_sh, "shingle")
        .groupBy(corpus_id, bench_id)
        .agg(F.count(F.lit(1)).alias("n_common"))
        .where(F.col("n_common") >= min_common)
    )
    return hits.join(b_sizes, bench_id).select(
        corpus_id,
        bench_id,
        F.col("n_common").cast("bigint").alias("n_common"),
        F.round(F.col("n_common") / F.col("n_bench_sh"), 6).alias("frac_bench"),
    )


def decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    corpus_id: str = "doc_id",
    bench_id: str = "bench_id",
    corpus_text: str = "text",
    bench_text: str = "text",
    n: int = 8,
    min_common: int = 1,
    broadcast: bool = True,
) -> DataFrame:
    """The corpus with contaminated documents removed (left anti join on
    the flagged ids — one small shuffle of the flagged-id set; the
    corpus side streams through)."""
    flagged = benchmark_contamination(
        corpus, bench, corpus_id, bench_id, corpus_text, bench_text,
        n=n, min_common=min_common, broadcast=broadcast,
    ).select(corpus_id).distinct()
    return corpus.join(F.broadcast(flagged), corpus_id, "left_anti")


def split_leakage(
    df: DataFrame,
    id_col: str,
    text_col: str,
    fractions: Mapping[str, float],
    train_split: str = "train",
    salt: int = 17,
) -> DataFrame:
    """Eval-split hygiene: per split, how many documents share exact
    content with the training split.

    Splits (operators.sample.with_split) are disjoint by ID — but not
    by CONTENT: two copies of one document land in different splits,
    and the eval metric silently becomes a memorization probe. This
    audit fingerprints every document (order-insensitive token-set md5,
    the exact-dedup key), flags each fingerprint that occurs in
    ``train_split``, and counts per split the documents whose
    fingerprint is train-flagged. For the train split itself the count
    reports its internal duplicate documents (members of multi-doc
    train fingerprints) — the same number an exact-dedup pass would
    remove.

    100-TB shape: one scan computes (split, fp); the fingerprint-level
    flag is ONE groupBy(fp) aggregation and the per-split rollup joins
    the (small, |distinct fp|-bounded) flag table back — two exchanges
    keyed on fp, both with map-side partial aggregation; nothing
    collected. Output: (split, n_docs, n_leaked), NULL-split rows
    excluded.
    """
    from .sample import with_split

    base = with_split(df, id_col, fractions, salt).where(
        F.col("split").isNotNull()
    ).select("split", tx.fingerprint(text_col).alias("fp"))
    is_train = (F.col("split") == train_split).cast("int")
    flags = base.groupBy("fp").agg(
        F.sum(is_train).alias("n_train"),
    )
    leaked = F.when(
        F.col("split") == train_split, F.col("n_train") >= 2
    ).otherwise(F.col("n_train") >= 1)
    return (
        base.join(flags, "fp")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(leaked.cast("bigint")).alias("n_leaked"),
        )
    )
