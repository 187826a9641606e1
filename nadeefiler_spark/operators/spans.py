"""Exact-substring (span-level) duplicate detection.

Document-level dedup (shingle Jaccard / MinHash / SimHash) misses the
common web-corpus failure where two otherwise-distinct pages share a
long verbatim passage — quoted boilerplate, templated paragraphs,
licence blocks; line dedup (operators/linededup.py) catches only the
cases that happen to align on line boundaries. The published remedy is
exact-substring dedup over fixed-length token windows (the suffix-array
method of "Deduplicating Training Data Makes Language Models Better",
Lee et al. 2022, approximated here at its standard 50-token window
granularity but with a tunable default): any ``window``-token span
occurring in >= ``min_docs`` distinct documents is duplicated text.

Spark-first shape (the repetition_profile lesson applies — tokenize
ONCE via posexplode, never expand token arrays through higher-order
lambdas, which re-evaluate the tokenizer per element):

  explode tokens        (id, pos, tok) — rows = corpus token count
  Window(id, pos)       span = concat_ws of lead(tok, 1..w-1); all the
                        leads share one window spec, ONE WindowExec
                        pass, one exchange on id
  md5(span)             fixed 16-byte key regardless of window size, so
                        every later shuffle carries hashes, not text
  groupBy(hash)         distinct-doc count per span (exchange on hash)
  join back + groupBy   per-document duplicated-window coverage; the
                        token-count side reuses the id partitioning

No all-pairs stage anywhere: cost is linear in corpus token count with
hash-keyed exchanges — the 100-TB-safe version of what a suffix array
does on one machine. A true suffix array finds *maximal* shared
substrings; fixed windows trade that precision for distributability
(any shared run >= window tokens is still detected, reported as its
covering windows).

No reference analog (beyond-reference operator per the task mandate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens


def duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 24,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document duplicated-span coverage.

    Returns one row per document that has at least one full window:
      (id, n_windows, n_dup_windows, dup_frac)
    where a window is "dup" when its ``window``-token span (single-space
    joined, whitespace-tokenized) occurs in >= ``min_docs`` distinct
    documents. dup_frac is the fraction of the document's windows that
    are duplicated — the signal a curation pipeline thresholds on.
    """
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(tokens(text_col)).alias("pos", "tok"),
    )
    w = Window.partitionBy("id").orderBy("pos")
    leads = [F.lead("tok", k).over(w) for k in range(1, window)]
    spans = toks.select(
        "id",
        F.when(
            leads[-1].isNotNull(),
            F.md5(F.concat_ws(" ", F.col("tok"), *leads)),
        ).alias("h"),
    )
    # per-doc totals reuse the id-partitioned spans (no extra exchange)
    totals = spans.groupBy("id").agg(
        F.sum(F.col("h").isNotNull().cast("bigint")).alias("n_windows")
    )
    dup_hashes = (
        spans.where(F.col("h").isNotNull())
        .groupBy("h")
        .agg(F.count_distinct("id").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select("h")
    )
    per_doc = (
        spans.join(dup_hashes, "h")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_dup_windows"))
    )
    return (
        totals.where(F.col("n_windows") > 0)
        .join(per_doc, "id", "left")
        .select(
            "id",
            F.col("n_windows").cast("bigint").alias("n_windows"),
            F.coalesce("n_dup_windows", F.lit(0))
            .cast("bigint")
            .alias("n_dup_windows"),
            F.round(
                F.coalesce("n_dup_windows", F.lit(0)) / F.col("n_windows"), 6
            ).alias("dup_frac"),
        )
    )
