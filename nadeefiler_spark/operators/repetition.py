"""Within-document repetition profiling (Gopher-style quality signals).

Machine-generated and boilerplate-heavy text is dominated by REPEATED
content — the same word, phrase, or passage recurring far beyond what
natural prose produces. The Gopher / MassiveText curation rules
(Rae et al. 2021, "Scaling Language Models", table A1) screen for this
with character-mass fractions of repeated n-grams; this module computes
the same family of signals as one distributed pass:

- ``top_word_frac``   — max over words of (occurrences × word chars) /
  total token chars: the fraction of the document's token characters
  attributable to its single most character-heavy repeated word.
- ``top_2gram_frac``  — same, over word 2-grams (gram char mass counts
  token characters only, not the joining space).
- ``dup_3gram_frac``  — fraction of word-3-gram OCCURRENCES whose gram
  appears ≥ 2 times in the document.

All three are defined as pure max/sum statistics, so no tie-breaking
rule is needed (two grams tied for the top yield the same fraction) and
the DuckDB oracle can reproduce them exactly.

100-TB shape: one explode of tagged (n, gram) rows — 1-, 2- and 3-grams
concatenated into a single array BEFORE the explode, so the job pays
ONE exchange keyed by (id, n, gram) instead of three. Repeated grams
collapse map-side (partial aggregation) before the shuffle; the second
aggregation keys on the doc id. Nothing is collected; per-doc state is
bounded by document length. Documents with no tokens (or too few for a
gram size) get 0.0 via the left join back onto the id spine.

Reference analog: nadeefiler's per-column value histogram
(/root/reference/profilers/dboost/index.js histogram path) counts
repeated VALUES per column; this is the same repeated-mass idea pushed
inside each document, which the reference's per-row profilers cannot
see. Beyond-reference operator per the task mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as tx

__all__ = ["repetition_profile"]


def _tagged_grams(text: Column) -> Column:
    """array<struct<n:int, g:string>> of 1-, 2- and 3-grams."""

    def tag(n: int, arr: Column) -> Column:
        return F.transform(
            arr, lambda g: F.struct(F.lit(n).alias("n"), g.alias("g"))
        )

    return F.concat(
        tag(1, tx.tokens(text)),
        tag(2, tx.word_shingles(text, 2)),
        tag(3, tx.word_shingles(text, 3)),
    )


def repetition_profile(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, n_tokens, top_word_frac, top_2gram_frac, dup_3gram_frac)
    per document, fractions rounded to 6 places."""
    text = F.col(text_col)
    toks = tx.tokens(text)
    spine = df.select(
        F.col(id_col).alias("id"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.aggregate(
            toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
        ).alias("tok_chars"),
        _tagged_grams(text).alias("grams"),
    )
    counts = (
        spine.select("id", F.explode("grams").alias("gr"))
        .groupBy("id", "gr")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    n, g = F.col("gr.n"), F.col("gr.g")
    # char mass of one occurrence = gram chars minus the n-1 join spaces
    aggs = counts.groupBy("id").agg(
        F.max(F.when(n == 1, F.col("cnt") * F.length(g))).alias("w_mass"),
        F.max(F.when(n == 2, F.col("cnt") * (F.length(g) - 1))).alias("g2_mass"),
        F.sum(F.when((n == 3) & (F.col("cnt") >= 2), F.col("cnt"))).alias("dup3"),
        F.sum(F.when(n == 3, F.col("cnt"))).alias("n3"),
    )

    def frac(num: Column, den: Column) -> Column:
        return F.round(
            F.when(den > 0, F.coalesce(num, F.lit(0)) / den).otherwise(0.0), 6
        )

    return spine.drop("grams").join(aggs, "id", "left").select(
        "id",
        "n_tokens",
        frac(F.col("w_mass"), F.col("tok_chars")).alias("top_word_frac"),
        frac(F.col("g2_mass"), F.col("tok_chars")).alias("top_2gram_frac"),
        frac(F.col("dup3"), F.col("n3")).alias("dup_3gram_frac"),
    )
