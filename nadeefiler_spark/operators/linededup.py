"""Corpus-level line deduplication (boilerplate removal).

The training-data-pipeline step behind "we removed boilerplate": a line
(nav bars, cookie banners, license headers) that recurs across many
documents carries no signal and skews n-gram statistics, so web-corpus
recipes (CCNet's paragraph dedup, RefinedWeb's line-wise filter) drop
every line whose content appears in >= ``min_docs`` distinct documents.
Distinct from document dedup (operators.dedup): the unit is the LINE,
the whole corpus is both the query and the index, and surviving
documents are REWRITTEN (lines removed, order preserved) rather than
dropped.

No reference analog (beyond-reference operator per the task mandate).

100-TB shape
------------
Lines are keyed by ``xxhash64(line)`` so the corpus-wide count
aggregation and the flag join move 8-byte keys, not line strings —
the standard production trade (a 64-bit collision removing an innocent
line is ~n^2/2^65; at 10^10 corpus lines that is still <<1 expected).
The plan is three exchanges of the exploded line set, all with map-side
partial aggregation and no collect:

    scan -> posexplode(split) ->                       (map-side)
    distinct (h, id)  \\__ both keyed on h: the second
    groupBy(h) count  /   agg REUSES the first exchange
    join lines<->flags on h                            (exchange 2)
    groupBy(id) reassemble kept lines by pos           (exchange 3)

Nothing is broadcast: the flag table is |distinct lines|-sized and
grows with the corpus, so the join is a plain shuffled hash join
(AQE may still locally convert per-partition).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def line_counts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delim: str = "\n",
) -> DataFrame:
    """Per-line corpus statistics: ``(line_hash, n_docs, n_occurrences)``.

    ``n_docs`` counts DISTINCT documents containing the line (the
    boilerplate criterion); ``n_occurrences`` counts total appearances.
    Computed as distinct-(h, id) then groupBy(h) — two aggregations
    keyed on the same column, so Catalyst reuses one exchange (cheaper
    at scale than countDistinct's Expand, which doubles the exploded
    rows through the shuffle).
    """
    ln = df.select(
        F.col(id_col).alias("__id"),
        F.explode(F.split(F.col(text_col), F.lit(delim), -1)).alias("line"),
    ).select("__id", F.xxhash64("line").alias("line_hash"))
    per_doc = ln.groupBy("line_hash", "__id").agg(
        F.count(F.lit(1)).alias("n_occ")
    )
    return per_doc.groupBy("line_hash").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_occ").alias("n_occurrences"),
    )


def dedup_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delim: str = "\n",
    min_docs: int = 2,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Rewrite each document with corpus-duplicated lines removed.

    A line is removed (from EVERY document, RefinedWeb-style — no
    canonical copy survives) when its content appears in >= ``min_docs``
    distinct documents. Returns one row per input document:

    - ``<id_col>`` plus any ``keep_cols`` carried through,
    - ``clean_text``: surviving lines joined by ``delim`` in original
      order ('' when everything was boilerplate),
    - ``n_lines``: lines before filtering (``split`` semantics: a
      document is always >= 1 line; empty text is one empty line),
    - ``n_removed``: lines dropped.

    Documents are never dropped, so the output is a row-for-row
    replacement of the corpus (join-free to consume downstream).
    """
    lines = df.select(
        F.col(id_col).alias("__id"),
        *[F.col(c) for c in keep_cols],
        F.posexplode(F.split(F.col(text_col), F.lit(delim), -1)).alias(
            "pos", "line"
        ),
    ).withColumn("line_hash", F.xxhash64("line"))
    flagged = (
        line_counts(df, id_col, text_col, delim)
        .where(F.col("n_docs") >= min_docs)
        .select("line_hash", F.lit(True).alias("dup"))
    )
    tagged = lines.join(flagged, "line_hash", "left").withColumn(
        "keep", F.col("dup").isNull()
    )
    kept_line: Column = F.when(F.col("keep"), F.struct("pos", "line"))
    return (
        tagged.groupBy("__id", *keep_cols)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum((~F.col("keep")).cast("bigint")).alias("n_removed"),
            F.concat_ws(
                delim,
                F.transform(
                    F.array_sort(F.collect_list(kept_line)),
                    lambda s: s.getField("line"),
                ),
            ).alias("clean_text"),
        )
        .select(
            F.col("__id").alias(id_col),
            *keep_cols,
            "clean_text",
            F.col("n_lines").cast("bigint").alias("n_lines"),
            F.col("n_removed").cast("bigint").alias("n_removed"),
        )
    )
