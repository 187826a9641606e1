"""Incremental corpus deduplication: admit a new batch against an
existing deduplicated corpus.

The steady-state shape of a training-data pipeline is not "dedup one
static corpus" (operators/dedup.py) but "a new crawl/delivery arrives;
which of its documents are actually new?". This operator classifies
every batch row against the corpus AND against the rest of its own
batch, producing one disposition row per batch document:

  - ``exact_corpus``: byte-identical (md5) to an existing corpus doc;
    ``match_id`` = the smallest matching corpus id.
  - ``exact_batch``:  byte-identical to an earlier (smaller-id) batch
    doc that is itself not an exact corpus dup; ``match_id`` = that
    keeper. The keeper continues to the near-dup check.
  - ``near_corpus``:  word-``n``-gram Jaccard >= ``threshold`` against
    some corpus doc; ``match_id`` = the best match (highest Jaccard,
    ties to the smallest corpus id), ``similarity`` = that Jaccard.
  - ``accept``:       none of the above — genuinely new content.

Precedence is exact_corpus > exact_batch > near_corpus > accept, so a
document gets exactly one row.

Scale story (batch << corpus, the interesting regime):
  - The exact check joins corpus digests to the batch digest set on
    ``digest``; with a small batch AQE plans a broadcast of the batch
    side, so the 10^12-row corpus is scanned but never shuffled. No
    broadcast HINT is forced (a hint is not overridden by AQE and
    would pin a large batch driver-side).
  - The near check is a batch-postings x corpus-postings join on the
    shingle key — the classic inverted-index probe. Corpus posting
    lists are bounded by the hot-shingle guard (``max_df``, computed
    from CORPUS document frequencies — the side whose posting lists
    can explode); candidate fan-out is therefore O(|batch shingles| x
    max_df). Batch-internal hot shingles are harmless: the batch never
    self-joins here.
  - Per-corpus-doc shingle counts (the Jaccard denominator) are an
    aggregate over corpus postings. In production that is a maintained
    per-document stat written at ingest (one bigint column), not a
    per-batch recomputation; here it is derived, map-side combinable.
  - Within-batch NEAR duplicates are deliberately out of scope: the
    accepted remainder is small, so run operators/dedup.py +
    operators/components.near_dedup over it before appending.

Shingles are hashed (similarity.word_shingle_hashes) — identical
Jaccard up to a ~2^-64 collision; all hashing is deterministic across
executors and parallelism levels, so dispositions are reproducible.

No reference analog (beyond-reference operator per the task mandate);
keeper conventions match dedup.exact_dup_groups (min id survives).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import similarity as S
from .dedup import _finalize, auto_max_df


def incremental_dedup(
    corpus: DataFrame,
    batch: DataFrame,
    id_col: str,
    content_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | str | None = "auto",
    eager: bool = True,
) -> DataFrame:
    """(id, disposition, match_id, similarity) for every batch row.

    ``id_col`` must be unique within the batch and within the corpus
    (the standard dedup precondition); batch and corpus ids may share a
    domain but a batch id equal to a corpus id is treated as a distinct
    document. ``similarity`` is 1.0 for exact matches, the Jaccard for
    near matches, NULL for accepts; ``match_id`` is NULL for accepts.
    """
    id_type = batch.schema[id_col].dataType
    b = batch.select(
        F.col(id_col).alias("id"), F.col(content_col).alias("content")
    )
    c = corpus.select(
        F.col(id_col).alias("cid"), F.col(content_col).alias("content")
    )

    # --- exact tier ------------------------------------------------
    bd = b.select(
        "id", F.md5(F.col("content").cast("string")).alias("digest")
    ).persist()
    cd = c.select("cid", F.md5(F.col("content").cast("string")).alias("digest"))
    # corpus -> batch-digest join: the matched subset (tiny) is then
    # grouped for the deterministic min-id corpus keeper
    ec = (
        cd.join(bd.select("digest").distinct(), "digest")
        .groupBy("digest")
        .agg(F.min("cid").alias("match_id"))
    )
    exact_corpus = bd.join(ec, "digest").select(
        "id",
        F.lit("exact_corpus").alias("disposition"),
        "match_id",
        F.lit(1.0).alias("similarity"),
    )
    rem1 = bd.join(ec.select("digest"), "digest", "left_anti")
    keep = rem1.groupBy("digest").agg(F.min("id").alias("keeper_id"))
    rem1k = rem1.join(keep, "digest")
    exact_batch = rem1k.where(F.col("id") != F.col("keeper_id")).select(
        "id",
        F.lit("exact_batch").alias("disposition"),
        F.col("keeper_id").alias("match_id"),
        F.lit(1.0).alias("similarity"),
    )
    rem2_ids = rem1k.where(F.col("id") == F.col("keeper_id")).select("id")

    # --- near tier (survivors of the exact tier only) ---------------
    if max_df == "auto":
        max_df = auto_max_df(c.count())
    b2 = b.join(rem2_ids, "id", "left_semi")
    bsh = b2.select(
        "id",
        F.explode(
            F.array_distinct(S.word_shingle_hashes("content", n))
        ).alias("shingle"),
    ).persist()
    csh = c.select(
        "cid",
        F.explode(
            F.array_distinct(S.word_shingle_hashes("content", n))
        ).alias("shingle"),
    ).persist()
    csr, bsr = csh, bsh
    if max_df is not None:
        # hot set measured on CORPUS document frequency; by construction
        # tiny (df > max_df), so the anti joins broadcast it
        hot = (
            csh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df_"))
            .where(F.col("df_") > max_df)
            .select("shingle")
        )
        csr = csh.join(F.broadcast(hot), "shingle", "left_anti")
        bsr = bsh.join(F.broadcast(hot), "shingle", "left_anti")
    sizes_c = csr.groupBy("cid").agg(F.count(F.lit(1)).alias("n_c"))
    sizes_b = bsr.groupBy("id").agg(F.count(F.lit(1)).alias("n_b"))
    common = (
        bsr.join(csr, "shingle")
        .groupBy("id", "cid")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = (
        common.join(sizes_b, "id")
        .join(sizes_c, "cid")
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.col("n_b") + F.col("n_c") - F.col("n_common")),
        )
        .where(F.col("jaccard") >= threshold)
    )
    w = Window.partitionBy("id").orderBy(
        F.col("jaccard").desc(), F.col("cid").asc()
    )
    near = (
        jac.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .select(
            "id",
            F.lit("near_corpus").alias("disposition"),
            F.col("cid").alias("match_id"),
            F.round("jaccard", 6).alias("similarity"),
        )
    )
    accept = rem2_ids.join(near.select("id"), "id", "left_anti").select(
        "id",
        F.lit("accept").alias("disposition"),
        F.lit(None).cast(id_type).alias("match_id"),
        F.lit(None).cast("double").alias("similarity"),
    )
    out = (
        exact_corpus.unionByName(exact_batch)
        .unionByName(near)
        .unionByName(accept)
    )
    return _finalize(out, bd, bsh, csh, eager=eager)
