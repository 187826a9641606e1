"""Deduplication operators for large-scale training-data pipelines.

Four families, each with an explicit scale story:

- exact:        md5-groupBy — one shuffle on the content hash; at
                10^12 rows hash first, group on the (shorter) digest.
- n-gram Jaccard: shingle -> inverted-index self-join on shingle ->
                pair counts -> Jaccard. Exact but O(pairs sharing a
                shingle); bound candidate fan-out by df-filtering hot
                shingles (stopword shingles are dropped via max_df).
- MinHash LSH:  signature per doc (no shuffle) -> band-bucket join ->
                candidate pairs -> exact-Jaccard verify. Sub-quadratic;
                the one to run at 100 TB.
- SimHash:      64-bit fingerprint -> 16-bit chunk blocking ->
                hamming<=k verify. Cheapest near-dup for long docs.

All hashing is Spark's xxhash64/md5 — deterministic across executors
and parallelism levels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import similarity as S
from ..functions import text as X


def exact_dup_groups(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """(content_hash, n_dups, keeper_id): one row per distinct content;
    keeper = min id (deterministic survivor)."""
    return (
        df.select(F.md5(F.col(content_col).cast("string")).alias("content_hash"),
                  F.col(id_col).alias("id"))
        .groupBy("content_hash")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min("id").alias("keeper_id"))
    )


def exact_dedup(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """Survivor rows only (keeper per content hash)."""
    keepers = exact_dup_groups(df, id_col, content_col).select(
        F.col("keeper_id").alias(id_col)
    )
    return df.join(keepers, id_col, "left_semi")


def shingle_sets(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) distinct pairs."""
    return (
        df.select(F.col(id_col).alias("id"),
                  F.explode(X.word_shingles(text_col, n)).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Exact Jaccard near-dup pairs via inverted-index self-join.

    (id_a, id_b, jaccard) with id_a < id_b and jaccard >= threshold.
    max_df drops shingles appearing in more than max_df docs (hot-key
    guard — a stopword shingle would otherwise produce a quadratic
    candidate blowup; this is the skew handling for this operator).
    """
    # persist: the (id, shingle) pairs feed the doc-size agg AND both
    # sides of the inverted-index self-join — tokenize once, not thrice
    sh = shingle_sets(df, id_col, text_col, n).persist()
    if max_df is not None:
        rare = (
            sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_"))
            .where(F.col("df_") <= max_df).select("shingle")
        )
        sh = sh.join(rare, "shingle", "left_semi")
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    out = (
        common.join(sizes.withColumnsRenamed({"id": "id_a", "n_sh": "n_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "n_sh": "n_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return out


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup pairs via MinHash banding, verified with exact Jaccard.

    Candidate generation is sub-quadratic: docs sharing any band bucket
    become candidates; only candidates pay the exact-Jaccard verify
    (computed on MinHash signatures' underlying shingle sets).
    """
    rows_per_band = num_hashes // bands
    # pre-hashed shingles (arithmetic, no string building) + persist:
    # the shingle set feeds signature generation AND both sides of the
    # exact-Jaccard verify — materialize once instead of recomputing the
    # tokenization three times (the 100TB analog: write the shingle-set
    # stage table once, read it per consumer)
    sh = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(S.word_shingle_hashes(text_col, n)).alias("shingles"),
    ).where(F.size("shingles") > 0).persist()
    sig = sh.select(
        "id", "shingles",
        S.minhash_signature_hashed(F.col("shingles"), num_hashes).alias("sig"),
    )
    banded = sig.select(
        "id", F.explode(S.minhash_bands(F.col("sig"), bands, rows_per_band)).alias("b")
    ).select("id", "b.band", "b.key")
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "key"])
        .where(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    sets_a = sh.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a"))
    sets_b = sh.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b"))
    verified = (
        cand.join(sets_a, "id_a").join(sets_b, "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.greatest(F.size(F.array_union("sh_a", "sh_b")), F.lit(1)),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return verified


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs via SimHash chunk blocking + hamming verify.

    Guaranteed recall for distance <= 3 with 4 chunks (pigeonhole).
    """
    fp = df.select(
        F.col(id_col).alias("id"),
        S.simhash64(X.tokens(text_col)).alias("fp"),
    ).persist()  # feeds both sides of the chunk-blocking self-join
    chunked = fp.select(
        "id", "fp", F.explode(S.simhash_chunks(F.col("fp"))).alias("c")
    ).select("id", "fp", "c.chunk", "c.key")
    cand = (
        chunked.alias("x")
        .join(chunked.alias("y"), ["chunk", "key"])
        .where(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"),
            F.col("x.fp").alias("fp_a"), F.col("y.fp").alias("fp_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", S.hamming64(F.col("fp_a"), F.col("fp_b")))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def embedding_cosine_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95
) -> DataFrame:
    """Exact cosine near-dup pairs (brute-force self-join baseline).

    At scale, block first (see operators.ann.hyperplane_buckets) —
    this variant is the correctness oracle for the blocked one.
    """
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", S.cosine(F.col("v_a"), F.col("v_b")))
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )
