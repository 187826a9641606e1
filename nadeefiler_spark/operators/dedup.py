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


def _finalize(out: DataFrame, *intermediates: DataFrame, eager: bool = True) -> DataFrame:
    """Release persisted intermediates without losing their benefit.

    eager=True (default): persist + materialize the (small) result, then
    unpersist the (large) intermediates — long-lived sessions (bench
    loops, streaming foreachBatch) no longer accumulate shingle-set
    cache blocks per call. Callers may ``.unpersist()`` the returned
    frame when done with it. eager=False keeps the old fully-lazy
    behavior and leaves intermediate lifetimes to the caller.
    """
    if not eager:
        return out
    out = out.persist()
    out.count()
    for df in intermediates:
        df.unpersist()
    return out


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


def auto_max_df(n_docs: int, frac: float = 0.01, floor: int = 5) -> int:
    """Default hot-shingle guard: a shingle present in more than
    max(floor, frac*n_docs) documents is a stopword shingle — it
    contributes O(df^2) candidate pairs while carrying ~no identity
    signal. 1% of the corpus is far above any real near-dup cluster and
    far below the quadratic-blowup regime."""
    return max(floor, int(frac * n_docs))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | str | None = "auto",
    eager: bool = True,
    shingle_impl: str = "hash",
) -> DataFrame:
    """Exact Jaccard near-dup pairs via inverted-index self-join.

    (id_a, id_b, jaccard) with id_a < id_b and jaccard >= threshold.
    ``id_col`` must uniquely identify rows (standard for dedup — a pair
    operator cannot represent same-id duplicates; run
    :func:`exact_dup_groups` first if ids can repeat. Shingle dedup is
    per ROW, so a repeated id would inflate df/size counts).
    max_df drops shingles appearing in more than max_df docs (hot-key
    guard — a stopword shingle would otherwise produce a quadratic
    candidate blowup; this is the skew handling for this operator).
    Defaults to "auto" = :func:`auto_max_df` of the corpus size (one
    cheap count job); pass None to explicitly disable the guard (exact
    Jaccard over ALL shingles — only safe on skew-free corpora).

    shingle_impl="hash" (default) shingles as 64-bit rotate-xor hashes
    (similarity.word_shingle_hashes): O(tokens) arithmetic instead of
    O(tokens x n) string builds, and 8-byte shuffle keys instead of
    multi-word strings — measured 7.1s -> 3.9s at sf0.1. Jaccard is
    identical up to a ~2^-64-per-pair hash collision (astronomically
    below any meaningful threshold). shingle_impl="string" keeps the
    collision-free string-shingle pipeline.
    """
    common, sizes, sh0 = _shingle_pair_counts(
        df, id_col, text_col, n, max_df, shingle_impl
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
    return _finalize(out, sh0, eager=eager)


def _shingle_pair_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    max_df: int | str | None,
    shingle_impl: str,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared inverted-index candidate machinery for the exact n-gram
    pair scorers: returns (common, sizes, persisted_shingles) where
    ``common`` is (id_a, id_b, n_common) with id_a < id_b over the
    guarded shingle sets and ``sizes`` is (id, n_sh). The caller owns
    unpersisting the third element (via _finalize)."""
    if max_df == "auto":
        max_df = auto_max_df(df.count())
    shingles = (
        S.word_shingle_hashes(text_col, n)
        if shingle_impl == "hash"
        else X.word_shingles(text_col, n)
    )
    # (id, shingle) pairs, deduped PER ROW (array_distinct — narrow, no
    # global distinct shuffle); persisted because the pairs feed the
    # hot-shingle census, the doc-size agg, and the bucket grouping
    # (measured: persist 7.0s vs recompute-3x 8.5s at sf0.1)
    sh0 = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(shingles)).alias("shingle"),
    ).persist()
    sh = sh0
    if max_df is not None:
        # hot-shingle guard as a BROADCAST ANTI join: the census groupBy
        # ships only (shingle, count) partial aggregates, and the hot set
        # (df > max_df) is by construction tiny — a semi join against the
        # (huge) rare set would shuffle the whole shingle table instead
        hot = (
            sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_"))
            .where(F.col("df_") > max_df).select("shingle")
        )
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    # inverted index: ONE shuffle groups each shingle's (bounded, thanks
    # to max_df) posting list; candidate pairs expand inside the bucket —
    # half the shuffle volume of a two-sided self-join, no join at all
    grouped = sh.groupBy("shingle").agg(F.collect_list("id").alias("ids"))
    common = (
        grouped.select(F.explode("ids").alias("id_a"), "ids")
        .select("id_a", F.explode("ids").alias("id_b"))
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    # sizes is one row per doc — no broadcast HINT (an explicit hint is
    # NOT overridden by AQE, so it would pin a 10^12-row table
    # driver-side); AQE/auto-broadcast picks broadcast when sizes fits
    # under the threshold and a shuffle join otherwise
    return common, sizes, sh0


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | str | None = "auto",
    eager: bool = True,
    shingle_impl: str = "hash",
) -> DataFrame:
    """Exact n-gram CONTAINMENT pairs: excerpt/quote duplication that
    Jaccard structurally misses. A 50-word passage verbatim inside a
    5000-word document scores J ~ 0.01 (union-normalized) but
    containment |A∩B| / min(|A|,|B|) = 1.0 — the asymmetric companion
    score the dedup literature pairs with Jaccard for exactly this case
    (Broder's containment, "On the resemblance and containment of
    documents", 1997).

    Output (contained_id, container_id, n_contained, n_container,
    containment): the smaller shingle set is the contained side (equal
    sizes: the lower id). Same inverted-index plan as
    ngram_jaccard_pairs — one shuffle to posting lists, candidates
    expand inside max_df-bounded buckets, sizes joined back under AQE.
    NOTE the hot-shingle guard interacts with intent here: a passage
    quoted in MORE than max_df documents is exactly a popular excerpt,
    and the guard would drop its shingles — raise ``max_df`` (or profile
    with dup_spans first) when hunting boilerplate rather than
    protecting against it.
    """
    common, sizes, sh0 = _shingle_pair_counts(
        df, id_col, text_col, n, max_df, shingle_impl
    )
    a_small = (F.col("n_a") < F.col("n_b")) | (
        (F.col("n_a") == F.col("n_b")) & (F.col("id_a") < F.col("id_b"))
    )
    out = (
        common.join(sizes.withColumnsRenamed({"id": "id_a", "n_sh": "n_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "n_sh": "n_b"}), "id_b")
        .withColumn(
            "containment", F.col("n_common") / F.least("n_a", "n_b")
        )
        .where(F.col("containment") >= threshold)
        .select(
            F.when(a_small, F.col("id_a")).otherwise(F.col("id_b"))
             .alias("contained_id"),
            F.when(a_small, F.col("id_b")).otherwise(F.col("id_a"))
             .alias("container_id"),
            F.least("n_a", "n_b").alias("n_contained"),
            F.greatest("n_a", "n_b").alias("n_container"),
            F.round("containment", 6).alias("containment"),
        )
    )
    return _finalize(out, sh0, eager=eager)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    impl: str = "arrow",
    eager: bool = True,
) -> DataFrame:
    """Near-dup pairs via MinHash banding, verified with exact Jaccard.

    Candidate generation is sub-quadratic: docs sharing any band bucket
    become candidates; only candidates pay the exact-Jaccard verify
    (computed on MinHash signatures' underlying shingle sets).

    impl="arrow" (default): one vectorized numpy pass per row for the
    signature stage (affine-mod-2^64 family; exact pure-Python twin in
    functions.similarity.affine_minhash_py). impl="expr" keeps the
    expression-only xxhash64 path (64 interpreted passes — 3-5x slower
    per row, zero Python; useful where Arrow is unavailable).
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
    sig_col = (
        S.minhash_signature_arrow(F.col("shingles"), num_hashes)
        if impl == "arrow"
        else S.minhash_signature_hashed(F.col("shingles"), num_hashes)
    )
    sig = sh.select("id", "shingles", sig_col.alias("sig"))
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
    sets_a = sh.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a"),
                       F.size("shingles").alias("n_a"))
    sets_b = sh.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b"),
                       F.size("shingles").alias("n_b"))
    verified = (
        cand.join(sets_a, "id_a").join(sets_b, "id_b")
        # size pre-filter BEFORE the O(|A|+|B|) set ops: J(A,B) <= min/max,
        # so J >= t requires min(|A|,|B|) >= t*max(|A|,|B|) — prunes most
        # candidates for free (sizes are scalars already in hand)
        .where(
            F.least("n_a", "n_b").cast("double")
            >= F.lit(threshold) * F.greatest("n_a", "n_b")
        )
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.greatest(F.size(F.array_union("sh_a", "sh_b")), F.lit(1)),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return _finalize(verified, sh, eager=eager)


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    impl: str = "arrow",
    eager: bool = True,
) -> DataFrame:
    """Near-dup pairs via SimHash chunk blocking + hamming verify.

    Guaranteed recall for distance <= 3 with 4 chunks (pigeonhole).
    impl="arrow" computes the fingerprint in one numpy pass over the
    xxhash64 token hashes — bit-for-bit identical to the impl="expr"
    expression path (64 aggregate passes), just cheaper.
    """
    tok_hashes = F.transform(X.tokens(text_col), lambda t: F.xxhash64(t))
    fp_col = (
        S.simhash64_arrow(tok_hashes)
        if impl == "arrow"
        else S.simhash64(X.tokens(text_col))
    )
    fp = df.select(
        F.col(id_col).alias("id"),
        fp_col.alias("fp"),
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
    out = (
        cand.withColumn("hamming", S.hamming64(F.col("fp_a"), F.col("fp_b")))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    return _finalize(out, fp, eager=eager)


def embedding_cosine_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95
) -> DataFrame:
    """Exact cosine near-dup pairs (brute-force self-join baseline).

    At scale, block first (see :func:`embedding_cosine_pairs_blocked`) —
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


def embedding_cosine_pairs_blocked(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    bits: int = 4,
    tables: int = 4,
    dim: int = 64,
    seed: int = 7,
    eager: bool = True,
) -> DataFrame:
    """Production path for embedding near-dup: hyperplane-LSH blocking,
    exact-cosine verify inside blocks.

    Each vector lands in `tables` sign-buckets (one per hash table,
    `bits` hyperplanes each, seeds seed+t — deterministic literals, same
    construction as operators.ann.hyperplane_expr); only same-bucket
    pairs pay the cosine. Union of tables + distinct recovers recall
    lost to any single table: P[candidate] = 1 - (1 - p^bits)^tables
    with p = 1 - theta/pi. Nothing is all-pairs — candidate count per
    bucket is |bucket|^2, bounded by choosing bits for the corpus size.

    Recall < 1 by construction; :func:`embedding_cosine_pairs` is the
    exact oracle (pytest asserts blocked ⊆ exact and recall on planted
    near-dup fixtures).
    """
    from . import ann

    buckets = F.array(*[
        ann.hyperplane_expr(vec_col, dim, bits, seed + t) for t in range(tables)
    ])
    # norm hoisted to a scalar COLUMN computed once per row at persist
    # time (NOT the measured-slower array pre-normalization, which
    # Catalyst re-inlines into the pair transform): each candidate pair
    # then pays ONE dot product instead of three
    base = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
        S.norm(F.col(vec_col)).alias("nrm"),
        F.posexplode(buckets).alias("table", "bucket"),
    ).persist()  # both sides of the per-table self-join
    a = base.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"),
                    F.col("nrm").alias("nrm_a"), "table", "bucket")
    b = base.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"),
                    F.col("nrm").alias("nrm_b"), "table", "bucket")
    cand = (
        a.join(b, ["table", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "v_a", "v_b", "nrm_a", "nrm_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    out = (
        cand.withColumn(
            "cos", S.dot(F.col("v_a"), F.col("v_b")) / (F.col("nrm_a") * F.col("nrm_b"))
        )
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )
    return _finalize(out, base, eager=eager)
