"""N-gram language-model quality scoring and vocabulary profiling.

The CCNet recipe's quality signal: score every document by its
perplexity under a (small, smoothed) n-gram language model and use the
score to rank/bucket the corpus — fluent text scores low, gibberish,
boilerplate soup, and wrong-language text score high. This module
implements the bigram add-k variant entirely as DataFrame expressions:

    P(w2 | w1) = (c(w1 w2) + alpha) / (c(w1) + alpha * V)

with ``V`` the model's unigram vocabulary size, counts taken from a
training corpus (usually a clean sample), and a document's score the
mean negative log-probability over its adjacent token pairs
(``ppl = exp(avg_nll)``).

No reference analog (beyond-reference operator per the task mandate).

100-TB shape
------------
Training and scoring are decoupled on purpose. ``ngram_lm`` is two
explode + groupBy counts (one exchange each, map-side partial agg).
At production scale the model is trained on a SAMPLE
(operators.sample.stratified_hash_sample) and pruned
(``min_count``), which makes both count tables small enough that
``lm_score``'s two lookups become broadcast joins and scoring is a
single corpus scan + one final groupBy(doc). Un-pruned self-scoring
(the exact mode the contract query oracles) instead shuffles the
exploded pair set twice — correct, but the sample+prune path is the
one to run at 10^12 rows. Pruning keeps smoothing consistent: a
pruned n-gram simply rejoins as count 0 and pays the unseen-mass
penalty.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as tx


def ngram_lm(
    df: DataFrame, text_col: str = "text", min_count: int = 1
) -> tuple[DataFrame, DataFrame]:
    """Train the model: ``(unigrams, bigrams)`` count tables.

    ``unigrams``: (w, c) — token occurrence counts; ``bigrams``:
    (bigram, c) keyed by the space-joined pair string (tokens cannot
    contain spaces post-split, so the key is injective). Rows with
    count < ``min_count`` are pruned from BOTH tables; the vocabulary
    size used for smoothing is the pruned table's row count.
    """
    uni = (
        df.select(F.explode(tx.tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    big = (
        df.select(F.explode(tx.word_shingles(text_col, 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    if min_count > 1:
        uni = uni.where(F.col("c") >= min_count)
        big = big.where(F.col("c") >= min_count)
    return uni, big


def lm_score(
    df: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
    broadcast_model: bool = False,
) -> DataFrame:
    """Per-document LM quality scores.

    Returns (``id_col``, n_bigrams, n_unseen, avg_nll, ppl):
    ``n_bigrams`` adjacent token pairs scored (positional, repeats
    count), ``n_unseen`` of them absent from the bigram table,
    ``avg_nll`` the mean −ln P(w2|w1), ``ppl = exp(avg_nll)`` —
    both NULL for documents with fewer than two tokens (which are
    still emitted, row-for-row with the input). Doubles are rounded
    to 6 dp.

    Pass ``broadcast_model=True`` when the model was trained on a
    pruned sample (the production path) to pin both lookups as
    broadcast joins; the default lets AQE decide.
    """
    v_df = unigrams.agg(F.count(F.lit(1)).alias("__v"))
    uni = unigrams.select(
        F.col("w").alias("__w1"), F.col("c").alias("__c1")
    )
    big = bigrams.select("bigram", F.col("c").alias("__c2"))
    if broadcast_model:
        uni, big = F.broadcast(uni), F.broadcast(big)

    pairs = df.select(
        F.col(id_col).alias("__id"),
        F.explode_outer(tx.word_shingles(text_col, 2)).alias("bigram"),
    ).withColumn("__w1", F.substring_index("bigram", " ", 1))
    scored = (
        pairs.join(big, "bigram", "left")
        .join(uni, "__w1", "left")
        .crossJoin(F.broadcast(v_df))
        .withColumn(
            "__nll",
            -F.log(
                (F.coalesce(F.col("__c2"), F.lit(0)) + F.lit(alpha))
                / (F.coalesce(F.col("__c1"), F.lit(0)) + F.lit(alpha) * F.col("__v"))
            ),
        )
    )
    has_pair = F.col("bigram").isNotNull()
    return (
        scored.groupBy("__id")
        .agg(
            F.sum(has_pair.cast("bigint")).alias("n_bigrams"),
            F.sum((has_pair & F.col("__c2").isNull()).cast("bigint")).alias(
                "n_unseen"
            ),
            F.avg(F.when(has_pair, F.col("__nll"))).alias("__avg"),
        )
        .select(
            F.col("__id").alias(id_col),
            "n_bigrams",
            "n_unseen",
            F.round("__avg", 6).alias("avg_nll"),
            F.round(F.exp("__avg"), 6).alias("ppl"),
        )
    )


def perplexity_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
    min_count: int = 1,
    train_df: DataFrame | None = None,
) -> DataFrame:
    """Convenience: train on ``train_df`` (default: ``df`` itself —
    self-perplexity, the contamination-free mode) and score ``df``."""
    uni, big = ngram_lm(train_df if train_df is not None else df,
                        text_col, min_count)
    return lm_score(
        df, uni, big, id_col, text_col, alpha,
        broadcast_model=train_df is not None,
    )


def vocab_profile(
    df: DataFrame,
    text_col: str = "text",
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Vocabulary statistics, one row per group (or one row total).

    (group…, n_tokens, n_types, ttr, hapax_types, hapax_ratio,
    top1_share): type–token ratio, hapax-legomenon share of the
    vocabulary, and the most frequent type's share of all tokens —
    the cheap screens for template spam (low TTR, high top1_share)
    and OCR noise / tokenizer breakage (hapax_ratio near 1).

    Two aggregations keyed on (group…, token) then (group…): the word
    explode shuffles once and everything else is vocabulary-sized —
    no global sort, no top-k window (top1_share is a plain max), so
    the plan is scale-safe verbatim. Ratios rounded to 6 dp.
    """
    gcols = list(group_cols)
    counts = (
        df.select(*gcols, F.explode(tx.tokens(text_col)).alias("w"))
        .groupBy(*gcols, "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        counts.groupBy(*gcols)
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_types"),
            F.sum((F.col("c") == 1).cast("bigint")).alias("hapax_types"),
            F.max("c").alias("__max_c"),
        )
        .select(
            *gcols,
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.col("n_types").cast("bigint").alias("n_types"),
            F.round(F.col("n_types") / F.col("n_tokens"), 6).alias("ttr"),
            F.col("hapax_types").cast("bigint").alias("hapax_types"),
            F.round(F.col("hapax_types") / F.col("n_types"), 6).alias(
                "hapax_ratio"
            ),
            F.round(F.col("__max_c") / F.col("n_tokens"), 6).alias(
                "top1_share"
            ),
        )
    )


def vocab_coverage(
    df: DataFrame,
    text_col: str = "text",
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Unseen-vocabulary estimation per group: how much of the type
    space has this corpus actually seen?

    The classical frequency-of-frequencies estimators (public
    statistics — Good 1953; Chao 1984):

    - Good–Turing coverage ``coverage = 1 - f1/N``: the estimated
      probability that the NEXT token is a type already observed
      (f1 = singleton types, N = tokens). Low coverage means the long
      tail is still pouring in — sampling more data will keep finding
      new vocabulary/speakers/entities.
    - Chao1 richness ``chao1 = D + f1(f1-1)/(2(f2+1))``: a lower-bound
      estimate of the TRUE number of types (observed D plus an unseen
      mass inferred from the singleton/doubleton ratio; the +1 is the
      standard bias-corrected form, defined even when f2 = 0).

    Returns (group…, n_tokens, n_types, f1, f2, chao1, coverage);
    coverage is NULL when N = 0 never arises (groups come from their
    own tokens) and rounded to 6 dp.

    Plan: the vocab_profile skeleton verbatim — one explode shuffle to
    (group, token) counts, then ONE vocabulary-sized aggregation
    computing all four frequency-of-frequency stats as conditional
    sums (no second pass over the corpus, no frequency-of-frequency
    table materialized). Scale-safe at any corpus size; the answer it
    gives — "this partition's vocabulary is 99.2% covered, that one is
    still at 91%" — is exactly the acquisition-stopping signal a
    10^12-clip speech corpus needs per language/domain.

    No reference analog (beyond-reference operator per the task
    mandate); complements vocab_profile (composition screens) with
    completeness estimation.
    """
    gcols = list(group_cols)
    counts = (
        df.select(*gcols, F.explode(tx.tokens(text_col)).alias("w"))
        .groupBy(*gcols, "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    f1, f2 = F.col("f1"), F.col("f2")
    return (
        counts.groupBy(*gcols)
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_types"),
            F.sum((F.col("c") == 1).cast("bigint")).alias("f1"),
            F.sum((F.col("c") == 2).cast("bigint")).alias("f2"),
        )
        .select(
            *gcols,
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.col("n_types").cast("bigint").alias("n_types"),
            f1.cast("bigint").alias("f1"),
            f2.cast("bigint").alias("f2"),
            F.round(
                F.col("n_types")
                + (f1 * (f1 - 1)) / (F.lit(2.0) * (f2 + 1)),
                6,
            ).alias("chao1"),
            F.round(
                F.lit(1.0) - f1 / F.col("n_tokens"), 6
            ).alias("coverage"),
        )
    )


def domain_logratio_scores(
    df: DataFrame,
    target_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
    broadcast_model: bool = False,
) -> DataFrame:
    """Domain-relevance importance scores (the DSIR recipe, unigram
    variant): score every raw-corpus document by how much more likely
    its tokens are under a TARGET domain sample than under the raw
    corpus itself,

        score(d) = sum_{w in d} ln( p_target(w) / p_raw(w) ),

    with both unigram models add-``alpha`` smoothed over the union
    vocabulary. High scorers read like the target domain; sampling
    raw data weighted by these scores tilts a pre-training mix toward
    the target without hand-written filters.

    Returns (``id_col``, n_tokens, sum_log_ratio, avg_log_ratio) —
    row-for-row with ``df``; zero-token documents carry 0.0 scores.
    Doubles rounded to 6 dp.

    100-TB shape: the target sample is small by definition and the raw
    counts come from a hash sample in production, so both lookup
    tables broadcast (``broadcast_model=True``) and scoring is one
    corpus scan + one groupBy(doc); the three scalars (token totals,
    union-vocab size) ride along as a one-row broadcast cross join.
    The contract query runs the exact full-corpus mode the oracle can
    replay.
    """
    raw_uni, _ = ngram_lm(df, text_col)
    tgt_uni, _ = ngram_lm(target_df, text_col)
    scalars = (
        raw_uni.select("w")
        .unionByName(tgt_uni.select("w"))
        .agg(F.count_distinct("w").alias("__v"))
        .crossJoin(raw_uni.agg(F.sum("c").alias("__n_r")))
        .crossJoin(tgt_uni.agg(F.sum("c").alias("__n_t")))
    )
    r = raw_uni.select("w", F.col("c").alias("__c_r"))
    t = tgt_uni.select("w", F.col("c").alias("__c_t"))
    if broadcast_model:
        r, t = F.broadcast(r), F.broadcast(t)
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.explode_outer(tx.tokens(text_col)).alias("w"),
    )
    a = F.lit(alpha)
    lr = F.log(
        (F.coalesce(F.col("__c_t"), F.lit(0)) + a)
        / (F.col("__n_t") + a * F.col("__v"))
    ) - F.log(
        (F.coalesce(F.col("__c_r"), F.lit(0)) + a)
        / (F.col("__n_r") + a * F.col("__v"))
    )
    has_tok = F.col("w").isNotNull()
    return (
        toks.join(r, "w", "left")
        .join(t, "w", "left")
        .crossJoin(F.broadcast(scalars))
        .groupBy("__id")
        .agg(
            F.sum(has_tok.cast("bigint")).alias("n_tokens"),
            F.sum(F.when(has_tok, lr)).alias("__sum"),
        )
        .select(
            F.col("__id").alias(id_col),
            "n_tokens",
            F.round(F.coalesce(F.col("__sum"), F.lit(0.0)), 6).alias(
                "sum_log_ratio"
            ),
            F.round(
                F.coalesce(F.col("__sum") / F.col("n_tokens"), F.lit(0.0)), 6
            ).alias("avg_log_ratio"),
        )
    )
