"""Bigram-LM scoring + vocab profile (operators/lm.py): hand-computed
probabilities, pruning/unseen semantics, short-doc NULLs, grouping."""

import pytest
import math

from pyspark.sql import functions as F

from nadeefiler_spark.operators.lm import (
    lm_score,
    ngram_lm,
    perplexity_scores,
    vocab_profile,
)


def _df(spark):
    # unigrams: a:3 b:3 z:1 q:3 -> V=4; bigrams: "a b":3 "b a":1 "q q":2
    return spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "z"), (4, "q q q")],
        "doc_id long, text string",
    )


def test_self_perplexity_hand_values(spark):
    got = {
        r["doc_id"]: r
        for r in perplexity_scores(_df(spark), alpha=0.5).collect()
    }
    # doc 2, pair "a b": p = (3+.5)/(3+.5*4) = 0.7
    assert got[2]["avg_nll"] == round(-math.log(0.7), 6)
    assert got[2]["ppl"] == round(1 / 0.7, 6)
    assert (got[2]["n_bigrams"], got[2]["n_unseen"]) == (1, 0)
    # doc 4, pairs "q q" x2: p = (2+.5)/(3+2) = 0.5 each
    assert got[4]["avg_nll"] == round(math.log(2.0), 6)
    # doc 3 has one token: emitted with NULL score
    assert got[3]["n_bigrams"] == 0 and got[3]["avg_nll"] is None
    assert len(got) == 4


def test_cross_corpus_unseen_and_pruning(spark):
    train = _df(spark)
    score_me = spark.createDataFrame(
        [(9, "a b x y")], "doc_id long, text string"
    )
    uni, big = ngram_lm(train, min_count=1)
    row = lm_score(
        score_me, uni, big, alpha=0.5, broadcast_model=True
    ).collect()[0]
    # pairs: "a b" seen, "b x" and "x y" unseen
    assert (row["n_bigrams"], row["n_unseen"]) == (3, 2)
    p_ab = 3.5 / 5.0       # (3+.5)/(3+.5*4)
    p_bx = 0.5 / 5.0       # unseen bigram, seen context b
    p_xy = 0.5 / 2.0       # both unseen: (0+.5)/(0+.5*4)
    expect = -(math.log(p_ab) + math.log(p_bx) + math.log(p_xy)) / 3
    assert row["avg_nll"] == round(expect, 6)

    # min_count=2 prunes "b a" (c=1) and z; V shrinks to 3
    uni2, big2 = ngram_lm(train, min_count=2)
    assert uni2.count() == 3 and big2.count() == 2
    row2 = lm_score(
        spark.createDataFrame([(9, "b a")], "doc_id long, text string"),
        uni2, big2, alpha=0.5,
    ).collect()[0]
    assert row2["n_unseen"] == 1  # "b a" fell out of the model
    assert row2["avg_nll"] == round(-math.log(0.5 / (3 + 0.5 * 3)), 6)


def test_vocab_profile_values_and_groups(spark):
    row = vocab_profile(_df(spark)).collect()[0]
    assert (row["n_tokens"], row["n_types"], row["hapax_types"]) == (10, 4, 1)
    assert row["ttr"] == 0.4 and row["top1_share"] == 0.3
    by_lang = vocab_profile(
        _df(spark).withColumn("lang", F.when(F.col("doc_id") <= 2, "en")
                              .otherwise("de")),
        group_cols=("lang",),
    )
    got = {r["lang"]: r for r in by_lang.collect()}
    assert got["en"]["n_tokens"] == 6 and got["de"]["n_tokens"] == 4
    assert got["de"]["n_types"] == 2  # z, q


def test_domain_logratio_hand_values(spark):
    from nadeefiler_spark.operators.lm import domain_logratio_scores
    import math

    raw = spark.createDataFrame(
        [(1, "x x"), (2, "y"), (3, "")], "doc_id long, text string"
    )
    target = spark.createDataFrame([(9, "x")], "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in domain_logratio_scores(raw, target, alpha=0.5).collect()
    }
    # raw counts: x:2 y:1 (N_r=3); target: x:1 (N_t=1); V = |{x,y}| = 2
    lr_x = math.log(1.5 / 2.0) - math.log(2.5 / 4.0)
    lr_y = math.log(0.5 / 2.0) - math.log(1.5 / 4.0)
    assert got[1]["sum_log_ratio"] == round(2 * lr_x, 6)
    assert got[1]["avg_log_ratio"] == round(lr_x, 6)
    assert got[2]["sum_log_ratio"] == round(lr_y, 6)
    assert lr_x > 0 > lr_y  # target-like tokens score up, others down
    # zero-token doc kept, zero scores
    assert (got[3]["n_tokens"], got[3]["sum_log_ratio"]) == (0, 0.0)
    assert len(got) == 3


def test_domain_scores_rank_target_language(spark):
    """On the synthetic corpus, the target-language docs must rank above
    the rest on average (the whole point of the signal)."""
    from nadeefiler_spark.operators.lm import domain_logratio_scores
    from pyspark.sql import functions as F2

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    scores = domain_logratio_scores(
        d, d.where(F2.col("lang") == "de"), broadcast_model=True
    ).join(d.select("doc_id", "lang"), "doc_id")
    m = {
        r["is_de"]: r["m"]
        for r in scores.groupBy((F2.col("lang") == "de").alias("is_de"))
        .agg(F2.avg("avg_log_ratio").alias("m"))
        .collect()
    }
    assert m[True] > m[False]


def test_vocab_coverage_hand_math(spark):
    # corpus: a a a b b c d  -> N=7, D=4, f1={c,d}=2, f2={b}=1
    # chao1 = 4 + 2*1/(2*(1+1)) = 4.5; coverage = 1 - 2/7
    from nadeefiler_spark.operators.lm import vocab_coverage

    df = spark.createDataFrame([("a a a b b c d",)], ["text"])
    r = vocab_coverage(df, "text").collect()[0]
    assert (r["n_tokens"], r["n_types"], r["f1"], r["f2"]) == (7, 4, 2, 1)
    assert r["chao1"] == pytest.approx(4.5, abs=1e-9)
    assert r["coverage"] == pytest.approx(1 - 2 / 7, abs=1e-6)


def test_vocab_coverage_no_singletons_saturates(spark):
    # every type seen twice: f1=0 -> coverage exactly 1, chao1 = D
    from nadeefiler_spark.operators.lm import vocab_coverage

    df = spark.createDataFrame([("x y x y", "g1"), ("z z", "g2")],
                               ["text", "g"])
    got = {r["g"]: r for r in vocab_coverage(df, "text", ("g",)).collect()}
    assert got["g1"]["coverage"] == 1.0 and got["g1"]["chao1"] == 2.0
    # f2=0 bias-corrected form stays finite: all-singletons group
    df2 = spark.createDataFrame([("p q r",)], ["text"])
    r = vocab_coverage(df2, "text").collect()[0]
    assert (r["f1"], r["f2"]) == (3, 0)
    assert r["chao1"] == pytest.approx(3 + 3 * 2 / 2.0, abs=1e-9)  # 6.0
    assert r["coverage"] == pytest.approx(0.0, abs=1e-9)
