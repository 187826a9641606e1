"""Within-doc repetition profile (operators/repetition.py): planted
fraction checks, degenerate inputs, layout independence."""

import pytest
from pyspark.sql import functions as F

from nadeefiler_spark.operators.repetition import repetition_profile


def _profile(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {r["id"]: r for r in repetition_profile(df, "doc_id", "text").collect()}


def test_planted_fractions(spark):
    rows = _profile(spark, ["aa aa aa bb"])
    r = rows[0]
    # tokens: aa aa aa bb -> 4 tokens, 8 chars
    assert r["n_tokens"] == 4
    # top word: aa x3, mass 6 of 8 chars
    assert r["top_word_frac"] == pytest.approx(0.75)
    # 2-grams: "aa aa" x2 (mass 4 each = 8), "aa bb" x1 -> 8/8
    assert r["top_2gram_frac"] == pytest.approx(1.0)
    # 3-grams: "aa aa aa", "aa aa bb" both unique
    assert r["dup_3gram_frac"] == pytest.approx(0.0)


def test_repeated_trigram_saturates(spark):
    # x y z x y z x y -> every 3-gram occurs exactly twice
    r = _profile(spark, ["x y z x y z x y"])[0]
    assert r["dup_3gram_frac"] == pytest.approx(1.0)


def test_degenerate_docs(spark):
    rows = _profile(spark, ["", "hi"])
    empty, hi = rows[0], rows[1]
    assert empty["n_tokens"] == 0
    assert (
        empty["top_word_frac"]
        == empty["top_2gram_frac"]
        == empty["dup_3gram_frac"]
        == 0.0
    )
    assert hi["n_tokens"] == 1
    assert hi["top_word_frac"] == pytest.approx(1.0)  # the only word is "top"
    assert hi["top_2gram_frac"] == 0.0  # no 2-grams
    assert hi["dup_3gram_frac"] == 0.0


def test_layout_independent(spark):
    texts = [f"w{i % 3} common w{i % 5} common tail{i}" for i in range(60)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    a = sorted(repetition_profile(df, "doc_id", "text").collect())
    b = sorted(repetition_profile(df.repartition(13), "doc_id", "text").collect())
    assert a == b
