"""Annotation-consistency operator vs hand-computed expectations, plus
the exact planted-conflict pin for the transcript_conflicts contract
query (its rows-only stand-in for a DuckDB oracle)."""

import pandas as pd

from pyspark.sql import functions as F
import pytest

from nadeefiler_spark.operators import consistency


def test_pair_attr_conflicts(spark):
    base = spark.createDataFrame(
        [
            (1, "en", "web"),
            (2, "de", "web"),
            (3, "en", "books"),
            (4, None, "web"),
            (5, None, "web"),
        ],
        "doc_id long, lang string, source string",
    )
    pairs = spark.createDataFrame(
        [(1, 2, 0.9), (1, 3, 0.8), (4, 5, 0.7)],
        "id_a long, id_b long, jaccard double",
    )
    out = (
        consistency.pair_attr_conflicts(pairs, base, "doc_id", ["lang", "source"])
        .toPandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert list(out.columns) == [
        "id_a", "id_b", "jaccard",
        "lang_a", "lang_b", "source_a", "source_b",
        "lang_match", "source_match",
    ]
    # (1,2): lang conflict, source agrees; (1,3): opposite;
    # (4,5): NULL vs NULL agrees under eqNullSafe
    assert out["lang_match"].tolist() == [False, True, True]
    assert out["source_match"].tolist() == [True, False, True]
    assert out["lang_a"].tolist() == ["en", "en", None]


def test_group_attr_conflicts_normalization(spark):
    df = spark.createDataFrame(
        [
            ("h1", "a1", "Hello  world"),
            ("h1", "a2", "hello world "),   # case/space variant: consistent
            ("h2", "b1", "left channel"),
            ("h2", "b2", "right channel"),  # real conflict
            ("h3", "c1", "lonely"),          # below min_group: dropped
            ("h4", "d1", None),
            ("h4", "d2", "text"),            # NULL excluded -> n=1, consistent
        ],
        "fp string, id string, transcript string",
    )
    out = consistency.group_attr_conflicts(
        df, "fp", "id", {"transcript": consistency.norm_text("transcript")}
    ).toPandas().set_index("group_key")
    assert sorted(out.index) == ["h1", "h2", "h4"]
    assert bool(out.loc["h1", "consistent"]) and out.loc["h1", "n_transcript"] == 1
    assert not bool(out.loc["h2", "consistent"])
    assert out.loc["h2", "n_transcript"] == 2
    assert out.loc["h2", "keeper_id"] == "b1"
    assert bool(out.loc["h4", "consistent"])
    assert out.loc["h4", "n_members"] == 2


def test_group_attr_conflicts_plain_attr_list(spark):
    df = spark.createDataFrame(
        [("g", 1, "x"), ("g", 2, "y")], "k string, id long, v string"
    )
    out = consistency.group_attr_conflicts(df, "k", "id", ["v"]).toPandas()
    assert out.loc[0, "n_v"] == 2 and not bool(out.loc[0, "consistent"])


def test_transcript_conflicts_planted_set(spark):
    """The contract query's rows-only pin: exactly the three planted
    rewritten-transcript copies flag inconsistent; the case/space
    variants and datagen's verbatim i%211 copies group consistent."""
    import __spark_entry__ as entry

    df = entry.queries()["transcript_conflicts_corpus"](
        spark, "/root/testdata/sf0.001"
    )
    pdf = df.toPandas()
    bad = pdf[~pdf["consistent"]].sort_values("keeper_id")
    assert bad["keeper_id"].tolist() == [
        "clip-000000000012",
        "clip-000000000345",
        "clip-000000000679",
    ]
    assert (bad["n_members"] == 2).all() and (bad["n_transcript"] == 2).all()
    good = pdf[pdf["consistent"]]
    # the benign case/space copies are present and NOT flagged
    assert {"clip-000000000023", "clip-000000000310"} <= set(good["keeper_id"])
    assert (good["n_transcript"] <= 1).all()


# --- chance-corrected label agreement ---------------------------------------


def test_label_agreement_known_2x2_kappa(spark):
    # 20 (x,x), 5 (x,y), 10 (y,x), 15 (y,y):
    # po = 35/50 = 0.7; pe = (25*30 + 25*20)/2500 = 0.5; kappa = 0.4
    rows = (
        [("x", "x")] * 20 + [("x", "y")] * 5 + [("y", "x")] * 10 + [("y", "y")] * 15
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = consistency.label_agreement(df, "a", "b").collect()[0]
    assert r["n"] == 50
    assert r["observed"] == pytest.approx(0.7)
    assert r["expected"] == pytest.approx(0.5)
    assert r["kappa"] == pytest.approx(0.4)


def test_label_agreement_perfect_and_degenerate(spark):
    perfect = spark.createDataFrame(
        [("x", "x")] * 5 + [("y", "y")] * 5, "a string, b string"
    )
    r = consistency.label_agreement(perfect, "a", "b").collect()[0]
    assert r["observed"] == 1.0 and r["kappa"] == pytest.approx(1.0)
    # constant equal labels: pe = 1 -> kappa defined as 0.0 (sklearn
    # degenerate-table convention), observed stays 1
    const = spark.createDataFrame([("x", "x")] * 7, "a string, b string")
    r = consistency.label_agreement(const, "a", "b").collect()[0]
    assert r["observed"] == 1.0 and r["expected"] == 1.0 and r["kappa"] == 0.0


def test_label_agreement_null_is_a_category(spark):
    df = spark.createDataFrame(
        [("x", "x"), (None, None), ("x", None), (None, "x")],
        "a string, b string",
    )
    r = consistency.label_agreement(df, "a", "b").collect()[0]
    # diagonal: (x,x) and (NULL,NULL) agree via null-safe equality
    assert r["n"] == 4
    assert r["observed"] == pytest.approx(0.5)
