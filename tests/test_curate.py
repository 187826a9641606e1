"""Curation pipeline: composed lang/quality gates + fingerprint dedup
(operators/curate.py) with a per-document audit trail."""

from nadeefiler_spark.operators.curate import curate, curation_disposition

GOOD = ("the cat and the dog sat with for of is was " * 9).strip()  # en, long
GOOD_DUP = "  " + GOOD + "  "  # same token set -> same fingerprint
SHORT = "the of and"  # en but < 50 chars -> quality gate
GERMAN = ("der hund und die katze ist nicht mit dem ball " * 9).strip()


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, GOOD, "declared_xx"),
            (2, GOOD_DUP, "declared_xx"),
            (3, SHORT, "declared_xx"),
            (4, GERMAN, "declared_xx"),
        ],
        "doc_id int, text string, lang string",  # declared lang is ignored
    )


def test_disposition_covers_all_reasons(spark):
    got = {
        r["doc_id"]: (r["disposition"], r["dup_of"])
        for r in curation_disposition(_docs(spark), "doc_id", "text").collect()
    }
    assert got == {
        1: ("kept", None),
        2: ("duplicate", 1),
        3: ("quality", None),
        4: ("lang", None),
    }


def test_curate_returns_only_keepers_with_computed_lang(spark):
    rows = curate(_docs(spark), "doc_id", "text").collect()
    assert [r["doc_id"] for r in rows] == [1]
    assert rows[0]["lang"] == "en"  # declared column replaced by guess
    assert rows[0]["quality"] >= 0.5


def test_dup_of_rejected_doc_is_not_a_duplicate(spark):
    """A doc whose only fingerprint-twin failed a gate is kept."""
    df = _docs(spark).where("doc_id = 2")  # 1 absent: 2 becomes keeper
    got = {r["doc_id"]: r["disposition"]
           for r in curation_disposition(df, "doc_id", "text").collect()}
    assert got == {2: "kept"}


def test_corpus_card_planted(spark):
    from nadeefiler_spark.operators.curate import corpus_card

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma", "en"),
            (1, "beta  ALPHA gamma", "en"),   # same token set -> exact dup
            (2, "delta epsilon", "de"),
            (3, "zeta", None),                # NULL lang counts as non-en
        ],
        "doc_id long, text string, lang string",
    )
    r = corpus_card(docs, "doc_id", "text", "lang").collect()[0]
    assert r["n_docs"] == 4
    assert r["total_tokens"] == 3 + 3 + 2 + 1
    assert r["en_frac"] == 0.5
    assert r["n_dup_docs"] == 1  # docs 0/1 share a fingerprint
    assert r["avg_chars"] == (16 + 17 + 13 + 4) / 4


def test_mixing_plan_hand_values(spark):
    from pyspark.sql import functions as F

    from nadeefiler_spark.operators.curate import mixing_plan

    df = spark.createDataFrame(
        [(1, "a b c d", "web"), (2, "e f", "web"),
         (3, "g h i", "code"), (4, "", "junk")],
        "doc_id long, text string, source string",
    )
    got = {
        r["source"]: r
        for r in mixing_plan(
            df, "text", "source", {"web": 0.75, "code": 0.25}, 1200
        ).collect()
    }
    # web: 6 tokens, target 900 -> 150 epochs (oversample)
    assert (got["web"]["n_docs"], got["web"]["n_tokens"]) == (2, 6)
    assert got["web"]["target_tokens"] == 900
    assert got["web"]["epochs"] == 150.0
    # code: 3 tokens, target 300 -> 100 epochs
    assert got["code"]["epochs"] == 100.0
    # unlisted source: weight 0, excluded from the mix but reported
    assert (got["junk"]["weight"], got["junk"]["target_tokens"]) == (0.0, 0)
    assert got["junk"]["epochs"] == 0.0  # zero tokens: no div-by-zero
