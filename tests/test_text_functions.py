import numpy as np

from pyspark.sql import functions as F

from nadeefiler_spark.functions import text as X


def _one(spark, expr, value):
    df = spark.createDataFrame([(value,)], "t string")
    return df.select(expr.alias("v")).first()["v"]


def test_token_counts(spark):
    assert _one(spark, X.token_count("t"), "a  b\tc\nd") == 4
    assert _one(spark, X.token_count("t"), "") == 0
    # 'hello' ',' 'world' '42' '!'
    assert _one(spark, X.bpe_ish_token_count("t"), "hello, world42!") == 5


def test_bpe_ish_exact(spark):
    import re
    for s in ["hello, world42!", "a.b,c", "x  y", "don't stop"]:
        expected = len(re.findall(X.BPE_ISH_REGEX, s))
        assert _one(spark, X.bpe_ish_token_count("t"), s) == expected, s


def test_quality_score_bounds(spark):
    good = "the quick brown fox jumps over the lazy dog " * 3
    bad = "!!! ,,, ... ;;; :::"
    g = _one(spark, X.quality_score("t"), good)
    b = _one(spark, X.quality_score("t"), bad)
    assert 0.0 <= b < g <= 1.0


def test_lang_id(spark):
    assert _one(spark, X.lang_id("t"), "the cat and the dog is here") == "en"
    assert _one(spark, X.lang_id("t"), "der hund und die katze ist da") == "de"
    assert _one(spark, X.lang_id("t"), "le chat est dans la maison") == "fr"
    assert _one(spark, X.lang_id("t"), "el perro es para los gatos") == "es"
    assert _one(spark, X.lang_id("t"), "xyzzy qwerty asdf") == "und"


def test_fingerprint_order_insensitive(spark):
    a = _one(spark, X.fingerprint("t"), "alpha beta gamma")
    b = _one(spark, X.fingerprint("t"), "gamma  alpha beta beta")
    c = _one(spark, X.fingerprint("t"), "alpha beta delta")
    assert a == b and a != c
    import hashlib
    assert a == hashlib.md5(b"alpha beta gamma").hexdigest()


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",)], "t string")
    got = df.select(X.word_shingles("t", 3).alias("s")).first()["s"]
    assert got == ["a b c", "b c d"]
    got2 = df.select(X.word_shingles("t", 5).alias("s")).first()["s"]
    assert got2 == []


def test_token_chunks_no_token_dropped(spark):
    import pytest

    df = spark.createDataFrame([(" ".join(f"t{i}" for i in range(11)),)], "t string")
    got = df.select(X.token_chunks("t", 4, 2).alias("c")).first()["c"]
    # starts 1,3,5,7,9 (1-based): last chunk covers t10 even though the
    # trailing window is shorter than the stride-free tail
    assert got[0] == "t0 t1 t2 t3"
    assert got[1] == "t2 t3 t4 t5"
    assert got[-1] == "t8 t9 t10"
    covered = {t for ch in got for t in ch.split()}
    assert covered == {f"t{i}" for i in range(11)}

    short = spark.createDataFrame([("a b",)], "t string")
    assert short.select(X.token_chunks("t", 4).alias("c")).first()["c"] == ["a b"]
    empty = spark.createDataFrame([("   ",)], "t string")
    assert empty.select(X.token_chunks("t", 4).alias("c")).first()["c"] == []
    with pytest.raises(ValueError):
        X.token_chunks("t", 4, 4)


def test_token_chunks_exact_cover_no_overlap(spark):
    df = spark.createDataFrame([(" ".join("abcdefgh"),)], "t string")
    got = df.select(X.token_chunks("t", 4, 0).alias("c")).first()["c"]
    assert got == ["a b c d", "e f g h"]


def test_mask_structure_classes(spark):
    df = spark.createDataFrame(
        [("Brand#17",), ("Customer#000000042",), ("+1 (555) 010-9999",),
         ("small ring",), ("",), (None,)],
        "t string",
    )
    got = [r["m"] for r in df.select(X.mask("t").alias("m")).collect()]
    assert got == [
        "Aaaaa#99",
        "Aaaaaaaa#999999999",
        "+9 (999) 999-9999",
        "aaaaa aaaa",
        "",
        None,
    ]
