"""Incremental batch-vs-corpus admission (operators/incremental.py):
planted dispositions, precedence, and keeper semantics."""

from nadeefiler_spark.operators.incremental import incremental_dedup


def _run(spark, corpus_rows, batch_rows, **kw):
    corpus = spark.createDataFrame(corpus_rows, ["doc_id", "text"])
    batch = spark.createDataFrame(batch_rows, ["doc_id", "text"])
    out = incremental_dedup(corpus, batch, "doc_id", "text", **kw)
    return {r["id"]: (r["disposition"], r["match_id"], r["similarity"])
            for r in out.collect()}


LONG_A = "the quick brown fox jumps over the lazy dog near the old river bank"
LONG_B = "pack my box with five dozen liquor jugs before the market opens today"
LONG_C = "sphinx of black quartz judge my vow while the evening light fades away"


def test_all_four_dispositions(spark):
    corpus = [(1, LONG_A), (2, LONG_B), (3, LONG_C)]
    batch = [
        (10, LONG_A),                    # exact_corpus -> 1
        (11, LONG_B + " zz qx vv"),      # near_corpus  -> 2
        (12, "completely different words about gardens and telescopes"),
        (13, "completely different words about gardens and telescopes"),
        # 12 keeps (accept: no corpus match), 13 is exact_batch -> 12
    ]
    got = _run(spark, corpus, batch, threshold=0.5, max_df=None)
    assert set(got) == {10, 11, 12, 13}
    assert got[10] == ("exact_corpus", 1, 1.0)
    disp, match, sim = got[11]
    assert (disp, match) == ("near_corpus", 2) and 0.5 <= sim < 1.0
    assert got[12] == ("accept", None, None)
    assert got[13] == ("exact_batch", 12, 1.0)


def test_exact_corpus_beats_near_and_exact_batch(spark):
    # two identical batch copies of a corpus doc: BOTH are exact_corpus
    # (corpus precedence), neither is exact_batch, and the trivially
    # perfect near match never surfaces
    corpus = [(1, LONG_A), (2, LONG_A)]  # corpus dup: min id wins
    batch = [(10, LONG_A), (11, LONG_A)]
    got = _run(spark, corpus, batch, threshold=0.5, max_df=None)
    assert got[10] == ("exact_corpus", 1, 1.0)
    assert got[11] == ("exact_corpus", 1, 1.0)


def test_batch_keeper_still_checked_against_corpus(spark):
    # duplicated batch content that is a NEAR (not exact) corpus match:
    # the min-id keeper gets near_corpus, the copy gets exact_batch
    corpus = [(1, LONG_C)]
    near_text = LONG_C + " zz qx vv"
    batch = [(20, near_text), (21, near_text)]
    got = _run(spark, corpus, batch, threshold=0.5, max_df=None)
    disp, match, sim = got[20]
    assert (disp, match) == ("near_corpus", 1) and sim >= 0.5
    assert got[21] == ("exact_batch", 20, 1.0)


def test_short_docs_accept_and_best_match_tiebreak(spark):
    corpus = [(1, LONG_A), (2, LONG_A + " extra"), (3, LONG_B)]
    batch = [
        (30, "too short"),            # < n tokens: no shingles -> accept
        (31, LONG_A + " trailing"),   # near both 1 and 2: best jaccard wins
    ]
    got = _run(spark, corpus, batch, threshold=0.3, max_df=None)
    assert got[30] == ("accept", None, None)
    disp, match, sim = got[31]
    assert disp == "near_corpus" and match in (1, 2) and sim >= 0.3
    # the elected match must be the max-jaccard corpus doc (tie -> min id)
    # recompute both jaccards via the operator at threshold 0 on a
    # single-candidate corpus each
    j1 = _run(spark, [(1, LONG_A)], [(31, LONG_A + " trailing")],
              threshold=0.0, max_df=None)[31][2]
    j2 = _run(spark, [(2, LONG_A + " extra")], [(31, LONG_A + " trailing")],
              threshold=0.0, max_df=None)[31][2]
    expect = 1 if j1 > j2 else (2 if j2 > j1 else 1)
    assert match == expect


def test_hot_shingle_guard_from_corpus_df(spark):
    # a shingle present in every corpus doc is dropped by max_df=1; the
    # batch doc shares ONLY that shingle -> no candidates -> accept
    stop = "aaa bbb ccc"
    corpus = [(1, f"{stop} unique one two three"),
              (2, f"{stop} other four five six")]
    batch = [(40, f"{stop} fresh seven eight nine")]
    got_guarded = _run(spark, corpus, batch, threshold=0.05, max_df=1)
    assert got_guarded[40][0] == "accept"
    got_open = _run(spark, corpus, batch, threshold=0.05, max_df=None)
    assert got_open[40][0] == "near_corpus"
