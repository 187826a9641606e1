"""Semantic scoring parity with the reference accumulation semantics
(profilers/semantic.js:8-29): score[object] += textScore * count, top-10."""

from collections import defaultdict

from nadeefiler_spark import datagen, semantic


def test_normalize_subject(spark):
    df = spark.createDataFrame([("<New_York>",), ("Blue_Whale",)], "s string")
    got = [r[0] for r in df.select(semantic.normalize_subject("s")).collect()]
    assert got == ["new york", "blue whale"]


def test_semantic_scores_weighted_topk(spark):
    hist_rows = [
        ("col_string", "new york", 5),
        ("col_string", "paris", 3),
        ("col_string", "blue whale", 2),
        ("col_string", "zzz nothing", 9),
        ("col_other", "york minster", 4),
    ]
    hist = spark.createDataFrame(hist_rows, "key string, value string, count bigint")
    kb = spark.createDataFrame(datagen.yago_types_pdf())
    got = semantic.semantic_scores(hist, kb, tf_idf=False).toPandas()

    # python oracle with the same token-overlap scoring
    kb_rows = datagen.yago_types_pdf().values.tolist()
    scores = defaultdict(float)
    for key, value, count in hist_rows:
        vtoks = set(value.split())
        for subject, objects in kb_rows:
            overlap = len(vtoks & set(subject.split()))
            if overlap:
                for obj in objects:
                    scores[(key, obj)] += overlap * count
    for r in got.itertuples():
        assert scores[(r.key, r.object)] == r.score, (r.key, r.object)
    # every expected (key, object) surfaced (all well under top-10 here)
    assert {(r.key, r.object) for r in got.itertuples()} == set(scores)
    # ranks are dense per key starting at 1
    for key, grp in got.groupby("key"):
        assert sorted(grp["rank"]) == list(range(1, len(grp) + 1))


def test_semantic_topk_prunes(spark):
    # one value matching a subject whose objects array is large
    kb = spark.createDataFrame(
        [("alpha", [f"obj_{i}" for i in range(25)])], "subject string, objects array<string>"
    )
    hist = spark.createDataFrame([("c", "alpha", 1)], "key string, value string, count bigint")
    got = semantic.semantic_scores(hist, kb, top_k=10).toPandas()
    assert len(got) == 10  # pruned to topScores (semantic.js:6)


def test_semantic_scores_tf_idf_matches_python(spark):
    """Default scoring weights each matched token by
    ln((N_subjects + 1) / df(token)) — rare tokens dominate, the public
    analog of Mongo $text textScore (semantic.js:60-66)."""
    import math

    hist_rows = [
        ("col_string", "new york", 5),
        ("col_string", "paris", 3),
        ("col_string", "blue whale", 2),
        ("col_other", "york minster", 4),
    ]
    hist = spark.createDataFrame(hist_rows, "key string, value string, count bigint")
    kb_rows = datagen.yago_types_pdf().values.tolist()
    kb = spark.createDataFrame(datagen.yago_types_pdf())
    got = semantic.semantic_scores(hist, kb).toPandas()

    n_subj = len({s for s, _ in kb_rows})
    df_tok = defaultdict(set)
    for subject, _objs in kb_rows:
        for t in subject.split():
            df_tok[t].add(subject)
    idf = {t: math.log((n_subj + 1.0) / len(subs)) for t, subs in df_tok.items()}

    scores = defaultdict(float)
    for key, value, count in hist_rows:
        vtoks = set(value.lower().split())
        for subject, objects in kb_rows:
            w = sum(idf[t] for t in vtoks & set(subject.split()))
            if w > 0:
                for obj in objects:
                    scores[(key, obj)] += w * count
    assert len(got) > 0
    for r in got.itertuples():
        # operator rounds scores to 6 decimals before ranking
        assert abs(scores[(r.key, r.object)] - r.score) < 1e-6, (r.key, r.object)
    assert {(r.key, r.object) for r in got.itertuples()} == set(scores)
    # rare-token dominance: 'york' (2 subjects) outweighed by 'whale'-only
    # matches relative to plain counting — spot-check ordering for col_string
    top = got[got["key"] == "col_string"].sort_values("rank").iloc[0]
    expect_top = max(v for (k, _), v in scores.items() if k == "col_string")
    assert abs(top["score"] - expect_top) < 1e-6
