"""Dedup + similarity operators vs pure-Python oracles."""

import itertools

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from nadeefiler_spark.functions import similarity as S
from nadeefiler_spark.operators import ann, dedup


def _docs(spark):
    base = "spark shuffle join agg window filter scan sort hash merge batch stream"
    words = base.split()
    rng = np.random.default_rng(5)
    rows = []
    for i in range(40):
        toks = [words[j] for j in rng.integers(0, len(words), 30)]
        rows.append((i, " ".join(toks)))
    # planted near-dups: 100/101 differ by one word; 102 = copy of 0
    rows.append((100, rows[0][1].replace("spark", "flink", 1)))
    rows.append((101, rows[1][1] + " extra"))
    rows.append((102, rows[0][1]))
    return spark.createDataFrame(rows, "doc_id long, text string"), rows


def _jaccard_py(a: str, b: str, n=3):
    def sh(t):
        w = t.split()
        return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}
    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb) if sa | sb else 0.0


def test_exact_dedup(spark):
    df, rows = _docs(spark)
    groups = dedup.exact_dup_groups(df, "doc_id", "text").toPandas()
    dup_groups = groups[groups["n_dups"] > 1]
    assert len(dup_groups) == 1 and int(dup_groups.iloc[0]["keeper_id"]) == 0
    survivors = dedup.exact_dedup(df, "doc_id", "text")
    assert survivors.count() == df.count() - 1
    assert survivors.where("doc_id = 102").count() == 0


def test_ngram_jaccard_matches_python(spark):
    df, rows = _docs(spark)
    # max_df=None: exact Jaccard over ALL shingles is what the pure-Python
    # oracle computes (the guard is exercised by test_ngram_hot_shingle_guard)
    got = dedup.ngram_jaccard_pairs(
        df, "doc_id", "text", n=3, threshold=0.5, max_df=None
    ).toPandas()
    expected = {}
    for (ia, ta), (ib, tb) in itertools.combinations(rows, 2):
        j = _jaccard_py(ta, tb)
        if j >= 0.5:
            expected[(min(ia, ib), max(ia, ib))] = j
    got_map = {(a, b): j for a, b, j in zip(got["id_a"], got["id_b"], got["jaccard"])}
    assert set(got_map) == set(expected)
    for k, j in expected.items():
        assert got_map[k] == pytest.approx(j, abs=1e-6)
    assert (0, 100) in got_map and (0, 102) in got_map  # planted pairs found


def test_minhash_lsh_finds_planted_dups(spark):
    df, rows = _docs(spark)
    got = dedup.minhash_lsh_pairs(df, "doc_id", "text", threshold=0.5).toPandas()
    pairs = {(a, b) for a, b in zip(got["id_a"], got["id_b"])}
    assert (0, 102) in pairs  # identical
    assert (0, 100) in pairs  # one-word edit
    # verified jaccard is exact -> no false positives above threshold
    for a, b, j in zip(got["id_a"], got["id_b"], got["jaccard"]):
        ta = next(t for i, t in rows if i == a)
        tb = next(t for i, t in rows if i == b)
        assert j == pytest.approx(_jaccard_py(ta, tb), abs=1e-6)


def test_simhash_near_dups(spark):
    df, rows = _docs(spark)
    got = dedup.simhash_pairs(df, "doc_id", "text", max_hamming=6).toPandas()
    pairs = {(a, b) for a, b in zip(got["id_a"], got["id_b"])}
    assert (0, 102) in pairs
    ham = {(a, b): h for a, b, h in zip(got["id_a"], got["id_b"], got["hamming"])}
    assert ham[(0, 102)] == 0  # identical docs -> identical fingerprints


def test_cosine_matches_numpy(spark):
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((6, 8)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = dedup.embedding_cosine_pairs(df, "vec_id", "embedding", threshold=-1.0).toPandas()
    for a, b, c in zip(got["id_a"], got["id_b"], got["cos"]):
        va, vb = vecs[a].astype(np.float64), vecs[b].astype(np.float64)
        expect = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
        assert c == pytest.approx(expect, abs=1e-6)


def test_brute_force_topk_and_lsh(spark):
    rng = np.random.default_rng(4)
    vecs = rng.standard_normal((60, 16))
    vecs[50] = vecs[0] + 0.01 * rng.standard_normal(16)  # planted neighbor
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    queries = df.where("vec_id < 3")
    got = ann.brute_force_topk(df, queries, k=3).toPandas()
    assert set(got["query_id"]) == {0, 1, 2}
    top_of_0 = got[(got["query_id"] == 0) & (got["rank"] == 1)].iloc[0]
    assert int(top_of_0["neighbor_id"]) == 50

    # numpy oracle for ranks of query 0
    sims = vecs @ vecs[0] / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(vecs[0]))
    order = [i for i in np.argsort(-sims) if i != 0][:3]
    assert list(got[got["query_id"] == 0].sort_values("rank")["neighbor_id"]) == order

    # LSH variant finds the planted near-identical vector (same bucket)
    lsh = ann.lsh_topk(df, queries, k=3, bits=6, dim=16).toPandas()
    l0 = lsh[(lsh["query_id"] == 0) & (lsh["rank"] == 1)]
    assert len(l0) == 1 and int(l0.iloc[0]["neighbor_id"]) == 50


def test_multimodal_meta_and_stub(spark, clips_dir):
    from nadeefiler_spark.operators import multimodal as M

    clips = spark.read.parquet(f"{clips_dir}/clips").limit(50)
    meta = M.binary_meta(clips, "clip_id", "bytes").toPandas()
    assert set(meta["kind"]) <= {"audio/wav", "audio/ndf-fake"}
    assert (meta["n_bytes"] > 0).all()

    img_rows = [("i1", M.encode_fake_image(4, 2, bytes(range(8)))), ("i2", b"\x89PNGxxxx")]
    idf = spark.createDataFrame(img_rows, "id string, img binary")
    feats = M.image_features(idf, "id", "img").toPandas().set_index("id")
    assert feats.loc["i1"]["width"] == 4 and feats.loc["i1"]["height"] == 2
    assert feats.loc["i1"]["mean_lum"] == pytest.approx(3.5)
    assert feats.loc["i2"]["width"] == -1  # real decode is stubbed


def test_ngram_hot_shingle_guard(spark):
    """Stopword-skew: a shingle shared by every doc makes the unguarded
    inverted-index self-join quadratic; the auto max_df guard bounds it."""
    stop = "the quick brown"  # one hot shingle planted in EVERY doc
    rng = np.random.default_rng(11)
    words = "alpha beta gamma delta eps zeta eta theta iota kappa".split()
    rows = []
    for i in range(200):
        uniq = " ".join(words[j] for j in rng.integers(0, len(words), 12))
        rows.append((i, f"{stop} {uniq}"))
    rows.append((900, rows[0][1]))  # one planted exact dup pair
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # candidate fan-out = sum over shingles of C(df,2)
    def fanout(max_df):
        sh = dedup.shingle_sets(df, "doc_id", "text")
        dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("c"))
        if max_df is not None:
            dfreq = dfreq.where(F.col("c") <= max_df)
        return dfreq.agg(
            F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("pairs")
        ).collect()[0]["pairs"]

    guard = dedup.auto_max_df(df.count())
    unguarded, guarded = fanout(None), fanout(guard)
    assert unguarded > 20000  # the hot shingle alone contributes C(201,2)
    assert guarded < unguarded / 10  # guard removes the quadratic term

    got = dedup.ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.5).toPandas()
    pairs = {(a, b) for a, b in zip(got["id_a"], got["id_b"])}
    assert (0, 900) in pairs  # planted dup survives the guard


def test_minhash_arrow_signature_matches_python_twin(spark):
    """The vectorized numpy signature stage must equal the pure-Python
    affine twin exactly, row for row."""
    df, _rows = _docs(spark)
    sh = df.select(
        "doc_id",
        F.array_distinct(S.word_shingle_hashes("text", 3)).alias("shingles"),
    ).where(F.size("shingles") > 0)
    got = sh.select(
        "doc_id", "shingles",
        S.minhash_signature_arrow(F.col("shingles"), 64).alias("sig"),
    ).collect()
    assert len(got) > 0
    for r in got:
        assert list(r["sig"]) == S.affine_minhash_py(list(r["shingles"]), 64), r["doc_id"]


def test_simhash_arrow_equals_expression(spark):
    """Arrow fingerprint path is bit-for-bit the expression path."""
    from nadeefiler_spark.functions import text as X

    df, _rows = _docs(spark)
    both = df.select(
        "doc_id",
        S.simhash64(X.tokens("text")).alias("fp_expr"),
        S.simhash64_arrow(
            F.transform(X.tokens("text"), lambda t: F.xxhash64(t))
        ).alias("fp_arrow"),
    ).collect()
    assert len(both) > 0
    for r in both:
        assert r["fp_expr"] == r["fp_arrow"], r["doc_id"]
    # and the empty-token edge case
    edge = spark.createDataFrame([(1, ""), (2, "one")], "doc_id long, text string")
    for r in edge.select(
        S.simhash64(X.tokens("text")).alias("e"),
        S.simhash64_arrow(
            F.transform(X.tokens("text"), lambda t: F.xxhash64(t))
        ).alias("a"),
    ).collect():
        assert r["e"] == r["a"]


def test_embedding_blocked_subset_of_exact_with_planted_dups(spark):
    rng = np.random.default_rng(9)
    vecs = rng.standard_normal((80, 16))
    vecs[70] = vecs[0] + 0.01 * rng.standard_normal(16)  # near-identical pair
    vecs[71] = vecs[1] + 0.01 * rng.standard_normal(16)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    exact = dedup.embedding_cosine_pairs(df, "vec_id", "embedding", threshold=0.9)
    blocked = dedup.embedding_cosine_pairs_blocked(
        df, "vec_id", "embedding", threshold=0.9, bits=4, tables=4, dim=16
    )
    e = {(a, b) for a, b in zip(*[exact.toPandas()[c] for c in ("id_a", "id_b")])}
    g = {(a, b) for a, b in zip(*[blocked.toPandas()[c] for c in ("id_a", "id_b")])}
    assert g <= e  # blocking never invents pairs
    assert (0, 70) in g and (1, 71) in g  # near-identical pairs share buckets


def test_ivf_topk_and_kmeans(spark):
    rng = np.random.default_rng(11)
    # 4 well-separated gaussian clusters so IVF cells mean something
    centers = rng.standard_normal((4, 16)) * 4.0
    vecs = np.vstack([c + 0.3 * rng.standard_normal((20, 16)) for c in centers])
    vecs[70] = vecs[0] + 0.01 * rng.standard_normal(16)  # planted neighbor
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    queries = df.where("vec_id < 3")

    # quantizer with the true cluster centers: IVF must equal brute force
    # restricted to probed cells — and with clusters this separated the
    # planted neighbor is always in the query's own (nearest) cell
    got = ann.ivf_topk(df, queries, centers, k=3, nprobe=1).toPandas()
    top_of_0 = got[(got["query_id"] == 0) & (got["rank"] == 1)].iloc[0]
    assert int(top_of_0["neighbor_id"]) == 70

    # IVF results are a subset of brute-force candidates: every returned
    # neighbor's cosine matches numpy exactly
    for _, r in got.iterrows():
        va = vecs[int(r["query_id"])].astype(np.float64)
        vb = vecs[int(r["neighbor_id"])].astype(np.float64)
        expect = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
        assert r["cos"] == pytest.approx(expect, abs=1e-6)

    # nprobe = #cells degenerates to exact brute force
    full = ann.ivf_topk(df, queries, centers, k=3, nprobe=len(centers)).toPandas()
    bf = ann.brute_force_topk(df, queries, k=3).toPandas()
    key = ["query_id", "rank"]
    assert (
        full.sort_values(key)["neighbor_id"].tolist()
        == bf.sort_values(key)["neighbor_id"].tolist()
    )

    # kmeans trainer: deterministic across repartitioning, inertia improves
    c1 = ann.kmeans_centroids(df, k=4, iters=3)
    c2 = ann.kmeans_centroids(df.repartition(7), k=4, iters=3)
    np.testing.assert_allclose(c1, c2, rtol=0, atol=1e-12)
    seed = ann.kmeans_centroids(df, k=4, iters=0)
    assert ann.kmeans_inertia(df, c1) < ann.kmeans_inertia(df, seed)
    # trained centroids recover the planted structure: every true center
    # has a trained centroid nearby (within the cluster's own spread)
    d = np.linalg.norm(centers[:, None, :] - c1[None, :, :], axis=2)
    assert (d.min(axis=1) < 1.5).all()


def test_ivf_index_pruned_search(spark, tmp_path):
    rng = np.random.default_rng(12)
    centers = rng.standard_normal((8, 16)) * 4.0
    vecs = np.vstack([c + 0.3 * rng.standard_normal((25, 16)) for c in centers])
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    queries = df.where("vec_id < 3")
    path = str(tmp_path / "ivf_index")
    ann.write_ivf_index(df, path, centers)

    got = ann.ivf_topk_indexed(spark, path, queries, centers, k=3, nprobe=2)
    direct = ann.ivf_topk(df, queries, centers, k=3, nprobe=2)
    key = ["query_id", "rank"]
    assert (
        got.toPandas().sort_values(key)["neighbor_id"].tolist()
        == direct.toPandas().sort_values(key)["neighbor_id"].tolist()
    )

    # the pruning claim: the probed-cell filter must be a PARTITION
    # filter on the scan (directory-level pruning), not a row filter
    # evaluated after reading everything.
    probe_cells = sorted(
        {
            c
            for r in queries.select(
                ann.ivf_probe_expr("embedding", centers, 2).alias("p")
            ).collect()
            for c in r["p"]
        }
    )
    assert len(probe_cells) < len(centers)  # something left to prune
    pruned = spark.read.parquet(path).where(F.col("cell").isin(probe_cells))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    scan_line = next(l for l in plan.splitlines() if "FileScan" in l)
    assert "PartitionFilters: [cell" in scan_line and " IN " in scan_line
    assert "DataFilters: []" in scan_line  # nothing row-filtered post-scan
    # and the pruned read returns exactly the probed cells' rows
    per_cell = dict(
        spark.read.parquet(path).groupBy("cell").count().collect()
    )
    assert pruned.count() == sum(per_cell[c] for c in probe_cells)


def test_ngram_containment_finds_excerpt_jaccard_misses(spark):
    """A short passage verbatim inside a long document: containment 1.0
    while the Jaccard pipeline at any sane threshold sees nothing."""
    passage = "the quick brown fox jumps over the lazy dog tonight"
    filler = " ".join(f"w{i}" for i in range(200))
    df = spark.createDataFrame(
        [
            (1, passage),                       # the excerpt (10 tokens)
            (2, filler + " " + passage),        # contains it verbatim
            (3, " ".join(f"x{i}" for i in range(50))),  # unrelated
        ],
        "doc_id int, text string",
    )
    got = dedup.ngram_containment_pairs(
        df, "doc_id", "text", n=3, threshold=0.9, max_df=None
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["contained_id"], r["container_id"]) == (1, 2)
    assert r["containment"] == 1.0
    # 10 tokens -> 8 shingles; the container carries them all plus filler
    assert r["n_contained"] == 8 and r["n_container"] > 100
    # the symmetric score really does miss it
    jac = dedup.ngram_jaccard_pairs(
        df, "doc_id", "text", n=3, threshold=0.2, max_df=None
    ).collect()
    assert jac == []


def test_ngram_containment_direction_tiebreak_and_guard(spark):
    """Equal-size sets: lower id is the contained side; the hot-shingle
    guard drops a passage quoted more widely than max_df (documented
    interaction — raise max_df when hunting boilerplate)."""
    passage = "alpha beta gamma delta epsilon zeta"
    rows = [(i, passage) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = dedup.ngram_containment_pairs(
        df, "doc_id", "text", n=3, threshold=0.9, max_df=None
    ).collect()
    assert len(got) == 45  # all pairs, identical sets
    assert all(r["contained_id"] < r["container_id"] for r in got)
    # guard on: the passage appears in 10 > max_df=5 docs -> all dropped
    guarded = dedup.ngram_containment_pairs(
        df, "doc_id", "text", n=3, threshold=0.9, max_df=5
    ).collect()
    assert guarded == []
