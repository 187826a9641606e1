"""Connected components over dup pairs (operators/components.py):
alternating large-star/small-star vs a pure-Python union-find twin."""

import random

from pyspark.sql import functions as F

from nadeefiler_spark.operators import components, dedup


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component id = min member = root after path compression to min
    return {x: find(x) for x in parent}


def _spark_components(spark, pairs):
    df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    return {
        r["id"]: r["component_id"]
        for r in components.connected_components(df).collect()
    }


def test_chain_collapses_to_min(spark):
    # a 40-long chain needs multiple rounds — min-label propagation
    # would take 40; large/small-star converges logarithmically
    pairs = [(i, i + 1) for i in range(40)]
    got = _spark_components(spark, pairs)
    assert got == {i: 0 for i in range(41)}


def test_disjoint_components_and_twin(spark):
    rng = random.Random(7)
    pairs = set()
    # several blobs with random internal edges, disjoint id ranges
    for base in (0, 100, 200, 300):
        ids = list(range(base, base + rng.randint(2, 12)))
        for _ in range(len(ids) * 2):
            a, b = rng.sample(ids, 2)
            pairs.add((min(a, b), max(a, b)))
    pairs = sorted(pairs)
    assert _spark_components(spark, pairs) == _union_find(pairs)


def test_random_graph_matches_union_find(spark):
    rng = random.Random(42)
    pairs = sorted(
        {
            tuple(sorted(rng.sample(range(120), 2)))
            for _ in range(90)
        }
    )
    got = _spark_components(spark, pairs)
    assert got == _union_find(pairs)
    # determinism across partition layouts
    df = spark.createDataFrame(pairs, ["id_a", "id_b"]).repartition(13)
    again = {
        r["id"]: r["component_id"]
        for r in components.connected_components(df).collect()
    }
    assert again == got


def test_string_ids(spark):
    pairs = [("d3", "d1"), ("d1", "d2"), ("x9", "x8")]
    got = _spark_components(spark, pairs)
    assert got == {"d1": "d1", "d2": "d1", "d3": "d1", "x8": "x8", "x9": "x8"}


def test_dup_clusters_sizes(spark):
    pairs = [(1, 2), (2, 3), (10, 11)]
    df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    rows = {
        r["id"]: (r["cluster_id"], r["cluster_size"])
        for r in components.dup_clusters(df).collect()
    }
    assert rows == {1: (1, 3), 2: (1, 3), 3: (1, 3), 10: (10, 2), 11: (10, 2)}


def test_near_dedup_keeps_one_per_cluster(spark):
    corpus = spark.range(20).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"]
    )
    kept = sorted(
        r["doc_id"]
        for r in components.near_dedup(corpus, "doc_id", pairs).collect()
    )
    # victims: 2, 3 (cluster 1) and 11 (cluster 10)
    assert kept == [i for i in range(20) if i not in (2, 3, 11)]


def test_transitive_closure_over_real_pairs(spark):
    # chain-planted dups: A~B and B~C below pairwise A~C threshold still
    # cluster together through B
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta"),
        (1, "alpha beta gamma delta epsilon zeta eta IOTA"),
        (2, "alpha beta gamma delta epsilon zeta KAPPA IOTA"),
        (3, "completely different text about something else entirely ok"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = dedup.ngram_jaccard_pairs(
        df, "doc_id", "text", n=3, threshold=0.3, max_df=None
    )
    got = {
        r["id"]: r["component_id"]
        for r in components.connected_components(pairs).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0}


def test_golden_records_quality_election(spark):
    from nadeefiler_spark.operators.components import golden_records

    # chain a-b, b-c plus isolated pair (d,e): two clusters
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a int, id_b int"
    )
    df = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 9), (10, None), (11, 4), (99, 100)],
        "id int, q int",
    )
    out = {r["id"]: r for r in golden_records(df, "id", pairs, "q").collect()}
    assert set(out) == {1, 2, 3, 10, 11}  # non-members never appear
    # cluster {1,2,3}: q tie 9 between ids 2 and 3 -> smallest id wins
    assert all(out[i]["keeper_id"] == 2 for i in (1, 2, 3))
    assert out[2]["is_keeper"] is True and out[1]["is_keeper"] is False
    assert out[1]["cluster_size"] == 3
    # cluster {10,11}: NULL quality sorts last -> 11 wins
    assert out[10]["keeper_id"] == 11 and out[11]["is_keeper"] is True
    assert out[10]["cluster_size"] == 2


def test_fast_path_matches_distributed(spark):
    # random-ish chain + cliques + isolated self-pair graph, both paths
    import random

    rng = random.Random(5)
    pairs = [(f"n{i:03d}", f"n{i+1:03d}") for i in range(0, 40, 2)]
    pairs += [(f"c{rng.randint(0,9)}", f"c{rng.randint(0,9)}") for _ in range(30)]
    df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    fast = components.connected_components(df)  # default: driver path
    dist = components.connected_components(df, small_graph_limit=0)
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, dist.collect()))


def test_fast_path_self_pair_isolated_node(spark):
    # a self-pair contributes a node but no edge: both paths must map
    # it to itself
    df = spark.createDataFrame([("x", "x"), ("a", "b")], ["id_a", "id_b"])
    for limit in (100_000, 0):
        got = dict(
            map(tuple, components.connected_components(
                df, small_graph_limit=limit
            ).collect())
        )
        assert got == {"x": "x", "a": "a", "b": "a"}
