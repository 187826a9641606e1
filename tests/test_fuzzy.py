"""Edit-distance join: blocked result must EQUAL the brute-force
cartesian definition on random-ish strings (the exactness claim the
oracle relies on), plus edge cases (short strings, nulls, hot-gram cap).
"""

from __future__ import annotations

import itertools

from nadeefiler_spark.operators.fuzzy import char_grams, edit_distance_pairs


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(rows, k):
    return {
        (i1, i2)
        for (i1, t1), (i2, t2) in itertools.combinations(rows, 2)
        if _lev(t1, t2) <= k
    }


def test_blocked_equals_bruteforce(spark):
    # deterministic pseudo-random words over a tiny alphabet: plenty of
    # near-collisions, all lengths >= n*(k+1) so recall is guaranteed
    words = []
    x = 12345
    for i in range(120):
        x = (x * 1103515245 + 12345) % (2**31)
        w = "".join("abcd"[(x >> (3 * j)) & 3] for j in range(8))
        words.append((i, w))
    df = spark.createDataFrame(words, "id int, t string")
    got = {
        (r["id_a"], r["id_b"])
        for r in edit_distance_pairs(df, "id", "t", max_dist=2).collect()
    }
    assert got == _brute(words, 2)
    assert len(got) > 0  # the corpus actually has near-dups


def test_dist_values_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, "kitten"), (2, "sitten"), (3, "sittin"), (4, None), (5, "")],
        "id int, t string",
    )
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in edit_distance_pairs(df, "id", "t", max_dist=2).collect()
    }
    assert got == {(1, 2): 1, (2, 3): 1, (1, 3): 2}


def test_short_strings_still_indexed(spark):
    # strings shorter than gram_n fall back to one whole-string gram
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "id int, t string"
    )
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in edit_distance_pairs(df, "id", "t", max_dist=0, gram_n=3).collect()
    }
    assert got == {(1, 2): 0}


def test_max_df_drops_hot_gram_pairs(spark):
    # every word shares the hot prefix "zz"; capping df kills the only
    # shared gram between the two near-identical words
    df = spark.createDataFrame(
        [(1, "zzabcd"), (2, "zzabce"), (3, "zzqrst"), (4, "zzwxyu")],
        "id int, t string",
    )
    exact = edit_distance_pairs(df, "id", "t", max_dist=1).collect()
    assert {(r["id_a"], r["id_b"]) for r in exact} == {(1, 2)}
    capped = edit_distance_pairs(df, "id", "t", max_dist=1, max_df=1).collect()
    assert capped == []  # recall traded away, as documented


def test_char_grams_shape(spark):
    df = spark.createDataFrame([("abab",), ("x",)], "t string")
    got = [r["g"] for r in df.select(char_grams("t", 2).alias("g")).collect()]
    assert got[0] == ["ab", "ba", "ab"]  # multiplicity kept (count bound)
    assert got[1] == ["x"]
