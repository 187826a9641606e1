"""Benchmark decontamination (operators/decontam.py) and deterministic
sampling (operators/sample.py)."""

import pytest
from pyspark.sql import functions as F

from nadeefiler_spark.operators import decontam
from nadeefiler_spark.operators import sample as smp

BENCH_ITEM = "alpha beta gamma delta epsilon zeta eta theta"
CLEAN = "one two three four five six seven eight nine ten"
# contains the benchmark item verbatim inside other text
CONTAMINATED = "prefix words " + BENCH_ITEM + " suffix words here"
PARTIAL = "alpha beta gamma delta epsilon unrelated tail words"  # 1 shared 5-gram


def _corpus(spark):
    return spark.createDataFrame(
        [(1, CLEAN), (2, CONTAMINATED), (3, PARTIAL), (4, BENCH_ITEM)],
        "doc_id int, text string",
    )


def _bench(spark):
    return spark.createDataFrame(
        [(100, BENCH_ITEM)], "bench_id int, text string"
    )


def test_contamination_pairs_counts_and_fraction(spark):
    got = {
        (r["doc_id"], r["bench_id"]): (r["n_common"], r["frac_bench"])
        for r in decontam.benchmark_contamination(
            _corpus(spark), _bench(spark), n=5
        ).collect()
    }
    # 8 tokens -> 4 distinct 5-grams in the benchmark item
    assert got == {
        (2, 100): (4, 1.0),  # full containment
        (3, 100): (1, 0.25),
        (4, 100): (4, 1.0),  # verbatim copy
    }


def test_min_common_prunes_weak_overlap(spark):
    ids = {
        r["doc_id"]
        for r in decontam.benchmark_contamination(
            _corpus(spark), _bench(spark), n=5, min_common=2
        ).collect()
    }
    assert ids == {2, 4}


def test_decontaminate_drops_flagged_docs(spark):
    kept = sorted(
        r["doc_id"]
        for r in decontam.decontaminate(
            _corpus(spark), _bench(spark), n=5
        ).collect()
    )
    assert kept == [1]


def test_same_id_column_name_rejected(spark):
    with pytest.raises(ValueError, match="must differ"):
        decontam.benchmark_contamination(
            _corpus(spark), _corpus(spark), corpus_id="doc_id", bench_id="doc_id"
        )


def test_short_docs_yield_no_shingles(spark):
    df = spark.createDataFrame([(9, "too short")], "doc_id int, text string")
    assert decontam.benchmark_contamination(df, _bench(spark), n=5).count() == 0


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------


def _rows(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )


def test_hash_sample_rate_and_determinism(spark):
    df = _rows(spark)
    a = {r["doc_id"] for r in smp.hash_sample(df, "doc_id", 0.25).collect()}
    b = {r["doc_id"] for r in smp.hash_sample(df, "doc_id", 0.25).collect()}
    assert a == b  # layout/run independent
    assert abs(len(a) / 2000 - 0.25) < 0.05
    # repartitioning must not change membership
    c = {
        r["doc_id"]
        for r in smp.hash_sample(df.repartition(13), "doc_id", 0.25).collect()
    }
    assert a == c


def test_hash_sample_nested_fractions(spark):
    """A smaller fraction's sample is a subset of a larger one's (keys
    are compared against thresholds, so membership nests)."""
    df = _rows(spark)
    small = {r["doc_id"] for r in smp.hash_sample(df, "doc_id", 0.1).collect()}
    big = {r["doc_id"] for r in smp.hash_sample(df, "doc_id", 0.5).collect()}
    assert small <= big


def test_stratified_rates_per_stratum(spark):
    df = _rows(spark)
    got = (
        smp.stratified_hash_sample(
            df, "doc_id", "lang", {"en": 0.5, "de": 0.1}
        )
        .groupBy("lang")
        .count()
        .collect()
    )
    rates = {r["lang"]: r["count"] / 1000 for r in got}
    assert abs(rates["en"] - 0.5) < 0.07
    assert abs(rates["de"] - 0.1) < 0.07


def test_stratified_default_fraction_zero_drops_unlisted(spark):
    df = _rows(spark)
    langs = {
        r["lang"]
        for r in smp.stratified_hash_sample(
            df, "doc_id", "lang", {"en": 0.5}
        ).collect()
    }
    assert langs == {"en"}


def test_python_twin_of_sample_key(spark):
    """Independent pure-Python recomputation of the membership set."""
    df = _rows(spark, 500)
    thr = smp.threshold(0.3)
    expected = {
        i for i in range(500) if ((i % 2**31) * 2654435761 + 17) % 2**31 < thr
    }
    got = {r["doc_id"] for r in smp.hash_sample(df, "doc_id", 0.3).collect()}
    assert got == expected


def test_fraction_bounds_validated():
    with pytest.raises(ValueError):
        smp.threshold(1.5)


# --- deterministic splits + split leakage -----------------------------------


def _py_key(i, salt=17):
    return ((i % 2**31) * 2654435761 + salt) % 2**31


def test_with_split_partitions_key_space(spark):
    from nadeefiler_spark.operators.sample import threshold, with_split

    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    got = {
        r["doc_id"]: r["split"]
        for r in with_split(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}).collect()
    }
    t1, t2, t3 = threshold(0.8), threshold(0.8 + 0.1), threshold(min(0.8 + 0.1 + 0.1, 1.0))
    for i in range(2000):
        k = _py_key(i)
        expected = "train" if k < t1 else "val" if k < t2 else "test" if k < t3 else None
        assert got[i] == expected
    # all three splits non-empty at this n
    assert {"train", "val", "test"} <= set(got.values())


def test_with_split_remainder_is_null_and_validation(spark):
    import pytest
    from nadeefiler_spark.operators.sample import with_split

    df = spark.range(500).select(F.col("id").alias("doc_id"))
    labels = [r["split"] for r in with_split(df, "doc_id", {"a": 0.5}).collect()]
    assert any(s is None for s in labels) and any(s == "a" for s in labels)
    with pytest.raises(ValueError):
        with_split(df, "doc_id", {"a": 0.7, "b": 0.7})
    with pytest.raises(ValueError):
        with_split(df, "doc_id", {})


def test_split_leakage_matches_python_twin(spark):
    import hashlib

    from nadeefiler_spark.operators.decontam import split_leakage
    from nadeefiler_spark.operators.sample import threshold

    # 60 unique texts; ids 100..159 repeat the text of ids 0..59 so
    # duplicates cross split boundaries wherever the hash puts them
    rows = [(i, f"alpha doc {i % 60} body words") for i in range(160)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fr = {"train": 0.7, "test": 0.3}
    got = {
        r["split"]: (r["n_docs"], r["n_leaked"])
        for r in split_leakage(df, "doc_id", "text", fr, salt=17).collect()
    }

    def fp(text):
        toks = sorted(set(text.lower().split()))
        return hashlib.md5(" ".join(toks).encode()).hexdigest()

    t1, t2 = threshold(0.7), threshold(min(1.0, 0.7 + 0.3))
    assign = {}
    for i, text in rows:
        k = _py_key(i)
        assign[i] = ("train" if k < t1 else "test" if k < t2 else None, fp(text))
    train_fps = {}
    for s, f in assign.values():
        if s == "train":
            train_fps[f] = train_fps.get(f, 0) + 1
    expected = {}
    for s, f in assign.values():
        if s is None:
            continue
        n, leaked = expected.get(s, (0, 0))
        hit = train_fps.get(f, 0) >= (2 if s == "train" else 1)
        expected[s] = (n + 1, leaked + int(hit))
    assert got == expected
    assert sum(v[1] for v in got.values()) > 0  # the plant actually leaks


def test_group_split_no_cross_split_content(spark):
    """with_split_by_group: equal group key => equal split, including
    planted exact duplicates spread across distant ids."""
    from nadeefiler_spark.functions import text as tx
    from nadeefiler_spark.operators.sample import with_split_by_group

    rows = [(i, f"unique doc {i} body {i * 7}") for i in range(200)]
    rows += [(1000 + i, f"unique doc {i} body {i * 7}") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = with_split_by_group(
        df, tx.fingerprint("text"), {"train": 0.8, "val": 0.1, "test": 0.1}
    ).withColumn("fp", tx.fingerprint("text"))
    per_fp = out.groupBy("fp").agg(
        F.count_distinct("split").alias("n_splits"),
        F.count(F.lit(1)).alias("n"),
    )
    assert per_fp.where("n_splits > 1").count() == 0
    assert per_fp.where("n >= 2").count() == 50  # the planted dup pairs
    # fractions sum to 1: nobody unassigned, all splits populated
    got = dict(out.groupBy("split").count().collect())
    assert None not in got and set(got) == {"train", "val", "test"}
    assert got["train"] > got["val"] and got["train"] > got["test"]


def test_group_split_key_matches_python_twin(spark):
    """group_split_key must equal the independent pure-Python
    reimplementation (hashlib md5, int arithmetic)."""
    import hashlib

    from nadeefiler_spark.operators.sample import group_split_key

    vals = ["", "abc", "fp-like-0123456789abcdef", "ünïcode"]
    df = spark.createDataFrame([(v,) for v in vals], "g string")
    got = {
        r["g"]: r["k"]
        for r in df.select("g", group_split_key("g", salt=17).alias("k")).collect()
    }
    for v in vals:
        h = int(hashlib.md5(v.encode()).hexdigest()[:15], 16)
        assert got[v] == ((h % 2**31) * 2654435761 + 17) % 2**31


def _es_python_twin(rows, k, salt=17):
    """Independent pure-Python A-ES selection: (id, weight) -> kept ids."""
    import math

    scored = []
    for i, w in rows:
        if w is None or w <= 0:
            continue
        key = ((i % 2**31) * 2654435761 + salt) % 2**31
        u = (key * 2 + 1) / 2**32
        scored.append((math.log(u) / w, -i))
    scored.sort(reverse=True)
    return {-neg_i for _, neg_i in scored[:k]}


def test_weighted_sample_matches_python_twin(spark):
    rows = [(i, float(1 + (i * 7) % 13)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = {
        r["doc_id"]
        for r in smp.weighted_sample(df, "doc_id", "w", k=25).collect()
    }
    assert got == _es_python_twin(rows, 25)


def test_weighted_sample_layout_independent(spark):
    rows = [(i, float(1 + i % 5)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    a = {r["doc_id"] for r in smp.weighted_sample(df, "doc_id", "w", 20).collect()}
    b = {
        r["doc_id"]
        for r in smp.weighted_sample(df.repartition(13), "doc_id", "w", 20).collect()
    }
    assert a == b


def test_weighted_sample_prefers_heavy_weights(spark):
    # 100 rows at weight 1000 vs 100 at weight 1/1000: u^(1/w) ~ 1 for
    # heavy rows, ~ 0 for light ones — the top-10 must be all heavy.
    rows = [(i, 1000.0) for i in range(100)] + [
        (i, 0.001) for i in range(100, 200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = smp.weighted_sample(df, "doc_id", "w", 10).collect()
    assert len(got) == 10 and all(r["doc_id"] < 100 for r in got)


def test_weighted_sample_strata_and_bad_weights(spark):
    rows = (
        [(i, "a", 1.0) for i in range(50)]
        + [(i + 100, "b", 1.0) for i in range(3)]
        + [(200, "a", None), (201, "a", 0.0), (202, "a", -2.0)]
    )
    df = spark.createDataFrame(rows, "doc_id long, src string, w double")
    got = smp.weighted_sample(df, "doc_id", "w", 5, strata_col="src").collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r["src"], set()).add(r["doc_id"])
    # k per stratum; short stratum keeps all eligible rows; NULL/<=0 dropped
    assert len(by_src["a"]) == 5 and by_src["b"] == {100, 101, 102}
    assert not by_src["a"] & {200, 201, 202}
    ranks = sorted(r["es_rank"] for r in got if r["src"] == "a")
    assert ranks == [1, 2, 3, 4, 5]


def test_neyman_allocation_hand_math(spark):
    from nadeefiler_spark.operators.sample import neyman_allocation

    # N*s: a=100*2=200, b=300*1=300, c=100*0=0 -> weights .4, .6, 0
    stats = spark.createDataFrame(
        [("a", 100, 2.0), ("b", 300, 1.0), ("c", 100, 0.0)],
        ["g", "n", "sd"],
    )
    got = {r["g"]: r for r in
           neyman_allocation(stats, ["g"], "n", "sd", budget=99).collect()}
    # raw: a=39.6, b=59.4, c=0 -> floors 39+59=98, leftover 1 to the
    # largest fraction (a: .6 > b: .4)
    assert got["a"]["alloc"] == 40 and got["b"]["alloc"] == 59
    assert got["c"]["alloc"] == 0
    assert sum(r["alloc"] for r in got.values()) == 99
    assert got["a"]["weight"] == pytest.approx(0.4, abs=1e-9)


def test_neyman_allocation_zero_spread_and_cap(spark):
    from nadeefiler_spark.operators.sample import neyman_allocation

    # all spreads zero -> proportional-to-N fallback
    stats = spark.createDataFrame(
        [("a", 10, 0.0), ("b", 30, 0.0)], ["g", "n", "sd"]
    )
    got = {r["g"]: r["alloc"] for r in
           neyman_allocation(stats, ["g"], "n", "sd", budget=8).collect()}
    assert got == {"a": 2, "b": 6}
    # allocation capped at the stratum size; capped remainder NOT
    # silently redistributed (sum < budget, caller decides)
    # N*s: tiny=3*100=300, big=100*1=100 -> weights .75/.25 ->
    # raw 75/25; tiny caps at its 3 rows, the capped 72 is NOT
    # redistributed (sum < budget, caller decides)
    stats2 = spark.createDataFrame(
        [("tiny", 3, 100.0), ("big", 100, 1.0)], ["g", "n", "sd"]
    )
    got2 = {r["g"]: r["alloc"] for r in
            neyman_allocation(stats2, ["g"], "n", "sd", budget=100).collect()}
    assert got2 == {"tiny": 3, "big": 25}
    assert sum(got2.values()) < 100
