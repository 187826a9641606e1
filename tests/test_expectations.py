"""Expectation-suite verifier: verdict semantics + the one-scan plan."""

from pyspark.sql import functions as F

from nadeefiler_spark import expectations as E


def _by_check(df):
    return {r["check"]: r for r in df.collect()}


def test_verify_global_pass_fail(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "b", None)],
        "id long, cat string, x double",
    )
    out = E.verify(
        df,
        [
            E.size_between(2, 5),
            E.completeness("x", 0.9),          # 2/3 -> fail
            E.uniqueness("id"),
            E.uniqueness("cat"),               # 2/3 -> fail
            E.mean_between("x", 10.0, 20.0),   # 15 -> pass
            E.min_at_least("x", 10.0),
            E.max_at_most("x", 15.0),          # 20 -> fail
            E.values_in("cat", ["a", "b"]),
            E.matches_regex("cat", "^[ab]$"),
            E.distinctness("cat", 2, 2),
        ],
    )
    v = _by_check(out)
    assert len(v) == 10 and out.columns == [
        "check", "column", "value", "lo", "hi", "passed",
    ]
    assert v["size"]["passed"] and v["size"]["value"] == 3.0
    assert not v["completeness(x)"]["passed"]
    assert v["uniqueness(id)"]["passed"]
    assert not v["uniqueness(cat)"]["passed"]
    assert v["mean(x)"]["passed"] and v["mean(x)"]["value"] == 15.0
    assert not v["max(x)"]["passed"]
    assert v["values_in(cat)"]["passed"]
    assert v["matches(cat)"]["passed"]
    assert v["distinctness(cat)"]["passed"]


def test_verify_null_metric_fails_not_vanishes(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "id long, x double")
    v = _by_check(E.verify(df, [E.mean_between("x", 0.0, 1.0)]))
    row = v["mean(x)"]
    assert row["value"] is None and row["passed"] is False


def test_verify_empty_input_global(spark):
    df = spark.createDataFrame([], "id long, x double")
    v = _by_check(E.verify(df, [E.size_between(1), E.mean_between("x", 0, 1)]))
    assert v["size"]["value"] == 0.0 and not v["size"]["passed"]
    assert v["mean(x)"]["passed"] is False


def test_verify_by_group_verdict_shape(spark):
    df = spark.createDataFrame(
        [("p1", 1, 5.0), ("p1", 2, 7.0), ("p2", 3, 100.0)],
        "part string, id long, x double",
    )
    out = E.verify(
        df, [E.size_between(2), E.max_at_most("x", 10.0)], by=["part"]
    )
    rows = {(r["part"], r["check"]): r for r in out.collect()}
    assert len(rows) == 4
    assert rows[("p1", "size")]["passed"]
    assert not rows[("p2", "size")]["passed"]
    assert rows[("p1", "max(x)")]["passed"]
    assert not rows[("p2", "max(x)")]["passed"]


def test_verify_is_one_scan(spark):
    """N checks must compile to ONE scan of the input — every metric is
    an aggregate expression in the same agg; no per-check jobs."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 5).alias("g"), F.rand(7).alias("x")
    )
    out = E.verify(
        df,
        [E.size_between(1), E.completeness("x"), E.mean_between("x", 0, 1)],
        by=["g"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.lower().count("scan existingrdd") + plan.count("Scan") <= 2  # one scan (+AQE echo)


def test_schema_conformance(spark):
    df = spark.createDataFrame(
        [(1, "a", 2.0)], "clip_id long, codec string, x double"
    )
    expected = {
        "clip_id": "string",       # wrong type (actual bigint)
        "codec": "string",         # ok
        "transcript": "string",    # missing
    }
    out = {r["check"]: r for r in
           E.schema_conformance(df, expected, allow_extra=False).collect()}
    assert out["column_present(clip_id)"]["passed"]
    assert not out["column_type(clip_id)"]["passed"]
    assert out["column_type(clip_id)"]["actual"] == "bigint"
    assert out["column_type(codec)"]["passed"]
    assert not out["column_present(transcript)"]["passed"]
    assert not out["column_type(transcript)"]["passed"]
    row = out["no_extra_columns"]
    assert not row["passed"] and row["actual"] == "x"
    # widening tolerated by default
    ok = E.schema_conformance(df, {"codec": "string"})
    assert all(r["passed"] for r in ok.collect())


def test_schema_conformance_input_hint_shape(spark):
    """The BASELINE.json input_hint contract passes against the datagen
    clips schema — the check a producer would run pre-ingest."""
    from nadeefiler_spark import datagen

    clips = datagen.clips_df(spark, datagen.GenConfig(n_rows=5))
    hint = {
        "clip_id": "string", "bytes": "binary", "sr_hz": "int",
        "dur_ms": "int", "codec": "string", "transcript": "string",
    }
    assert all(r["passed"] for r in E.schema_conformance(clips, hint).collect())


def test_uniqueness_approx_variant(spark):
    df = spark.range(1000).select(F.col("id"))
    v = _by_check(E.verify(df, [E.uniqueness("id", 0.9, exact=False)]))
    assert v["uniqueness(id)"]["passed"]


def test_suggest_checks_from_planted_profile(spark):
    """Each suggestion class fires on exactly the columns built to
    trigger it, and the pooled math is right."""
    rows = [
        # uid: unique in both parts; no nulls; numeric 1..8
        ("a", "uid", 4, 0, 4, "1", "4"),
        ("b", "uid", 4, 0, 4, "5", "8"),
        # cat: low cardinality, some nulls over tolerance (2/8 = 25%)
        ("a", "cat", 4, 2, 2, "x", "y"),
        ("b", "cat", 4, 0, 2, "x", "y"),
        # txt: high cardinality strings, 1 null (12.5% > 5%)
        ("a", "txt", 4, 1, 3, "aaa", "zzz"),
        ("b", "txt", 4, 0, 30, "aaa", "zzz"),
    ]
    prof = spark.createDataFrame(
        rows,
        "part string, key string, n_rows long, n_nulls long, ndv long, "
        "min string, max string",
    )
    from nadeefiler_spark.expectations import suggest_checks

    got = {
        (r["key"], r["check"]): (r["lo"], r["hi"])
        for r in suggest_checks(prof, null_tolerance=0.05, low_card_max=5).collect()
    }
    assert got[("uid", "completeness")] == (1.0, 1.0)
    assert got[("uid", "uniqueness")] == (1.0, 1.0)
    assert got[("uid", "range")] == (1.0, 8.0)
    assert ("uid", "low_cardinality") not in got  # sum_ndv 8 > 5
    assert got[("cat", "low_cardinality")] == (0.0, 4.0)
    assert ("cat", "completeness") not in got  # 25% nulls
    assert ("cat", "uniqueness") not in got
    assert ("cat", "range") not in got  # strings
    assert set(k[0] for k in got) == {"uid", "cat"}  # txt suggests nothing


def test_suggested_suite_passes_on_source_data(spark):
    """The loop closes: suggestions derived from a profile must verify
    green against the very data that produced the profile."""
    from nadeefiler_spark import profiler
    from nadeefiler_spark.expectations import (
        completeness,
        max_at_most,
        min_at_least,
        suggest_checks,
        uniqueness,
        verify,
    )

    df = spark.createDataFrame(
        [(i, f"v{i % 3}", "p" if i < 50 else "q") for i in range(100)],
        "id long, cat string, part string",
    )
    prof = profiler.profile_summary(
        df.select("id", "cat", "part"),
        profiler.ProfileConfig(exact_ndv=True, part_col="part"),
    ).select("part", "key", "n_rows", "n_nulls", "ndv", "min", "max")
    sugg = {
        (r["key"], r["check"]): r
        for r in suggest_checks(prof).collect()
    }
    checks = []
    for (key, kind), r in sugg.items():
        if kind == "completeness":
            checks.append(completeness(key, r["lo"]))
        elif kind == "uniqueness":
            checks.append(uniqueness(key))
        elif kind == "range":
            checks += [min_at_least(key, r["lo"]), max_at_most(key, r["hi"])]
    assert ("id", "uniqueness") in sugg and checks
    verdicts = verify(df, checks)
    assert all(r["passed"] for r in verdicts.collect())


def test_suite_regressions_flags_each_break(spark):
    """Every check class regresses on exactly the planted break, with
    the learned bound and release-B observation carried through."""
    schema = (
        "part string, key string, n_rows long, n_nulls long, ndv long, "
        "min string, max string"
    )
    old = spark.createDataFrame(
        [
            ("a", "uid", 4, 0, 4, "1", "4"),
            ("b", "uid", 4, 0, 4, "5", "8"),
            ("a", "cat", 4, 0, 2, "x", "y"),
            ("b", "cat", 4, 0, 2, "x", "y"),
            ("a", "gone", 4, 0, 2, "p", "q"),
        ],
        schema,
    )
    new = spark.createDataFrame(
        [
            # uid: now has a null (completeness break), a duplicate in
            # part a (uniqueness break), and max escaped to 9 (range hi)
            ("a", "uid", 4, 1, 2, "1", "4"),
            ("b", "uid", 4, 0, 4, "5", "9"),
            # cat: a third category appears in both parts
            ("a", "cat", 4, 0, 3, "x", "z"),
            ("b", "cat", 4, 0, 3, "x", "z"),
            # gone: column dropped from release B entirely
        ],
        schema,
    )
    from nadeefiler_spark.expectations import suite_regressions

    got = {
        (r["key"], r["check"]): (r["lo"], r["hi"], r["observed_lo"], r["observed_hi"])
        for r in suite_regressions(old, new, null_tolerance=0.05,
                                   low_card_max=5).collect()
    }
    assert got[("uid", "completeness")] == (1.0, 1.0, 0.875, None)
    # pooled new ndv/non-null = 6/7
    lo, hi, olo, ohi = got[("uid", "uniqueness")]
    assert (lo, hi, ohi) == (1.0, 1.0, None) and abs(olo - round(6 / 7, 6)) < 1e-12
    assert got[("uid", "range")] == (1.0, 8.0, 1.0, 9.0)
    assert got[("cat", "low_cardinality")] == (0.0, 4.0, None, 6.0)
    # dropped column: every learned check fails with NULL observations
    # (gone's min/max are strings, so no range check was learned; its
    # single old partition had ndv 2, so the low-card bound is 2)
    assert got[("gone", "completeness")] == (1.0, 1.0, None, None)
    assert got[("gone", "low_cardinality")] == (0.0, 2.0, None, None)
    # nothing else regressed (cat completeness still 1.0, etc.)
    assert set(got) == {
        ("uid", "completeness"), ("uid", "uniqueness"), ("uid", "range"),
        ("gone", "completeness"), ("gone", "low_cardinality"),
        ("cat", "low_cardinality"),
    }
