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
