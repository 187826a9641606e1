"""PII detection/redaction functions and the PiiRule predicate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nadeefiler_spark.functions import pii


@pytest.fixture(scope="module")
def texts(spark):
    return spark.createDataFrame(
        [
            (0, "contact alice@example.com or bob@sub.example.org", "a"),
            (1, "ssn is 123-45-6789 and card 4111111111111111", "a"),
            (2, "call +1 (415) 555-0199 from 192.168.0.1", "b"),
            (3, "clean text, just words and 42", "b"),
            (4, None, "b"),
        ],
        "id int, body string, src string",
    )


def test_pii_counts_per_kind(spark, texts):
    row = texts.select(
        *[pii.pii_count("body", k).alias(k) for k in pii.PII_PATTERNS]
    ).collect()
    got = {r_i: {k: r[k] for k in pii.PII_PATTERNS} for r_i, r in enumerate(row)}
    assert got[0]["email"] == 2 and got[0]["ssn"] == 0
    assert got[1]["ssn"] == 1 and got[1]["card"] == 1
    assert got[2]["phone"] == 1 and got[2]["ipv4"] == 1
    assert all(v == 0 for v in got[3].values())
    assert all(v == 0 for v in got[4].values())  # NULL -> 0, not NULL


def test_plain_digit_runs_do_not_match_phone(spark):
    # phone requires the international '+' so ssn/card text isn't
    # triple-counted
    df = spark.createDataFrame([("123-45-6789 4111111111111111",)], "b string")
    r = df.select(
        pii.pii_count("b", "phone").alias("p"),
        pii.pii_count("b", "ssn").alias("s"),
        pii.pii_count("b", "card").alias("c"),
    ).collect()[0]
    assert (r["p"], r["s"], r["c"]) == (0, 1, 1)


def test_redact_replaces_with_kind_tokens(spark, texts):
    got = {
        r["id"]: r["red"]
        for r in texts.select("id", pii.redact("body").alias("red")).collect()
    }
    assert got[0] == "contact <EMAIL> or <EMAIL>"
    assert got[1] == "ssn is <SSN> and card <CARD>"
    assert got[2] == "call <PHONE> from <IPV4>"
    assert got[3] == "clean text, just words and 42"
    assert got[4] is None
    # kind-scoped redaction leaves other kinds alone
    one = texts.where("id = 1").select(
        pii.redact("body", kinds=["ssn"]).alias("red")
    ).collect()[0]["red"]
    assert one == "ssn is <SSN> and card 4111111111111111"


def test_scan_pii_groups(spark, texts):
    got = {
        r["src"]: r
        for r in pii.scan_pii(texts, "body", group_cols=["src"]).collect()
    }
    a, b = got["a"], got["b"]
    assert (a["n_rows"], a["n_email"], a["n_ssn"], a["n_card"]) == (2, 2, 1, 1)
    assert a["pii_rows"] == 2 and a["pii_rate"] == 1.0
    assert (b["n_rows"], b["n_phone"], b["n_ipv4"]) == (3, 1, 1)
    assert b["pii_rows"] == 1 and b["pii_rate"] == round(1 / 3, 6)


def test_pii_rule_predicate_and_detail(spark):
    from nadeefiler_spark.rules.base import RuleContext
    from nadeefiler_spark.rules.constraints import PiiRule

    clips = spark.createDataFrame(
        [
            ("c1", "P1", "email me: x@example.com ssn 123-45-6789"),
            ("c2", "P1", "all clean here"),
        ],
        "clip_id string, part string, transcript string",
    )
    ctx = RuleContext(spark=spark, clips=clips)
    rule = PiiRule()
    assert rule.name == "transcript_pii"
    out = rule.violations(ctx).collect()
    assert [r["clip_id"] for r in out] == ["c1"]
    assert out[0]["detail"] == "email,ssn"
    # predicate fast-path exists -> engine folds it into the shared scan
    assert rule.predicate(ctx) is not None


def test_job_cli_pii_flag(spark, clips_dir, tmp_path_factory):
    from pyspark.sql import functions as F

    from nadeefiler_spark import job

    # plant PII into one clip's transcript, keep everything else intact
    src = spark.read.parquet(f"{clips_dir}/clips")
    first = src.select("clip_id").orderBy("clip_id").first()["clip_id"]
    data = str(tmp_path_factory.mktemp("pii_clips"))
    src.withColumn(
        "transcript",
        F.when(
            F.col("clip_id") == first,
            F.concat(F.col("transcript"), F.lit(" mail me: leak@example.com")),
        ).otherwise(F.col("transcript")),
    ).write.mode("overwrite").parquet(f"{data}/clips")

    out = str(tmp_path_factory.mktemp("pii_out"))
    job.main(
        ["--clips", f"{data}/clips", "--out", out,
         "--no-audio", "--no-drift", "--pii"],
        spark=spark,
    )
    v = (
        spark.read.parquet(f"{out}/violations")
        .where("rule = 'transcript_pii'")
        .collect()
    )
    # the first clip_id may be one of datagen's planted duplicate ids,
    # so several rows (all with that id) can carry the planted PII
    assert v and {r["clip_id"] for r in v} == {first}
    assert all(r["detail"] == "email" for r in v)


def test_k_anonymity_flags_small_and_uniform_groups(spark):
    from nadeefiler_spark.functions.pii import k_anonymity

    rows = (
        # (zip, age) QI groups: g1 has 3 members (k-risky at k=4) with
        # diverse salaries; g2 has 5 members all sharing one salary
        # (l-risky at l=2); g3 has 5 members, 3 distinct salaries (safe)
        [("94110", 30, 100.0 + i) for i in range(3)]
        + [("94110", 40, 200.0) for _ in range(5)]
        + [("10001", 40, 300.0 + (i % 3)) for i in range(5)]
    )
    df = spark.createDataFrame(rows, ["zip", "age", "salary"])
    got = {
        (r["zip"], r["age"]): (
            r["group_size"], r["n_sensitive"], r["at_risk_k"], r["at_risk_l"]
        )
        for r in k_anonymity(
            df, ["zip", "age"], k=4, sensitive_col="salary", l=2
        ).collect()
    }
    assert got == {
        ("94110", 30): (3, 3, True, False),
        ("94110", 40): (5, 1, False, True),
    }


def test_k_anonymity_without_sensitive_and_null_qi(spark):
    from nadeefiler_spark.functions.pii import k_anonymity

    df = spark.createDataFrame(
        [("a",), ("a",), ("a",), ("b",), (None,)], ["qi"]
    )
    got = {
        r["qi"]: r["group_size"]
        for r in k_anonymity(df, ["qi"], k=3).collect()
    }
    # NULL is a QI group like any other; 'a' (3 rows) is safe at k=3
    assert got == {"b": 1, None: 1}
    assert "at_risk_l" not in k_anonymity(df, ["qi"], k=3).columns


def test_t_closeness_ordered_hand_math(spark):
    # global: uniform over {1,2,3} (m=3); each group holds one value.
    # Paper's rank-EMD = sum|CDF diff| / (m-1), hand-computed:
    #   A (all 1): (|1-1/3| + |1-2/3| + 0) / 2 = 1/2
    #   B (all 2): (1/3 + 1/3 + 0) / 2 = 1/3
    #   C (all 3): (1/3 + 2/3 + 0) / 2 = 1/2
    df = spark.createDataFrame(
        [("A", 1)] * 3 + [("B", 2)] * 3 + [("C", 3)] * 3, ["g", "v"]
    )
    got = {
        r["g"]: (r["group_size"], r["t_distance"], r["at_risk_t"])
        for r in pii.t_closeness(df, ["g"], "v", t=0.4).collect()
    }
    assert got == {
        "A": (3, 0.5, True),
        "B": (3, pytest.approx(1 / 3, abs=1e-6), False),
        "C": (3, 0.5, True),
    }


def test_t_closeness_categorical_tvd(spark):
    # TVD of (1,0,0) vs (1/3,1/3,1/3) = (2/3 + 1/3 + 1/3)/2 = 2/3
    df = spark.createDataFrame(
        [("A", "x")] * 3 + [("B", "y")] * 3 + [("C", "z")] * 3, ["g", "v"]
    )
    got = {
        r["g"]: r["t_distance"]
        for r in pii.t_closeness(df, ["g"], "v", ordered=False).collect()
    }
    # symmetric by construction: every group is TVD 2/3 from uniform
    assert got == {k: pytest.approx(2 / 3, abs=1e-6) for k in "ABC"}


def test_t_closeness_degenerate_and_null_bin(spark):
    # single distinct value -> m == 1 -> distance 0 (nothing can move)
    one = spark.createDataFrame([("A", 5), ("B", 5)], ["g", "v"])
    got = {r["g"]: r["t_distance"] for r in
           pii.t_closeness(one, ["g"], "v").collect()}
    assert got == {"A": 0.0, "B": 0.0}
    # NULL sensitive values form a real (last-sorted) bin: a group that
    # is ALL NULL vs a global half-NULL is distance > 0
    mixed = spark.createDataFrame(
        [("A", None), ("A", None), ("B", 1), ("B", 1)], ["g", "v"]
    )
    got = {r["g"]: r["t_distance"] for r in
           pii.t_closeness(mixed, ["g"], "v").collect()}
    # m=2 bins (1, NULL); A: p=(0,1) q=(.5,.5) -> |0-.5|/1 = 0.5
    assert got == {"A": 0.5, "B": 0.5}


def test_entropy_l_diversity_hand_math(spark):
    import math

    from nadeefiler_spark.functions.pii import entropy_l_diversity

    # A: 99x 'flu', 1x 'cancer' -> 2 distinct (distinct-l=2 passes)
    # but H = ln(100) - (99 ln 99)/100 = 0.05600... << ln(2): at risk
    # B: 50/50 -> H = ln(2) exactly: NOT at risk at l=2
    rows = [("A", "flu")] * 99 + [("A", "cancer")] + \
           [("B", "flu")] * 50 + [("B", "cancer")] * 50
    df = spark.createDataFrame(rows, ["g", "s"])
    got = {r["g"]: r for r in
           entropy_l_diversity(df, ["g"], "s", l=2.0).collect()}
    h_a = math.log(100) - (99 * math.log(99)) / 100
    assert got["A"]["entropy"] == pytest.approx(h_a, abs=1e-6)
    assert bool(got["A"]["at_risk"]) is True
    assert got["B"]["entropy"] == pytest.approx(math.log(2), abs=1e-6)
    assert bool(got["B"]["at_risk"]) is False
    assert got["A"]["n_sensitive"] == 2  # the distinct count that lies


def test_entropy_l_diversity_single_value_and_null(spark):
    from nadeefiler_spark.functions.pii import entropy_l_diversity

    df = spark.createDataFrame(
        [("A", "x"), ("A", "x"), ("B", None), ("B", "x")], ["g", "s"]
    )
    got = {r["g"]: r for r in
           entropy_l_diversity(df, ["g"], "s", l=2.0).collect()}
    assert got["A"]["entropy"] == 0.0 and bool(got["A"]["at_risk"])
    # NULL is a value class: B is 50/50 (x, NULL) -> ln 2
    assert got["B"]["n_sensitive"] == 2
    assert bool(got["B"]["at_risk"]) is False
