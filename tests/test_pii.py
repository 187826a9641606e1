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
