"""Tests for ingestion sources (SURVEY §2.1 S1/S8)."""

from __future__ import annotations

from pyspark.sql import types as T

from nadeefiler_spark import sources


CSV = """id,name,score
1,alpha,10
2,beta,
3,gamma,7.5
"""

TSV = (
    "<Alpha_Centauri>\twikicat_Stars\n"
    "<Alpha_Centauri>\twordnet_star\n"
    "<beta_test>\twikicat_Software_testing\n"
)


def test_read_tuples_csv_all_strings(spark, tmp_path):
    p = tmp_path / "up.csv"
    p.write_text(CSV)
    df = sources.read_tuples_csv(spark, str(p))
    assert df.columns == ["id", "name", "score"]
    assert all(isinstance(f.dataType, T.StringType) for f in df.schema.fields)
    rows = {r["id"]: r for r in df.collect()}
    assert rows["2"]["score"] is None  # empty cell -> null string
    assert rows["3"]["score"] == "7.5"


def test_read_tuples_csv_order(spark, tmp_path):
    p = tmp_path / "ordered.csv"
    p.write_text(CSV)
    df = sources.read_tuples_csv(spark, str(p), with_order=True)
    got = [r["id"] for r in df.orderBy("__order").collect()]
    assert got == ["1", "2", "3"]


def test_dataset_counts(spark, tmp_path):
    (tmp_path / "a.csv").write_text(CSV)
    (tmp_path / "b.csv").write_text("id,name,score\n9,zeta,1\n")
    df = sources.read_tuples_csv(spark, str(tmp_path))
    counts = {r["dataset"].rsplit("/", 1)[-1]: r["count"]
              for r in sources.dataset_counts(df).collect()}
    assert counts == {"a.csv": 3, "b.csv": 1}


def test_import_kb_tsv(spark, tmp_path):
    p = tmp_path / "kb.tsv"
    p.write_text(TSV)
    kb = {r["subject"]: r["objects"] for r in sources.import_kb_tsv(spark, str(p)).collect()}
    assert kb == {
        "alpha centauri": ["wikicat_Stars", "wordnet_star"],
        "beta test": ["wikicat_Software_testing"],
    }


def test_pretouch_opts_env_gated(monkeypatch):
    """SPARK_GRAFT_PRETOUCH=1 adds the measured allocation-stability JVM
    options (round-3 cluster A/B) sized to the driver heap; default off."""
    from nadeefiler_spark.session import _pretouch_opts

    monkeypatch.delenv("SPARK_GRAFT_PRETOUCH", raising=False)
    assert _pretouch_opts() == ""
    monkeypatch.setenv("SPARK_GRAFT_PRETOUCH", "1")
    monkeypatch.setenv("SPARK_GRAFT_DRIVER_MEM", "8g")
    got = _pretouch_opts()
    assert "-Xms8g" in got and "-XX:+AlwaysPreTouch" in got
    assert "-XX:+UseTransparentHugePages" in got
