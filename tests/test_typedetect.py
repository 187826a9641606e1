"""Detector fidelity vs the reference cascade (SURVEY §2.6 F1-F4, §5.1)."""

from collections import Counter, defaultdict

import pytest

from nadeefiler_spark import datagen, typedetect
from nadeefiler_spark.functions import detectors as D

EDGE_CASES = [
    ("true", "boolean"), ("FALSE", "boolean"), ("T", "boolean"), ("n", "boolean"),
    ("1", "boolean"), ("0", "boolean"),           # boolean beats number
    ("5", "integer"), ("+5", "integer"), ("-17", "integer"), ("007", "integer"),
    ("1e2", "integer"), ("12E3", "integer"),       # exp >= frac len -> integer
    ("5.", "integer"),                             # empty fraction -> integer
    ("3.14", "float"), ("-0.5", "float"), ("3.0", "float"),
    ("1.23e1", "float"), ("2.5E-3", "float"),      # exp < frac len -> float
    ("15%", "percent"), ("3.5%", "percent"), ("-2%", "percent"),
    ("1987", "integer"),                           # number beats date (bare year)
    ("2/29/2000", "date"), ("4/30/1999", "date"), ("02/9/2001", "date"),
    ("12/31/2024", "date"), ("1/1/1900", "date"),
    ("13/1/2000", "string"),                       # month 13 invalid
    ("2/30/2000", "string"),                       # Feb 30 invalid
    ("4/31/1999", "string"),                       # Apr 31 invalid
    ("", "null"), (None, "null"),
    ("alpha", "string"), ("12ab", "string"), ("N/A", "string"), ("-", "string"),
]


@pytest.mark.parametrize("value,expected", EDGE_CASES)
def test_detect_type_py_edges(value, expected):
    assert D.detect_type_py(value) == expected


def test_spark_detector_matches_python_twin(spark):
    values = [v for v, _ in EDGE_CASES]
    df = spark.createDataFrame([(v,) for v in values], "value string")
    got = {
        r["value"]: r["t"]
        for r in df.select("value", D.detect_type(df["value"]).alias("t")).collect()
    }
    for v, expected in EDGE_CASES:
        if v is not None:
            assert got[v] == expected, v


def _python_oracle(pdf):
    """Reference-semantics scores + histograms in plain Python."""
    scores = defaultdict(Counter)
    hists = defaultdict(Counter)
    for col in pdf.columns:
        for v in pdf[col]:
            t = D.detect_type_py(v)
            scores[col][t] += 1
            if t != "null":
                hists[(t, col)][v] += 1
    return scores, hists


def test_type_scores_match_reference_semantics(spark):
    pdf = datagen.tuples_typed_pdf(400)
    scores_py, _ = _python_oracle(pdf)
    df = spark.createDataFrame(pdf)
    got = typedetect.type_scores(df).toPandas().set_index("key")
    for col in pdf.columns:
        for t in D.TYPE_LABELS:
            assert int(got.loc[col][t]) == scores_py[col].get(t, 0), (col, t)


def test_type_histograms_match_reference_semantics(spark):
    pdf = datagen.tuples_typed_pdf(400)
    _, hists_py = _python_oracle(pdf)
    df = spark.createDataFrame(pdf)
    got = typedetect.type_histograms(df).toPandas()
    assert "null" not in set(got["histogram"])  # null rows excluded
    got_map = {
        (h, k, v): c
        for h, k, v, c in zip(got["histogram"], got["key"], got["value"], got["count"])
    }
    expect = {
        (t, col, v): c
        for (t, col), counter in hists_py.items()
        for v, c in counter.items()
    }
    assert got_map == expect
    # numeric parsing: value_num is parseFloat semantics ('%' stripped)
    pct = got[got["histogram"] == "percent"]
    for r in pct.itertuples():
        assert abs(r.value_num - float(r.value.rstrip("%"))) < 1e-12


def test_fd_mining_planted(spark):
    """Planted FDs: a -> a_fn holds (pure function), noisy pair is an
    approximate FD at 5% tolerance but not exact."""
    from nadeefiler_spark import fd
    import pyspark.sql.functions as F

    rows = [(i % 40, (i % 40) * 7, "g" if i % 97 else "h", i) for i in range(500)]
    df = spark.createDataFrame(rows, "a long, a_fn long, noisy string, uid long")
    got = fd.mine_fds(
        df, ["a", "a_fn", "noisy", "uid"], max_ndv_frac=0.5
    ).toPandas().set_index(["lhs", "rhs"])
    # uid has NDV == n -> never an LHS (bounded-cardinality guard)
    assert "uid" not in set(got.index.get_level_values("lhs"))
    assert bool(got.loc[("a", "a_fn")]["holds"])
    assert bool(got.loc[("a_fn", "a")]["holds"])  # *7 is injective here
    assert not bool(got.loc[("a", "uid")]["holds"])
    assert not bool(got.loc[("a", "noisy")]["holds"])  # i%97 noise rows
    # approximate tolerance: noisy violations are rare
    approx = fd.mine_fds(
        df, ["a", "noisy"], lhs_cols=["a"], max_violation_rate=0.2
    ).toPandas().set_index(["lhs", "rhs"])
    assert bool(approx.loc[("a", "noisy")]["holds"])


def test_fd_mining_empty_input(spark):
    """Empty input with explicit lhs_cols: violating_groups must be 0
    (not NULL — F.sum over zero groups) and holds true, matching the SQL
    twin's COALESCE semantics."""
    from nadeefiler_spark import fd

    df = spark.createDataFrame([], "a long, b long")
    got = fd.mine_fds(df, ["a", "b"], lhs_cols=["a"]).toPandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert r["n_groups"] == 0 and r["violating_groups"] == 0
    assert bool(r["holds"])
