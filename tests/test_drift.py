"""KS/PSI drift math vs numpy/scipy-style references computed by hand."""

import math

import numpy as np
import pytest

from nadeefiler_spark import drift


def _hist_df(spark, rows):
    return spark.createDataFrame(
        rows, "part string, key string, kind string, bin string, count bigint"
    )


def _baseline_df(spark, rows):
    return spark.createDataFrame(rows, "key string, kind string, bin string, count bigint")


def _psi_py(p_counts, q_counts, eps=drift.EPS):
    bins = sorted(set(p_counts) | set(q_counts))
    tp, tq = sum(p_counts.values()), sum(q_counts.values())
    psi = 0.0
    for b in bins:
        p = max(p_counts.get(b, 0) / tp, eps)
        q = max(q_counts.get(b, 0) / tq, eps)
        psi += (p - q) * math.log(p / q)
    return psi


def _ks_py(p_counts, q_counts):
    bins = sorted(set(p_counts) | set(q_counts), key=float)
    tp, tq = sum(p_counts.values()), sum(q_counts.values())
    cp = cq = 0.0
    d = 0.0
    for b in bins:
        cp += p_counts.get(b, 0) / tp
        cq += q_counts.get(b, 0) / tq
        d = max(d, abs(cp - cq))
    return d


def test_drift_metrics_match_hand_math(spark):
    p_counts = {"0": 50, "100": 30, "200": 20}
    q_counts = {"0": 20, "100": 30, "200": 40, "300": 10}
    hist = _hist_df(spark, [("a", "dur_ms", "bucket", b, c) for b, c in p_counts.items()])
    base = _baseline_df(spark, [("dur_ms", "bucket", b, c) for b, c in q_counts.items()])
    got = drift.drift_metrics(hist, base).collect()[0]
    assert got["part"] == "a" and got["key"] == "dur_ms"
    assert got["psi"] == pytest.approx(_psi_py(p_counts, q_counts), rel=1e-9)
    assert got["ks_d"] == pytest.approx(_ks_py(p_counts, q_counts), rel=1e-9)


def test_identical_distributions_have_zero_drift(spark):
    counts = {"0": 10, "100": 20, "200": 30}
    hist = _hist_df(spark, [("a", "k", "bucket", b, c) for b, c in counts.items()])
    base = _baseline_df(spark, [("k", "bucket", b, c * 7) for b, c in counts.items()])
    got = drift.drift_metrics(hist, base).collect()[0]
    assert got["psi"] == pytest.approx(0.0, abs=1e-9)
    assert got["ks_d"] == pytest.approx(0.0, abs=1e-9)


def test_drift_rule_flags_shifted_partition(spark):
    rng = np.random.default_rng(7)
    bins = ["0", "100", "200", "300", "400"]
    clean = [0.30, 0.30, 0.20, 0.10, 0.10]
    shifted = [0.05, 0.10, 0.15, 0.30, 0.40]
    rows = []
    for part, probs in [("p1", clean), ("p2", clean), ("p3", shifted)]:
        cnts = rng.multinomial(4000, probs)
        rows += [(part, "dur_ms", "bucket", b, int(c)) for b, c in zip(bins, cnts)]
    hist = _hist_df(spark, rows)
    from nadeefiler_spark.rules.base import RuleContext

    rule = drift.DriftRule()
    ctx = RuleContext(spark=spark, clips=hist, profile_hist=hist)
    v = rule.violations(ctx).toPandas()
    assert "p3" in set(v["part"])          # shifted partition flagged
    assert set(v["part"]) <= {"p3"}        # unshifted ones are not


def test_drift_rule_with_external_baseline(spark):
    hist = _hist_df(spark, [("a", "k", "bucket", "0", 100), ("a", "k", "bucket", "100", 100)])
    # baseline with part column (a prior run's profile_hist) gets aggregated
    base = _hist_df(
        spark,
        [("x", "k", "bucket", "0", 10), ("y", "k", "bucket", "0", 10)],
    )
    from nadeefiler_spark.rules.base import RuleContext

    rule = drift.DriftRule()
    ctx = RuleContext(spark=spark, clips=hist, profile_hist=hist, baseline_hist=base)
    v = rule.violations(ctx).toPandas()
    assert list(v["part"]) == ["a"]  # 50/50 vs 100/0 drifts hard


def test_profile_diff_statuses_and_metrics(spark):
    from nadeefiler_spark.drift import profile_diff
    from nadeefiler_spark.profiler import SUMMARY_SCHEMA

    old = spark.createDataFrame(
        [
            ("*", "num", 100, 10, 50, "1.0", "9.0", 5.0, 2.0, None),
            ("*", "gone", 100, 0, 3, "a", "c", None, None, 1.0),
            ("*", "const", 100, 0, 1, "k", "k", 7.0, 0.0, None),
        ],
        SUMMARY_SCHEMA,
    )
    new = spark.createDataFrame(
        [
            ("*", "num", 200, 40, 150, "1.0", "12.0", 6.0, 3.0, None),
            ("*", "fresh", 200, 0, 2, "x", "y", None, None, 1.0),
            ("*", "const", 200, 0, 1, "k", "k", 9.0, 0.0, None),
        ],
        SUMMARY_SCHEMA,
    )
    got = {r["key"]: r for r in profile_diff(old, new).collect()}
    num = got["num"]
    assert num["status"] == "common"
    assert num["null_rate_delta"] == 0.1          # 0.2 - 0.1
    assert num["ndv_ratio"] == 3.0
    assert num["mean_shift"] == 0.5               # (6-5)/2
    assert num["minmax_changed"] is True          # max 9.0 -> 12.0
    assert got["gone"]["status"] == "dropped"
    assert got["gone"]["n_rows_new"] is None
    assert got["gone"]["minmax_changed"] is False  # nothing to compare
    assert got["fresh"]["status"] == "added"
    # zero old sigma -> mean shift undefined, not infinite
    const = got["const"]
    assert const["mean_shift"] is None and const["minmax_changed"] is False


def test_snapshot_diff_planted(spark):
    from nadeefiler_spark.drift import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", None), (2, "b", "x"), (3, "c", "y"), (4, None, "z")],
        "id long, v string, w string",
    )
    new = spark.createDataFrame(
        [(2, "b", "x"),          # unchanged -> omitted
         (3, "c2", "y"),         # changed value
         (4, "now", "z"),        # NULL -> value edit must be detected
         (5, "new", None)],      # added
        "id long, v string, w string",
    )
    got = {r["id"]: r["change"] for r in snapshot_diff(old, new, "id").collect()}
    assert got == {1: "removed", 3: "changed", 4: "changed", 5: "added"}


def test_snapshot_diff_compare_cols_subset(spark):
    from nadeefiler_spark.drift import snapshot_diff

    old = spark.createDataFrame([(1, "a", "meta1")], "id long, v string, m string")
    new = spark.createDataFrame([(1, "a", "meta2")], "id long, v string, m string")
    # metadata column excluded -> no diff
    assert snapshot_diff(old, new, "id", compare_cols=["v"]).count() == 0
    # included -> changed
    got = snapshot_diff(old, new, "id").collect()
    assert [(r["id"], r["change"]) for r in got] == [(1, "changed")]


def test_snapshot_diff_separator_ambiguity(spark):
    from nadeefiler_spark.drift import snapshot_diff

    # ("ab", "c") vs ("a", "bc"): naive concat would collide
    old = spark.createDataFrame([(1, "ab", "c")], "id long, v string, w string")
    new = spark.createDataFrame([(1, "a", "bc")], "id long, v string, w string")
    got = snapshot_diff(old, new, "id").collect()
    assert [(r["id"], r["change"]) for r in got] == [(1, "changed")]


def test_chi2_drift_known_table(spark):
    """Hand-computed 2x2 two-sample chi-square: part A = (30, 10),
    baseline = (20, 20): pooled p = (50/80, 30/80); X^2 by hand."""
    from nadeefiler_spark.drift import chi2_drift

    hist = spark.createDataFrame(
        [("A", "k", "value", "x", 30), ("A", "k", "value", "y", 10)],
        "part string, key string, kind string, bin string, count long",
    )
    base = spark.createDataFrame(
        [("k", "value", "x", 20), ("k", "value", "y", 20)],
        "key string, kind string, bin string, count long",
    )
    r = chi2_drift(hist, base).collect()[0]
    n_p, n_q = 40, 40
    expected = 0.0
    for o, q, tot in ((30, 20, 50), (10, 20, 30)):
        pool = tot / 80
        expected += (o - n_p * pool) ** 2 / (n_p * pool)
        expected += (q - n_q * pool) ** 2 / (n_q * pool)
    assert r["chi2"] == round(expected, 6)
    assert r["dof"] == 1
    assert (r["n_p"], r["n_q"]) == (40, 40)


def test_chi2_drift_identical_and_disjoint_bins(spark):
    from nadeefiler_spark.drift import chi2_drift

    # identical distributions -> chi2 == 0
    hist = spark.createDataFrame(
        [("A", "k", "value", "x", 10), ("A", "k", "value", "y", 30)],
        "part string, key string, kind string, bin string, count long",
    )
    base = spark.createDataFrame(
        [("k", "value", "x", 10), ("k", "value", "y", 30)],
        "key string, kind string, bin string, count long",
    )
    assert chi2_drift(hist, base).collect()[0]["chi2"] == 0.0
    # bin present only in the part (absent from baseline) still counts
    hist2 = spark.createDataFrame(
        [("A", "k", "value", "z", 5)],
        "part string, key string, kind string, bin string, count long",
    )
    r = chi2_drift(hist2, base).collect()[0]
    assert r["dof"] == 2 and r["chi2"] > 0


class TestEmbeddingDrift:
    """embedding_drift vs a numpy twin on a small planted corpus."""

    def _df(self, spark):
        rows = []
        # groups a and b cluster near two different base vectors; c is a
        # copy of a shifted by +2.0 on every dim (a centroid mover).
        for g, base, delta in (("a", 1.0, 0.0), ("b", -1.0, 0.0), ("c", 1.0, 2.0)):
            for i in range(5):
                vec = [float(base + delta + 0.01 * i * (d + 1)) for d in range(4)]
                rows.append((g, vec))
        rows.append(("a", None))  # null vector -> n_bad
        rows.append(("b", [1.0, 2.0]))  # truncated -> n_bad
        return spark.createDataFrame(rows, "grp string, v array<float>"), rows

    def test_matches_numpy_twin(self, spark):
        df, rows = self._df(spark)
        out = {
            r["grp"]: r
            for r in drift.embedding_drift(df, "v", "grp", dim=4).collect()
        }
        good = {}
        for g, vec in rows:
            if vec is not None and len(vec) == 4:
                good.setdefault(g, []).append(np.array(vec, dtype=np.float32))
        gmean = np.mean(
            np.stack([v for vs in good.values() for v in vs]).astype("float64"),
            axis=0,
        )
        for g, vs in good.items():
            cent = np.mean(np.stack(vs).astype("float64"), axis=0)
            r = out[g]
            assert r["n_vecs"] == len(vs)
            assert r["centroid_norm"] == pytest.approx(
                float(np.linalg.norm(cent)), abs=1e-6
            )
            cos = float(
                cent @ gmean / (np.linalg.norm(cent) * np.linalg.norm(gmean))
            )
            assert r["global_cos"] == pytest.approx(cos, abs=1e-6)
            assert r["centroid_shift"] == pytest.approx(
                float(np.linalg.norm(cent - gmean)), abs=1e-6
            )
        assert out["a"]["n_bad"] == 1 and out["b"]["n_bad"] == 1
        # b points away from the global centroid; a and c align with it
        assert out["b"]["global_cos"] < 0 < out["a"]["global_cos"]
        # the shifted copy of a sits farther from the global centroid than a
        assert out["c"]["centroid_shift"] > out["a"]["centroid_shift"]

    def test_all_bad_group_dropped(self, spark):
        df = spark.createDataFrame(
            [("x", None), ("y", [1.0, 0.0])], "grp string, v array<float>"
        )
        rows = drift.embedding_drift(df, "v", "grp", dim=2).collect()
        assert [r["grp"] for r in rows] == ["y"]


def _w1_py(p_counts, q_counts, width):
    bins = sorted(set(p_counts) | set(q_counts), key=float)
    tp, tq = sum(p_counts.values()), sum(q_counts.values())
    cp = cq = 0.0
    w1 = 0.0
    for b in bins:
        cp += p_counts.get(b, 0) / tp
        cq += q_counts.get(b, 0) / tq
        w1 += abs(cp - cq) * width
    return w1


def test_wasserstein_matches_hand_math(spark):
    p_counts = {"0": 50, "100": 30, "200": 20}
    q_counts = {"0": 20, "100": 30, "200": 40, "300": 10}
    hist = _hist_df(spark, [("a", "dur_ms", "bucket", b, c) for b, c in p_counts.items()])
    base = _baseline_df(spark, [("dur_ms", "bucket", b, c) for b, c in q_counts.items()])
    got = drift.wasserstein_drift(hist, base, bin_width=100.0).collect()[0]
    assert got["part"] == "a" and got["key"] == "dur_ms"
    assert got["w1"] == pytest.approx(_w1_py(p_counts, q_counts, 100.0), abs=1e-6)


def test_wasserstein_one_bin_shift_equals_width(spark):
    # shifting ALL mass exactly one bin right moves W1 by one bin width —
    # while KS saturates at 1.0 for any complete separation
    hist = _hist_df(spark, [("a", "k", "bucket", "100", 10)])
    base = _baseline_df(spark, [("k", "bucket", "0", 10)])
    got = drift.wasserstein_drift(hist, base, bin_width=5.0).collect()[0]
    assert got["w1"] == pytest.approx(5.0, abs=1e-9)


def test_wasserstein_zero_for_identical_and_skips_value_kind(spark):
    hist = _hist_df(
        spark,
        [("a", "k", "bucket", "0", 10), ("a", "k", "bucket", "100", 30),
         ("a", "cat", "value", "x", 5)],
    )
    base = _baseline_df(
        spark,
        [("k", "bucket", "0", 20), ("k", "bucket", "100", 60),
         ("cat", "value", "x", 5)],
    )
    rows = drift.wasserstein_drift(hist, base, bin_width=5.0).collect()
    # categorical 'value' kind excluded: W1 needs an ordered space
    assert [r["kind"] for r in rows] == ["bucket"]
    assert rows[0]["w1"] == pytest.approx(0.0, abs=1e-9)


def test_drift_explain_ranks_and_sums_to_psi(spark):
    p_counts = {"0": 50, "100": 30, "200": 20}
    q_counts = {"0": 20, "100": 30, "200": 40, "300": 10}
    hist = _hist_df(spark, [("a", "k", "bucket", b, c) for b, c in p_counts.items()])
    base = _baseline_df(spark, [("k", "bucket", b, c) for b, c in q_counts.items()])
    rows = drift.drift_explain(hist, base, k=4).collect()
    assert [r["rank"] for r in rows] == [1, 2, 3, 4]
    # contributions are DESC and sum to the PSI drift_metrics reports
    contribs = [r["psi_contrib"] for r in rows]
    assert contribs == sorted(contribs, reverse=True)
    psi = drift.drift_metrics(hist, base).collect()[0]["psi"]
    assert sum(contribs) == pytest.approx(psi, abs=5e-6)
    # the top contributor is the VANISHED bin: '300' fell 10% -> EPS,
    # (1e-4 - 0.1)·ln(1e-4/0.1) ≈ 0.690 — bigger than the grown bin
    # '0' (20% -> 50%, (0.5-0.2)·ln(2.5) ≈ 0.275), which ranks second
    assert rows[0]["bin"] == "300"
    assert rows[0]["c_p"] == 0 and rows[0]["p"] == pytest.approx(drift.EPS)
    assert rows[0]["psi_contrib"] == pytest.approx(
        (drift.EPS - 0.1) * math.log(drift.EPS / 0.1), abs=1e-6
    )
    assert rows[1]["bin"] == "0"
    assert rows[1]["psi_contrib"] == pytest.approx(
        (0.5 - 0.2) * math.log(0.5 / 0.2), abs=1e-6
    )


def test_drift_explain_k_truncates(spark):
    counts = {"0": 10, "100": 20, "200": 30}
    hist = _hist_df(spark, [("a", "k", "bucket", b, c) for b, c in counts.items()])
    base = _baseline_df(spark, [("k", "bucket", b, c) for b, c in counts.items()])
    rows = drift.drift_explain(hist, base, k=2).collect()
    # no drift: still returns k rows, near-zero contributions
    assert len(rows) == 2
    assert all(abs(r["psi_contrib"]) < 1e-9 for r in rows)


def test_changepoint_scan_finds_planted_step(spark):
    from nadeefiler_spark.drift import changepoint_scan

    rows = []
    # series A: clean step 10 -> 30 after t=12 (split at t=12)
    for t in range(1, 25):
        rows.append(("A", t, 10.0 if t <= 12 else 30.0))
    # series B: constant — low score, split is the noise argmax
    for t in range(1, 25):
        rows.append(("B", t, 5.0))
    # series C: too short for any split (n <= 2*min_seg guard)
    rows += [("C", 1, 1.0), ("C", 2, 9.0), ("C", 3, 1.0)]
    df = spark.createDataFrame(rows, "k string, t int, v double")
    out = {
        r["k"]: r
        for r in changepoint_scan(df, "v", "t", ("k",), min_seg=2).collect()
    }
    a = out["A"]
    assert a["split_at"] == 12
    assert a["mean_before"] == 10.0 and a["mean_after"] == 30.0
    assert a["score"] > 100  # near-zero pooled sd -> huge score
    assert out["B"]["score"] < 1e-6  # constant series scores ~0
    assert "C" not in out  # n=3 < 2*min_seg: no admissible split


def test_changepoint_scan_over_engine_metric_history(spark):
    """the operational composition: the manifest's per-(part, stage)
    n_violations series is exactly the input shape."""
    from nadeefiler_spark.drift import changepoint_scan

    hist = [
        ("flac", "audio", run, 3 if run < 6 else 40) for run in range(10)
    ] + [
        ("opus", "audio", run, 7) for run in range(10)
    ]
    df = spark.createDataFrame(
        hist, "part string, stage string, run int, n_violations int"
    )
    out = {
        (r["part"], r["stage"]): r
        for r in changepoint_scan(
            df, "n_violations", "run", ("part", "stage")
        ).collect()
    }
    assert out[("flac", "audio")]["split_at"] == 5
    assert out[("flac", "audio")]["score"] > out[("opus", "audio")]["score"] * 100
