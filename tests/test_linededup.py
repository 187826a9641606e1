"""Corpus line dedup (operators/linededup.py): planted boilerplate,
within-doc repeats, order preservation, empty rewrites, keep_cols."""

from pyspark.sql import functions as F

from nadeefiler_spark.operators.linededup import dedup_lines, line_counts


def _df(spark):
    return spark.createDataFrame(
        [
            (1, "intro one\nCOOKIE BANNER\nbody a", "en"),
            (2, "COOKIE BANNER\nbody b", "en"),
            (3, "solo\nsolo", "de"),  # repeated WITHIN one doc only
            (4, "COOKIE BANNER", "en"),  # all boilerplate
            (5, "", "de"),  # empty text = one empty line
        ],
        "doc_id long, text string, lang string",
    )


def test_cross_doc_lines_removed_order_kept(spark):
    got = {
        r["doc_id"]: r
        for r in dedup_lines(_df(spark), "doc_id", "text").collect()
    }
    assert got[1]["clean_text"] == "intro one\nbody a"
    assert (got[1]["n_lines"], got[1]["n_removed"]) == (3, 1)
    assert got[2]["clean_text"] == "body b"
    # within-doc repetition is NOT boilerplate (n_docs == 1)
    assert got[3]["clean_text"] == "solo\nsolo"
    assert got[3]["n_removed"] == 0
    # fully-boilerplate doc survives as an empty rewrite, never dropped
    assert got[4]["clean_text"] == ""
    assert (got[4]["n_lines"], got[4]["n_removed"]) == (1, 1)
    # empty text: one empty line, unique to this doc, kept
    assert got[5]["clean_text"] == ""
    assert (got[5]["n_lines"], got[5]["n_removed"]) == (1, 0)


def test_min_docs_threshold_and_keep_cols(spark):
    out = dedup_lines(
        _df(spark), "doc_id", "text", min_docs=4, keep_cols=("lang",)
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    # banner is in 3 docs < 4: nothing removed anywhere
    assert all(r["n_removed"] == 0 for r in rows.values())
    assert rows[3]["lang"] == "de"


def test_line_counts_distinct_doc_semantics(spark):
    cnt = {
        r["n_docs"]: r["n_occurrences"]
        for r in line_counts(_df(spark), "doc_id", "text")
        .join(
            _df(spark).select(
                F.xxhash64(F.lit("COOKIE BANNER")).alias("line_hash")
            ).limit(1),
            "line_hash",
        )
        .collect()
    }
    assert cnt == {3: 3}


class TestDuplicateSpans:
    def test_shared_passage_detected(self, spark):
        from nadeefiler_spark.operators.spans import duplicate_spans

        shared = "the quick brown fox jumps over the lazy dog again"  # 10 toks
        rows = [
            (1, "alpha beta gamma " + shared + " delta"),
            (2, "one two three four " + shared),
            (3, "completely unrelated text with enough tokens to have "
                "several full windows of its own here now"),
            (4, "tiny doc"),  # shorter than the window -> no rows
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = {r["id"]: r for r in duplicate_spans(
            df, "doc_id", "text", window=10, min_docs=2).collect()}
        # doc 4 has no full window
        assert set(out) == {1, 2, 3}
        # the shared 10-token run is exactly ONE 10-token window in each
        assert out[1]["n_dup_windows"] == 1
        assert out[2]["n_dup_windows"] == 1
        assert out[3]["n_dup_windows"] == 0 and out[3]["dup_frac"] == 0.0
        # window counts: n_tokens - window + 1 (both docs have 14 tokens)
        assert out[1]["n_windows"] == 14 - 10 + 1
        assert out[2]["n_windows"] == 14 - 10 + 1
        assert out[1]["dup_frac"] == round(1 / out[1]["n_windows"], 6)

    def test_identical_docs_fully_covered(self, spark):
        from nadeefiler_spark.operators.spans import duplicate_spans

        text = " ".join(f"w{i}" for i in range(20))
        df = spark.createDataFrame(
            [(1, text), (2, text)], "doc_id bigint, text string"
        )
        out = duplicate_spans(df, "doc_id", "text", window=8).collect()
        assert all(r["dup_frac"] == 1.0 and r["n_windows"] == 13 for r in out)
