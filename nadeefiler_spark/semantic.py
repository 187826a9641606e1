"""Semantic-type scoring: the Spark analog of nadeefiler's `semantic`
profiler (SURVEY §2.4 J1, §2.3 A5/A6).

Reference pipeline (/root/reference/profilers/semantic.js):
1. input = messystreams' string-histogram RESULTS (key, value, count) —
   a cascaded profiler reading another profiler's output
   (semantic.js:50-55); here: `typedetect.type_histograms(...)` rows
   where histogram == 'string'.
2. each distinct value is $text-searched against the yagoSimpleTypes
   knowledge base (Mongo text index, top-10 by textScore)
   (semantic.js:60-66).
3. for each hit, every object in its `objects` array accumulates
   score += textScore * value_count (semantic.js:8-15).
4. output: top-10 (object, score) per column (semantic.js:17-29).

Spark-first re-expression: the KB is broadcast-sized (import-yago.js
normalizes subjects; the bundled extract is 10k rows), so the text
search becomes a broadcast token equi-join: tokenize both sides, join on
shared tokens, score = |shared tokens| (a deterministic textScore
stand-in), then weighted sum + window top-k. Values are deduplicated
BEFORE the join — the reference's dedupe-before-expensive-work shape.

Scale notes: values side is already distinct (key, value, count)
triples from the profile stage; the KB side is broadcast; the only
shuffle is the final groupBy(key, object) on match rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def normalize_subject(c) -> F.Column:
    """import-yago.js:38-41: strip <>, '_' -> ' ', lowercase."""
    return F.lower(F.regexp_replace(F.regexp_replace(c, "^<(.+)>$", "$1"), "_", " "))


def semantic_scores(
    string_hist: DataFrame,
    kb: DataFrame,
    top_k: int = 10,  # topScores = 10, semantic.js:6
    tf_idf: bool = True,
    group_cols: tuple[str, ...] = ("key",),
) -> DataFrame:
    """(*group_cols, object, score, rank): top-k weighted semantic types
    per group (per column by default; pass ("part", "key") to score per
    partition-column, the engine's cascade-stage shape).

    string_hist: (*group_cols, value, count) distinct string values.
    kb: (subject, objects array<string>) pre-normalized subjects.

    tf_idf=True (default): a matched token contributes
    ln(N_subjects / df(token)) — rare tokens dominate, the public analog
    of Mongo's $text TF-IDF-ish textScore the reference ranks with
    (``/root/reference/profilers/semantic.js:60-66``); the idf table is
    computed on the (broadcast-sized) KB side, so it adds no shuffle.
    tf_idf=False keeps the round-1 shared-token-count scoring.
    """
    gcols = list(group_cols)
    vals = (
        string_hist.select(*gcols, "value", "count")
        .withColumn("tok", F.explode(F.split(F.lower("value"), "\\s+")))
        .where(F.col("tok") != "")
    )
    subs = (
        kb.select("subject", "objects")
        .withColumn("tok", F.explode(F.split(F.col("subject"), "\\s+")))
        .where(F.col("tok") != "")
    )
    if tf_idf:
        n_subjects = kb.select(F.count_distinct("subject").alias("n_subj"))
        idf = (
            subs.groupBy("tok")
            .agg(F.count_distinct("subject").alias("df_t"))
            .crossJoin(F.broadcast(n_subjects))
            # +1 smoothing keeps a token present in EVERY subject at a
            # small positive weight instead of exactly zero
            .select("tok", F.log((F.col("n_subj") + 1.0) / F.col("df_t")).alias("w"))
        )
        subs = subs.join(F.broadcast(idf), "tok")
        weight = F.sum("w")
    else:
        weight = F.count(F.lit(1)).cast("double")
    # token equi-join (broadcast KB), then per (key,value,subject):
    # match score = sum of matched-token idf weights (textScore analog)
    matches = (
        vals.join(F.broadcast(subs), "tok")
        .groupBy(*gcols, "value", "count", "subject", "objects")
        .agg(weight.alias("match_score"))
    )
    # accumulate score*count into each object (semantic.js:8-15)
    scored = (
        matches.select(
            *gcols,
            F.explode("objects").alias("object"),
            (F.col("match_score") * F.col("count")).alias("w"),
        )
        .groupBy(*gcols, "object")
        .agg(F.sum("w").cast("double").alias("score"))
    )
    # rank over the ROUNDED score: objects sharing a subject get
    # mathematically identical sums, and with idf weights those are
    # floats — ranking on raw doubles would let last-ulp summation-order
    # jitter flip the object-ASC tie-break across engines/runs
    scored = scored.withColumn("score", F.round("score", 6))
    w = Window.partitionBy(*gcols).orderBy(F.desc("score"), F.asc("object"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
    )
