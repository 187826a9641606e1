"""Text-analysis expression builders for large-scale training-data
pipelines: tokenization, quality scoring, language ID, fingerprinting,
shingling. All pure Catalyst expressions (JVM-side, codegen-friendly) —
no Python UDFs.

These extend the reference's per-column profiling (nadeefiler profiles
generic CSV strings) with the document-level signals a 100 TB text
corpus pipeline needs; they run inside the same single-pass aggregation
framework as the profiler.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WORD_SPLIT = r"\s+"
# BPE-ish pre-tokenization: letter runs, digit runs, single other glyphs
BPE_ISH_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# tiny deterministic stopword marker sets for heuristic language ID
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "was", "with", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit"),
    "fr": ("le", "la", "les", "et", "est", "dans", "pour"),
    "es": ("el", "la", "los", "que", "es", "para", "con"),
}


def tokens(c: Column | str) -> Column:
    """Whitespace tokens, empty strings removed."""
    col = F.col(c) if isinstance(c, str) else c
    return F.filter(F.split(col, WORD_SPLIT), lambda t: t != "")


def token_count(c: Column | str) -> Column:
    return F.size(tokens(c))


def bpe_ish_token_count(c: Column | str) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.size(F.regexp_extract_all(col, F.lit(BPE_ISH_REGEX), F.lit(0)))


def punct_ratio(c: Column | str) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    n_punct = F.length(F.regexp_replace(col, r"[^\.,;:!\?]", ""))
    return n_punct / F.greatest(F.length(col), F.lit(1))


def stopword_ratio(c: Column | str, lang: str = "en") -> Column:
    toks = tokens(F.lower(F.col(c) if isinstance(c, str) else c))
    hits = F.size(F.array_intersect(F.array_distinct(toks), F.array(
        *[F.lit(w) for w in LANG_MARKERS[lang]]
    )))
    return hits / F.greatest(F.size(F.array_distinct(toks)), F.lit(1))


def mean_word_len(c: Column | str) -> Column:
    toks = tokens(c)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(c: Column | str) -> Column:
    """Heuristic document quality in [0, 1]:

    0.4 * length_ok (50..20000 chars) + 0.3 * word_len_ok (mean word
    length in 3..12) + 0.3 * (1 - min(punct_ratio * 5, 1)).
    Deterministic, expression-only; mirrors common corpus-filtering
    heuristics (length / punctuation / word-shape gates).
    """
    col = F.col(c) if isinstance(c, str) else c
    n = F.length(col)
    length_ok = ((n >= 50) & (n <= 20000)).cast("double")
    mwl = mean_word_len(col)
    word_ok = ((mwl >= 3.0) & (mwl <= 12.0)).cast("double")
    punct_pen = F.lit(1.0) - F.least(punct_ratio(col) * 5.0, F.lit(1.0))
    return F.round(0.4 * length_ok + 0.3 * word_ok + 0.3 * punct_pen, 6)


def lang_id(c: Column | str) -> Column:
    """Marker-word language guess; 'und' when no markers hit.

    First-match-wins on the max hit count (stable order en,de,fr,es) —
    the same cascade shape as the reference type detector.
    """
    col = F.lower(F.col(c) if isinstance(c, str) else c)
    toks = F.array_distinct(tokens(col))
    hits = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in LANG_MARKERS.items()
    }
    best = F.greatest(*hits.values())
    expr = F.when(best <= 0, F.lit("und"))
    for lang in LANG_MARKERS:  # insertion order = tie-break priority
        expr = expr.when(hits[lang] == best, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def fingerprint(c: Column | str) -> Column:
    """Order-insensitive content fingerprint: md5 of the sorted distinct
    lowercase token set. md5 keeps the fingerprint portable across
    engines (same value in Spark, DuckDB, Python hashlib)."""
    col = F.lower(F.col(c) if isinstance(c, str) else c)
    normalized = F.array_join(F.array_sort(F.array_distinct(tokens(col))), " ")
    return F.md5(normalized)


def word_shingles(c: Column | str, n: int = 3) -> Column:
    """Array of word n-gram shingle strings (distinct not applied).

    Built by zipping n shifted slices of the token array and joining
    each zipped struct — NOT by a ``transform(sequence(...), i ->
    slice(toks, i, n))`` lambda: a lambda that captures the token
    array re-evaluates the tokenizer once PER ELEMENT (Catalyst does
    no common-subexpression elimination across lambda boundaries),
    which measured 2.9 s vs 0.6 s for the shingle explode alone at
    sf0.1 (BENCH/BASELINE.md, sixth-session record). The zip form
    evaluates the tokenizer a constant n+1 times per row and stays
    map-side (no window, no shuffle)."""
    toks = tokens(c)
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    z = F.arrays_zip(*[F.slice(toks, i + 1, m) for i in range(n)])
    return F.transform(
        z, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(n)])
    )


def token_chunks(c: Column | str, size: int, overlap: int = 0) -> Column:
    """Array of token-window chunk strings: ``size`` tokens per chunk,
    consecutive chunks sharing ``overlap`` tokens (stride = size −
    overlap) — the standard context-window chunking step ahead of
    tokenizer/training ingestion. Expression-only (no UDF): chunk
    starts are a `sequence` with the stride as step, each materialized
    via `slice` + `array_join`, so the whole thing runs inside
    whole-stage codegen. A document shorter than ``size`` yields one
    chunk with all its tokens; a trailing window shorter than the
    overlap-free stride still appears (no token is dropped).

    Cost note: the chunk lambda captures the token array, and Catalyst
    re-evaluates captured expressions once per lambda element (see
    word_shingles), so tokenization runs once per CHUNK —
    O(n²/stride) characters for an n-char document. Fine at typical
    document sizes (doc_chunks: 0.47 s at sf0.1, measured); for very
    long documents (≫10k tokens) pre-split into an exploded token
    frame and chunk there instead (the repetition_profile pattern)."""
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got {overlap=} {size=}")
    stride = size - overlap
    toks = tokens(c)
    n = F.size(toks)
    # last start: the smallest s in {1, 1+stride, 1+2*stride, ...} with
    # s + size - 1 >= n, i.e. 1 + stride*ceil((n-size)/stride); when
    # n <= size one chunk from position 1 covers everything
    d = n - size
    last = F.when(n <= size, F.lit(1)).otherwise(
        d + (F.lit(stride) - d % F.lit(stride)) % F.lit(stride) + 1
    )
    starts = F.sequence(F.lit(1), F.greatest(last, F.lit(1)), F.lit(stride))
    return F.when(n <= 0, F.expr("cast(array() as array<string>)")).otherwise(
        F.transform(starts, lambda s: F.array_join(F.slice(toks, s, size), " "))
    )


def mask(c: Column | str) -> Column:
    """Potter's-Wheel-style structure mask: uppercase letters -> 'A',
    lowercase -> 'a', digits -> '9', everything else kept verbatim, so
    "Brand#17" profiles as "Aaaaa#99". Histogramming masks instead of
    raw values surfaces FORMAT drift (a column of phone-like strings
    with three masks has a dirty row problem no value histogram shows)
    at format-count cardinality instead of value cardinality. ASCII
    classes only, matching the portable `[A-Z]` semantics DuckDB and
    Spark share; three regexp_replace passes, all whole-stage codegen."""
    col = F.col(c) if isinstance(c, str) else c
    m = F.regexp_replace(col, "[A-Z]", "A")
    m = F.regexp_replace(m, "[a-z]", "a")
    return F.regexp_replace(m, "[0-9]", "9")
