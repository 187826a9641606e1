"""PII detection and redaction over text columns — expression-only.

A training-data pipeline gates corpora on personally identifiable
information before anything ships; the reference's value-level
profilers (``/root/reference/profilers/worker.js:121-144`` streams
every value through JS detector callbacks) are the semantic slot this
fills, re-expressed as Catalyst regexes so the scan stays inside
whole-stage codegen — no per-row Python anywhere.

Pattern notes: every regex uses only syntax shared by Java's engine
(Spark) and RE2 (DuckDB oracle): character classes, bounded repeats,
``\\b`` word boundaries — no lookaround. ``phone`` requires the
leading ``+`` of an international number so plain digit runs don't
triple-count against ``ssn``/``card``. Redaction applies patterns in
the fixed ``PII_PATTERNS`` order (email, ssn, phone, ipv4, card);
since ssn/ipv4/card are mutually exclusive by shape and email/phone
consume their text first, the chain is order-stable.

Scale story (10^12 rows): narrow projection + regex per row, no
shuffle at all for redaction; the scan aggregates map-side into one
row per group. The regexes are a compile-once constant per task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ordered: redaction applies in this order (see module docstring)
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "phone": r"\+[0-9][0-9 ()-]{7,}[0-9]",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "card": r"\b[0-9]{13,16}\b",
}


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def pii_count(c: Column | str, kind: str) -> Column:
    """Number of matches of one PII kind in the text (0 for NULL text)."""
    return F.coalesce(
        F.size(F.regexp_extract_all(_col(c), F.lit(PII_PATTERNS[kind]), 0)),
        F.lit(0),
    ).cast("bigint")


def has_pii(c: Column | str, kinds: list[str] | None = None) -> Column:
    """True iff any of the given kinds (default: all) matches."""
    ks = kinds or list(PII_PATTERNS)
    out = F.lit(False)
    for k in ks:
        out = out | (pii_count(c, k) > 0)
    return out


def redact(c: Column | str, kinds: list[str] | None = None) -> Column:
    """Replace every match with ``<KIND>`` tokens, in PII_PATTERNS
    order. NULL text stays NULL."""
    ks = [k for k in PII_PATTERNS if kinds is None or k in kinds]
    out = _col(c)
    for k in ks:
        out = F.regexp_replace(out, PII_PATTERNS[k], f"<{k.upper()}>")
    return out


def scan_pii(
    df: DataFrame,
    text_col: str,
    group_cols: list[str] | None = None,
    kinds: list[str] | None = None,
) -> DataFrame:
    """Per-group PII audit: one row per group with
    (n_rows, n_<kind>... total match counts, pii_rows, pii_rate).

    One scan, map-side combinable — the aggregate state is a handful of
    counters per group, so the shuffle is ∝ #groups regardless of corpus
    size. ``pii_rate`` is rounded to 6 places (oracle-stable)."""
    ks = kinds or list(PII_PATTERNS)
    keys = group_cols or []
    flag = has_pii(text_col, ks)
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.sum(pii_count(text_col, k)).alias(f"n_{k}") for k in ks],
        F.sum(flag.cast("bigint")).alias("pii_rows"),
        F.round(
            F.sum(flag.cast("bigint")) / F.count(F.lit(1)), 6
        ).alias("pii_rate"),
    )
