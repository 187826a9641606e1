"""Type detectors — bit-for-bit port of nadeefiler's messystreams cascade
semantics to Catalyst expressions (no Python in the hot path).

Reference: /root/reference/profilers/messystreams.js
- boolean value list        messystreams.js:5-11
- number regex + subtype    messystreams.js:13,22-45
- date regex                messystreams.js:14,46-50
- string/null fallback      messystreams.js:51-53
- first-match-wins order    messystreams.js:17-54,110-121
  (boolean -> number -> date -> string/null)

Notable consequences preserved deliberately:
- "1"/"0" classify as BOOLEAN (boolean runs before number).
- bare years ("1987") classify as INTEGER (number runs before date), so
  the date regex's `^\\d{4}$` alternative only matters after non-numeric
  prefixes — it is effectively dead, as in the reference.
- "5." is INTEGER (empty fraction), "3.0" is FLOAT (non-empty fraction).
- exponent rule: with eX present, float iff X - len(frac) < 0
  ("1e2" integer, "1.23e1" float, "2.5E-3" float).
- '' (and SQL NULL, which the reference's CSV source cannot produce)
  -> type 'null'.

A pure-Python twin (`detect_type_py`) exists for golden tests and the
DuckDB oracle construction.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

BOOLEAN_VALUES = ["true", "false", "t", "f", "yes", "no", "y", "n", "1", "0"]

# exactly messystreams.js:13 — groups: 1 whole, 2 .frac, 3 frac, 4 eX, 5 e, 6 X, 7 %
NUMBER_REGEX = r"^[+-]?([0-9]+)(\.?([0-9]*))((e|E)([+-]?[0-9]+))?(%)?$"

# exactly messystreams.js:14 (JS and Java regex dialects agree here)
DATE_REGEX = (
    r"^((((0[13578])|([13578])|(1[02]))[/](([1-9])|([0-2][0-9])|(3[01])))"
    r"|(((0[469])|([469])|(11))[/](([1-9])|([0-2][0-9])|(30)))"
    r"|((2|02)[/](([1-9])|([0-2][0-9]))))[/][0-9]{4}$|^[0-9]{4}$"
)

TYPE_LABELS = ("boolean", "integer", "float", "percent", "date", "string", "null")


def number_subtype(c: Column) -> Column:
    """percent / float / integer for a value already known to match
    NUMBER_REGEX (messystreams.js:34-43)."""
    frac = F.regexp_extract(c, NUMBER_REGEX, 3)
    ex = F.regexp_extract(c, NUMBER_REGEX, 6)
    pct = F.regexp_extract(c, NUMBER_REGEX, 7)
    return (
        F.when(pct != "", F.lit("percent"))
        .when(ex == "", F.when(frac != "", "float").otherwise("integer"))
        .otherwise(
            F.when(ex.cast("int") - F.length(frac) < 0, "float").otherwise("integer")
        )
    )


def detect_type(c: Column) -> Column:
    """First-match-wins type label, exactly the reference cascade."""
    return (
        F.when(F.lower(c).isin(BOOLEAN_VALUES), F.lit("boolean"))
        .when(c.rlike(NUMBER_REGEX), number_subtype(c))
        .when(c.rlike(DATE_REGEX), F.lit("date"))
        .when(c.isNull() | (c == ""), F.lit("null"))
        .otherwise(F.lit("string"))
    )


def parse_number(c: Column) -> Column:
    """parseFloat semantics for matched numbers (trailing % ignored,
    messystreams.js:34)."""
    return F.regexp_replace(c, "%$", "").cast("double")


# --- pure-Python twin (test golden + oracle construction) -------------------

_NUM_RE = re.compile(NUMBER_REGEX)
_DATE_RE = re.compile(DATE_REGEX)


def detect_type_py(value: str | None) -> str:
    if value is None:
        return "null"
    if value.lower() in BOOLEAN_VALUES:
        return "boolean"
    m = _NUM_RE.match(value)
    if m:
        if m.group(7):
            return "percent"
        if not m.group(6):
            return "float" if m.group(3) else "integer"
        return "float" if int(m.group(6)) - len(m.group(3)) < 0 else "integer"
    if _DATE_RE.match(value):
        return "date"
    return "string" if value != "" else "null"
