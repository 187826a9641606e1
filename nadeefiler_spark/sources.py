"""Ingestion sources: the Spark analogs of nadeefiler's upload pipeline.

Reference (SURVEY §2.1): CSV multipart uploads are streamed row-by-row
into a schemaless tuple store with header-derived column names and a
physical row order column (`__order`)
(/root/reference/api/controllers/DatasetController.js:12-87,
api/models/Tuple.js:8-30). The Spark re-expressions:

- read_tuples_csv: all-string CSV scan (types are discovered by
  profiling, never declared — reference DatasetController.js:24 parses
  every value as string) with optional __order for order-sensitive
  reads. Order is derived from (file, offset) so it is deterministic
  and stable across parallelism — NOT monotonically_increasing_id(),
  whose values depend on partition layout.
- dataset_counts: the per-upload row count stored on the Dataset row
  (DatasetController.js:66-72).
- import_kb_tsv: the YAGO bulk import (import-yago.js:16-66) —
  subject-normalized TSV -> (subject, objects array) via groupBy +
  collect_list, replacing the buffered insertMany loop.
- read_jsonl: JSON-lines ingestion with corrupt-record triage — good
  rows projected to the declared schema, bad raw lines kept as
  violation rows with their source file (beyond-reference: the JSONL
  analog of the CSV upload path).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .semantic import normalize_subject

# Characters parquet rejects in field names (" ,;{}()\n\t=") — the
# Spark-side analog of the reference's Mongo key restrictions.
_BAD_NAME_CHARS = re.compile(r"[ ,;{}()\n\t=]+")


def clean_column_names(df: DataFrame) -> DataFrame:
    """Key-name cleaning (SURVEY §2 F7): make header-derived column
    names safe to persist.

    The reference sanitizes tuple keys for its store's key restrictions
    — ``cleanKeyName`` replaces ``(`` / ``)``
    (/root/reference/frontend/app/scripts/controllers/main.js:371-373,
    Mongo additionally forbids ``.``/``$``). The Spark engine can QUERY
    any name via backtick quoting, but parquet rejects
    `` ,;{}()\\n\\t=`` in field names, so an uploaded CSV with headers
    like ``price (usd)`` would profile fine yet fail on first persist.
    This maps each forbidden run to ``_``, names an empty header
    ``_c{i}``, and dedupes case-insensitive collisions with ``_2``,
    ``_3``… suffixes (CSV headers are user input; duplicates happen).
    Idempotent and deterministic across parallelism (driver-side rename
    only — no data movement, the scan plan is unchanged)."""
    out: list[str] = []
    seen: dict[str, int] = {}
    for i, name in enumerate(df.columns):
        # rstrip only: a trailing ``_`` comes from a substituted trailing
        # ``)`` etc.; LEADING underscores are legal, meaningful names
        # (``_id``) and must survive unchanged
        base = _BAD_NAME_CHARS.sub("_", name.strip()).rstrip("_") or f"_c{i}"
        n = seen.get(base.lower(), 0) + 1
        seen[base.lower()] = n
        out.append(base if n == 1 else f"{base}_{n}")
    return df.toDF(*out)


def sniff_header(
    spark: SparkSession,
    path: str,
    delimiter: str = ",",
    sample_rows: int = 100,
    margin: float = 0.4,
) -> bool:
    """Header-row detection — the messytables ``headers_guess`` analog
    (SURVEY §2 F5; the reference's profiler wrapper feeds messytables,
    ``/root/reference/profilers/messytables/run.py``, whose
    type_guess/headers_guess pair decides whether row 0 is data).

    Heuristic, same spirit as messytables: run the engine's OWN type
    detectors (``detect_type_py`` — the exact pure-Python twin of the
    Catalyst cascade) over a small ordered sample; row 0 is a header
    iff the rows below it are substantially more "typed" (numeric /
    date / boolean / percent) than row 0 — ``margin`` defaults to 0.4.
    An all-string table is genuinely ambiguous (both fractions 0) and
    reports False — same failure mode as the reference's guesser.

    Driver-side BY DESIGN: reads ``sample_rows + 1`` rows from the
    file — the reference guesses headers on the upload buffer the same
    way; never part of a distributed plan.
    """
    from .functions.detectors import detect_type_py

    df = (
        spark.read.option("header", False)
        .option("delimiter", delimiter)
        .option("inferSchema", False)
        .option("multiLine", True)  # one task per file -> physical order
        .csv(path)
    )
    rows = df.limit(sample_rows + 1).collect()
    if len(rows) < 2:
        return False

    def typed_frac(row) -> float:
        vals = list(row)
        if not vals:
            return 0.0
        typed = sum(
            1 for v in vals if detect_type_py(v) not in ("string", "null")
        )
        return typed / len(vals)

    head = typed_frac(rows[0])
    rest = sum(typed_frac(r) for r in rows[1:]) / (len(rows) - 1)
    return rest - head >= margin


def read_tuples_csv(
    spark: SparkSession,
    path: str,
    delimiter: str = ",",
    with_order: bool = False,
    clean_names: bool = True,
    header: bool | str = True,
) -> DataFrame:
    """Schemaless (all-string) CSV scan with header-derived columns.

    Every column is StringType: the engine's type-detection rules
    (typedetect / functions.detectors) discover types downstream, as in
    the reference. With with_order=True an `__order` column reproduces
    physical row order per input file (Tuple.js:8); the engine itself is
    order-insensitive, so default off (skips a window shuffle).
    ``header`` may be ``"auto"`` to run :func:`sniff_header` first —
    headerless files then get ``_c{i}`` names instead of having their
    first data row eaten.
    """
    if header == "auto":
        header = sniff_header(spark, path, delimiter)
    reader = (
        spark.read.option("header", bool(header))
        .option("delimiter", delimiter)
        .option("inferSchema", False)  # strings stay strings
    )
    _clean = clean_column_names if clean_names else (lambda d: d)
    if not with_order:
        return _clean(reader.csv(path))
    # Deterministic physical order needs each file to stay in ONE task:
    # multiLine disables input splitting, so within a partition
    # monotonically_increasing_id() ascends in physical row order and a
    # per-file window turns it into a dense 0-based __order. Matches the
    # reference's per-upload `__order` (Tuple.js:8) — uploads are small;
    # large order-insensitive scans should use with_order=False.
    # _metadata is resolvable only on the scan relation, so order columns
    # are attached BEFORE the (projection-introducing) name cleaning
    df = reader.option("multiLine", True).csv(path)
    w = Window.partitionBy(F.col("_file")).orderBy(F.col("_mid"))
    return _clean(
        df.withColumn("_file", F.col("_metadata.file_path"))
        .withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("__order", F.row_number().over(w) - F.lit(1))
        .drop("_file", "_mid")
    )


def dataset_counts(df: DataFrame, dataset_col: str = "_metadata.file_path") -> DataFrame:
    """Per-source-file row counts (Dataset.count, DatasetController.js:66-72)."""
    return (
        df.select(F.col(dataset_col).alias("dataset"))
        .groupBy("dataset")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def import_kb_tsv(spark: SparkSession, path: str) -> DataFrame:
    """YAGO-style KB import: TSV (subject, object) -> (subject, objects).

    Normalization exactly as import-yago.js:38-41 (strip <>, '_' -> ' ',
    lowercase); consecutive-row grouping becomes a full groupBy (the
    reference's buffer-1000 insertMany loop is just a write batch). The
    objects array is sorted for deterministic output.
    """
    raw = (
        spark.read.option("sep", "\t")
        .option("header", False)
        .schema("subject string, object string")
        .csv(path)
    )
    return (
        raw.select(normalize_subject(F.col("subject")).alias("subject"), "object")
        .groupBy("subject")
        .agg(F.array_sort(F.collect_list("object")).alias("objects"))
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """JSONL ingestion with corrupt-record triage: (good, bad).

    Web-scale document corpora arrive as JSON-lines; at 100 TB some
    lines are ALWAYS malformed (truncated writes, encoding damage,
    schema drift), and silently dropping them (mode=DROPMALFORMED)
    destroys the audit trail a validation engine exists to provide.
    This reads PERMISSIVE with an explicit corrupt-record column:

    - ``good``: rows that parsed, projected to the declared schema —
      the corrupt column is pruned out, so downstream plans scan only
      declared fields;
    - ``bad``: the raw offending lines plus their source file
      (``_metadata.file_path``) — the same violation-row shape the
      engine's rule stages emit (reference analog: nadeefiler stores
      the offending tuple with every violation,
      /root/reference/profilers/worker.js:84-100).

    The declared schema is REQUIRED: with inferred schemas Spark's
    PERMISSIVE corrupt-record column cannot be filtered reliably
    (the parser re-runs per query), and a 100-TB inference pass is a
    full extra scan anyway.

    Implementation note: Spark's native JSON *file source* forbids
    queries that reference only the corrupt-record column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the
    documented workaround is caching, which is exactly wrong at 100 TB.
    So the reader scans the files as TEXT and parses each line with
    ``from_json`` carrying its own corrupt column: one scan, one parse,
    no cache, no shuffle, and the triage filter is an ordinary column
    predicate. JSONL's one-object-per-line contract is what makes the
    text framing correct.
    """
    parsed_schema = f"{schema}, {corrupt_col} string"
    df = (
        spark.read.text(path)
        .select(
            F.from_json(
                F.col("value"),
                parsed_schema,
                {"mode": "PERMISSIVE",
                 "columnNameOfCorruptRecord": corrupt_col},
            ).alias("j"),
            F.col("value"),
            F.col("_metadata.file_path").alias("_src_file"),
        )
    )
    is_bad = F.col("j").isNull() | F.col(f"j.{corrupt_col}").isNotNull()
    good = df.where(~is_bad).select("j.*").drop(corrupt_col)
    bad = df.where(is_bad).select(
        F.col("value").alias("raw_line"), "_src_file"
    )
    return good, bad
