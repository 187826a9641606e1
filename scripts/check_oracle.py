"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its oracle_sql()
twin on DuckDB over the same parquet tables, then compares row count,
column names, and order-insensitive values.

The comparison is DTYPE-STRICT by rendering every cell to the string a
hash-based gate would see (repr for floats, str for ints, hex for
bytes): DuckDB materializing a HUGEINT window-sum as float64 renders
"1.0" where Spark's int64 renders "1", and that MUST fail here exactly
as it fails the driver's hash_match (it bit round 3 on event_sessions /
session_concurrency while a check_dtype=False value comparison stayed
green). Usage:

    python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def render_cell(v) -> str:
    """Render one cell the way a canonical string/hash gate would.

    Deliberately dtype-sensitive where it matters: float 1.0 -> "1.0"
    but int 1 -> "1"; Decimal("1.00") -> "1.00"; float32 values go
    through float() so single-precision noise is visible. Containers
    render element-wise so Spark's ndarray and DuckDB's list agree."""
    if v is None:
        return "\\N"
    if isinstance(v, (np.ndarray, list, tuple)):
        return "[" + ",".join(render_cell(x) for x in v) + "]"
    try:
        if pd.isna(v):
            return "\\N"
    except (TypeError, ValueError):
        pass
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, (float, np.floating)):
        return repr(float(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    return str(v)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    out = pd.DataFrame({c: df[c].map(render_cell) for c in sorted(df.columns)})
    if len(out.columns) == 0:
        return out
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)


class CodegenWatch:
    """Per-query whole-stage-codegen fallback detector.

    Janino's "Code grows beyond 64 KB" makes Spark fall back to
    interpreted eval SILENTLY — the query stays correct but the scan
    pays a multi-x CPU penalty, which at 100 TB is a regression no
    value check sees. log4j writes the trace to the process's fd 2, so
    we dup fd 2 into a file and scan the newly appended bytes after
    each query, attributing any trace to that query by position."""

    MARKERS = (b"grows beyond 64 KB", b"InternalCompilerException")
    GLOBAL_WINDOW = b"No Partition Defined for Window operation"

    def __init__(self) -> None:
        import tempfile

        self._f = tempfile.NamedTemporaryFile(prefix="cg_stderr_", delete=False)
        self._saved_fd = os.dup(2)
        sys.stderr.flush()
        os.dup2(self._f.fileno(), 2)
        self._pos = 0
        self.last_chunk = b""

    def poll(self) -> tuple[bool, int]:
        """(codegen failure appeared, #global-window warns) since last poll.

        The captured bytes land in ``self.last_chunk`` so failure paths
        can surface the JVM's actual stderr (dup2 hides fd 2 — without
        this a FAIL line would print with its diagnostics swallowed
        into the temp file; ADVICE r4).

        The global-window count is informational: an unpartitioned
        WindowExec is the right plan on sketch-sized inputs (drift CDFs,
        rollup grand totals — rows ∝ parts × bins) and a scale bug on
        row-proportional ones; PLANS.md's global-window table maps each
        site to its bounded input."""
        sys.stderr.flush()
        with open(self._f.name, "rb") as fh:
            fh.seek(self._pos)
            chunk = fh.read()
            self._pos = fh.tell()
        self.last_chunk = chunk
        return (
            any(m in chunk for m in self.MARKERS),
            chunk.count(self.GLOBAL_WINDOW),
        )

    def restore(self) -> None:
        """Put the real stderr back on fd 2 (idempotent). Call before
        normal exit / re-raise so Python tracebacks and interpreter
        diagnostics reach the terminal again."""
        if self._saved_fd is not None:
            sys.stderr.flush()
            os.dup2(self._saved_fd, 2)
            os.close(self._saved_fd)
            self._saved_fd = None

    def stderr_tail(self, n: int = 4000) -> str:
        return self.last_chunk[-n:].decode("utf-8", "replace").strip()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    watch = CodegenWatch()
    try:
        return _run(sf_dir, only, watch)
    finally:
        # put stderr back so anything fatal after this point (or the
        # interpreter's own exit diagnostics) is visible
        watch.restore()


def _run(sf_dir: str, only: set[str], watch: CodegenWatch) -> int:
    from nadeefiler_spark.session import get_spark

    spark = get_spark(app_name="check_oracle")
    con = duck_con(sf_dir)

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    codegen_hits: list[str] = []
    global_windows: dict[str, int] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        spark_err: str | None = None
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception:
            spark_err = traceback.format_exc()
        finally:
            cg, gw = watch.poll()
            if cg:
                codegen_hits.append(name)
                print(f"WARN {name}: whole-stage codegen fallback (64 KB)")
            if gw:
                global_windows[name] = global_windows.get(name, 0) + gw
        if spark_err is not None:
            # fd 2 is dup2'd into the watch's temp file, so the trace
            # and the JVM's stderr must go to STDOUT to be seen at all
            print(f"FAIL {name}: spark error")
            print(spark_err)
            tail = watch.stderr_tail()
            if tail:
                print(f"--- captured JVM stderr tail ({name}) ---")
                print(tail)
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(spdf)} rows)")
            continue
        try:
            opdf = con.execute(oracles[name]).df()
        except Exception:
            print(f"FAIL {name}: oracle error")
            traceback.print_exc(file=sys.stdout)
            failures += 1
            continue
        if len(spdf) != len(opdf):
            print(f"FAIL {name}: rows spark={len(spdf)} oracle={len(opdf)}")
            failures += 1
            continue
        if sorted(spdf.columns) != sorted(opdf.columns):
            print(f"FAIL {name}: cols spark={sorted(spdf.columns)} oracle={sorted(opdf.columns)}")
            failures += 1
            continue
        a, b = canon(spdf), canon(opdf)
        if a.equals(b):
            print(f"ok   {name}: {len(spdf)} rows match (strict)")
        else:
            neq = a != b
            bad = neq.any(axis=1)
            badcols = [c for c in a.columns if neq[c].any()]
            print(f"FAIL {name}: strict-render mismatch in cols {badcols}")
            print("spark rows:\n", a[bad].head(5))
            print("oracle rows:\n", b[bad].head(5))
            failures += 1
    if global_windows:
        total = sum(global_windows.values())
        print(f"\nGLOBAL WINDOWS ({total} warns, informational — see "
              f"PLANS.md global-window table): {global_windows}")
    if codegen_hits:
        print(f"\nCODEGEN FALLBACKS ({len(codegen_hits)}): {codegen_hits}")
        failures += len(codegen_hits)
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
