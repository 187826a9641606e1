"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its oracle_sql()
twin on DuckDB over the same parquet tables, then compares row count,
column names, and order-insensitive values (exact equality after sorting
rows and columns). Usage:

    python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import traceback

import duckdb
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


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from nadeefiler_spark.session import get_spark

    spark = get_spark(app_name="check_oracle")
    con = duck_con(sf_dir)

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception:
            print(f"FAIL {name}: spark error")
            traceback.print_exc()
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(spdf)} rows)")
            continue
        try:
            opdf = con.execute(oracles[name]).df()
        except Exception:
            print(f"FAIL {name}: oracle error")
            traceback.print_exc()
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
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
            print(f"ok   {name}: {len(spdf)} rows match")
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch\n{str(e)[:2000]}")
            neq = (a != b) & ~(a.isna() & b.isna())
            bad = neq.any(axis=1)
            print("spark rows:\n", a[bad].head(5))
            print("oracle rows:\n", b[bad].head(5))
            failures += 1
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
