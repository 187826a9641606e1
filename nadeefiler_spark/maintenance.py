"""Scheduled maintenance: the physical purge of soft-deleted rows.

Reference analog (SURVEY §2 T7): a daily cron job (``0 0 * * *``)
physically destroys projects/datasets flagged ``deleted: true``
(/root/reference/config/bootstrap.js:19-26,
api/services/DeleteService.js:1-16) — the soft-delete flag (P3) makes
deletes instant for the UI, and the scheduled job reclaims storage. The
Spark analog is this spark-submit-able entrypoint, scheduled by
whatever the deployment uses (cron / Airflow):

    spark-submit --py-files nadeefiler_spark.zip \
        nadeefiler_spark/maintenance.py --base-dir /data/store \
        --parent datasets --child "tuples:dataset_id" [--flag deleted]

Semantics (P4 cascade, reference ``Dataset.js:46-48`` destroy hooks):
rows of each child table whose FK matches a flagged parent key are
purged, then the flagged parent rows themselves. Children are purged
BEFORE the parent so a crash between the two leaves the flags intact
and a re-run converges (idempotent); purging the parent first would
strand orphaned child rows with no flag left to find them by.

Backend strategies:
- ParquetDirIO: anti-join rewrite + rename swap per table (one full
  scan + one write per table — at 100 TB you run this on the cluster,
  and the scan is the unavoidable cost of a physical purge without
  table-format delete files).
- IcebergTableIO: ``DELETE FROM`` per table (merge-on-read delete
  files, one snapshot commit each — no rewrite of survivors), then
  optional ``expire_snapshots`` so reclaimed space is actually freed.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tableio import IcebergTableIO, ParquetDirIO, default_io


def _flagged(df: DataFrame, flag: str):
    # a NULL flag is "not deleted" (reference guards filter deleted:true)
    return F.coalesce(F.col(flag).cast("boolean"), F.lit(False))


def purge_soft_deleted(
    spark: SparkSession,
    io,
    parent: str,
    children: list[tuple[str, str]] | None = None,
    flag: str = "deleted",
    key: str = "id",
    expire_snapshots: bool = False,
) -> dict[str, int]:
    """Physically delete soft-deleted ``parent`` rows and cascade to
    ``children`` ([(child_table, fk_col), ...]). Returns per-table purge
    counts. Safe to re-run: a second invocation purges nothing."""
    try:
        pdf = io.read(parent)
    except Exception:
        return {}
    if flag not in pdf.columns:
        return {}
    dead = pdf.where(_flagged(pdf, flag)).select(F.col(key).alias("__dead_key"))
    counts: dict[str, int] = {}

    if isinstance(io, IcebergTableIO):
        dead.createOrReplaceTempView("__ndf_dead_keys")
        sub = "(SELECT __dead_key FROM __ndf_dead_keys)"
        for child, fk in children or []:
            cdf = io.read(child)
            counts[child] = cdf.join(dead, cdf[fk] == dead["__dead_key"],
                                     "left_semi").count()
            spark.sql(f"DELETE FROM {io._full(child)} WHERE `{fk}` IN {sub}")
        counts[parent] = dead.count()
        spark.sql(
            f"DELETE FROM {io._full(parent)} WHERE "
            f"coalesce(cast(`{flag}` as boolean), false)"
        )
        if expire_snapshots:
            cat = io.namespace.split(".", 1)[0]
            for t in [c for c, _ in children or []] + [parent]:
                try:
                    spark.sql(
                        f"CALL {cat}.system.expire_snapshots"
                        f"(table => '{io._full(t)}')"
                    )
                except Exception:  # procedure catalog not configured
                    break
        return counts

    assert isinstance(io, ParquetDirIO), f"unsupported IO backend {type(io)}"
    for child, fk in children or []:
        try:
            cdf = io.read(child)
        except Exception:
            continue
        n = cdf.join(dead, cdf[fk] == dead["__dead_key"], "left_semi").count()
        counts[child] = n
        if n:
            io.overwrite(
                cdf.join(dead, cdf[fk] == dead["__dead_key"], "left_anti"),
                child,
            )
    n = dead.count()
    counts[parent] = n
    if n:
        io.overwrite(pdf.where(~_flagged(pdf, flag)), parent)
    return counts


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="nadeefiler_spark purge job (T7)")
    p.add_argument("--base-dir", required=True,
                   help="table store base dir (or Iceberg out_dir analog)")
    p.add_argument("--parent", required=True, help="parent table name")
    p.add_argument("--child", action="append", default=[],
                   metavar="TABLE:FK_COL",
                   help="cascade child, repeatable (e.g. tuples:dataset_id)")
    p.add_argument("--flag", default="deleted")
    p.add_argument("--key", default="id")
    p.add_argument("--expire-snapshots", action="store_true",
                   help="Iceberg backend: expire old snapshots after purge")
    return p


def main(argv: list[str] | None = None, spark: SparkSession | None = None) -> dict:
    args = build_parser().parse_args(argv)
    if spark is None:
        from nadeefiler_spark.session import get_spark

        spark = get_spark(app_name="nadeefiler_spark_purge")
    io = default_io(spark, args.base_dir)
    children = []
    for c in args.child:
        table, _, fk = c.partition(":")
        if not fk:
            raise SystemExit(f"--child needs TABLE:FK_COL, got {c!r}")
        children.append((table, fk))
    counts = purge_soft_deleted(
        spark, io, args.parent, children, flag=args.flag, key=args.key,
        expire_snapshots=args.expire_snapshots,
    )
    out = {"purged": counts, "base_dir": args.base_dir}
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main(sys.argv[1:])
