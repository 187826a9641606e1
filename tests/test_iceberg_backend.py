"""IcebergTableIO execution contract.

The full replace/append/ensure/read contract runs ONLY when an Iceberg
Spark runtime jar is available — none ships in this sandbox and the
container has no network (pip/maven resolution fails on DNS; verified
2026-08-17), so here the execution test documents its skip loudly. On a
machine with the jar, point NADEEFILER_ICEBERG_JAR at
iceberg-spark-runtime-4.0_2.13-<ver>.jar (or spark-submit --packages
org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>) and the same
test drives a hadoop-type catalog end-to-end in a temp warehouse.

What DOES run in-sandbox: the API-shape contract — every
DataFrameWriterV2 entry point the backend calls exists with the
signature used, and the overwrite condition the backend builds is a
valid Column. This pins the code path against pyspark API drift even
where the Iceberg runtime itself can't load.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys

import pytest

from nadeefiler_spark.tableio import IcebergTableIO


def _find_iceberg_jar() -> str | None:
    env = os.environ.get("NADEEFILER_ICEBERG_JAR")
    if env and os.path.isfile(env):
        return env
    for pat in (
        os.path.expanduser("~/.ivy2/jars/org.apache.iceberg_iceberg-spark-runtime*.jar"),
        os.path.expanduser("~/.ivy2.5.2/jars/org.apache.iceberg_iceberg-spark-runtime*.jar"),
        "/opt/spark/jars/iceberg-spark-runtime*.jar",
    ):
        hits = glob.glob(pat)
        if hits:
            return hits[0]
    return None


ICEBERG_JAR = _find_iceberg_jar()


@pytest.mark.skipif(
    ICEBERG_JAR is None,
    reason="no iceberg-spark-runtime jar in container and no network to fetch one "
    "(documented limitation — set NADEEFILER_ICEBERG_JAR to run; "
    "see tableio.py module docstring for the production setup)",
)
def test_iceberg_io_full_contract(tmp_path):
    """Replace / append / ensure / read / emptied-partition contract
    against a real hadoop-type Iceberg catalog (fresh JVM so the jar and
    catalog conf apply)."""
    code = f"""
import sys
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
from pyspark.sql import SparkSession, functions as F
from nadeefiler_spark.tableio import IcebergTableIO

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.jars", {ICEBERG_JAR!r})
    .config("spark.sql.catalog.it", "org.apache.iceberg.spark.SparkCatalog")
    .config("spark.sql.catalog.it.type", "hadoop")
    .config("spark.sql.catalog.it.warehouse", {str(tmp_path / 'wh')!r})
    .getOrCreate()
)
spark.sql("CREATE NAMESPACE IF NOT EXISTS it.db")
io = IcebergTableIO(spark, "it.db")

df = spark.createDataFrame([("a", 1), ("b", 2)], "part string, v int")
io.replace_partitions(df, "t", "part", ["a", "b"])
io.replace_partitions(spark.createDataFrame([("a", 10)], "part string, v int"), "t", "part", ["a"])
got = {{(r["part"], r["v"]) for r in io.read("t", "part string, v int").collect()}}
assert got == {{("a", 10), ("b", 2)}}, got

# zero-row replace clears the partition (single-commit overwrite path)
empty = spark.createDataFrame([], "part string, v int")
io.replace_partitions(empty, "t", "part", ["a"])
assert {{r["part"] for r in io.read("t").collect()}} == {{"b"}}

# fixed levels + append + missing-table read
io.replace_partitions(df, "t2", "part", ["a", "b"], fixed={{"stage": "s1"}})
io.replace_partitions(spark.createDataFrame([("a", 9)], "part string, v int"),
                      "t2", "part", ["a"], fixed={{"stage": "s2"}})
rows = {{(r["stage"], r["part"], r["v"]) for r in io.read("t2").collect()}}
assert rows == {{("s1", "a", 1), ("s1", "b", 2), ("s2", "a", 9)}}, rows
io.append(df, "m", coalesce=1)
io.append(df, "m", coalesce=1)
assert io.read("m").count() == 4
assert io.read("never_written", "part string, v int").count() == 0
print("ICEBERG_CONTRACT_OK")
"""
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=600)
    assert "ICEBERG_CONTRACT_OK" in out.stdout, out.stderr[-2000:]


def test_writerv2_api_shape(spark):
    """The exact DataFrameWriterV2 surface IcebergTableIO drives must
    exist with the signatures used (pins against pyspark API drift even
    without the Iceberg runtime)."""
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("a", 1)], "part string, v int")
    w = df.limit(0).writeTo("some_catalog.db.t")
    assert callable(w.using) and callable(w.create)
    assert callable(w.append) and callable(w.overwrite) and callable(
        w.overwritePartitions)
    w2 = w.using("iceberg")
    assert callable(w2.partitionedBy)
    w3 = w2.partitionedBy(F.col("part"))
    assert callable(w3.create)

    # condition construction as replace_partitions builds it
    cond = F.col("part").isin(["a", "b"]) & (F.col("stage") == F.lit("s1"))
    assert isinstance(cond, Column)
    # and it evaluates with the engine's semantics on a real df
    got = df.withColumn("stage", F.lit("s1")).where(cond).count()
    assert got == 1


def test_iceberg_backend_skip_is_documented():
    """The skip reason must stay truthful: if a jar IS present, the full
    contract above runs and this guard is moot."""
    if ICEBERG_JAR is None:
        assert True  # documented skip path — see module docstring
    else:
        assert os.path.isfile(ICEBERG_JAR)
