"""Training-shard export (operators/shards.py): deterministic
assignment, manifest integrity, partitioned layout."""

import os

import pytest
from pyspark.sql import functions as F

from nadeefiler_spark.operators import shards


def _docs(spark, n=300):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("word "), F.lit("text body number "), F.col("id").cast("string")).alias("text"),
    )


def test_with_shard_deterministic_and_layout_independent(spark):
    df = _docs(spark)
    a = {r["doc_id"]: r["shard_id"] for r in shards.with_shard(df, "doc_id", 8).collect()}
    b = {
        r["doc_id"]: r["shard_id"]
        for r in shards.with_shard(df.repartition(17), "doc_id", 8).collect()
    }
    assert a == b
    assert set(a.values()) <= set(range(8))


def test_python_twin_of_shard_assignment(spark):
    got = {
        r["doc_id"]: r["shard_id"]
        for r in shards.with_shard(_docs(spark, 100), "doc_id", 8).collect()
    }
    expected = {
        i: ((i % 2**31) * 2654435761 + 29) % 2**31 % 8 for i in range(100)
    }
    assert got == expected


def test_manifest_totals_and_checksum(spark):
    df = _docs(spark, 200)
    rows = shards.shard_manifest(df, "doc_id", "text", 8).collect()
    assert sum(r["n_docs"] for r in rows) == 200
    # every doc has 4 tokens ("word text body number <id>" -> 5 actually)
    total_tokens = sum(r["n_tokens"] for r in rows)
    assert total_tokens == 200 * 5
    # checksum twin
    by_shard: dict[int, int] = {}
    for i in range(200):
        key = ((i % 2**31) * 2654435761 + 29) % 2**31
        by_shard[key % 8] = by_shard.get(key % 8, 0) + key % 2**20
    got = {r["shard_id"]: r["id_checksum"] for r in rows}
    assert got == by_shard


def test_write_shards_layout_and_roundtrip(spark, tmp_path):
    df = _docs(spark, 120)
    out = str(tmp_path / "shards")
    manifest = shards.write_shards(
        df, out, "doc_id", "text", n_shards=4, max_records_per_file=50
    )
    dirs = sorted(d for d in os.listdir(out) if d.startswith("shard_id="))
    assert dirs == [f"shard_id={k}" for k in range(4)]
    back = spark.read.option("basePath", out).parquet(out)
    assert back.count() == 120
    # membership in each directory matches the manifest counts
    per_dir = {
        r["shard_id"]: r["count"]
        for r in back.groupBy("shard_id").count().collect()
    }
    per_manifest = {r["shard_id"]: r["n_docs"] for r in manifest.collect()}
    assert per_dir == per_manifest
    # a shard-pruned read plans a partition filter on the shard dirs
    # (inputFiles() reports the unpruned relation, so assert on the plan)
    one = back.where(F.col("shard_id") == 2)
    plan = one._jdf.queryExecution().executedPlan().toString()
    scan_line = next(ln for ln in plan.splitlines() if "FileScan" in ln)
    assert "PartitionFilters: [" in scan_line and "shard_id" in scan_line
    # assignment in the files matches the expression
    for r in one.select("doc_id").collect():
        key = ((r["doc_id"] % 2**31) * 2654435761 + 29) % 2**31
        assert key % 4 == 2


def test_n_shards_validated(spark):
    with pytest.raises(ValueError):
        shards.with_shard(_docs(spark, 5), "doc_id", 0)


# --- sequence packing -------------------------------------------------------


def _pack_twin(ids_tokens, budget, n_shards, salt=29):
    """Pure-Python twin of pack_docs' streaming packing."""
    by_shard: dict[int, list[tuple[int, int]]] = {}
    for i, tk in ids_tokens:
        s = ((i % 2**31) * 2654435761 + salt) % 2**31 % n_shards
        by_shard.setdefault(s, []).append((i, tk))
    out = {}
    for s, members in by_shard.items():
        cum = 0
        for i, tk in sorted(members):
            out[i] = (s, cum // budget)
            cum += tk
    return out


def test_pack_docs_matches_python_twin(spark):
    df = _docs(spark, 400)  # every doc: 5 tokens
    got = {
        r["id"]: (r["shard_id"], r["pack_id"])
        for r in shards.pack_docs(df, "doc_id", "text", budget=17, n_shards=4).collect()
    }
    expected = _pack_twin([(i, 5) for i in range(400)], budget=17, n_shards=4)
    assert got == expected


def test_pack_docs_layout_independent_and_contiguous(spark):
    df = _docs(spark, 300)
    a = sorted(shards.pack_docs(df, "doc_id", "text", 23, 4).collect())
    b = sorted(
        shards.pack_docs(df.repartition(11), "doc_id", "text", 23, 4).collect()
    )
    assert a == b
    # packs are contiguous in id order within each shard
    by_shard: dict[int, list[tuple[int, int]]] = {}
    for r in a:
        by_shard.setdefault(r["shard_id"], []).append((r["id"], r["pack_id"]))
    for members in by_shard.values():
        packs = [p for _, p in sorted(members)]
        assert packs == sorted(packs)  # non-decreasing along id order


def test_pack_manifest_totals_and_bounds(spark):
    df = _docs(spark, 500)  # 5 tokens per doc
    budget, max_doc = 31, 5
    rows = shards.pack_manifest(df, "doc_id", "text", budget, 4).collect()
    assert sum(r["n_docs"] for r in rows) == 500
    assert sum(r["n_tokens"] for r in rows) == 500 * 5
    last_pack = {}
    for r in rows:
        last_pack[r["shard_id"]] = max(last_pack.get(r["shard_id"], -1), r["pack_id"])
    for r in rows:
        assert r["n_tokens"] < budget + max_doc  # bounded overflow
        if r["pack_id"] != last_pack[r["shard_id"]]:
            assert r["n_tokens"] > budget - max_doc  # non-final packs ~full
        assert r["first_id"] <= r["last_id"]


def test_pack_docs_rejects_bad_budget(spark):
    with pytest.raises(ValueError):
        shards.pack_docs(_docs(spark, 10), "doc_id", "text", 0, 4)
