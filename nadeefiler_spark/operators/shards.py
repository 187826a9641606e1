"""Training-shard export: the step between a curated corpus and a
dataloader.

Training jobs don't read a 100-TB table; they read SHARDS — fixed
collections of documents with a manifest (per-shard document/token
counts + a checksum) that the dataloader uses for work assignment and
integrity checks. The exporter here is deterministic end-to-end:

- shard assignment is the same portable integer hash as
  operators.sample (key(id) mod n_shards) — a pure expression, so a
  document's shard never depends on partition layout, parallelism, or
  engine, and a re-export after an upstream fix moves only the
  documents that actually changed;
- the manifest is ONE groupBy(shard_id) — counts, token totals, and an
  order-insensitive additive checksum (sum of per-doc hash keys
  truncated to 2^20, so the int64 sum cannot overflow below ~10^13 rows
  per shard);
- the writer lays out one directory per shard (`partitionBy`), each
  co-located into one task's output by `repartition(shard_id)`, with
  `maxRecordsPerFile` bounding individual file sizes — the same
  scan-pruning layout as operators.ann.write_ivf_index: a dataloader
  (or a re-validation job) reading shard k touches only shard k's
  directory.

No reference analog (beyond-reference operator per the task mandate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as tx
from .sample import sample_key

_CHECK_MOD = 2**20  # truncated checksum key: sum(int64) safe to ~10^13 rows/shard


def with_shard(
    df: DataFrame, id_col: str, n_shards: int, salt: int = 29
) -> DataFrame:
    """df + deterministic ``shard_id`` column in [0, n_shards)."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    return df.withColumn(
        "shard_id", (sample_key(id_col, salt) % n_shards).cast("int")
    )


def shard_manifest(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_shards: int,
    salt: int = 29,
) -> DataFrame:
    """Per-shard manifest: (shard_id, n_docs, n_tokens, id_checksum).

    ``id_checksum`` is the sum of each member's hash key mod 2^20 —
    order-insensitive and O(1) aggregation state, so two manifests match
    iff the shard membership (almost certainly) matches; a dataloader
    can recompute it from the shard directory alone.
    """
    return (
        with_shard(df, id_col, n_shards, salt)
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(tx.token_count(text_col).cast("bigint")).alias("n_tokens"),
            F.sum(sample_key(id_col, salt) % _CHECK_MOD).alias("id_checksum"),
        )
    )


def write_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    text_col: str,
    n_shards: int,
    salt: int = 29,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Write the corpus as shard directories and return the manifest.

    Layout: ``<path>/shard_id=<k>/part-*.parquet``; one shuffle
    (repartition on shard_id) co-locates each shard so every directory
    is written by one task run, and ``maxRecordsPerFile`` re-splits big
    shards into bounded files. The returned manifest is computed from
    the SAME assignment expression (no read-back job); persist it next
    to the shards as the dataloader's index.
    """
    sharded = with_shard(df, id_col, n_shards, salt).repartition(F.col("shard_id"))
    writer = sharded.write.mode(mode).partitionBy("shard_id")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)
    return shard_manifest(df, id_col, text_col, n_shards, salt)


def pack_docs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget: int,
    n_shards: int,
    salt: int = 29,
) -> DataFrame:
    """Streaming sequence packing: assign each document to a fixed
    token-budget PACK within its shard.

    Training dataloaders consume fixed-size token windows; the step
    between shards and batches is packing documents into ~budget-token
    groups. Exact first-fit packing is inherently sequential, so the
    scalable variant used here is STREAMING packing with bounded
    overflow: documents are taken in id order within each shard, and a
    document is assigned to the pack in which its cumulative token
    offset starts::

        pack_id = floor((cumsum(tokens) - tokens) / budget)

    Every pack's total lands in [budget - max_doc + 1, budget +
    max_doc - 1] (the boundary document overflows its pack rather than
    splitting), packs are contiguous in id order, and the assignment is
    a pure function of (id set, token counts) — independent of
    partition layout and parallelism, reproducible on any engine.

    100-TB shape: the only non-local step is one window cumsum
    PARTITIONED BY shard_id — each shard's running sum is sequential by
    nature, but shards are hash-spread and independently computed, so
    parallelism = n_shards; pick n_shards so a shard's rows fit one
    task (the same sizing rule as :func:`write_shards`). No driver
    state, no collect.

    Returns (id, shard_id, n_tokens, pack_id).
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("shard_id")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = with_shard(df, id_col, n_shards, salt).select(
        F.col(id_col).alias("id"),
        "shard_id",
        tx.token_count(text_col).cast("bigint").alias("n_tokens"),
    )
    cum = F.sum("n_tokens").over(w)
    return base.withColumn(
        "pack_id",
        F.floor((cum - F.col("n_tokens")) / F.lit(budget)).cast("bigint"),
    )


def pack_manifest(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget: int,
    n_shards: int,
    salt: int = 29,
) -> DataFrame:
    """Per-pack manifest over :func:`pack_docs`: (shard_id, pack_id,
    n_docs, n_tokens, first_id, last_id). One groupBy on top of the
    per-shard window — the dataloader's batch index."""
    return (
        pack_docs(df, id_col, text_col, budget, n_shards, salt)
        .groupBy("shard_id", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("id").alias("first_id"),
            F.max("id").alias("last_id"),
        )
    )
