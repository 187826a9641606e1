"""Connected components over near-duplicate pair lists.

Every pair-producing dedup operator (ngram Jaccard, MinHash-LSH,
SimHash, blocked embedding cosine) emits EDGES; an actual corpus dedup
needs CLUSTERS — duplicate chains a-b and b-c must collapse to one
surviving document even though (a, c) was never emitted as a pair.
This module closes that gap with the alternating large-star /
small-star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14 — a published MapReduce algorithm,
re-expressed as DataFrame ops):

- each round is two (groupBy + join) passes over the CURRENT edge set
  — no adjacency matrices, no driver-side graph;
- the edge set only ever points "downhill" toward each component's
  minimum id, converging in O(log^2 n) rounds even on pathological
  chain graphs (plain min-label propagation needs O(diameter) rounds —
  fatal on a 10^6-long chain, which LSH bucket overlaps can produce);
- dedup graphs are near-cliques in practice, so typical convergence is
  2-3 rounds; the round loop is driver-side but each iteration's work
  is fully distributed, and the fixpoint test is an exact set
  comparison (count + subtract), not a heuristic.

The component id is the minimum member id (natural column ordering), so
cluster labels are deterministic across runs, partition layouts, and
parallelism levels — same contract as every other operator here.

No reference analog (beyond-reference operator per the task mandate);
the keeper-selection convention matches dedup.exact_dup_groups
(min id survives).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every node's larger neighbors to its smallest neighbor.

    For each node u (neighbors taken from BOTH edge directions):
    m = min(neighbors(u) + [u]); emit (v, m) for each neighbor v > u.
    Each undirected edge {a, b} is emitted exactly from its smaller
    endpoint's group, so connectivity is preserved.
    """
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = sym.groupBy("u").agg(F.min("v").alias("mv")).select(
        "u", F.least("mv", F.col("u")).alias("m")
    )
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Re-point every node's smaller neighbors (and itself) at the min.

    Edges are first oriented big -> small; for each node u with (all
    smaller) neighbors N: m = min(N); emit (v, m) for v in N, v != m,
    plus (u, m).
    """
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    to_min = (
        oriented.join(mins, "u")
        .where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    self_edge = mins.select(F.col("u"), F.col("m").alias("v"))
    return to_min.unionByName(self_edge).distinct()


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 60,
    small_graph_limit: int = 100_000,
) -> DataFrame:
    """(id, component_id) for every node appearing in ``pairs``.

    ``component_id`` is the minimum id in the node's connected
    component. Each round costs a bounded number of shuffles on the
    shrinking edge set; ``max_rounds`` is a safety net far above the
    O(log^2 n) guarantee (60 rounds covers any graph that fits in any
    cluster) — hitting it raises instead of returning partial clusters.

    Graphs with at most ``small_graph_limit`` edges skip the loop: the
    edge set is collected and solved with driver-side union-find (path
    compression, min-id roots — bit-identical output). The bound keeps
    the collect at a few MB; the EDGE SET is duplicates-only, already
    the output of the expensive pair stage, so on most corpora — even
    huge ones — it is sketch-sized, while each distributed round costs
    2 shuffle barriers + a fixpoint check regardless of size (measured:
    the loop dominated dup_clusters wall time at sf0.1). Corpora whose
    duplicate graph genuinely exceeds the bound (boilerplate floods)
    take the distributed loop unchanged; ``small_graph_limit=0``
    forces it (tests pin fast == distributed).

    Each round's edge set is ``localCheckpoint``-ed: iterative
    DataFrame algorithms MUST truncate lineage per round — a persist
    alone caches the data but Catalyst still re-analyzes the whole
    nested plan, whose size (and optimizer time) grows exponentially
    with rounds (measured: round 1 4s, round 2 200s+ on a 40-edge
    graph without truncation). The checkpoint blocks are executor-local
    (no DFS round-trip); a lost executor re-runs the round, which for a
    dedup edge set (tiny next to the corpus) is the right trade.
    """
    nodes = (
        pairs.select(F.col(src).alias("id"))
        .unionByName(pairs.select(F.col(dst).alias("id")))
        .distinct()
        .persist()
    )
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    n_edges = edges.count()
    if n_edges <= small_graph_limit:
        return _driver_components(nodes, edges)
    for _ in range(max_rounds):
        if n_edges == 0:
            break
        new = _small_star(_large_star(edges)).localCheckpoint()
        n_new = new.count()
        converged = n_new == n_edges and new.subtract(edges).isEmpty()
        edges, n_edges = new, n_new
        if converged:
            break
    else:
        nodes.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )
    # At the fixpoint the edge set is a star forest: (member, root) with
    # root < member. Roots (and any isolated node) map to themselves.
    out = (
        nodes.join(edges, nodes.id == edges.u, "left")
        .select("id", F.coalesce("v", "id").alias("component_id"))
        .persist()
    )
    out.count()
    nodes.unpersist()
    return out


def _driver_components(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Union-find over a collected (bounded — see connected_components)
    edge set; same (id, component_id = min member) contract as the
    distributed loop. ``nodes`` is consumed and unpersisted."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    node_ids = [r["id"] for r in nodes.collect()]
    for n in node_ids:
        parent[n] = n
    for row in edges.collect():
        ru, rv = find(row["u"]), find(row["v"])
        if ru != rv:
            parent[ru] = rv
    # label every component by its minimum member (the keeper contract)
    min_of: dict = {}
    for n in node_ids:
        r = find(n)
        if r not in min_of or n < min_of[r]:
            min_of[r] = n
    spark = nodes.sparkSession
    schema = nodes.schema.fields[0].dataType
    out = spark.createDataFrame(
        [(n, min_of[find(n)]) for n in node_ids],
        f"id {schema.simpleString()}, component_id {schema.simpleString()}",
    ).persist()
    out.count()
    nodes.unpersist()
    return out


def dup_clusters(
    pairs: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """Per-node cluster assignment with cluster sizes.

    (id, cluster_id, cluster_size): cluster_id = keeper (min member id),
    cluster_size >= 2 by construction (every node here came from a
    pair). The size join is an aggregate of the (small — duplicates
    only) component table, not of the corpus.
    """
    comp = connected_components(pairs, src, dst)
    sizes = comp.groupBy("component_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return comp.join(sizes, "component_id").select(
        "id", F.col("component_id").alias("cluster_id"), "cluster_size"
    )


def near_dedup(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Drop every non-keeper member of every duplicate cluster.

    Survivors = rows whose id is not a non-root member of any component
    — one left-anti join of the corpus against the (duplicates-only,
    usually tiny) victim list; the corpus itself is never shuffled.
    """
    victims = connected_components(pairs, src, dst).where(
        F.col("id") != F.col("component_id")
    )
    return df.join(
        victims, df[id_col] == victims.id, "left_anti"
    )


def golden_records(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    quality_col: str,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Survivorship: per duplicate cluster, elect the canonical
    ("golden") record by QUALITY instead of the min-id convention —
    highest ``quality_col`` wins, ties (and NULL quality, sorted last)
    break to the smallest id so election stays deterministic. The
    record-linkage completion of the dedup arc: pairs → clusters →
    one keeper, with a redirect map for everything else.

    Returns one row per cluster MEMBER:
      (cluster_id, id, keeper_id, is_keeper, cluster_size)
    — the (id → keeper_id) mapping is exactly the rewrite table a
    downstream pipeline needs to repoint references before dropping
    victims (``near_dedup`` drops by min-id; this generalizes the
    election and keeps the map).

    Scale story: components run on the (duplicates-only) edge list; the
    quality join touches only cluster members — broadcast when dup
    clusters are the usual minority — and the election window
    partitions by cluster (each partition is one cluster's member
    list). The corpus is never shuffled.
    """
    from pyspark.sql import Window

    clusters = dup_clusters(pairs, src, dst)
    members = clusters.join(
        df.select(
            F.col(id_col).alias("id"), F.col(quality_col).alias("__q")
        ),
        "id",
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("__q").desc_nulls_last(), F.col("id").asc()
    )
    ranked = members.withColumn("__rk", F.row_number().over(w))
    keepers = ranked.where(F.col("__rk") == 1).select(
        "cluster_id", F.col("id").alias("keeper_id")
    )
    return ranked.join(keepers, "cluster_id").select(
        "cluster_id",
        "id",
        "keeper_id",
        (F.col("id") == F.col("keeper_id")).alias("is_keeper"),
        F.col("cluster_size").cast("bigint").alias("cluster_size"),
    )
