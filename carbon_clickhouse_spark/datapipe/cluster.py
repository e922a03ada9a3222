"""Near-duplicate cluster formation: connected components over a
pair/edge list.

Pair generators (:func:`..dedup.minhash_lsh_pairs`,
:func:`..dedup.simhash_pairs`, :func:`..similarity.lsh_bucketed_pairs`)
emit EDGES; a training-data dedup pass needs the transitive CLOSURE —
"keep one doc per connected component". This module closes that gap
with the alternating large-star / small-star algorithm (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC 2014):
O(log n) rounds of two groupBy-join steps, each shuffling only
(long, long) edge pairs — no adjacency materialization, no driver
state, which is what lets it run over billions of edges where a
single-machine union-find cannot.

Determinism: every step is a min() over node ids, so the final
labeling (node -> smallest id in its component) is unique regardless
of partitioning — oracle-checkable against a recursive-CTE closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _canonical(edges: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Undirected edge list -> distinct (u < v) long pairs, self-loops
    dropped."""
    e = edges.select(
        F.col(a_col).cast("long").alias("x"), F.col(b_col).cast("long").alias("y")
    ).filter(F.col("x") != F.col("y"))
    return e.select(
        F.least("x", "y").alias("u"), F.greatest("x", "y").alias("v")
    ).distinct()


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every neighbor v > u to min(N(u) + {u})."""
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("mn", "u").alias("m"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("m").alias("u"), F.col("v").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Within each node's smaller-neighbor set, connect everything to
    the minimum. Edges arrive canonical (u < v), so the smaller
    neighbors of v are exactly its u-side partners."""
    mins = e.groupBy("v").agg(F.min("u").alias("m"))
    moved = (
        e.join(mins, "v")
        .filter(F.col("u") != F.col("m"))
        .select(F.col("m").alias("u"), F.col("u").alias("v"))
    )
    stars = mins.select(F.col("m").alias("u"), F.col("v").alias("v"))
    return moved.unionByName(stars).distinct()


def _signature(e: DataFrame) -> tuple:
    """Order-independent fingerprint of an edge set: one aggregate job
    (count + hash-sum) — the cheap fixed-point test at scale."""
    row = e.agg(
        F.count("*").alias("n"),
        # decimal sum: a plain long sum of 64-bit hashes overflows
        # under ANSI mode
        F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
    ).first()
    return (row["n"], row["h"])


def connected_components(
    edges: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    nodes: DataFrame | None = None,
    id_col: str = "doc_id",
    max_iter: int = 25,
) -> DataFrame:
    """-> (node, cluster_id) with cluster_id = smallest node id in the
    component.

    ``nodes`` (optional) adds edge-less singletons, labeled by
    themselves. ``max_iter`` is a safety cap; the algorithm's round
    count is O(log n) and the loop exits at the edge-set fixed point
    (checked by an aggregate signature, with a localCheckpoint per
    round so lineage never stacks across iterations).
    """
    e = _canonical(edges, a_col, b_col).localCheckpoint()
    sig = _signature(e)
    for _ in range(max_iter):
        e2 = _small_star(_large_star(e)).localCheckpoint()
        sig2 = _signature(e2)
        e = e2
        if sig2 == sig:
            break
        sig = sig2
    # converged edges are stars (m, x): label x -> m, and m -> itself
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    labels = (
        sym.unionByName(e.select("u", F.col("u").alias("v")))
        .groupBy("u")
        .agg(F.min("v").alias("cluster_id"))
        .select(F.col("u").alias("node"), "cluster_id")
    )
    if nodes is not None:
        singles = (
            nodes.select(F.col(id_col).cast("long").alias("node"))
            .distinct()
            .join(labels, "node", "left_anti")
            .select("node", F.col("node").alias("cluster_id"))
        )
        labels = labels.unionByName(singles)
    return labels


def dedup_clusters(
    docs: DataFrame,
    edges: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    id_col: str = "doc_id",
) -> DataFrame:
    """-> (doc_id, cluster_id, cluster_size, is_keeper) for every doc
    that has at least one near-dup edge; the keeper is the smallest
    doc_id of the cluster (deterministic survivor selection).
    """
    comp = connected_components(edges, a_col, b_col)
    sizes = comp.groupBy("cluster_id").agg(
        F.count("*").cast("long").alias("cluster_size")
    )
    return (
        comp.join(sizes, "cluster_id")
        .select(
            F.col("node").alias(id_col),
            "cluster_id",
            "cluster_size",
            (F.col("node") == F.col("cluster_id")).alias("is_keeper"),
        )
    )
