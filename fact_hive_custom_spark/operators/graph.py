"""Distributed connected components — near-dup clusters from pair sets.

Near-dup detection (MinHash-LSH, SimHash, cosine) emits *pairs*; a
dedup pipeline needs *clusters* so it can keep one canonical document
per group. Pairs→clusters is connected components over the similarity
graph, and the scale-correct algorithm is the alternating
large-star / small-star method of Kiveris et al., "Connected
Components in MapReduce and Beyond" (SoCC 2014): each round is two
grouped aggregations + two joins (pure shuffles on node id), and the
edge set converges to stars (node → component-min) in O(log n) rounds
— versus O(graph diameter) for naive label propagation, which on a
100 TB near-dup chain can be thousands of rounds.

Driver-side iteration is inherent to the algorithm (every published
MapReduce/Spark CC does it); each round's edge set is
`localCheckpoint`-ed so the lineage stays O(1) instead of growing a
plan per round. Only the (u, v) long pairs ever shuffle — never
document payloads. On a real cluster swap `localCheckpoint` for a
reliable `checkpoint` dir to survive executor loss on long chains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fact_hive_custom_spark.materialize import materialize


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round on an undirected edge set.

    For each node u, let m = min(Γ(u) ∪ {u}); connect every *larger*
    neighbor v > u directly to m. Output edges are oriented
    (larger → smaller), strictly decreasing, so each round can only
    pull nodes toward their component minimum.
    """
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    gamma_min = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mv"))
        .select("u", F.least("u", "mv").alias("m"))
    )
    return (
        sym.filter(F.col("v") > F.col("u"))
        .join(gamma_min, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round on a (larger → smaller)-oriented edge set.

    For each node u with smaller neighbors N(u), let m = min(N(u));
    connect u and every other small neighbor to m. Flattens the tail
    of each star that large-star left behind.
    """
    gamma_min = edges.groupBy("u").agg(F.min("v").alias("m"))
    with_min = edges.join(gamma_min, "u")
    moved = with_min.filter(F.col("v") != F.col("m")).select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    self_edges = gamma_min.select("u", F.col("m").alias("v"))
    return moved.union(self_edges).distinct()


def connected_components(
    pairs: DataFrame, src: str, dst: str, max_iter: int = 25
) -> DataFrame:
    """(node, component) for every node appearing in `pairs`.

    `component` is the minimum node id in the node's connected
    component (a deterministic canonical representative — exactly the
    "keep the smallest doc_id" dedup convention). Nodes with no edges
    don't appear; callers left-join and coalesce to self.

    Each iteration alternates large-star and small-star and checks the
    fixpoint (edge set unchanged). Near-dup graphs converge in 2–4
    rounds; `max_iter` is a safety net (O(log n) is the proven bound),
    and non-convergence raises rather than returning partial clusters.
    """
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
        .transform(materialize)
    )
    for _ in range(max_iter):
        nxt = _small_star(_large_star(edges)).transform(materialize)
        unchanged = (
            nxt.count() == edges.count()
            and nxt.join(edges, ["u", "v"], "left_anti").isEmpty()
        )
        edges = nxt
        if unchanged:
            break
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
    # At the fixpoint every edge is (node → component-min); the roots
    # themselves appear only on the right side, so union them in.
    roots = edges.select(F.col("v").alias("u"), F.col("v")).distinct()
    return (
        edges.union(roots)
        .distinct()
        .select(F.col("u").alias("node"), F.col("v").alias("component"))
    )
