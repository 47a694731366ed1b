"""Connected components over an edge list — the clustering step of
corpus-scale deduplication.

Near-duplicate detection (``operators.dedup.near_dup_pairs``) yields *pairs*;
an actual dedup pass needs *clusters* (keep one representative per connected
component of the similarity graph).  The reference library stops at pairwise
machinery (its join operators, ``spanner/join.py``); clustering is part of
the beyond-reference training-data surface (SURVEY.md §7 step 9).

Algorithm: iterative **min-label propagation**.  Every node starts labeled
with its own id; each round every node takes the minimum label among itself
and its neighbors.  This converges to ``label(v) = min(component(v))`` in
O(graph diameter) rounds.  Duplicate clusters in practice have tiny
diameters (they are near-cliques — every member shares most shingles with
every other), so the loop runs 2-4 rounds even at corpus scale.

Scale design:

* Each round is ONE shuffle: an equijoin of the (node, label) table with the
  symmetrized edge list on the destination, followed by a map-side-combined
  ``min`` aggregate.  Both sides are hash-partitioned on the node id, so AQE
  can reuse the exchange across rounds.
* Lineage is truncated with ``localCheckpoint`` every round — without it the
  plan doubles per iteration and the driver, not the cluster, becomes the
  bottleneck.
* Convergence is detected from a single scalar action per round:
  ``sum(label)`` is strictly decreasing until fixpoint (labels only ever
  decrease), so an unchanged sum means convergence.  No expensive
  changed-row join.
* For graphs with giant components / long chains (not the dedup case) the
  large-star/small-star variant (Kiveris et al., "Connected Components in
  MapReduce and Beyond", SoCC'14) halves round counts; plain min-propagation
  is the right trade for near-clique dedup graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components"]


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iterations: int = 50,
) -> DataFrame:
    """Return ``(node, component)`` where ``component`` is the minimum node
    id reachable from ``node`` over the undirected edge list.

    Nodes that appear in no edge are absent (callers union isolated nodes
    back in if they want singleton clusters).
    """
    sym = (
        edges.select(F.col(src).alias("node"), F.col(dst).alias("peer"))
        .unionByName(edges.select(F.col(dst).alias("node"), F.col(src).alias("peer")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select("node").distinct().withColumn("component", F.col("node"))
    ).localCheckpoint(eager=True)

    prev_sum = None
    for _ in range(max_iterations):
        neighbor_labels = (
            sym.join(
                labels.select(
                    F.col("node").alias("peer"), F.col("component")
                ),
                "peer",
            ).select("node", "component")
        )
        labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("component")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels
