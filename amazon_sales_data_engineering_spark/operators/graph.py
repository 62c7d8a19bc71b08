"""Iterative graph operators: connected components for dedup clustering.

Near-dup PAIRS (MinHash / embedding-cosine) aren't enough to deduplicate a
corpus — transitively connected docs must collapse to one canonical keeper.
That's connected components over the pair graph, an inherently ITERATIVE
algorithm (no fixed-depth SQL expresses it for unbounded diameter).

Implementation: min-label propagation. Every node starts labeled with
itself; each round, a node takes the min label in its neighborhood; stop
when a round changes nothing. Rounds needed ≈ graph diameter (near-dup
graphs are shallow — tight clusters). Each round is one shuffle
(join + groupBy on node); ``localCheckpoint`` every few rounds cuts the
growing lineage so plans don't re-execute from round 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Components of the undirected graph given by ``edges``.

    Returns (node, component) for every node appearing in an edge, where
    component = the minimum node id reachable from it. Converges in
    O(diameter) rounds; raises if ``max_iter`` rounds don't converge."""
    both = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    neighbors = both.distinct()

    labels = (
        neighbors.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )

    for i in range(max_iter):
        # candidate label per node: min over its own and neighbors' labels
        neighbor_labels = (
            neighbors.join(
                labels.withColumnRenamed("node", "v").withColumnRenamed(
                    "label", "v_label"
                ),
                "v",
            )
            .groupBy("u")
            .agg(F.min("v_label").alias("n_label"))
            .withColumnRenamed("u", "node")
        )
        new_labels = (
            labels.join(neighbor_labels, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("n_label"), F.col("label"))
                ).alias("label"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint()
        converged = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .isEmpty()
        )
        labels = new_labels
        if converged:
            return labels.select(F.col("node"), F.col("label").alias("component"))
    raise RuntimeError(f"connected_components: no convergence in {max_iter} rounds")
