"""Iterative graph operators: connected components for dedup clustering.

Near-dup PAIRS (MinHash / embedding-cosine) aren't enough to deduplicate a
corpus — transitively connected docs must collapse to one canonical keeper.
That's connected components over the pair graph, an inherently ITERATIVE
algorithm (no fixed-depth SQL expresses it for unbounded diameter).

Implementation: min-label propagation with pointer-doubling path
compression. Every node starts labeled with itself; each round a node
takes (a) the min label in its neighborhood, then (b) its label's own
label — the pointer-doubling step that collapses label chains
exponentially, so rounds needed ≈ O(log diameter) instead of O(diameter).
Each round is materialized with an eager ``localCheckpoint`` (lineage cut
— later rounds and the convergence probe read the checkpoint instead of
re-executing the whole history), and convergence is detected WITHOUT a
self-join: labels only ever decrease, so the exact decimal sum of all
labels is strictly decreasing until the fixpoint — one cheap aggregate
per round replaces the join+isEmpty probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Components of the undirected graph given by ``edges``.

    Returns (node, component) for every node appearing in an edge, where
    component = the minimum node id reachable from it. Converges in
    O(log diameter) rounds (pointer doubling); raises if ``max_iter``
    rounds don't converge. Node ids must be non-negative integers (the
    sum-based convergence probe relies on labels being monotonically
    non-increasing, which holds for any total order; the decimal cast
    keeps the sum exact at any node count)."""
    both = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    # Materialize the edge list once: ``edges`` is often an expensive plan
    # (e.g. the bucketed cosine self-join) and every round joins against it
    # — without this cut it would re-execute per round.
    neighbors = both.distinct().localCheckpoint()

    labels = (
        neighbors.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )

    def label_sum(df: DataFrame):
        return df.agg(F.sum(F.col("label").cast("decimal(38,0)")).alias("s")).first()["s"]

    prev_sum = label_sum(labels)
    for _ in range(max_iter):
        # (a) candidate label per node: min over its own and neighbors' labels
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
        stepped = labels.join(neighbor_labels, "node", "left").select(
            "node",
            F.least(
                F.col("label"), F.coalesce(F.col("n_label"), F.col("label"))
            ).alias("label"),
        )
        # (b) pointer doubling: label <- label(label). A label is always a
        # node id, so the lookup is a self-join on the label table.
        parent = stepped.select(
            F.col("node").alias("p_node"), F.col("label").alias("p_label")
        )
        new_labels = (
            stepped.join(parent, stepped["label"] == parent["p_node"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("p_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()  # eager: materialize the round once
        )
        cur_sum = label_sum(new_labels)
        labels = new_labels
        if cur_sum == prev_sum:
            return labels.select(F.col("node"), F.col("label").alias("component"))
        prev_sum = cur_sum
    raise RuntimeError(f"connected_components: no convergence in {max_iter} rounds")
