"""Connected components — the clustering step every dedup pipeline
needs after pair generation (near-dup PAIRS → duplicate GROUPS with a
canonical representative).

Iterative min-label propagation: every vertex starts labeled with its
own id; each round takes the min of its label and its neighbors'
labels; fixpoint in O(diameter) rounds (duplicate clusters are
near-cliques, so 2-3 rounds in practice).

Scale shape: each round is one shuffle join + one aggregation over the
edge relation — the standard large-graph CC pattern (GraphX/Pregel do
exactly this). The driver loop only checks a convergence COUNT per
round (bounded, never materializes rows), and ``localCheckpoint``
truncates the lineage each round so the plan doesn't grow with the
iteration count — without it each round re-executes all prior rounds
and the DAG is exponential.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components"]


def connected_components(
    edges: DataFrame, src: str, dst: str, *, max_iter: int = 50
) -> DataFrame:
    """(node, cluster_id) for every node in ``edges``; cluster_id = the
    minimum node id reachable in the undirected graph (deterministic
    canonical representative)."""
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = sym.union(
        sym.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct().localCheckpoint()
    labels = sym.select("u").distinct().select("u", F.col("u").alias("lbl"))

    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels.select(F.col("u").alias("v"), "lbl"), "v")
            .groupBy("u")
            .agg(F.min("lbl").alias("nlbl"))
        )
        new_labels = (
            labels.join(nbr_min, "u", "left")
            .select(
                "u",
                F.least("lbl", F.coalesce("nlbl", F.col("lbl"))).alias("lbl"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "u")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("u").alias("node"), F.col("lbl").alias("cluster_id"))
