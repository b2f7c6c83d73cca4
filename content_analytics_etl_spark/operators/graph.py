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

__all__ = ["connected_components", "common_neighbor_scores"]


def connected_components(
    edges: DataFrame,
    src: str,
    dst: str,
    *,
    max_iter: int = 50,
    distinct_pairs: bool = False,
) -> DataFrame:
    """(node, cluster_id) for every node in ``edges``; cluster_id = the
    minimum node id reachable in the undirected graph (deterministic
    canonical representative).

    ``distinct_pairs=True`` declares the input a DISTINCT canonical
    (src < dst) pair list — the near-dup pair graph's contract — whose
    symmetrization is then distinct by construction (the two
    orientations cannot collide), skipping the dedup exchange (r15).
    Duplicate edges would only inflate the per-round join fan-out, not
    change labels, so the flag is a performance declaration."""
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = sym.union(sym.select(F.col("v").alias("u"), F.col("u").alias("v")))
    if not distinct_pairs:
        sym = sym.distinct()
    sym = sym.localCheckpoint()
    labels = sym.select("u").distinct().select("u", F.col("u").alias("lbl"))

    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels.select(F.col("u").alias("v"), "lbl"), "v")
            .groupBy("u")
            .agg(F.min("lbl").alias("nlbl"))
        )
        # r15: the convergence flag rides ON the checkpointed label
        # table — the old shape re-joined new vs old labels (one extra
        # shuffle join per round) just to count changes; now the count
        # is a narrow filter over the checkpoint.
        new_labels = (
            labels.join(nbr_min, "u", "left")
            .select(
                "u",
                F.least("lbl", F.coalesce("nlbl", F.col("lbl"))).alias("lbl"),
                (F.coalesce("nlbl", F.col("lbl")) < F.col("lbl")).alias(
                    "chg"
                ),
            )
            .localCheckpoint()
        )
        changed = new_labels.filter(F.col("chg")).count()
        labels = new_labels.select("u", "lbl")
        if changed == 0:
            break
    return labels.select(F.col("u").alias("node"), F.col("lbl").alias("cluster_id"))


def common_neighbor_scores(pairs: DataFrame, a: str = "doc_a", b: str = "doc_b") -> DataFrame:
    """Link-prediction scores over an undirected pair list: for every
    NON-edge (node_a < node_b) sharing >= 1 neighbor, the
    common-neighbor count and neighborhood Jaccard. ``pairs`` must be
    canonical (a < b per row). Wedge enumeration is one self-equi-join
    of the symmetrized edges on the middle vertex — linear in wedge
    count (sum of deg^2), all equi-joins."""
    edges = pairs.select(F.col(a).alias("src"), F.col(b).alias("dst")).unionAll(
        pairs.select(F.col(b).alias("src"), F.col(a).alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    cn = (
        edges.alias("x")
        .join(edges.alias("y").hint("merge"), F.col("x.dst") == F.col("y.src"))
        .filter(F.col("x.src") < F.col("y.dst"))
        .groupBy(F.col("x.src").alias("node_a"), F.col("y.dst").alias("node_b"))
        .agg(F.count(F.lit(1)).alias("common_neighbors"))
    )
    ex = pairs.select(F.col(a).alias("node_a"), F.col(b).alias("node_b"))
    cand = cn.join(ex, ["node_a", "node_b"], "left_anti")
    da = deg.select(F.col("src").alias("node_a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("src").alias("node_b"), F.col("deg").alias("deg_b"))
    jac = F.col("common_neighbors").cast("double") / (
        F.col("deg_a") + F.col("deg_b") - F.col("common_neighbors")
    ).cast("double")
    return (
        cand.join(da, "node_a")
        .join(db, "node_b")
        .select(
            "node_a", "node_b", "common_neighbors", "deg_a", "deg_b",
            jac.alias("jaccard"),
        )
    )
