"""Connected components over candidate-pair edges: the group-resolution
step of a dedup pipeline (pairs → clusters → keeper per cluster).

Algorithm: iterative min-label propagation to fixpoint. Each round is
one shuffle (edge ⋈ label, min per node); rounds needed = cluster
diameter, which for near-dup clusters is tiny (dup groups are cliques
or near-cliques from band collisions — diameter 1-3). The driver loop
carries only a converged/not-converged boolean; labels stay
distributed, and each round persists + truncates lineage so plans
don't grow. This is the standard scalable formulation (GraphX/
GraphFrames use the same shape); for adversarial high-diameter graphs
swap in large-star/small-star — near-dup graphs never need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 25,
) -> DataFrame:
    """Resolve undirected edges (id_a, id_b) into components.

    Returns (node, component) where component = min node id reachable —
    a deterministic canonical keeper id per duplicate group.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # localCheckpoint (not persist) inside the loop: it truncates
    # lineage, so round N's plan doesn't contain rounds 1..N-1
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(F.col("dst").alias("node2"))
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = labels.join(
            neighbor_min, labels.node == F.col("node2"), "left"
        ).select(
            "node",
            F.least(
                F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
            ).alias("component"),
            (F.col("nbr_min") < F.col("component")).alias("_changed"),
        ).localCheckpoint(eager=True)
        changed = new_labels.where(F.col("_changed")).limit(1).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break

    edges.unpersist()
    return labels
