"""Iterative connected components: hash-min label propagation on DataFrames.

Resolves transitive duplicate clusters from the verified-pair edge list (the
role sklearn DBSCAN plays downstream of the reference's distance graph,
cluster/minHashDBSCAN.py:53-85 — density clustering at eps = Jaccard
threshold over these edges IS connectivity).

Driver-side loop of joins with localCheckpoint() per iteration to truncate
lineage; converges in O(cluster diameter) rounds — web dup clusters are
shallow (near-clique), so typically 2-4 rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    max_iter: int = 25,
) -> DataFrame:
    """(id) vertices + (a, b) edges → (id, cluster_id = min id in component).

    Hash-min propagation: every vertex repeatedly adopts the minimum label
    in its closed neighborhood until a fixpoint. Each iteration is one
    shuffle (groupBy id); lineage is cut with localCheckpoint so plan depth
    stays O(1) per round instead of O(rounds).
    """
    sym = (
        edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .union(edges.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    )
    labels = vertices.select(F.col("id"), F.col("id").alias("cluster_id"))
    labels = labels.localCheckpoint(eager=True)

    for _ in range(max_iter):
        # min label over incoming neighbors
        nbr_min = (
            sym.join(labels, sym.dst == labels.id)
            .groupBy("src")
            .agg(F.min("cluster_id").alias("nbr_label"))
            .withColumnRenamed("src", "id")
        )
        new_labels = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("cluster_id"), F.coalesce("nbr_label", "cluster_id")
                ).alias("cluster_id"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} iterations")
    return labels
