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

from pyspark.sql import DataFrame, Observation, functions as F


#: diagnostics from the most recent connected_components call on this
#: driver (rounds to fixpoint, symmetric edge count, active vertices):
#: the scale-evidence benches read it to show CC round count stays flat
#: as the corpus grows (hash-min + pointer jumping converges in
#: O(log diameter) — the 100-TB claim rests on that curve, BENCH r5)
LAST_STATS: dict = {}


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
    sym = sym.localCheckpoint(eager=True)
    # Size the loop's shuffles to the edge count, not the session default:
    # dup edges are tiny relative to the corpus and per-iteration latency is
    # dominated by task scheduling when partitions are near-empty.
    n_edges = sym.count()
    parts = max(4, min(256, n_edges // 50_000 + 1))
    sym = sym.repartition(parts, "dst")
    # Only vertices touching an edge can ever change label; isolated vertices
    # keep cluster_id = id and never enter the loop. At web scale dup-edge
    # vertices are a small fraction of the corpus — this shrinks every
    # iteration's shuffle from O(corpus) to O(dup docs).
    active = sym.select(F.col("src").alias("id")).distinct()
    labels = active.select(F.col("id"), F.col("id").alias("cluster_id"))
    labels = labels.localCheckpoint(eager=True)

    for it in range(max_iter):
        # min label over incoming neighbors PLUS the current label's own
        # label (pointer jumping): unioning the (id → cluster_id) assignment
        # edges into the propagation graph makes each round take
        # label(id) = min(label(nbrs), label(label(id))), which converges in
        # O(log diameter) rounds instead of O(diameter) — a 25+-hop drift
        # chain no longer exhausts max_iter.
        lbl_edges = labels.select(
            F.col("id").alias("src"), F.col("cluster_id").alias("dst")
        )
        prop = sym.unionByName(lbl_edges)
        nbr_min = (
            prop.join(labels, prop.dst == labels.id)
            .groupBy("src")
            .agg(F.min("cluster_id").alias("nbr_label"))
            .withColumnRenamed("src", "id")
        )
        # fold the convergence check into the same action that materializes
        # the checkpoint (observe = free metric, no second job)
        ob = Observation(f"cc_changed_{it}")
        new_labels = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("cluster_id"), F.coalesce("nbr_label", "cluster_id")
                ).alias("cluster_id"),
                (
                    F.coalesce("nbr_label", "cluster_id") < F.col("cluster_id")
                ).cast("long").alias("_chg"),
            )
            .observe(ob, F.sum("_chg").alias("changed"))
            .select("id", "cluster_id")
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        labels = new_labels
        LAST_STATS.update(rounds=it + 1, n_sym_edges=n_edges)
        if (ob.get["changed"] or 0) == 0:
            break
    else:
        # never abort a whole batch/incremental run over a pathological
        # chain: labels are a valid (possibly over-split) clustering — warn
        # and return them; the next incremental round re-resolves the full
        # edge store anyway
        import warnings

        warnings.warn(
            f"connected_components did not converge in {max_iter} iterations;"
            " returning partial labels (components may be over-split)",
            RuntimeWarning,
        )
    # fold isolated vertices back in with their own id as the label
    return vertices.select("id").join(labels, "id", "left").select(
        "id", F.coalesce("cluster_id", "id").alias("cluster_id")
    )
