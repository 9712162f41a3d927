"""M4/M5 clustering wrappers: spectral + generic over the MinHash graph."""

import numpy as np
import pytest

from webdedup.cluster import MinHashClustering, MinHashSpectralClustering, spectral_labels
from webdedup.api import MinHashNeighbors


def planted_rows(n_clusters=4, per=12, dim=4000, seed=3):
    rng = np.random.RandomState(seed)
    rows, truth = [], []
    for c in range(n_clusters):
        base = np.unique(rng.randint(0, dim, size=60))
        for _ in range(per):
            keep = base[rng.rand(base.size) > 0.08]
            rows.append(np.unique(keep))
            truth.append(c)
    return rows, truth


def as_df(spark, rows):
    return spark.createDataFrame(
        [(i, [int(x) for x in r]) for i, r in enumerate(rows)],
        "id long, features array<long>",
    )


def partition_of(labels: dict):
    g = {}
    for i, l in labels.items():
        g.setdefault(l, set()).add(i)
    return {frozenset(v) for v in g.values()}


def truth_partition(truth):
    g = {}
    for i, c in enumerate(truth):
        g.setdefault(c, set()).add(i)
    return {frozenset(v) for v in g.values()}


def test_spectral_labels_block_diagonal():
    """Pure-numpy sanity: two disconnected cliques → two clusters."""
    A = np.zeros((8, 8))
    A[:4, :4] = 1.0
    A[4:, 4:] = 1.0
    lab = spectral_labels(A, 2, seed=0)
    assert len(set(lab[:4])) == 1 and len(set(lab[4:])) == 1
    assert lab[0] != lab[4]


def test_spectral_recovers_planted_clusters(spark):
    rows, truth = planted_rows()
    sc = MinHashSpectralClustering(
        n_clusters=4, n_neighbors=5, number_of_hash_functions=96,
        max_bin_size=10_000, random_state=0,
    )
    labels = sc.fit_predict(as_df(spark, rows))
    assert partition_of(labels) == truth_partition(truth)


def test_spectral_vertex_guard(spark):
    rows, _ = planted_rows(n_clusters=1, per=4)
    sc = MinHashSpectralClustering(n_clusters=2, max_local_vertices=2)
    with pytest.raises(ValueError, match="max_local_vertices"):
        sc.fit(as_df(spark, rows))


def test_generic_wrapper_with_pluggable_clusterer(spark):
    """M5: any callable over the dense distance matrix works — here a
    trivial threshold-connectivity clusterer."""
    rows, truth = planted_rows(n_clusters=3, per=8)

    def threshold_cc(D):
        n = D.shape[0]
        lab = list(range(n))

        def find(i):
            while lab[i] != i:
                lab[i] = lab[lab[i]]
                i = lab[i]
            return i

        for i in range(n):
            for j in range(i + 1, n):
                if D[i, j] <= 0.4:
                    ri, rj = find(i), find(j)
                    if ri != rj:
                        lab[max(ri, rj)] = min(ri, rj)
        return [find(i) for i in range(n)]

    nn = MinHashNeighbors(
        n_neighbors=5, number_of_hash_functions=96, max_bin_size=10_000,
        metric="jaccard",
    )
    mc = MinHashClustering(nn, threshold_cc)
    labels = mc.fit_predict(as_df(spark, rows))
    assert partition_of(labels) == truth_partition(truth)
    assert mc._precomputed_graph is not None


def test_generic_wrapper_pca_reduction(spark):
    rows, truth = planted_rows(n_clusters=2, per=8)
    from webdedup.cluster import _lloyd_kmeans

    nn = MinHashNeighbors(
        n_neighbors=5, number_of_hash_functions=96, max_bin_size=10_000,
        metric="jaccard",
    )
    mc = MinHashClustering(nn, lambda M: _lloyd_kmeans(M, 2, seed=1))
    labels = mc.fit_predict(as_df(spark, rows), pPca=True, pPcaDimensions=4)
    assert mc._precomputed_graph.shape[1] == 4
    assert partition_of(labels) == truth_partition(truth)
