"""Clustering wrappers over the MinHash neighbor graph (reference M4/M5).

Mirrors the reference's cluster/ package:

* ``MinHashSpectralClustering`` — MinHash(similarity=True) → symmetric
  kneighbors_graph → normalized spectral clustering on the precomputed
  affinity (cluster/minHashSpectralClustering.py:20-98, which delegates to
  sklearn SpectralClustering(affinity='precomputed')). The eigen-solve is
  inherently single-node — the reference's sklearn call is too — so the
  (k·n)-edge graph is collected to the driver under an explicit vertex
  guard; candidate generation and the exact re-rank stay distributed.
* ``MinHashClustering`` — the generic wrapper (cluster/minHashClustering.py:
  23-80): fit a MinHash index, build the distance graph, hand a local
  affinity matrix to ANY pluggable clusterer; optional PCA reduction
  (numpy SVD in place of sklearn PCA). UMAP reduction is gated behind an
  import-try like the reference's optional dependency.

sklearn is not available in this environment, so the spectral embedding
(Ng-Jordan-Weiss normalized Laplacian) and k-means are implemented on
numpy directly; test_cluster.py checks planted partitions are recovered.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from webdedup.api import MinHashNeighbors


def _graph_to_dense(
    edges, ids: list, similarity: bool, self_affinity: float = 1.0
) -> np.ndarray:
    """(src, dst, weight) rows → dense symmetric affinity matrix.

    similarity=True: weights already are affinities (cosine). Otherwise
    weights are distances in [0, 1] (jaccard) and affinity = 1 - distance.
    """
    pos = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    A = np.zeros((n, n))
    for r in edges:
        w = float(r["weight"])
        a = w if similarity else 1.0 - w
        i, j = pos[r["src"]], pos[r["dst"]]
        A[i, j] = a
        A[j, i] = a
    np.fill_diagonal(A, self_affinity)
    return A


def _lloyd_kmeans(X: np.ndarray, k: int, iters: int = 50, n_init: int = 10, seed: int = 0):
    """Plain seeded Lloyd k-means, best of n_init restarts (sklearn
    SpectralClustering's assign_labels='kmeans' role)."""
    best, best_inertia = None, np.inf
    rng = np.random.RandomState(seed)
    for _ in range(n_init):
        C = X[rng.choice(len(X), size=min(k, len(X)), replace=False)].copy()
        for _ in range(iters):
            d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = d.argmin(axis=1)
            newC = np.array(
                [X[a == j].mean(axis=0) if (a == j).any() else C[j] for j in range(len(C))]
            )
            if np.allclose(newC, C):
                C = newC
                break
            C = newC
        inertia = ((X - C[a]) ** 2).sum()
        if inertia < best_inertia:
            best_inertia, best = inertia, a
    return best


def spectral_labels(A: np.ndarray, n_clusters: int, seed: int = 0) -> np.ndarray:
    """Ng-Jordan-Weiss normalized spectral clustering on a dense affinity."""
    d = A.sum(axis=1)
    d_inv_sqrt = 1.0 / np.sqrt(np.maximum(d, 1e-12))
    M = A * d_inv_sqrt[:, None] * d_inv_sqrt[None, :]
    vals, vecs = np.linalg.eigh(M)
    U = vecs[:, -n_clusters:]  # top eigenvectors of the normalized affinity
    norms = np.maximum(np.linalg.norm(U, axis=1, keepdims=True), 1e-12)
    return _lloyd_kmeans(U / norms, n_clusters, seed=seed)


class MinHashSpectralClustering:
    """M4: spectral clustering over the approximate cosine kNN graph.

    Constructor mirrors minHashSpectralClustering.py:21-37 (the sklearn
    pass-through knobs that have no meaning here — eigen_solver, gamma,
    degree, coef0, kernel_params — are accepted and ignored, like several
    dead reference knobs). ``max_local_vertices`` guards the driver-side
    eigendecomposition; above it, use ``MinHashNeighbors.cluster``
    (distributed DBSCAN/CC) instead.
    """

    def __init__(
        self,
        n_clusters: int = 8,
        n_neighbors: int = 5,
        random_state: int = 0,
        radius: float = 1.0,
        fast: bool = False,
        number_of_hash_functions: int = 400,
        max_bin_size: int = 50,
        minimal_blocks_in_common: int = 1,
        shingle_size: int = 4,
        excess_factor: int = 5,
        max_local_vertices: int = 20_000,
        **_ignored_sklearn_knobs,
    ):
        self.n_clusters = n_clusters
        self.n_neighbors = n_neighbors
        self.random_state = random_state
        self.max_local_vertices = max_local_vertices
        self._nn = MinHashNeighbors(
            n_neighbors=n_neighbors,
            radius=radius,
            fast=fast,
            number_of_hash_functions=number_of_hash_functions,
            max_bin_size=max_bin_size,
            minimal_blocks_in_common=minimal_blocks_in_common,
            shingle_size=shingle_size,
            excess_factor=excess_factor,
            similarity=True,  # the reference builds the graph in similarity mode
        )
        self.labels_: dict | None = None

    def fit(self, X: DataFrame) -> "MinHashSpectralClustering":
        self._nn.fit(X)
        ids = [r["id"] for r in X.select("id").orderBy("id").collect()]
        if len(ids) > self.max_local_vertices:
            raise ValueError(
                f"{len(ids)} vertices > max_local_vertices="
                f"{self.max_local_vertices}: the spectral eigen-solve is "
                "single-node (as in the reference); use "
                "MinHashNeighbors.cluster for distributed clustering"
            )
        g = self._nn.kneighbors_graph(mode="distance", symmetric=True)
        A = _graph_to_dense(g.collect(), ids, similarity=True)
        lab = spectral_labels(A, self.n_clusters, seed=self.random_state)
        self.labels_ = dict(zip(ids, (int(x) for x in lab)))
        return self

    def fit_predict(self, X: DataFrame) -> dict:
        return self.fit(X).labels_


class MinHashClustering:
    """M5: generic clustering wrapper — any local clusterer over the MinHash
    distance graph (cluster/minHashClustering.py:23-80).

    ``clusterer``: object with fit_predict(matrix) -> labels, or a plain
    callable (matrix) -> labels. The matrix handed over is the dense
    symmetric graph (affinity if the MinHash object is similarity-mode,
    distance-filled-with-1.0 otherwise), optionally PCA-reduced.
    """

    def __init__(self, minhash_object: MinHashNeighbors, clusterer, max_local_vertices: int = 20_000):
        self._nn = minhash_object
        self._clusterer = clusterer
        self.max_local_vertices = max_local_vertices
        self._precomputed_graph: np.ndarray | None = None
        self.labels_: dict | None = None

    def fit(
        self,
        X: DataFrame,
        y: DataFrame | None = None,
        pPca: bool = False,
        pPcaDimensions: int | None = None,
        pUmap: bool = False,
        pUmapDict: dict | None = None,
    ) -> "MinHashClustering":
        self._nn.fit(X, y)
        ids = [r["id"] for r in X.select("id").orderBy("id").collect()]
        if len(ids) > self.max_local_vertices:
            raise ValueError(
                f"{len(ids)} vertices > max_local_vertices={self.max_local_vertices}"
            )
        g = self._nn.kneighbors_graph(mode="distance", symmetric=True)
        sim_mode = self._nn._resolved_metric() == "cosine"
        M = _graph_to_dense(g.collect(), ids, similarity=sim_mode)
        if not sim_mode:
            # distance semantics: absent edge = far (1.0), self = 0.0 — the
            # shape sklearn 'precomputed' distance consumers expect
            D = np.ones_like(M)
            nz = M > 0
            D[nz] = 1.0 - M[nz]
            np.fill_diagonal(D, 0.0)
            M = D
        if pPca:
            # numpy SVD in place of sklearn PCA (minHashClustering.py:52-57)
            Mc = M - M.mean(axis=0, keepdims=True)
            _, _, Vt = np.linalg.svd(Mc, full_matrices=False)
            dims = min(pPcaDimensions or M.shape[0] - 1, M.shape[0] - 1)
            M = Mc @ Vt[:dims].T
        if pUmap:
            try:
                import umap  # noqa: F401  (not shipped in this sandbox)
            except ImportError as e:
                raise NotImplementedError(
                    "UMAP reduction requires the optional umap-learn package"
                ) from e
            reducer = umap.UMAP(**(pUmapDict or {}))
            M = reducer.fit_transform(M)
        self._precomputed_graph = M
        fn = getattr(self._clusterer, "fit_predict", self._clusterer)
        lab = fn(M)
        self.labels_ = dict(zip(ids, (int(x) for x in lab)))
        return self

    def fit_predict(self, X: DataFrame, y: DataFrame | None = None, **kw) -> dict:
        return self.fit(X, y, **kw).labels_
