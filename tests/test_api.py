"""MinHashNeighbors API tests — recall vs exact brute-force, tie semantics,
graph symmetry, classifier accuracy. Mirrors the reference's own accuracy
harness (run_test.py:38-77: recall of approximate kneighbors vs exact NN).
"""

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from webdedup import kernels as K
from webdedup.api import MinHashClassifier, MinHashNeighbors


def make_sparse_rows(n=120, dim=5000, nnz=60, n_clusters=12, seed=7):
    """Clustered sparse feature sets: rows in a cluster share ~90% features."""
    rng = np.random.RandomState(seed)
    rows, labels = [], []
    per = n // n_clusters
    for c in range(n_clusters):
        base = np.unique(rng.randint(0, dim, size=nnz))
        for _ in range(per):
            keep = base[rng.rand(base.size) > 0.1]
            extra = np.unique(rng.randint(0, dim, size=max(1, nnz // 10)))
            rows.append(np.unique(np.concatenate([keep, extra])))
            labels.append(c)
    return rows, labels


@pytest.fixture(scope="module")
def data(spark):
    rows, labels = make_sparse_rows()
    df = spark.createDataFrame(
        [(i, [int(x) for x in r]) for i, r in enumerate(rows)],
        "id long, features array<long>",
    )
    y = spark.createDataFrame(
        [(i, int(l)) for i, l in enumerate(labels)], "id long, label int"
    )
    return df, y, rows, labels


def brute_knn(rows, k):
    n = len(rows)
    out = {}
    for i in range(n):
        d = [
            (1.0 - K.jaccard_sorted(rows[i], rows[j]), j)
            for j in range(n)
            if j != i
        ]
        d.sort()
        out[i] = d[:k]
    return out


def test_kneighbors_recall_vs_exact(spark, data):
    df, _, rows, _ = data
    nn = MinHashNeighbors(
        n_neighbors=5, number_of_hash_functions=128, shingle=0,
        max_bin_size=10_000, excess_factor=5, fast=False,
    ).fit(df)
    got = nn.kneighbors()
    pairs = {(r["query_id"], r["cand_id"]) for r in got.collect()}
    exact = brute_knn(rows, 5)
    hits = tot = 0
    for q, ns in exact.items():
        for d, j in ns:
            tot += 1
            hits += (q, j) in pairs
    recall = hits / tot
    assert recall >= 0.95, f"kneighbors recall {recall:.3f}"


def test_kneighbors_distances_exact_when_slow_path(spark, data):
    df, _, rows, _ = data
    nn = MinHashNeighbors(
        n_neighbors=3, number_of_hash_functions=64, fast=False, max_bin_size=10_000
    ).fit(df)
    for r in nn.kneighbors().limit(50).collect():
        want = 1.0 - K.jaccard_sorted(rows[r["query_id"]], rows[r["cand_id"]])
        assert r["distance"] == pytest.approx(want, abs=1e-9)


def test_fast_path_distance_transform(spark, data):
    """fast=True distances must be 1 - collisions/sig_len in [0, 1]."""
    df, _, _, _ = data
    nn = MinHashNeighbors(
        n_neighbors=3, number_of_hash_functions=64, fast=True, max_bin_size=10_000
    ).fit(df)
    rows = nn.kneighbors().limit(100).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["distance"] <= 1.0


def test_self_edges_dropped_on_self_query(spark, data):
    df, _, _, _ = data
    nn = MinHashNeighbors(n_neighbors=3, number_of_hash_functions=64, max_bin_size=10_000).fit(df)
    assert nn.kneighbors().where("query_id = cand_id").count() == 0


def test_explicit_query_keeps_self_match(spark, data):
    """Querying with X = fitted data keeps the self hit at distance 0
    (reference: cutFirstValue only when X is None)."""
    df, _, _, _ = data
    nn = MinHashNeighbors(n_neighbors=3, number_of_hash_functions=64, max_bin_size=10_000).fit(df)
    got = nn.kneighbors(df)
    selfs = got.where("query_id = cand_id")
    assert selfs.count() > 0
    assert selfs.where("distance > 1e-9").count() == 0


def test_radius_neighbors(spark, data):
    df, _, rows, _ = data
    nn = MinHashNeighbors(number_of_hash_functions=128, max_bin_size=10_000).fit(df)
    got = nn.radius_neighbors(radius=0.3)
    for r in got.limit(50).collect():
        assert r["distance"] <= 0.3 + 1e-9


def test_graph_symmetric(spark, data):
    df, _, _, _ = data
    nn = MinHashNeighbors(n_neighbors=3, number_of_hash_functions=64, max_bin_size=10_000).fit(df)
    g = nn.kneighbors_graph(mode="distance", symmetric=True)
    a = {(r["src"], r["dst"]): r["weight"] for r in g.collect()}
    for (s, d), w in a.items():
        assert (d, s) in a and a[(d, s)] == pytest.approx(w)


def test_graph_connectivity_mode(spark, data):
    df, _, _, _ = data
    nn = MinHashNeighbors(n_neighbors=3, number_of_hash_functions=64, max_bin_size=10_000).fit(df)
    g = nn.kneighbors_graph(mode="connectivity")
    assert g.where("weight != 1.0").count() == 0


def test_partial_fit_appends(spark, data):
    df, _, _, _ = data
    first = df.where("id < 60")
    second = df.where("id >= 60")
    nn = MinHashNeighbors(n_neighbors=3, number_of_hash_functions=64, max_bin_size=10_000)
    nn.fit(first).partial_fit(second)
    ids = {r["cand_id"] for r in nn.kneighbors().collect()}
    assert any(i >= 60 for i in ids)


def test_classifier_accuracy(spark, data):
    df, y, _, labels = data
    clf = MinHashClassifier(
        n_neighbors=5, number_of_hash_functions=128, max_bin_size=10_000
    ).fit(df, y)
    acc = clf.score(df, y)
    assert acc >= 0.9, f"classifier accuracy {acc:.3f}"


def test_predict_proba_sums_to_one(spark, data):
    df, y, _, _ = data
    clf = MinHashClassifier(
        n_neighbors=5, number_of_hash_functions=64, max_bin_size=10_000
    ).fit(df, y)
    s = (
        clf.predict_proba(df)
        .groupBy("query_id")
        .agg(F.sum("proba").alias("s"))
        .where("abs(s - 1.0) > 1e-9")
        .count()
    )
    assert s == 0


def test_cluster_recovers_planted_clusters(spark, data):
    df, _, rows, labels = data
    nn = MinHashNeighbors(number_of_hash_functions=128, max_bin_size=10_000).fit(df)
    cl = {r["id"]: r["cluster_id"] for r in nn.cluster(eps=0.4).collect()}
    # same planted cluster ⇒ same component for the vast majority of pairs
    same = tot = 0
    for i, j in itertools.combinations(range(len(labels)), 2):
        if labels[i] == labels[j]:
            tot += 1
            same += cl[i] == cl[j]
    assert same / tot >= 0.95


def test_dead_parameter_accepted():
    MinHashNeighbors(minimal_blocks_in_common=400)  # must not raise / affect anything


def test_to_local_arrays_padding(spark, data):
    df, _, _, _ = data
    nn = MinHashNeighbors(n_neighbors=4, number_of_hash_functions=64, max_bin_size=10_000).fit(df)
    ids, dists = nn.to_local_arrays(nn.kneighbors(), k=4)
    assert all(len(r) == 4 for r in ids)
    assert all(len(r) == 4 for r in dists)
