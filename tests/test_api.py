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


def test_wta_hash_variant(spark, data):
    """hash_algorithm=1 (WTA, reference P5): same API, different signature
    family; near rows still retrieved."""
    df, _, rows, _ = data
    nn = MinHashNeighbors(
        n_neighbors=5, number_of_hash_functions=128, hash_algorithm=1,
        rangeK_wta=10, max_bin_size=10_000,
    ).fit(df)
    got = nn.kneighbors()
    pairs = {(r["query_id"], r["cand_id"]) for r in got.collect()}
    exact = brute_knn(rows, 5)
    hits = tot = 0
    for q, ns in exact.items():
        for d, j in ns:
            tot += 1
            hits += (q, j) in pairs
    assert hits / tot >= 0.8  # WTA on uniform values ~ minhash-of-hash


def test_wta_uniform_values_is_min_hashed_key():
    import numpy as np

    from webdedup import kernels as K

    f = np.array([5, 9, 100, 2**31], dtype=np.uint32)
    sig = K.wta_signature(f, None, 6, range_k=2)
    for i in range(6):
        h = K.hash_ks(f + np.uint32(1), np.uint32(42 + i))
        assert sig[i] == h.min()


def test_lsb_filter_shrinks_index(spark, data):
    df, _, _, _ = data
    full = MinHashNeighbors(number_of_hash_functions=64, max_bin_size=10_000).fit(df)
    lsb = MinHashNeighbors(
        number_of_hash_functions=64, max_bin_size=10_000,
        store_value_with_least_sigificant_bit=2,
    ).fit(df)
    n_full, n_lsb = full._index.count(), lsb._index.count()
    assert 0 < n_lsb < n_full
    assert lsb._index.where("hash % 4 != 3").count() == 0  # low 2 bits all 1


def test_prune_and_weak_slot_removal(spark, data):
    df, _, _, _ = data
    nn = MinHashNeighbors(number_of_hash_functions=32, max_bin_size=10_000).fit(df)
    before = nn._index.count()
    nn.prune(n=1)
    pruned = nn._index.count()
    assert pruned < before
    # all remaining buckets have >= 2 members
    m = nn._index.groupBy("slot", "hash").count().agg(F.min("count")).collect()[0][0]
    assert m >= 2
    nn.remove_weak_slots(n=1)  # keep slots with >= 1 distinct value (no-op-ish)
    assert nn._index.count() == pruned


def test_index_stats(spark, data):
    df, _, _, _ = data
    nn = MinHashNeighbors(number_of_hash_functions=16, max_bin_size=10_000).fit(df)
    stats = nn.index_stats().collect()
    assert len(stats) == 16
    for r in stats:
        assert r["n_hash_values"] > 0 and r["mean_bucket_size"] >= 1.0


def test_save_load_roundtrip(spark, data, tmp_path):
    df, y, _, _ = data
    nn = MinHashNeighbors(n_neighbors=3, number_of_hash_functions=64, max_bin_size=10_000).fit(df)
    want = {(r["query_id"], r["cand_id"]) for r in nn.kneighbors().collect()}
    nn.save(str(tmp_path / "model"))
    nn2 = MinHashNeighbors.load(spark, str(tmp_path / "model"))
    got = {(r["query_id"], r["cand_id"]) for r in nn2.kneighbors().collect()}
    assert got == want


def test_radius_graph_symmetric(spark, data):
    """O4: radius graph symmetrization parallels O3."""
    df, _, _, _ = data
    nn = MinHashNeighbors(number_of_hash_functions=64, max_bin_size=10_000).fit(df)
    g = nn.radius_neighbors_graph(radius=0.4, mode="distance", symmetric=True)
    a = {(r["src"], r["dst"]): r["weight"] for r in g.collect()}
    assert a
    for (s, d), w in a.items():
        assert (d, s) in a and a[(d, s)] == pytest.approx(w)


def test_to_local_arrays_padding(spark, data):
    df, _, _, _ = data
    nn = MinHashNeighbors(n_neighbors=4, number_of_hash_functions=64, max_bin_size=10_000).fit(df)
    ids, dists = nn.to_local_arrays(nn.kneighbors(), k=4)
    assert all(len(r) == 4 for r in ids)
    assert all(len(r) == 4 for r in dists)


def test_mixed_values_presence_raises(spark):
    """ADVICE r2: fitting valued data then querying with a values-less X
    (or vice versa) must fail loudly — euclidean/cosine between weighted
    candidates and implicitly-binary queries is silently inconsistent."""
    import pytest as _pytest
    from webdedup.api import MinHashNeighbors

    valued = spark.createDataFrame(
        [(i, [1, 2, 3, i + 10], [1.0, 2.0, 1.0, 3.0]) for i in range(8)],
        "id long, features array<long>, values array<double>",
    )
    plain = valued.select("id", "features")
    nn = MinHashNeighbors(number_of_hash_functions=16).fit(valued)
    with _pytest.raises(ValueError, match="has_values"):
        nn.kneighbors(plain, n_neighbors=2).collect()
    nn2 = MinHashNeighbors(number_of_hash_functions=16).fit(plain)
    # jaccard (presence-only) ignores values → no error by design
    nn2.kneighbors(plain, n_neighbors=2)
