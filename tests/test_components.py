"""Connected-components unit tests on known graphs."""

import pytest

from webdedup.components import connected_components


def cc(spark, n, edge_list, max_iter=25):
    verts = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges = spark.createDataFrame(edge_list or [(0, 0)], "a long, b long")
    if not edge_list:
        edges = edges.limit(0)
    out = connected_components(verts, edges, max_iter=max_iter)
    return {r["id"]: r["cluster_id"] for r in out.collect()}


def test_simple_components(spark):
    got = cc(spark, 6, [(0, 1), (1, 2), (3, 4)])
    assert got[0] == got[1] == got[2] == 0
    assert got[3] == got[4] == 3
    assert got[5] == 5


def test_chain_converges(spark):
    # path graph 0-1-2-...-9: worst case for hash-min (diameter = n)
    got = cc(spark, 10, [(i, i + 1) for i in range(9)])
    assert all(v == 0 for v in got.values())


def test_no_edges_all_singletons(spark):
    got = cc(spark, 5, [])
    assert got == {i: i for i in range(5)}


def test_cluster_label_is_min_member(spark):
    got = cc(spark, 8, [(5, 7), (7, 6)])
    assert got[5] == got[6] == got[7] == 5
    for i in range(5):
        assert got[i] == i


def test_long_chain_converges_logarithmically(spark):
    """Path graph of 64 vertices: pure hash-min needs ~63 rounds; with the
    pointer-jumping label edges it must finish well inside max_iter=10."""
    got = cc(spark, 64, [(i, i + 1) for i in range(63)], max_iter=10)
    assert all(v == 0 for v in got.values())


def test_nonconvergence_warns_and_returns_partial(spark):
    with pytest.warns(RuntimeWarning):
        got = cc(spark, 12, [(i, i + 1) for i in range(11)], max_iter=1)
    # partial labels: still a valid (over-split) clustering, every vertex labeled
    assert set(got) == set(range(12))
    assert all(got[i] <= i for i in range(12))
