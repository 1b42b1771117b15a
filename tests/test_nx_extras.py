"""nx-parity wrappers added late in round 5: barycenter, dominating_set,
ancestors/descendants, has_bridges, maximal_matching, k_shell,
louvain_communities, label_propagation_communities."""

from __future__ import annotations

import pytest

from linkgraph import nx as lnx


def _ug(spark, edges):
    G = lnx.Graph(spark)
    G.add_edges_from(edges)
    return G


def _dg(spark, edges):
    G = lnx.DiGraph(spark)
    G.add_edges_from(edges)
    return G


def test_barycenter_path(spark):
    G = _ug(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    assert lnx.barycenter(G) == [2]


def test_barycenter_disconnected_raises(spark):
    G = _ug(spark, [(0, 1), (2, 3)])
    with pytest.raises(ValueError):
        lnx.barycenter(G)


def test_dominating_set_star(spark):
    edges = [(0, i) for i in range(1, 6)]
    G = _ug(spark, edges)
    ds = lnx.dominating_set(G)
    nbrs = {n: set() for n in range(6)}
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    assert all(n in ds or nbrs[n] & ds for n in nbrs)


def test_descendants_ancestors_chain(spark):
    G = _dg(spark, [(0, 1), (1, 2), (2, 3)])
    assert lnx.descendants(G, 0) == {1, 2, 3}
    assert lnx.descendants(G, 2) == {3}
    assert lnx.ancestors(G, 3) == {0, 1, 2}
    assert lnx.ancestors(G, 0) == set()
    with pytest.raises(KeyError):
        lnx.descendants(G, 99)


def test_has_bridges(spark):
    assert lnx.has_bridges(_ug(spark, [(0, 1), (1, 2)]))
    assert not lnx.has_bridges(_ug(spark, [(0, 1), (1, 2), (2, 0)]))


def test_maximal_matching_valid_and_maximal(spark):
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (1, 3)]
    G = _ug(spark, edges)
    m = lnx.maximal_matching(G)
    used = [n for pair in m for n in pair]
    assert len(used) == len(set(used))  # node-disjoint
    cover = set(used)
    for a, b in edges:  # maximal: no edge with both ends free
        assert a in cover or b in cover


def test_k_shell_k4_pendant(spark):
    G = _ug(spark, [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 9)])
    assert lnx.k_shell(G, 1) == [9]
    assert lnx.k_shell(G, 3) == [0, 1, 2, 3]


def test_louvain_communities_two_triangles(spark):
    G = _ug(spark, [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10), (2, 10)])
    comms = lnx.louvain_communities(G)
    assert {frozenset(c) for c in comms} == {
        frozenset({0, 1, 2}),
        frozenset({10, 11, 12}),
    }


def test_label_propagation_communities_disjoint(spark):
    G = _ug(spark, [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10)])
    comms = lnx.label_propagation_communities(G)
    assert {frozenset(c) for c in comms} == {
        frozenset({0, 1, 2}),
        frozenset({10, 11, 12}),
    }


def test_hits_scipy_alias():
    assert lnx.hits_scipy is lnx.hits
