"""k=3 clique percolation vs a brute-force python replay."""

import itertools

import pytest

from linkgraph.algorithms.cliques import k_clique_communities, triangle_triples
from linkgraph.graph import graph_from_edge_vids

# two triangle chains sharing edges + an isolated triangle + non-triangle tail
#  comm A: {0,1,2,3} (triangles 012, 123 share edge 1-2)
#  comm B: {10,11,12}
#  tail: 20-21 (no triangle, no community)
EDGES = [
    (0, 1), (1, 2), (0, 2), (1, 3), (2, 3),
    (10, 11), (11, 12), (10, 12),
    (20, 21),
]


def _brute_communities(edges):
    und = {tuple(sorted(e)) for e in edges}
    nbrs = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    tris = set()
    for a, b in und:
        for c in nbrs[a] & nbrs[b]:
            tris.add(tuple(sorted((a, b, c))))
    # union-find over triangles sharing an edge
    parent = {t: t for t in tris}

    def find(t):
        while parent[t] != t:
            parent[t] = parent[parent[t]]
            t = parent[t]
        return t

    for t1, t2 in itertools.combinations(tris, 2):
        if len(set(t1) & set(t2)) >= 2:
            parent[find(t1)] = find(t2)
    comms = {}
    for t in tris:
        comms.setdefault(find(t), set()).update(t)
    return {frozenset(m) for m in comms.values()}


@pytest.fixture(scope="module")
def g(spark):
    return graph_from_edge_vids(spark, EDGES)


def test_triples(spark, g):
    got = {tuple(r) for r in triangle_triples(g).collect()}
    assert got == {(0, 1, 2), (1, 2, 3), (10, 11, 12)}


def test_communities_match_brute(spark, g):
    rows = k_clique_communities(g).collect()
    got = {}
    for r in rows:
        got.setdefault(r["community"], set()).add(r["vid"])
    assert {frozenset(m) for m in got.values()} == _brute_communities(EDGES)
    # canonical community id = packed key of the community's smallest edge
    for c, m in got.items():
        lo, hi = c >> 32, c & 0xFFFFFFFF
        assert lo in m and hi in m and lo < hi
    # non-triangle vertices appear in no community
    flat = set().union(*got.values())
    assert 20 not in flat and 21 not in flat


def test_k_bounds(spark, g):
    # k < 3 is rejected; k >= 5 now dispatches to the general
    # maximal-clique tier (maxcliques.k_clique_communities_general) —
    # no 5-clique in the fixture, so the result is empty
    with pytest.raises(ValueError):
        k_clique_communities(g, k=2)
    assert k_clique_communities(g, k=5).count() == 0


def test_nx_wrapper(spark):
    from linkgraph import nx as lnx

    G = lnx.Graph(spark)
    G.add_edges_from([(s, d) for s, d in EDGES])
    comms = list(lnx.k_clique_communities(G, 3))
    assert {frozenset(c) for c in comms} == _brute_communities(EDGES)
    assert len(comms[0]) >= len(comms[-1])


def test_vertex_sharing_edge_disjoint_communities_stay_distinct(spark):
    """Two edge-disjoint triangles sharing only vertex 0 are DISTINCT
    communities (r4 advice repro: a min-member-vid community id merged
    them; the packed-edge-key id must not)."""
    edges = [(0, 1), (1, 2), (0, 2), (0, 3), (3, 4), (0, 4)]
    g = graph_from_edge_vids(spark, edges)
    got = {}
    for r in k_clique_communities(g).collect():
        got.setdefault(r["community"], set()).add(r["vid"])
    assert {frozenset(m) for m in got.values()} == {
        frozenset({0, 1, 2}),
        frozenset({0, 3, 4}),
    }
    # ...and the nx wrapper sees both
    from linkgraph import nx as lnx

    G = lnx.Graph(spark)
    G.add_edges_from(edges)
    comms = {frozenset(c) for c in lnx.k_clique_communities(G, 3)}
    assert comms == {frozenset({0, 1, 2}), frozenset({0, 3, 4})}


def test_k4_two_k4s_sharing_a_vertex_stay_distinct(spark):
    """k=4 twin of the r4 advice repro: two edge-disjoint K4s sharing
    only vertex 0 are distinct communities; a lone triangle is no
    community at k=4."""
    k4a = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    k4b = [(0, 4), (0, 5), (0, 6), (4, 5), (4, 6), (5, 6)]
    lone_tri = [(7, 8), (8, 9), (7, 9)]
    g = graph_from_edge_vids(spark, k4a + k4b + lone_tri)
    got = {}
    for r in k_clique_communities(g, k=4).collect():
        got.setdefault(r["community"], set()).add(r["vid"])
    assert {frozenset(m) for m in got.values()} == {
        frozenset({0, 1, 2, 3}),
        frozenset({0, 4, 5, 6}),
    }


def test_k4_face_chain_merges(spark):
    """Two 4-cliques sharing a triangle face {1,2,3} percolate into ONE
    community {0,1,2,3,4}."""
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
             (4, 1), (4, 2), (4, 3)]
    g = graph_from_edge_vids(spark, edges)
    got = {}
    for r in k_clique_communities(g, k=4).collect():
        got.setdefault(r["community"], set()).add(r["vid"])
    assert {frozenset(m) for m in got.values()} == {frozenset({0, 1, 2, 3, 4})}
