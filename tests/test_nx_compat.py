"""NetworkX-compat surface (§2.6): Graph/DiGraph projection + builtin
wrappers return plain-python results keyed by the caller's node objects."""

from __future__ import annotations

import math

import pytest

from linkgraph import nx as lnx


@pytest.fixture()
def G(spark):
    g = lnx.DiGraph(spark)
    g.add_edges_from([("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")])
    g.add_node("e")  # isolated
    return g


def test_graph_surface(G):
    assert len(G) == 5 and G.number_of_edges() == 4
    assert "a" in G and "z" not in G
    G.remove_node("e")
    assert len(G) == 4


def test_pagerank_dict(G):
    pr = lnx.pagerank(G, tol=1e-10)
    assert set(pr) == {"a", "b", "c", "d", "e"}
    assert abs(sum(pr.values()) - 1.0) < 1e-9
    assert pr["c"] > pr["d"]  # c has two in-edges... b->c and ... rank flows a->b->c


def test_degree_centrality_variants(G):
    dc = lnx.degree_centrality(G)
    assert abs(dc["c"] - 3 / 4) < 1e-12  # in b->c, out c->a, c->d over n-1=4
    assert lnx.in_degree_centrality(G)["d"] == 1 / 4
    assert lnx.out_degree_centrality(G)["d"] == 0.0


def test_paths_and_bfs(G):
    assert lnx.has_path(G, "a", "d")
    assert not lnx.has_path(G, "d", "a")
    assert lnx.shortest_path(G, "a", "d") == ["a", "b", "c", "d"]
    sp = lnx.single_source_dijkstra_path_length(G, "a")
    assert sp == {"a": 0.0, "b": 1.0, "c": 2.0, "d": 3.0}  # e unreachable omitted
    assert set(lnx.bfs_edges(G, "a")) == {("a", "b"), ("b", "c"), ("c", "d")}
    succ = dict(lnx.bfs_successors(G, "a"))
    assert succ["c"] == ["d"]
    tree = lnx.bfs_tree(G, "a")
    assert tree.number_of_edges() == 3


def test_apsp_and_closeness(G):
    apsp = lnx.all_pairs_shortest_path_length(G)
    assert apsp["a"]["d"] == 3
    cc = lnx.closeness_centrality(G)
    # reach-to sets: b,c each reached by 2 others at total dist 3; d by 3
    # at total dist 6 with the wf factor 3/4 -> d ranks highest
    assert cc["e"] == 0.0
    assert cc["b"] == pytest.approx(cc["c"])
    assert cc["d"] > cc["c"]


def test_wcc_components(G):
    comps = sorted(lnx.weakly_connected_components(G), key=len)
    assert [set(c) for c in comps] == [{"e"}, {"a", "b", "c", "d"}]


def test_undirected_triangles_clustering(spark):
    g = lnx.Graph(spark)
    g.add_edges_from([(1, 2), (2, 3), (1, 3), (3, 4)])
    tri = lnx.triangles(g)
    assert tri == {1: 1, 2: 1, 3: 1, 4: 0}
    assert lnx.transitivity(g) == pytest.approx(3 * 1 / 5)  # 3 closed / 5 wedges... computed below
    cl = lnx.clustering(g)
    assert cl[1] == pytest.approx(1.0) and cl[4] == 0.0
    with pytest.raises(ValueError):
        lnx.triangles(lnx.DiGraph(spark))


def test_k_core_and_boundary(spark):
    g = lnx.Graph(spark)
    # K4 plus a pendant
    g.add_edges_from([(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)])
    assert lnx.k_core(g, k=3) == [1, 2, 3, 4]
    nb = lnx.node_boundary(g, [1, 2])
    assert nb == {3, 4}
    eb = lnx.edge_boundary(g, [1, 2])
    assert set(eb) <= {(1, 3), (1, 4), (2, 3), (2, 4), (3, 1), (4, 1), (3, 2), (4, 2)}
    assert len(eb) == 4


def test_assortativity_attrs(spark):
    g = lnx.DiGraph(spark)
    g.add_node("a", color="r", size=1)
    g.add_node("b", color="r", size=2)
    g.add_node("c", color="g", size=9)
    g.add_edges_from([("a", "b"), ("c", "c2")])
    g.add_node("c2", color="g", size=10)
    r = lnx.attribute_assortativity_coefficient(g, "color")
    assert r == pytest.approx(1.0)  # perfectly assortative
    rn = lnx.numeric_assortativity_coefficient(g, "size")
    assert rn == pytest.approx(1.0, abs=1e-6)


def test_simple_paths(G):
    assert lnx.is_simple_path(G, ["a", "b", "c"])
    assert not lnx.is_simple_path(G, ["a", "c"])
    assert not lnx.is_simple_path(G, ["a", "zz"])
    paths = lnx.all_simple_paths(G, "a", "d", cutoff=5)
    assert paths == [["a", "b", "c", "d"]]
    edge_paths = lnx.all_simple_edge_paths(G, "a", "d", cutoff=5)
    assert edge_paths == [[("a", "b"), ("b", "c"), ("c", "d")]]


def test_hits_and_betweenness(G):
    hubs, auth = lnx.hits(G, tol=1e-10)
    assert set(hubs) == set(auth) == {"a", "b", "c", "d", "e"}
    bc = lnx.betweenness_centrality(G)
    assert bc["c"] >= bc["d"]


def test_nx_link_prediction(spark):
    from linkgraph import nx

    # K5 — jaccard(0,1) = 0.6 (networkx TestJaccardCoefficient.test_K5)
    G = nx.Graph(spark)
    G.add_edges_from([(i, j) for i in range(5) for j in range(i + 1, 5)])
    (u, v, p) = nx.jaccard_coefficient(G, [(0, 1)])[0]
    assert (u, v) == (0, 1) and abs(p - 0.6) < 1e-9
    import math
    assert abs(nx.adamic_adar_index(G, [(0, 1)])[0][2] - 3 / math.log(4)) < 1e-9
    assert abs(nx.resource_allocation_index(G, [(0, 1)])[0][2] - 0.75) < 1e-9
    assert nx.preferential_attachment(G, [(0, 1)])[0][2] == 16

    # default ebunch = all non-edges (P4: {(0,2),(0,3),(1,3)})
    P = nx.Graph(spark)
    P.add_edges_from([(0, 1), (1, 2), (2, 3)])
    got = {(u, v): p for u, v, p in nx.jaccard_coefficient(P)}
    assert set(got) == {(0, 2), (0, 3), (1, 3)}
    assert got[(0, 3)] == 0.0

    D = nx.DiGraph(spark)
    D.add_edges_from([(0, 1), (1, 2)])
    import pytest as _pytest
    with _pytest.raises(ValueError):
        nx.jaccard_coefficient(D, [(0, 2)])


def test_nx_voterank(spark):
    from linkgraph import nx

    G = nx.Graph(spark)
    G.add_edges_from([(7, 8), (7, 5), (7, 9), (5, 0), (0, 1), (0, 2), (0, 3),
                      (0, 4), (1, 6), (2, 6), (3, 6), (4, 6)])
    assert nx.voterank(G, 3) == [0, 7, 6]


def test_nx_density_reciprocity_avg_neighbor(spark):
    import linkgraph.nx as nx

    G = nx.DiGraph(spark=spark)
    G.add_edges_from([(0, 1), (1, 0), (1, 2)])
    assert G.number_of_nodes() == 3
    assert abs(nx.density(G) - 3 / 6) < 1e-12
    assert abs(nx.reciprocity(G) - 2 / 3) < 1e-12

    H = nx.Graph(spark=spark)
    H.add_edges_from([(0, 1), (1, 2)])
    # nx undirected density: 2*2/(3*2) = 2/3
    assert abs(nx.density(H) - 2 / 3) < 1e-12

    G2 = nx.DiGraph(spark=spark)
    G2.add_edges_from([(0, 1), (0, 2), (1, 2), (2, 0)])
    got = nx.average_neighbor_degree(G2)
    assert got == {0: 1.0, 1: 1.0, 2: 2.0}


def test_nx_maximal_independent_set(spark):
    import pytest as _pytest

    from linkgraph import nx

    G = nx.Graph(spark)
    G.add_edges_from([(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)])
    s = set(nx.maximal_independent_set(G))
    edges = {(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)}
    assert not any((a, b) in edges or (b, a) in edges for a in s for b in s if a != b)
    for v in (0, 1, 2, 3):
        assert v in s or any((min(v, u), max(v, u)) in edges for u in s)
    D = nx.DiGraph(spark)
    D.add_edge(0, 1)
    with _pytest.raises(ValueError):
        nx.maximal_independent_set(D)


def test_nx_greedy_color(spark):
    from linkgraph import nx

    G = nx.Graph(spark)
    G.add_edges_from([("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")])
    colors = nx.greedy_color(G)
    assert set(colors) == {"a", "b", "c", "d"}
    for u, v in [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]:
        assert colors[u] != colors[v]
    assert max(colors.values()) <= 3  # Delta+1 with Delta=3


def test_nx_k_truss(spark):
    from linkgraph import nx

    G = nx.Graph(spark)
    # K4 + pendant triangle at node "a"
    G.add_edges_from([("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
                      ("b", "d"), ("c", "d"), ("a", "x"), ("x", "y"), ("y", "a")])
    kept = nx.k_truss(G, 4)
    nodes = {n for e in kept for n in e}
    assert nodes == {"a", "b", "c", "d"} and len(kept) == 6


def test_nx_core_number(spark):
    from linkgraph import nx

    G = nx.Graph(spark)
    # triangle (core 2) + tail (core 1)
    G.add_edges_from([(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)])
    assert nx.core_number(G) == {0: 2, 1: 2, 2: 2, 3: 1, 4: 1}


def test_nx_onion_layers(spark):
    from linkgraph import nx

    G = nx.Graph(spark)
    # triangle (peels last) + tail 2-3-4 (tail end peels first)
    G.add_edges_from([(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)])
    od = nx.onion_layers(G)
    assert od[4] == 1                       # degree-1 tail end, layer 1
    assert od[3] == 2                       # exposed next
    assert od[0] == od[1] == od[2] == 3     # the 2-core peels together


def test_nx_rich_club(spark):
    import pytest as _pytest

    from linkgraph import nx

    G = nx.Graph(spark)
    # K4 plus a pendant: deg(a..d)>=3 except the pendant chain
    G.add_edges_from([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4)])
    rc = nx.rich_club_coefficient(G)
    # k=3: nodes with deg>3 = {3}? deg: 0,1,2 ->3; 3 ->4; 4 ->1
    assert rc[0] == round(2 * 7 / (5 * 4), 8)
    assert rc[1] == round(2 * 6 / (4 * 3), 8)  # drop the pendant
    assert 3 not in rc  # only one node with deg>3 -> undefined
    with _pytest.raises(ValueError):
        nx.rich_club_coefficient(G, normalized=True)


def test_nx_s_metric_and_efficiency(spark):
    from linkgraph import nx

    G = nx.Graph(spark)
    # path 0-1-2: degs 1,2,1; s = 1*2 + 2*1 = 4
    G.add_edges_from([(0, 1), (1, 2)])
    assert nx.s_metric(G) == 4.0
    # efficiency: ordered pairs: (0,1),(1,0),(1,2),(2,1) d=1; (0,2),(2,0) d=2
    # sum 1/d = 4 + 1 = 5; / (3*2) = 0.83333333
    assert abs(nx.global_efficiency(G) - 5.0 / 6.0) < 1e-7


def test_nx_structural_holes_and_misc(spark):
    from linkgraph import nx

    G = nx.Graph(spark)
    G.add_edges_from([("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")])
    es = nx.effective_size(G)
    assert es["a"] == 1.0 and es["c"] == round(3 - 2 / 3, 8)
    con = nx.constraint(G)
    assert abs(con["d"] - 0.5) < 1e-7  # two non-adjacent neighbors, p=1/2 each
    assert nx.wiener_index(G) == 17.0
    assert sorted(nx.local_bridges(G)) == [("c", "d"), ("d", "e")]
    assert sorted(nx.bridges(G)) == [("c", "d"), ("d", "e")]
    assert nx.is_bipartite(G) is False
    assert nx.degree_histogram(G) == [0, 1, 3, 1]

    H = nx.Graph(spark)
    H.add_edges_from([(0, 1), (1, 2), (2, 3), (3, 0)])  # C4
    assert nx.is_bipartite(H) is True


def test_nx_connectivity_family(spark):
    import pytest as _pytest

    from linkgraph import nx

    G = nx.DiGraph(spark)
    G.add_edges_from([(1, 2), (2, 1), (2, 3), (4, 5)])
    comps = sorted(sorted(c) for c in nx.connected_components(G))
    assert comps == [[1, 2, 3], [4, 5]]
    assert nx.number_connected_components(G) == 2
    assert nx.is_connected(G) is False
    assert nx.node_connected_component(G, 3) == {1, 2, 3}
    sccs = sorted(sorted(c) for c in nx.strongly_connected_components(G))
    assert sccs == [[1, 2], [3], [4], [5]]
    assert nx.number_strongly_connected_components(G) == 4
    assert nx.is_strongly_connected(G) is False
    with _pytest.raises(KeyError):
        nx.node_connected_component(G, 99)
    E = nx.DiGraph(spark)
    with _pytest.raises(ValueError):
        nx.is_connected(E)


def test_nx_graph_object_accessors(spark):
    import pytest as _pytest

    from linkgraph import nx

    G = nx.DiGraph(spark)
    G.add_edges_from([(1, 2), (2, 3), (3, 1), (1, 3)])
    assert list(G.successors(1)) == [2, 3]
    assert list(G.predecessors(1)) == [3]
    assert list(G.neighbors(2)) == [3]
    assert G.degree(1) == 3 and G.in_degree(1) == 1 and G.out_degree(1) == 2
    assert dict(G.degree())[3] == 3
    assert G.has_edge(1, 2) and not G.has_edge(2, 1)
    assert G.has_node(2) and not G.has_node(9)
    with _pytest.raises(KeyError):
        G.degree(9)

    H = nx.Graph(spark)
    H.add_edges_from([("a", "b"), ("b", "c")])
    assert list(H.neighbors("b")) == ["a", "c"]
    assert H.degree("b") == 2
    assert H.has_edge("b", "a")  # orientation-insensitive


def test_nx_graph_views_and_copies(spark):
    from linkgraph import nx

    G = nx.DiGraph(spark)
    G.add_edges_from([(1, 2), (2, 1), (2, 3)])
    H = G.subgraph([1, 2])
    assert sorted(H.nodes()) == [1, 2] and sorted(H.edges()) == [(1, 2), (2, 1)]
    C = G.copy()
    C.remove_edge(2, 3)
    assert G.has_edge(2, 3) and not C.has_edge(2, 3)  # stores independent
    U = G.to_undirected()
    assert not U.directed and U.number_of_edges() == 2  # (1,2) collapsed
    D = U.to_directed()
    assert D.directed and D.number_of_edges() == 4
    R = G.reverse()
    assert R.has_edge(3, 2) and not R.has_edge(2, 3)
    # algorithms still run on the derived graphs
    assert nx.number_connected_components(H) == 1


def test_nx_selfloop_degree_and_scc_calltime_validation(spark):
    import pytest as _pytest

    from linkgraph import nx

    G = nx.Graph(spark)
    G.add_edge("a", "a")
    G.add_edge("a", "b")
    assert G.degree("a") == 3  # self-loop counts twice, as nx
    D = nx.DiGraph(spark)
    D.add_edge(1, 1)
    assert D.degree(1) == 2 and D.in_degree(1) == 1

    U = nx.Graph(spark)
    U.add_edge(1, 2)
    with _pytest.raises(ValueError):
        nx.strongly_connected_components(U)  # raises at call, not iteration
