"""Non-flagship algorithm coverage: traversals, HITS, cores, clustering,
centralities, assortativity, boundaries — validated against plain-Python
oracles on tiny graphs (reference test style, test_app.py)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from linkgraph.graph import graph_from_edge_vids
from linkgraph.algorithms import (
    average_clustering,
    average_degree_connectivity,
    bfs,
    clustering,
    degree_assortativity_coefficient,
    degree_centrality,
    edge_boundary,
    eigenvector_centrality,
    hits,
    k_core,
    k_shell,
    katz_centrality,
    node_boundary,
    sssp,
    transitivity,
)
from tests.conftest import TRI_MIX, rmat_edges

DIAMOND = [(1, 2), (1, 3), (2, 4), (3, 4)]


def _d(df):
    return {r["vid"]: r["value"] for r in df.collect()}


def test_bfs_depths(spark):
    g = graph_from_edge_vids(spark, DIAMOND)
    assert _d(bfs(g, src=1)) == {1: 0, 2: 1, 3: 1, 4: 2}
    # unreachable sentinel
    assert _d(bfs(g, src=4)) == {1: -1, 2: -1, 3: -1, 4: 0}


def test_sssp_weighted(spark):
    e = spark.createDataFrame(
        [(0, 1, 4.0), (0, 2, 1.0), (2, 1, 1.0), (1, 3, 1.0)], "src long, dst long, weight double"
    )
    v = spark.createDataFrame([(i, str(i)) for i in range(4)], "vid long, oid string")
    from linkgraph.graph import LinkGraph

    g = LinkGraph(vertices=v, edges=e)
    assert _d(sssp(g, src=0)) == {0: 0.0, 1: 2.0, 2: 1.0, 3: 3.0}


def test_sssp_unweighted_equals_bfs(spark):
    edges = rmat_edges(80, 200, seed=5)
    g = graph_from_edge_vids(spark, edges)
    d_bfs = _d(bfs(g, src=0))
    d_sssp = _d(sssp(g, src=0, weight_col=None))
    assert {k: (v if v < 0 else float(v)) for k, v in d_bfs.items()} == d_sssp


def test_degree_centrality(spark):
    g = graph_from_edge_vids(spark, DIAMOND)
    got = _d(degree_centrality(g, "out").withColumnRenamed("value", "value"))
    assert got == {1: 2 / 3, 2: 1 / 3, 3: 1 / 3, 4: 0.0}


def test_hits_against_networkx_formula(spark):
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2)]
    g = graph_from_edge_vids(spark, edges)
    out = hits(g, tolerance=1e-8, max_round=60, normalized=True)
    got = {r["vid"]: (r["hub"], r["auth"]) for r in out.collect()}

    # plain-python power iteration, same semantics
    verts = [0, 1, 2, 3]
    h = {v: 1 / 4 for v in verts}
    for _ in range(60):
        hlast = dict(h)
        a = {v: sum(hlast[u] for u, w in edges if w == v) for v in verts}
        h = {v: sum(a[w] for u, w in edges if u == v) for v in verts}
        hm, am = max(h.values()), max(a.values())
        h = {v: x / hm for v, x in h.items()}
        a = {v: x / am for v, x in a.items()}
        if sum(abs(h[v] - hlast[v]) for v in verts) < 1e-10:
            break
    hs, as_ = sum(h.values()), sum(a.values())
    want = {v: (h[v] / hs, a[v] / as_) for v in verts}
    for v in verts:
        assert np.allclose(got[v], want[v], atol=1e-6)


def test_k_core_k_shell(spark):
    g = graph_from_edge_vids(spark, TRI_MIX)  # K4 + pendant 3-6
    assert _d(k_core(g, 3)) == {0: 1, 1: 1, 2: 1, 3: 1, 6: 0}
    assert _d(k_core(g, 1)) == {0: 1, 1: 1, 2: 1, 3: 1, 6: 1}
    assert _d(k_shell(g, 1)) == {0: 0, 1: 0, 2: 0, 3: 0, 6: 1}
    assert _d(k_shell(g, 3)) == {0: 1, 1: 1, 2: 1, 3: 1, 6: 0}


def test_clustering_coefficients(spark):
    g = graph_from_edge_vids(spark, TRI_MIX)
    got = _d(clustering(g))
    # K4 vertices 0,1,2: deg 3, tri 3 → 1.0; vertex 3: deg 4, tri 3 → 0.5; 6: 0
    assert got[0] == got[1] == got[2] == 1.0
    assert got[3] == 0.5 and got[6] == 0.0
    assert abs(average_clustering(g) - (3 * 1.0 + 0.5) / 5) < 1e-12
    # transitivity = 3*4 / sum deg(deg-1)/2 = 12/(3+3+3+6+0)
    assert abs(transitivity(g) - 12 / 15) < 1e-12


def test_eigenvector_centrality_cycle(spark):
    # directed 3-cycle: symmetric → uniform centrality
    g = graph_from_edge_vids(spark, [(0, 1), (1, 2), (2, 0)])
    got = _d(eigenvector_centrality(g, tolerance=1e-12, max_round=200))
    assert np.allclose(list(got.values()), 1 / math.sqrt(3), atol=1e-6)


def test_katz_centrality_star(spark):
    g = graph_from_edge_vids(spark, [(1, 0), (2, 0), (3, 0)])
    got = _d(katz_centrality(g, alpha=0.1, beta=1.0, tolerance=1e-12, max_round=200))
    # leaves: x=1; center: 1 + 0.1*3 = 1.3, then L2-normalized
    raw = {0: 1.3, 1: 1.0, 2: 1.0, 3: 1.0}
    nrm = math.sqrt(sum(v * v for v in raw.values()))
    for v in raw:
        assert abs(got[v] - raw[v] / nrm) < 1e-6


def test_degree_assortativity(spark):
    edges = rmat_edges(60, 150, seed=9)
    g = graph_from_edge_vids(spark, edges)
    r = degree_assortativity_coefficient(g, "out", "in")
    # plain python pearson over edges
    out_d, in_d = {}, {}
    for s, d in edges:
        out_d[s] = out_d.get(s, 0) + 1
        in_d[d] = in_d.get(d, 0) + 1
    xs = [out_d.get(s, 0) for s, d in edges]
    ys = [in_d.get(d, 0) for s, d in edges]
    want = np.corrcoef(xs, ys)[0, 1]
    assert abs(r - want) < 1e-9


def test_average_degree_connectivity(spark):
    g = graph_from_edge_vids(spark, TRI_MIX)
    got = {r["degree"]: r["avg_nbr_degree"] for r in average_degree_connectivity(g).collect()}
    # degrees: 0,1,2 → 3; 3 → 4; 6 → 1
    # k=3 nodes (0,1,2): neighbors deg = {3,3,4} each → avg 10/3
    assert abs(got[3] - 10 / 3) < 1e-12
    # k=4 node (3): neighbors 0,1,2,6 → (3+3+3+1)/4
    assert abs(got[4] - 10 / 4) < 1e-12
    # k=1 node (6): neighbor 3 → 4
    assert got[1] == 4.0


def test_boundaries(spark):
    g = graph_from_edge_vids(spark, DIAMOND)
    s = spark.createDataFrame([(1,), (2,)], "vid long")
    nb = sorted(r["vid"] for r in node_boundary(g, s).collect())
    assert nb == [3, 4]
    eb = sorted((r["src"], r["dst"]) for r in edge_boundary(g, s).collect())
    assert eb == [(1, 3), (2, 4)]


def test_add_column_result_onto_graph(spark):
    """ADD_COLUMN analog (framework/graph.py:581): algorithm result
    joins onto vertices as a property; missing vids → null."""
    from linkgraph.algorithms import degree_centrality

    g = graph_from_edge_vids(spark, [(0, 1), (1, 2)])
    res = degree_centrality(g, "both")
    g2 = g.add_column(res, "dc")
    assert "dc" in g2.vertices.columns
    got = {r["vid"]: r["dc"] for r in g2.vertices.collect()}
    assert got[1] == max(got.values())
    import pytest as _pytest
    with _pytest.raises(ValueError):
        g2.add_column(res, "dc")


def test_global_scalars_density_reciprocity(spark):
    """density = |E|/(n(n-1)); reciprocity counts mutual directed pairs.
    Fixture: edges 0->1, 1->0, 1->2 over vids {0,1,2}:
    density = 3/6, reciprocity = 2/3 (the 0<->1 pair both ways)."""
    from linkgraph.algorithms import density, reciprocity

    g = graph_from_edge_vids(spark, [(0, 1), (1, 0), (1, 2)])
    assert density(g).first()["value"] == pytest.approx(3 / 6)
    assert reciprocity(g).first()["value"] == pytest.approx(2 / 3)


def test_average_neighbor_degree_out_out(spark):
    """nx.average_neighbor_degree(source='out', target='out') on
    0->1, 0->2, 1->2, 2->0: out-degrees are {0:2, 1:1, 2:1};
    v0's out-nbrs {1,2} -> mean 1.0; v1's {2} -> 1.0; v2's {0} -> 2.0."""
    from linkgraph.algorithms import average_neighbor_degree

    g = graph_from_edge_vids(spark, [(0, 1), (0, 2), (1, 2), (2, 0)])
    got = {r["vid"]: r["value"] for r in average_neighbor_degree(g).collect()}
    assert got == {0: 1.0, 1: 1.0, 2: 2.0}
    with pytest.raises(ValueError):
        average_neighbor_degree(g, source="total")


def test_rich_club_coefficient_matches_python(spark):
    from linkgraph.algorithms import rich_club_coefficient
    from linkgraph.graph import graph_from_edge_vids
    from tests.conftest import rmat_edges

    for gseed in (1, 7):
        edges = rmat_edges(n_vertices=40, n_edges=200, seed=gseed)
        es = {(min(a, b), max(a, b)) for a, b in edges}
        deg = {}
        for a, b in es:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        want = {}
        for k in range(max(deg.values())):
            nodes = {v for v, d in deg.items() if d > k}
            if len(nodes) < 2:
                continue
            ek = sum(1 for a, b in es if a in nodes and b in nodes)
            want[k] = round(2.0 * ek / (len(nodes) * (len(nodes) - 1)), 8)
        g = graph_from_edge_vids(spark, edges)
        got = {r["k"]: r["value"] for r in rich_club_coefficient(g).collect()}
        assert got == want


def test_structural_holes_and_misc_fixture(spark):
    """Triangle + tail fixture, every value hand-computed (constraint
    replayed brute-force per Burt's formula)."""
    from linkgraph.algorithms import (
        constraint,
        degree_histogram,
        effective_size,
        is_bipartite,
        local_bridges,
        wiener_index,
    )

    g = graph_from_edge_vids(spark, [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)])
    es = _d(effective_size(g))
    assert es == {1: 1.0, 2: 1.0, 3: pytest.approx(7 / 3, abs=1e-8), 4: 2.0, 5: 1.0}

    adj = {1: {2, 3}, 2: {1, 3}, 3: {1, 2, 4}, 4: {3, 5}, 5: {4}}

    def brute(u):
        s = 0.0
        for v in adj[u]:
            p = 1 / len(adj[u]) + sum(
                1 / (len(adj[u]) * len(adj[w])) for w in adj[u] & adj[v]
            )
            s += p * p
        return s

    got = _d(constraint(g))
    assert set(got) == set(adj)
    for u in adj:
        assert got[u] == pytest.approx(brute(u), abs=1e-7)

    assert wiener_index(g).first()["value"] == 17.0
    assert sorted((r["lo"], r["hi"]) for r in local_bridges(g).collect()) == [
        (3, 4),
        (4, 5),
    ]
    row = is_bipartite(g).first()
    assert (row["value"], row["odd_edges"]) == (False, 1)  # the triangle
    hist = {r["deg"]: r["count"] for r in degree_histogram(g).collect()}
    assert hist == {0: 0, 1: 1, 2: 3, 3: 1}


def test_bipartite_and_wiener_edge_cases(spark):
    from linkgraph.algorithms import is_bipartite, wiener_index

    # even cycle, two components -> bipartite; wiener of disconnected = inf
    g = graph_from_edge_vids(spark, [(1, 2), (2, 3), (3, 4), (4, 1), (7, 8)])
    row = is_bipartite(g).first()
    assert (row["value"], row["odd_edges"]) == (True, 0)
    assert math.isinf(wiener_index(g).first()["value"])


def test_structural_holes_match_python_on_rmat(spark):
    """Replay effective_size + constraint brute-force on the RMAT graph."""
    from linkgraph.algorithms import effective_size, constraint

    edges = rmat_edges(200, seed=11)
    g = graph_from_edge_vids(spark, edges)
    adj: dict = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    es_exp = {u: len(n) - 2 * sum(len(adj[u] & adj[v]) for v in n) / (2 * len(n)) for u, n in adj.items()}
    es_got = _d(effective_size(g))
    assert set(es_got) == set(es_exp)
    for u, v in es_exp.items():
        assert es_got[u] == pytest.approx(v, abs=1e-7)

    def brute(u):
        s = 0.0
        for v in adj[u]:
            p = 1 / len(adj[u]) + sum(
                1 / (len(adj[u]) * len(adj[w])) for w in adj[u] & adj[v]
            )
            s += p * p
        return s

    c_got = _d(constraint(g))
    assert set(c_got) == set(adj)
    for u in adj:
        assert c_got[u] == pytest.approx(brute(u), abs=1e-7)


def test_triadic_census_matches_bruteforce(spark):
    """Full 16-class census vs an all-triples brute force on a seeded
    random digraph (mutual dyads included)."""
    import itertools
    import random

    from linkgraph.algorithms.triads import TRIAD_CLASS, _SLOTS, triadic_census

    random.seed(7)
    n = 14
    edges = set()
    while len(edges) < 45:
        s, d = random.randrange(n), random.randrange(n)
        if s != d:
            edges.add((s, d))
    g = graph_from_edge_vids(spark, sorted(edges))
    got = {r["triad_type"]: r["count"] for r in triadic_census(g).collect()}
    vs = [r["vid"] for r in g.vertices.collect()]
    exp = {k: 0 for k in got}
    for u, v, w in itertools.combinations(sorted(vs), 3):
        ids = {0: u, 1: v, 2: w}
        code = sum(
            1 << i for i, (a, b) in enumerate(_SLOTS) if (ids[a], ids[b]) in edges
        )
        exp[TRIAD_CLASS[code]] += 1
    assert got == exp
    assert sum(got.values()) == len(vs) * (len(vs) - 1) * (len(vs) - 2) // 6


def test_triadic_census_salted_and_shuffle_paths(spark):
    """The hub-salted wedge join (salt_cap below the hub degree) and the
    non-broadcast third-dyad shuffle join must both count identically to
    the common path on a hub-heavy seeded digraph."""
    import random

    from linkgraph.algorithms.triads import triadic_census

    random.seed(11)
    edges = {(0, v) for v in range(1, 30)} | {(v, 0) for v in range(10, 20)}
    while len(edges) < 120:
        s, d = random.randrange(40), random.randrange(40)
        if s != d:
            edges.add((s, d))
    g = graph_from_edge_vids(spark, sorted(edges))
    base = {r["triad_type"]: r["count"] for r in triadic_census(g).collect()}
    salted = {
        r["triad_type"]: r["count"]
        for r in triadic_census(g, salt_cap=4).collect()
    }
    shuffled = {
        r["triad_type"]: r["count"]
        for r in triadic_census(g, broadcast_rows=0, salt_cap=7).collect()
    }
    assert salted == base
    assert shuffled == base
    # vids past 2^31 disable the packed single-long lookup key — the
    # 2-column fallback must classify identically (shift all vids up)
    big = graph_from_edge_vids(
        spark, sorted((s + 2**32, d + 2**32) for s, d in edges)
    )
    shifted = {r["triad_type"]: r["count"] for r in triadic_census(big).collect()}
    assert shifted == base


def test_triadic_census_nx_wrapper(spark):
    from linkgraph import nx

    G = nx.DiGraph(spark)
    # one mutual pair + one asym edge on 4 nodes
    G.add_edges_from([("a", "b"), ("b", "a"), ("b", "c")])
    G.add_node("d")
    c = nx.triadic_census(G)
    # triples: {a,b,c}=111U (a<->b->c), {a,b,d}=102, {a,c,d}=003? a-c no edge: 003;
    # {b,c,d}=012
    assert c["111U"] == 1 and c["102"] == 1 and c["012"] == 1 and c["003"] == 1
    assert sum(c.values()) == 4


def test_square_clustering_fixture_and_random(spark):
    """C4 fixture (square + pendant) hand-checked, then a random-graph
    replay against the brute-force Lind formula."""
    import random

    from linkgraph.algorithms import square_clustering

    g = graph_from_edge_vids(spark, [(1, 2), (2, 3), (3, 4), (4, 1), (1, 5)])
    assert _d(square_clustering(g)) == {
        1: pytest.approx(1 / 3, abs=1e-8),
        2: 0.5,
        3: 1.0,
        4: 0.5,
        5: 0.0,
    }

    random.seed(3)
    edges = set()
    while len(edges) < 60:
        s, d = random.randrange(25), random.randrange(25)
        if s != d:
            edges.add((s, d))
    g2 = graph_from_edge_vids(spark, sorted(edges))
    adj: dict = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)

    def brute(v):
        ns = sorted(adj[v])
        num = den = 0
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                u, w = ns[i], ns[j]
                q = len((adj[u] & adj[w]) - {v})
                th = 1 if w in adj[u] else 0
                num += q
                den += q + (len(adj[u]) - (1 + q + th)) + (len(adj[w]) - (1 + q + th))
        return num / den if den else 0.0

    got = _d(square_clustering(g2))
    for v in adj:
        assert got[v] == pytest.approx(brute(v), abs=1e-7)


def test_is_bipartite_refuses_truncated_rounds(spark):
    """Round-capped layering must raise, not silently report bipartite
    (review regression: C5 with max_rounds=1 used to return True)."""
    from linkgraph.algorithms import is_bipartite

    c5 = [(i, (i + 1) % 5) for i in range(5)]
    g = graph_from_edge_vids(spark, c5)
    row = is_bipartite(g).first()
    assert (row["value"], row["odd_edges"]) == (False, 1)
    with pytest.raises(ValueError, match="converge"):
        is_bipartite(g, max_rounds=1)
