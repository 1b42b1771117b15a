"""k-truss: python synchronous-peel replay, hand-checked fixtures,
nested-truss property, and the k<3 guard."""

from __future__ import annotations

import pytest

from linkgraph.algorithms import k_truss
from linkgraph.graph import graph_from_edge_vids
from tests.conftest import rmat_edges


def py_ktruss(edges, k):
    es = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    while True:
        nbrs = {}
        for a, b in es:
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
        kept = {
            (a, b)
            for a, b in es
            if len(nbrs.get(a, set()) & nbrs.get(b, set())) >= k - 2
        }
        if kept == es:
            return es
        es = kept


def _spark_truss(spark, edges, k):
    g = graph_from_edge_vids(spark, edges)
    return {(r["lo"], r["hi"]) for r in k_truss(g, k).collect()}


def test_k_truss_matches_python_replay(spark):
    for gseed in (1, 7):
        edges = rmat_edges(n_vertices=50, n_edges=350, seed=gseed)
        for k in (3, 4):
            assert _spark_truss(spark, edges, k) == py_ktruss(edges, k)


def test_k_truss_hand_cases(spark):
    # K4 plus a pendant triangle hanging off vertex 0
    k4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    pend = [(0, 4), (4, 5), (5, 0)]
    edges = k4 + pend
    # 3-truss: every edge closes >= 1 triangle -> everything survives
    assert _spark_truss(spark, edges, 3) == {(min(a, b), max(a, b)) for a, b in edges}
    # 4-truss: only K4 (pendant-triangle edges have support 1 < 2)
    assert _spark_truss(spark, edges, 4) == {(min(a, b), max(a, b)) for a, b in k4}
    # 5-truss: K4 edges have support 2 < 3 -> empty
    assert _spark_truss(spark, edges, 5) == set()


def test_k_truss_cascade(spark):
    # two triangles sharing an edge: (0,1) has support 2, others 1;
    # 4-truss drops the outer edges round 1, then (0,1) cascades out
    edges = [(0, 1), (0, 2), (1, 2), (0, 3), (1, 3)]
    assert _spark_truss(spark, edges, 4) == set()


def test_k_truss_guard(spark):
    g = graph_from_edge_vids(spark, [(0, 1)])
    with pytest.raises(ValueError, match="k >= 3"):
        k_truss(g, 2)


def py_core_number(edges):
    es = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    vids = {v for e in es for v in e}
    core = {v: 0 for v in vids}
    k = 0
    while es:
        k += 1
        while True:
            deg = {}
            for a, b in es:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            kept = {(a, b) for a, b in es if deg[a] >= k and deg[b] >= k}
            if kept == es:
                break
            es = kept
            if not es:
                break
        for e in es:
            core[e[0]] = k
            core[e[1]] = k
    return core


def test_core_number_matches_python_replay(spark):
    from linkgraph.algorithms import core_number

    for gseed in (1, 7):
        edges = rmat_edges(n_vertices=50, n_edges=300, seed=gseed)
        g = graph_from_edge_vids(spark, edges)
        got = {r["vid"]: r["value"] for r in core_number(g).collect()}
        want = py_core_number(edges)
        assert got == want


def test_core_number_consistent_with_k_core(spark):
    from linkgraph.algorithms import core_number, k_core

    edges = rmat_edges(n_vertices=40, n_edges=200, seed=3)
    g = graph_from_edge_vids(spark, edges)
    cn = {r["vid"]: r["value"] for r in core_number(g).collect()}
    for k in (1, 2, 3):
        members = {r["vid"] for r in k_core(g, k).collect() if r["value"] == 1}
        assert members == {v for v, c in cn.items() if c >= k}


def py_onion(vertices, edges):
    es = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    remaining = set(vertices)
    k, layer, od = 1, 0, {}
    while remaining:
        layer += 1
        deg = {v: 0 for v in remaining}
        for a, b in es:
            deg[a] += 1
            deg[b] += 1
        k = max(k, min(deg.values()))
        peeled = {v for v in remaining if deg[v] <= k}
        for v in peeled:
            od[v] = layer
        remaining -= peeled
        es = {(a, b) for a, b in es if a in remaining and b in remaining}
    return od


def test_onion_layers_matches_python_replay(spark):
    from linkgraph.algorithms import onion_layers

    for gseed in (1, 7):
        edges = rmat_edges(n_vertices=50, n_edges=300, seed=gseed)
        g = graph_from_edge_vids(spark, edges)
        vertices = [r["vid"] for r in g.vertices.collect()]
        got = {r["vid"]: r["value"] for r in onion_layers(g).collect()}
        assert got == py_onion(vertices, edges)


def test_onion_layers_orders_core_peel(spark):
    from linkgraph.algorithms import core_number, onion_layers

    # layers refine cores: within one vertex pair, a strictly smaller
    # core number never gets a LATER layer than a larger one... the true
    # invariant is: layer boundaries never split a core "inward" —
    # lower-core vertices peel in earlier-or-equal layers
    edges = rmat_edges(n_vertices=40, n_edges=200, seed=3)
    g = graph_from_edge_vids(spark, edges)
    od = {r["vid"]: r["value"] for r in onion_layers(g).collect()}
    cn = {r["vid"]: r["value"] for r in core_number(g).collect()}
    for u in od:
        for v in od:
            if cn[u] < cn[v]:
                assert od[u] <= od[v]


def test_hindex_tier_matches_peel(spark):
    """The h-index fast tier must produce the identical k-truss edge set
    as synchronous peeling, across k, on rmat graphs."""
    for gseed in (1, 7):
        edges = rmat_edges(n_vertices=50, n_edges=350, seed=gseed)
        g = graph_from_edge_vids(spark, edges)
        for k in (3, 4, 5):
            peel = {(r["lo"], r["hi"]) for r in k_truss(g, k).collect()}
            fast = {
                (r["lo"], r["hi"]) for r in k_truss(g, k, method="hindex").collect()
            }
            assert fast == peel, f"seed={gseed} k={k}"


def test_truss_decomposition_values(spark):
    """trussness(e) = max k with e in the k-truss — cross-checked against
    the python peel at every k; triangle-free edges get 2."""
    from linkgraph.algorithms import truss_decomposition

    edges = rmat_edges(n_vertices=40, n_edges=250, seed=3) + [(100, 101)]
    g = graph_from_edge_vids(spark, edges)
    got = {
        (r["lo"], r["hi"]): r["trussness"] for r in truss_decomposition(g).collect()
    }
    assert got[(100, 101)] == 2
    kmax = max(got.values())
    for k in range(3, kmax + 2):
        expect = py_ktruss(edges, k)
        assert {e for e, t in got.items() if t >= k} == expect, f"k={k}"


def test_unknown_method_rejected(spark):
    g = graph_from_edge_vids(spark, [(0, 1)])
    with pytest.raises(ValueError, match="unknown method"):
        k_truss(g, 3, method="magic")
