"""Path-family + assortativity operators vs plain-Python oracles."""

from __future__ import annotations

import math
from collections import deque

import pytest

from linkgraph.graph import graph_from_edge_vids
from linkgraph.algorithms import (
    all_pairs_shortest_path_length,
    attribute_assortativity_coefficient,
    average_shortest_path_length,
    bfs_generic,
    closeness_centrality,
    is_simple_path,
    numeric_assortativity_coefficient,
    sssp_has_path,
    sssp_path,
)
from tests.conftest import rmat_edges

EDGES = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (5, 0)]


def _py_bfs_all(edges, verts, reverse=False):
    adj = {}
    for s, d in edges:
        if reverse:
            s, d = d, s
        adj.setdefault(s, []).append(d)
    out = {}
    for r in verts:
        dist = {r: 0}
        q = deque([r])
        while q:
            u = q.popleft()
            for w in adj.get(u, []):
                if w not in dist:
                    dist[w] = dist[u] + 1
                    q.append(w)
        out[r] = dist
    return out


def test_apsp_matches_python_bfs(spark):
    edges = rmat_edges(60, 200)
    verts = sorted({v for e in edges for v in e})
    g = graph_from_edge_vids(spark, edges)
    got = {}
    for r in all_pairs_shortest_path_length(g).collect():
        got.setdefault(r["root"], {})[r["vid"]] = r["dist"]
    assert got == _py_bfs_all(edges, verts)


def test_closeness_matches_networkx_formula(spark):
    verts = sorted({v for e in EDGES for v in e})
    n = len(verts)
    g = graph_from_edge_vids(spark, EDGES)
    got = {r["vid"]: r["value"] for r in closeness_centrality(g).collect()}
    dist_to = _py_bfs_all(EDGES, verts, reverse=True)
    for v in verts:
        d = dist_to[v]
        s = sum(d.values())
        r = len(d)
        want = ((r - 1) / s) * ((r - 1) / (n - 1)) if s > 0 else 0.0
        assert math.isclose(got[v], want, abs_tol=1e-9), (v, got[v], want)


def test_average_shortest_path_length(spark):
    verts = sorted({v for e in EDGES for v in e})
    g = graph_from_edge_vids(spark, EDGES)
    alld = _py_bfs_all(EDGES, verts)
    pairs = [d for dd in alld.values() for d in dd.values() if d > 0]
    assert math.isclose(
        average_shortest_path_length(g), sum(pairs) / len(pairs), abs_tol=1e-9
    )


def test_sssp_path_and_has_path(spark):
    g = graph_from_edge_vids(spark, EDGES)
    assert sssp_has_path(g, 0, 4)
    assert not sssp_has_path(g, 4, 0)
    p = sssp_path(g, 0, 4, weight_col=None)
    assert p[0] == 0 and p[-1] == 4 and len(p) == 4  # 0→{1,2}→3→4
    edge_set = set(EDGES)
    assert all((a, b) in edge_set for a, b in zip(p, p[1:]))
    assert sssp_path(g, 4, 0, weight_col=None) == []


def _py_dfs(edges, src):
    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    order = []
    visited = set()

    def go(v, parent):
        visited.add(v)
        order.append((v, len(order), parent))
        for u in sorted(adj.get(v, [])):
            if u not in visited:
                go(u, v)

    go(src, None)
    return order


def test_dfs_matches_recursive_oracle(spark):
    from linkgraph.algorithms import dfs

    for edges, src in [(EDGES, 0), (rmat_edges(50, 160), 0)]:
        g = graph_from_edge_vids(spark, edges)
        got = sorted(
            (r["vid"], r["rank"], r["parent"]) for r in dfs(g, src=src).collect()
        )
        want = sorted(_py_dfs(edges, src))
        assert got == want


def test_all_simple_paths(spark):
    from linkgraph.algorithms import all_simple_paths

    edges = [(0, 1), (0, 2), (1, 2), (2, 3), (1, 3)]
    g = graph_from_edge_vids(spark, edges)
    got3 = {tuple(r["path"]) for r in all_simple_paths(g, 0, 3, cutoff=3).collect()}
    assert got3 == {(0, 1, 3), (0, 2, 3), (0, 1, 2, 3)}
    got2 = {tuple(r["path"]) for r in all_simple_paths(g, 0, 3, cutoff=2).collect()}
    assert got2 == {(0, 1, 3), (0, 2, 3)}
    assert all_simple_paths(g, 3, 0, cutoff=4).count() == 0


def test_sssp_path_extraction_is_log_jobs(spark):
    """Pointer doubling: extracting a 33-hop path from a precomputed tree
    must cost O(log path) jobs, not one job per hop (VERDICT r1 fix 9)."""
    from linkgraph.algorithms import sssp_path
    from linkgraph.algorithms.paths import sssp_predecessors

    import linkgraph.algorithms.paths as pathmod

    chain = [(i, i + 1) for i in range(33)]
    g = graph_from_edge_vids(spark, chain)
    tree = sssp_predecessors(g, 0, weight_col=None).localCheckpoint(eager=True)
    path = sssp_path(g, 0, 33, weight_col=None, tree=tree)
    assert path == list(range(34))
    # doubling covers 2^k ancestors after k rounds; a 33-hop chain must
    # finish in ≤ ceil(log2(34)) + 1 = 7 driver round-trips (the O(hops)
    # walk needed 33)
    assert pathmod.LAST_SSSP_PATH_ROUNDS is not None
    assert pathmod.LAST_SSSP_PATH_ROUNDS <= 7, pathmod.LAST_SSSP_PATH_ROUNDS


def test_bfs_generic_formats(spark):
    g = graph_from_edge_vids(spark, EDGES)
    tree = {(r["src"], r["dst"]) for r in bfs_generic(g, 0, "edges").collect()}
    # BFS tree from 0: 1 and 2 at depth 1, 3 via min-parent 1, 4 via 3
    assert tree == {(0, 1), (0, 2), (1, 3), (3, 4)}
    preds = {r["vid"]: r["predecessor"] for r in bfs_generic(g, 0, "predecessors").collect()}
    assert preds == {1: 0, 2: 0, 3: 1, 4: 3}
    succ = {r["vid"]: list(r["successors"]) for r in bfs_generic(g, 0, "successors").collect()}
    assert succ == {0: [1, 2], 1: [3], 3: [4]}


def test_is_simple_path(spark):
    g = graph_from_edge_vids(spark, EDGES)
    assert is_simple_path(g, [0, 1, 3, 4])
    assert is_simple_path(g, [5, 0, 2, 3])
    assert is_simple_path(g, [2])
    assert not is_simple_path(g, [0, 3])        # not an edge
    assert not is_simple_path(g, [0, 1, 3, 4, 0])  # repeated vertex (not an edge either)
    assert not is_simple_path(g, [])
    assert not is_simple_path(g, [99])          # absent vertex


def test_attribute_and_numeric_assortativity(spark):
    g = graph_from_edge_vids(spark, EDGES)
    attrs = spark.createDataFrame(
        [(v, v % 2) for v in range(6)], "vid long, attr long"
    )
    # python oracle: mixing matrix over directed edges
    pairs = [(s % 2, d % 2) for s, d in EDGES]
    total = len(pairs)
    cats = sorted({x for p in pairs for x in p})
    m = {(i, j): sum(1 for p in pairs if p == (i, j)) / total for i in cats for j in cats}
    a = {i: sum(m[(i, j)] for j in cats) for i in cats}
    b = {j: sum(m[(i, j)] for i in cats) for j in cats}
    tr = sum(m[(c, c)] for c in cats)
    sab = sum(a[c] * b[c] for c in cats)
    want = (tr - sab) / (1 - sab)
    assert math.isclose(attribute_assortativity_coefficient(g, attrs), want, abs_tol=1e-9)

    xs = [float(s % 2) for s, d in EDGES]
    ys = [float(d % 2) for s, d in EDGES]
    mx, my = sum(xs) / total, sum(ys) / total
    cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    sx = math.sqrt(sum((x - mx) ** 2 for x in xs))
    sy = math.sqrt(sum((y - my) ** 2 for y in ys))
    want_num = cov / (sx * sy)
    assert math.isclose(
        numeric_assortativity_coefficient(g, attrs), want_num, abs_tol=1e-9
    )


def test_closeness_sampled_matches_full(spark):
    """sources= computes exact closeness for the sampled subset."""
    from linkgraph.algorithms import closeness_centrality
    from linkgraph.graph import graph_from_edge_vids
    from tests.conftest import rmat_edges
    from pyspark.sql import functions as F

    g = graph_from_edge_vids(spark, rmat_edges(80, 200, seed=21))
    full = {r["vid"]: r["value"] for r in closeness_centrality(g).collect()}
    samp = g.vertices.where(F.col("vid") % 3 == 0).select("vid")
    got = {r["vid"]: r["value"] for r in closeness_centrality(g, sources=samp).collect()}
    assert set(got) == {v for v in full if v % 3 == 0}
    for v, val in got.items():
        assert abs(val - full[v]) < 1e-12


def test_eccentricity_family(spark):
    """Reachable-set eccentricity/diameter/radius/center/periphery vs a
    plain-Python BFS oracle on a directed graph with unreachable pairs."""
    from linkgraph.algorithms import center, diameter, eccentricity, periphery, radius

    verts = range(6)
    g = graph_from_edge_vids(spark, EDGES)
    dist = _py_bfs_all(EDGES, verts)
    want = {r: max(dist[r].values()) for r in verts}
    got = {r["vid"]: r["ecc"] for r in eccentricity(g).collect()}
    assert got == want
    assert diameter(g) == max(want.values())
    assert radius(g) == min(want.values())
    rad, dia = min(want.values()), max(want.values())
    assert {r["vid"] for r in center(g).collect()} == {v for v, e in want.items() if e == rad}
    assert {r["vid"] for r in periphery(g).collect()} == {v for v, e in want.items() if e == dia}


def test_harmonic_centrality_incoming(spark):
    """harmonic(v) = sum of 1/d(u, v) over incoming distances; 0.0 when
    nothing reaches v (vertex 5 here has in-degree 0)."""
    from linkgraph.algorithms import harmonic_centrality

    verts = range(6)
    g = graph_from_edge_vids(spark, EDGES)
    rdist = _py_bfs_all(EDGES, verts, reverse=True)
    want = {
        v: round(sum(1.0 / d for u, d in rdist[v].items() if d > 0), 6) for v in verts
    }
    got = {r["vid"]: r["value"] for r in harmonic_centrality(g).collect()}
    assert got == want
    assert got[5] == 0.0


def test_nx_eccentricity_guard_and_cycle():
    """nx wrappers: faithful raise on non-strongly-connected digraphs;
    exact values on a 3-cycle (ecc 2 everywhere, harmonic 1.5)."""
    import pytest as _pytest

    from linkgraph import nx

    G = nx.DiGraph()
    G.add_edges_from([(0, 1), (1, 2), (2, 0)])
    assert nx.eccentricity(G) == {0: 2, 1: 2, 2: 2}
    assert nx.diameter(G) == 2 and nx.radius(G) == 2
    assert nx.center(G) == [0, 1, 2] and nx.periphery(G) == [0, 1, 2]
    assert nx.harmonic_centrality(G) == {0: 1.5, 1: 1.5, 2: 1.5}

    H = nx.DiGraph()
    H.add_edges_from([(0, 1)])  # 1 cannot reach 0
    with _pytest.raises(ValueError, match="not connected"):
        nx.eccentricity(H)


def test_condensation_dag(spark):
    """Two 2-cycles bridged by one edge -> 2-node DAG with one edge;
    weight counts the underlying cross-edges."""
    from linkgraph.algorithms import condensation

    # SCC {0,1} (max id 1), SCC {2,3} (max id 3), bridges 1->2 and 0->3
    g = graph_from_edge_vids(spark, [(0, 1), (1, 0), (2, 3), (3, 2), (1, 2), (0, 3)])
    c = condensation(g)
    comps = {int(r["oid"]) for r in c.vertices.collect()}
    assert comps == {1, 3}
    edges = [(int(r["src"]), int(r["dst"]), r["weight"]) for r in c.edges.collect()]
    vid_of = {int(r["oid"]): r["vid"] for r in c.vertices.collect()}
    assert edges == [(vid_of[1], vid_of[3], 2.0)]
    c.unpersist()


def test_nx_condensation():
    from linkgraph import nx

    G = nx.DiGraph()
    G.add_edges_from([("a", "b"), ("b", "a"), ("c", "d"), ("d", "c"), ("b", "c")])
    H = nx.condensation(G)
    assert H.number_of_nodes() == 2 and H.number_of_edges() == 1
    (u, v), = list(H.edges())
    assert u in ("a", "b") and v in ("c", "d")


def test_bidirectional_distance_matches_bfs(spark):
    from linkgraph.algorithms.traversal import bfs, bidirectional_distance
    from tests.conftest import rmat_edges
    from linkgraph.graph import graph_from_edge_vids

    g = graph_from_edge_vids(spark, rmat_edges(100, 420, seed=3))
    vids = sorted(r["vid"] for r in g.vertices.select("vid").collect())
    src, dst = vids[0], vids[-1]
    want = {r["vid"]: r["value"] for r in bfs(g, src).collect()}.get(dst, -1)
    got = bidirectional_distance(g, src, dst).first()
    assert (got["src"], got["dst"]) == (src, dst)
    assert got["dist"] == want


def test_bidirectional_distance_unreachable_and_self(spark):
    from linkgraph.algorithms.traversal import bidirectional_distance
    from tests.conftest import TWO_COMPONENTS
    from linkgraph.graph import graph_from_edge_vids

    g = graph_from_edge_vids(spark, TWO_COMPONENTS)
    assert bidirectional_distance(g, 0, 5).first()["dist"] == -1  # cross-component
    assert bidirectional_distance(g, 0, 0).first()["dist"] == 0
    assert bidirectional_distance(g, 0, 2).first()["dist"] == 2
