"""Exact bridges (spanning-forest XOR-cover) vs brute force —
remove-an-edge reconnectivity on small graphs."""

from __future__ import annotations

from collections import deque

from linkgraph.algorithms.bridges import bridges
from linkgraph.graph import graph_from_edge_vids
from tests.conftest import TWO_COMPONENTS, rmat_edges


def _brute_bridges(edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj: dict[int, set[int]] = {}
    for lo, hi in und:
        adj.setdefault(lo, set()).add(hi)
        adj.setdefault(hi, set()).add(lo)

    def connected(a, b, banned):
        seen, q = {a}, deque([a])
        while q:
            x = q.popleft()
            if x == b:
                return True
            for y in adj.get(x, ()):
                if y not in seen and tuple(sorted((x, y))) != banned:
                    seen.add(y)
                    q.append(y)
        return False

    return {e for e in und if not connected(e[0], e[1], e)}


def _engine_bridges(spark, edges):
    g = graph_from_edge_vids(spark, edges)
    return {(r["lo"], r["hi"]) for r in bridges(g).collect()}


def test_bridges_path_all(spark):
    edges = [(i, i + 1) for i in range(6)]
    assert _engine_bridges(spark, edges) == _brute_bridges(edges)
    assert len(_brute_bridges(edges)) == 6  # every path edge is a bridge


def test_bridges_cycle_none(spark):
    edges = [(i, (i + 1) % 5) for i in range(5)]
    assert _engine_bridges(spark, edges) == set()


def test_bridges_two_components(spark):
    # {0,1,2} path (both edges bridges) + {3,4,5} cycle (none)
    assert _engine_bridges(spark, TWO_COMPONENTS) == {(0, 1), (1, 2)}


def test_bridges_shared_min_vertex_triangles(spark):
    # the ADVICE r4 shape: two edge-disjoint triangles sharing vertex 0 —
    # no bridges, but the cut vertex must not confuse the cover fold
    edges = [(0, 1), (1, 2), (0, 2), (0, 3), (3, 4), (0, 4), (4, 9)]
    assert _engine_bridges(spark, edges) == {(4, 9)}


def test_bridges_rmat(spark):
    edges = rmat_edges(90, 220, seed=11)
    assert _engine_bridges(spark, edges) == _brute_bridges(edges)
