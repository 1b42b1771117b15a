"""Louvain community detection — structure + modularity checks."""

from __future__ import annotations

from itertools import combinations

from linkgraph.graph import graph_from_edge_vids
from linkgraph.algorithms import louvain


def _cliques_plus_bridge():
    c1 = list(combinations([0, 1, 2, 3], 2))
    c2 = list(combinations([10, 11, 12, 13], 2))
    return c1 + c2 + [(3, 10)]


def test_louvain_separates_cliques(spark):
    g = graph_from_edge_vids(spark, _cliques_plus_bridge())
    out = {r["vid"]: r["value"] for r in louvain(g).collect()}
    left = {out[v] for v in [0, 1, 2, 3]}
    right = {out[v] for v in [10, 11, 12, 13]}
    assert len(left) == 1 and len(right) == 1, out
    assert left != right


def test_louvain_three_components(spark):
    # three disjoint triangles must land in three distinct communities
    edges = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10), (20, 21), (21, 22), (22, 20)]
    g = graph_from_edge_vids(spark, edges)
    out = {r["vid"]: r["value"] for r in louvain(g).collect()}
    comms = {frozenset(v for v in out if out[v] == c) for c in set(out.values())}
    assert comms == {
        frozenset({0, 1, 2}),
        frozenset({10, 11, 12}),
        frozenset({20, 21, 22}),
    }
