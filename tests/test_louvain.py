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


def test_louvain_modularity_bound(spark):
    """The partition's modularity must be near the known optimum for the
    two-clique fixture (Q_opt = 2·(6/13 − (13/26)²) ≈ 0.423) — this is the
    quantitative oracle backing g_louvain's rows-only driver entry."""
    edges = _cliques_plus_bridge()
    g = graph_from_edge_vids(spark, edges)
    comm = {r["vid"]: r["value"] for r in louvain(g).collect()}
    und = set()
    for a, b in edges:
        und.add((min(a, b), max(a, b)))
    m = len(und)
    deg: dict[int, int] = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    q = 0.0
    for c in set(comm.values()):
        members = {v for v in comm if comm[v] == c}
        e_c = sum(1 for a, b in und if a in members and b in members)
        d_c = sum(deg[v] for v in members)
        q += e_c / m - (d_c / (2 * m)) ** 2
    assert q >= 0.4, (q, comm)


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


def test_louvain_canonical_planted_partition(spark):
    """Two dense 5-cliques joined by one bridge edge: the canonical
    two-phase pipeline must recover the planted communities, labeled by
    min member vid, with every original vertex present."""
    import itertools

    from linkgraph.algorithms.louvain import louvain_canonical
    from linkgraph.graph import graph_from_edge_vids

    c1 = list(itertools.combinations(range(5), 2))
    c2 = list(itertools.combinations(range(10, 15), 2))
    g = graph_from_edge_vids(spark, c1 + c2 + [(0, 10)])
    got = {r["vid"]: r["value"] for r in louvain_canonical(g).collect()}
    assert set(got) == set(range(5)) | set(range(10, 15))
    assert {got[v] for v in range(5)} == {0}
    assert {got[v] for v in range(10, 15)} == {10}


def test_louvain_canonical_modularity_not_worse_than_phase1(spark):
    """Contraction phases may only improve (or match) phase-1 modularity
    on the oracle graph shape — checked on a ring-of-cliques where
    phase 2 genuinely merges."""
    import itertools

    from linkgraph.algorithms.louvain import (
        _modularity,
        louvain_canonical,
        louvain_phase1,
    )
    from linkgraph.graph import graph_from_edge_vids
    from pyspark.sql import functions as F

    # 4 triangles chained in a ring through single bridges
    edges = []
    for b in range(4):
        base = b * 3
        edges += list(itertools.combinations(range(base, base + 3), 2))
        edges.append((base + 2, (base + 3) % 12))
    g = graph_from_edge_vids(spark, edges)
    und = g.simple_undirected_edges()
    ew = und.selectExpr("lo AS src", "hi AS dst", "CAST(1.0 AS DOUBLE) AS w").union(
        und.selectExpr("hi AS src", "lo AS dst", "CAST(1.0 AS DOUBLE) AS w")
    )
    m2 = ew.agg(F.sum("w")).first()[0]
    q1 = _modularity(
        ew, louvain_phase1(g, rounds=4).selectExpr("vid", "value AS comm"), m2
    )
    qc = _modularity(
        ew, louvain_canonical(g, 4, 2).selectExpr("vid", "value AS comm"), m2
    )
    assert qc >= q1 - 1e-12
