"""Deterministic Luby MIS: independence + maximality properties, exact
agreement with a plain-Python round replay (the same process the DuckDB
oracle unrolls), and parallelism invariance via the portable md5
priority."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from linkgraph.algorithms import maximal_independent_set
from linkgraph.graph import graph_from_edge_vids
from tests.conftest import rmat_edges


def _md5(vid: int, seed: int = 42) -> str:
    return hashlib.md5(f"{vid}:{seed}".encode()).hexdigest()


def py_luby(vertices, und_edges, seed=42):
    """Round-by-round replay: winners = undecided strict (p, vid)-minima
    among undecided neighbors; winners + their neighbors leave."""
    nbrs = {v: set() for v in vertices}
    for a, b in und_edges:
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    undecided = set(vertices)
    out = {}
    rnd = 0
    while undecided:
        rnd += 1
        winners = {
            v
            for v in undecided
            if all(
                (_md5(v, seed), v) < (_md5(u, seed), u)
                for u in nbrs[v]
                if u in undecided
            )
        }
        assert winners, "Luby must make progress every round"
        for w in winners:
            out[w] = rnd
        undecided -= winners
        for w in winners:
            undecided -= nbrs[w]
    return out


def test_mis_matches_python_replay_and_properties(spark):
    for gseed in (1, 7):
        edges = rmat_edges(n_vertices=80, n_edges=500, seed=gseed)
        g = graph_from_edge_vids(spark, edges)
        vertices = [r["vid"] for r in g.vertices.collect()]
        got = {r["vid"]: r["value"] for r in maximal_independent_set(g).collect()}
        want = py_luby(vertices, edges)
        assert got == want

        s = set(got)
        nbrs = {v: set() for v in vertices}
        for a, b in edges:
            nbrs[a].add(b)
            nbrs[b].add(a)
        # independence
        assert not any(u in s and v in s for u in s for v in nbrs[u])
        # maximality
        for v in vertices:
            if v not in s:
                assert nbrs[v] & s, f"{v} not in MIS and has no MIS neighbor"


def test_mis_parallelism_invariance(spark):
    edges = rmat_edges(n_vertices=60, n_edges=300, seed=3)
    g = graph_from_edge_vids(spark, edges)
    a = sorted(
        (r["vid"], r["value"])
        for r in maximal_independent_set(g).collect()
    )
    g2 = graph_from_edge_vids(spark, edges)
    g2 = type(g2)(
        vertices=g2.vertices.repartition(7), edges=g2.edges.repartition(13)
    )
    b = sorted(
        (r["vid"], r["value"])
        for r in maximal_independent_set(g2).collect()
    )
    assert a == b


def test_mis_isolated_and_empty(spark):
    # triangle + isolated vertex: exactly one triangle corner + the isolate
    g = graph_from_edge_vids(spark, [(0, 1), (1, 2), (2, 0), (3, 3)])
    got = {r["vid"]: r["value"] for r in maximal_independent_set(g).collect()}
    tri_members = {v for v in got if v in (0, 1, 2)}
    assert len(tri_members) == 1
    assert 3 in got and got[3] == 1  # isolate wins round 1 (no neighbors)


def py_jones_plassmann(vertices, und_edges, seed=42):
    nbrs = {v: set() for v in vertices}
    for a, b in und_edges:
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    undecided = set(vertices)
    color = {}
    while undecided:
        ready = {
            v
            for v in undecided
            if all(
                (_md5(v, seed), v) < (_md5(u, seed), u)
                for u in nbrs[v]
                if u in undecided
            )
        }
        assert ready
        for v in ready:
            used = {color[u] for u in nbrs[v] if u in color}
            c = 0
            while c in used:
                c += 1
            color[v] = c
        undecided -= ready
    return color


def test_greedy_color_matches_python_replay_and_proper(spark):
    from linkgraph.algorithms import greedy_color

    for gseed in (1, 7):
        edges = rmat_edges(n_vertices=70, n_edges=420, seed=gseed)
        g = graph_from_edge_vids(spark, edges)
        vertices = [r["vid"] for r in g.vertices.collect()]
        got = {r["vid"]: r["value"] for r in greedy_color(g).collect()}
        want = py_jones_plassmann(vertices, edges)
        assert got == want
        # properness + Delta+1 bound
        nbrs = {v: set() for v in vertices}
        for a, b in edges:
            nbrs[a].add(b)
            nbrs[b].add(a)
        for v in vertices:
            assert all(got[v] != got[u] for u in nbrs[v])
            assert got[v] <= len(nbrs[v])


def test_greedy_color_parallelism_invariance(spark):
    from linkgraph.algorithms import greedy_color

    edges = rmat_edges(n_vertices=50, n_edges=250, seed=5)
    g = graph_from_edge_vids(spark, edges)
    a = sorted((r["vid"], r["value"]) for r in greedy_color(g).collect())
    g2 = graph_from_edge_vids(spark, edges)
    g2 = type(g2)(vertices=g2.vertices.repartition(9), edges=g2.edges.repartition(5))
    b = sorted((r["vid"], r["value"]) for r in greedy_color(g2).collect())
    assert a == b
