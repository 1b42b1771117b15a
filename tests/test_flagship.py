"""Flagship-four correctness vs plain-Python oracles (FIXTURES.md §3/§6).

Mirrors the reference's test style: allclose(atol=1e-6) for PageRank,
exact equality for WCC/CDLP labels and triangle counts
(/root/reference/python/graphscope/tests/unittest/test_app.py:122,314,332).
"""

from __future__ import annotations

import numpy as np
import pytest

from linkgraph.graph import graph_from_edge_vids
from linkgraph.algorithms import (
    cdlp,
    pagerank,
    pagerank_nx,
    triangles,
    triangle_total,
    wcc,
    scc,
)
from tests.conftest import (
    CDLP_TIES,
    LANGVILLE_MEYER,
    TRI_MIX,
    TWO_COMPONENTS,
    py_cdlp,
    py_pagerank_nx,
    py_scc,
    py_triangles,
    py_wcc,
    rmat_edges,
)


def _verts(edges):
    return sorted({v for e in edges for v in e})


def _as_dict(df):
    return {r["vid"]: r["value"] for r in df.collect()}


# ---------------- PageRank ----------------


@pytest.mark.parametrize("edges", [LANGVILLE_MEYER, TWO_COMPONENTS, rmat_edges()])
def test_pagerank_nx_matches_oracle(spark, edges):
    g = graph_from_edge_vids(spark, edges)
    got = _as_dict(pagerank_nx(g, alpha=0.85, max_iter=100, tol=1e-6))
    want = py_pagerank_nx(edges, _verts(edges))
    assert set(got) == set(want)
    ks = sorted(want)
    assert np.allclose([got[k] for k in ks], [want[k] for k in ks], atol=1e-6, rtol=0)


def test_pagerank_langville_meyer_golden(spark):
    """Known values for the 6-vertex example (public literature figures)."""
    g = graph_from_edge_vids(spark, LANGVILLE_MEYER)
    got = _as_dict(pagerank_nx(g, tol=1e-10, max_iter=200))
    assert abs(sum(got.values()) - 1.0) < 1e-9  # ranks are a distribution
    # vertex 2 is dangling; 4/5/6 cluster holds the most mass
    assert got[4] > got[1] and got[6] > got[1]


def test_pagerank_fixed_rounds(spark):
    g = graph_from_edge_vids(spark, LANGVILLE_MEYER)
    got = _as_dict(pagerank(g, delta=0.85, max_round=3))
    want = py_pagerank_nx(LANGVILLE_MEYER, _verts(LANGVILLE_MEYER), max_iter=3, tol=0.0)
    ks = sorted(want)
    assert np.allclose([got[k] for k in ks], [want[k] for k in ks], atol=1e-12, rtol=0)


def test_pagerank_dangling_only(spark):
    # 2 vertices, single edge → vertex 1 dangling; exercises edge cases
    g = graph_from_edge_vids(spark, [(0, 1)])
    got = _as_dict(pagerank_nx(g))
    want = py_pagerank_nx([(0, 1)], [0, 1])
    assert np.allclose([got[0], got[1]], [want[0], want[1]], atol=1e-6)


# ---------------- WCC ----------------


@pytest.mark.parametrize("edges", [TWO_COMPONENTS, TRI_MIX, rmat_edges(100, 150)])
def test_wcc_exact(spark, edges):
    g = graph_from_edge_vids(spark, edges)
    got = _as_dict(wcc(g))
    want = py_wcc(edges, _verts(edges))
    assert got == want


def test_wcc_two_components_golden(spark):
    g = graph_from_edge_vids(spark, TWO_COMPONENTS)
    got = _as_dict(wcc(g))
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3}


# ---------------- CDLP ----------------


@pytest.mark.parametrize("edges", [CDLP_TIES, TWO_COMPONENTS, rmat_edges(80, 160)])
@pytest.mark.parametrize("rounds", [2, 10])
def test_cdlp_exact(spark, edges, rounds):
    g = graph_from_edge_vids(spark, edges)
    got = _as_dict(cdlp(g, max_round=rounds))
    want = py_cdlp(edges, _verts(edges), max_round=rounds)
    assert got == want


def test_cdlp_salted_equals_unsalted(spark):
    edges = rmat_edges(60, 200, seed=7)
    g = graph_from_edge_vids(spark, edges)
    a = _as_dict(cdlp(g, max_round=4, num_salts=1))
    b = _as_dict(cdlp(g, max_round=4, num_salts=32))
    assert a == b


# ---------------- Triangles ----------------


@pytest.mark.parametrize("edges", [TRI_MIX, TWO_COMPONENTS, rmat_edges(120, 500)])
def test_triangles_exact(spark, edges):
    g = graph_from_edge_vids(spark, edges)
    got = _as_dict(triangles(g))
    want = py_triangles(edges, _verts(edges))
    assert got == want


def test_triangles_k4_golden(spark):
    g = graph_from_edge_vids(spark, TRI_MIX)
    got = _as_dict(triangles(g))
    # K4 corners have 3 triangles each; pendant vertex none
    assert got == {0: 3, 1: 3, 2: 3, 3: 3, 6: 0}
    assert triangle_total(g) == 4


# ---------------- SCC (beyond-reference) ----------------


@pytest.mark.parametrize(
    "edges",
    [
        [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 3)],  # two SCCs + bridge
        LANGVILLE_MEYER,
        rmat_edges(60, 150, seed=3),
    ],
)
def test_scc_exact(spark, edges):
    g = graph_from_edge_vids(spark, edges)
    got = _as_dict(scc(g))
    want = py_scc(edges, _verts(edges))
    assert got == want


def test_personalized_pagerank_matches_oracle(spark):
    """pagerank(personalization=...) parity (nx semantics): teleport +
    dangling mass follow the normalized vector; absent vids get 0."""
    edges = rmat_edges()
    g = graph_from_edge_vids(spark, edges)
    verts = _verts(edges)
    pers = {v: 2.0 for v in verts if v % 3 == 0}
    pdf = spark.createDataFrame(list(pers.items()), "vid long, weight double")
    got = _as_dict(pagerank_nx(g, alpha=0.85, max_iter=200, tol=1e-8, personalization=pdf))
    want = py_pagerank_nx(edges, verts, max_iter=200, tol=1e-8, personalization=pers)
    ks = sorted(want)
    assert np.allclose([got[k] for k in ks], [want[k] for k in ks], atol=1e-6, rtol=0)
    # seeds hold more mass than in the uniform run; non-reachable non-seeds ~0
    uni = py_pagerank_nx(edges, verts, max_iter=200, tol=1e-8)
    assert sum(want[v] for v in pers) > sum(uni[v] for v in pers)
