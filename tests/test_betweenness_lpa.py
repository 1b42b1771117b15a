"""Betweenness (Brandes oracle), lpa_u2i, sampling_path."""

from __future__ import annotations

import math
from collections import deque

from pyspark.sql import functions as F

from linkgraph.graph import graph_from_edge_vids, LinkGraph
from linkgraph.algorithms import betweenness_centrality, lpa_u2i, sampling_path
from tests.conftest import rmat_edges


def _py_betweenness(edges, verts, normalized=True):
    """Plain-Python Brandes (directed, unweighted)."""
    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    bc = {v: 0.0 for v in verts}
    for s in verts:
        stack, preds = [], {v: [] for v in verts}
        sigma = {v: 0.0 for v in verts}
        dist = {v: -1 for v in verts}
        sigma[s], dist[s] = 1.0, 0
        q = deque([s])
        while q:
            v = q.popleft()
            stack.append(v)
            for w in adj.get(v, []):
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = {v: 0.0 for v in verts}
        while stack:
            w = stack.pop()
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]
    n = len(verts)
    if normalized and n > 2:
        scale = 1.0 / ((n - 1) * (n - 2))
        bc = {v: x * scale for v, x in bc.items()}
    return bc


def test_betweenness_small_graph(spark):
    edges = [(0, 1), (1, 2), (2, 3), (0, 2), (3, 4), (1, 3)]
    verts = sorted({v for e in edges for v in e})
    g = graph_from_edge_vids(spark, edges)
    got = {r["vid"]: r["value"] for r in betweenness_centrality(g).collect()}
    want = _py_betweenness(edges, verts)
    for v in verts:
        assert math.isclose(got[v], want[v], abs_tol=1e-9), (v, got[v], want[v])


def test_betweenness_rmat(spark):
    edges = rmat_edges(40, 150)
    verts = sorted({v for e in edges for v in e})
    g = graph_from_edge_vids(spark, edges)
    got = {r["vid"]: r["value"] for r in betweenness_centrality(g, normalized=False).collect()}
    want = _py_betweenness(edges, verts, normalized=False)
    for v in verts:
        assert math.isclose(got[v], want[v], abs_tol=1e-6), (v, got[v], want[v])


def test_lpa_u2i_bipartite(spark):
    # users 0,1 share items 10,11 strongly; user 2 isolated with item 12
    edges = [(0, 10, 2.0), (0, 11, 1.0), (1, 10, 2.0), (1, 11, 1.0), (2, 12, 1.0)]
    e = spark.createDataFrame(edges, "src long, dst long, weight double")
    v = spark.createDataFrame(
        [(x,) for x in [0, 1, 2, 10, 11, 12]], "vid long"
    ).select("vid", F.col("vid").cast("string").alias("oid"))
    g = LinkGraph(vertices=v, edges=e)
    users = spark.createDataFrame([(0,), (1,), (2,)], "vid long")
    out = {r["vid"]: r["value"] for r in lpa_u2i(g, users, max_round=3).collect()}
    # items 10/11 adopt min dominant user label 0; users 0,1 converge together
    assert out[10] == out[11]
    assert out[0] == out[1]
    assert out[2] == out[12] or out[12] == 2  # isolated pair stays self-consistent
    assert out[0] != out[2]


def test_sampling_path_deterministic(spark):
    edges = rmat_edges(30, 120)
    g = graph_from_edge_vids(spark, edges)
    a = {r["path_id"]: list(r["path"]) for r in sampling_path(g, 5, 4, seed=7).collect()}
    b = {r["path_id"]: list(r["path"]) for r in sampling_path(g, 5, 4, seed=7).collect()}
    assert a == b and len(a) == 5
    edge_set = set(edges)
    for path in a.values():
        assert all((x, y) in edge_set for x, y in zip(path, path[1:]))
