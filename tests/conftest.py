"""Shared Spark session + tiny canonical fixtures (FIXTURES.md §3)."""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("linkgraph-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.maxPlanStringLength", "1048576")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "6g")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


# ---- canonical edge lists (FIXTURES.md §3) ----------------------------

# Langville–Meyer 6-vertex PageRank example (vertex 2 dangling); same graph
# as /root/reference/python/graphscope/nx/algorithms/tests/builtin/test_pagerank.py:44-68
LANGVILLE_MEYER = [(1, 2), (1, 3), (3, 1), (3, 2), (3, 5), (4, 5), (4, 6), (5, 4), (5, 6), (6, 4)]

# chain 0-1-2 plus triangle 3-4-5 (undirected intent, stored directed)
TWO_COMPONENTS = [(0, 1), (1, 2), (3, 4), (4, 5), (5, 3)]

# K4 on {0,1,2,3} plus pendant edge 3-6
TRI_MIX = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 6)]

# 4-cycle + pendant (CDLP tie-break exercise)
CDLP_TIES = [(0, 1), (1, 2), (2, 3), (3, 0), (3, 4)]


def rmat_edges(n_vertices: int = 300, n_edges: int = 1500, seed: int = 42):
    """Seeded preferential-attachment-ish deterministic random graph."""
    import random

    rng = random.Random(seed)
    targets = list(range(n_vertices))
    # skew: low ids get extra weight (hub-ish)
    weights = [max(1, n_vertices // (i + 1)) for i in range(n_vertices)]
    out = set()
    while len(out) < n_edges:
        s = rng.randrange(n_vertices)
        d = rng.choices(targets, weights=weights, k=1)[0]
        if s != d:
            out.add((s, d))
    return sorted(out)


# ---- plain-Python oracles (public formulas, SURVEY.md §2.4) ------------


def py_pagerank_nx(edges, vertices, alpha=0.85, max_iter=100, tol=1e-6, personalization=None):
    """NetworkX-semantics PageRank (pagerank_networkx.h:65-156).

    ``personalization``: optional {vid: weight} — normalized; teleport AND
    dangling mass land on it (nx defaults dangling weights to p)."""
    verts = sorted(vertices)
    out = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    n = len(verts)
    if personalization is None:
        p = {v: 1.0 / n for v in verts}
    else:
        tot = sum(personalization.values())
        p = {v: personalization.get(v, 0.0) / tot for v in verts}
    rank = {v: 1.0 / n for v in verts}
    for _ in range(max_iter):
        dangling = alpha * sum(rank[v] for v in verts if not out.get(v))
        nxt = {v: 0.0 for v in verts}
        for u in verts:
            if out.get(u):
                share = rank[u] / len(out[u])
                for v in out[u]:
                    nxt[v] += share
        new = {v: alpha * nxt[v] + (1 - alpha) * p[v] + dangling * p[v] for v in verts}
        l1 = sum(abs(new[v] - rank[v]) for v in verts)
        rank = new
        if l1 < tol * n:
            break
    return rank


def py_wcc(edges, vertices):
    """Union-find ground truth; component id = min vid."""
    parent = {v: v for v in vertices}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    return {v: find(v) for v in vertices}


def py_cdlp(edges, vertices, max_round=10):
    """LDBC CDLP: sync LPA, most-frequent neighbor label, min tie-break."""
    from collections import Counter

    nbrs = {v: [] for v in vertices}
    for s, d in edges:
        if s != d:
            nbrs[d].append(s)
            nbrs[s].append(d)
    label = {v: v for v in vertices}
    for _ in range(max_round):
        nxt = {}
        for v in vertices:
            if not nbrs[v]:
                nxt[v] = label[v]
                continue
            cnt = Counter(label[u] for u in nbrs[v])
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[v] = best[0]
        label = nxt
    return label


def py_triangles(edges, vertices):
    """Per-vertex triangle counts on the undirected simple graph."""
    adj = {v: set() for v in vertices}
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    tri = {v: 0 for v in vertices}
    for v in vertices:
        for u in adj[v]:
            if u < v:
                continue
            common = adj[v] & adj[u]
            for w in common:
                if w > u:
                    tri[v] += 1
                    tri[u] += 1
                    tri[w] += 1
    return tri


def py_scc(edges, vertices):
    """Tarjan SCC; component id = max vid in component."""
    import sys

    sys.setrecursionlimit(100000)
    adj = {v: [] for v in vertices}
    for s, d in edges:
        if s in adj and d in adj:
            adj[s].append(d)
    index = {}
    low = {}
    on = set()
    stack = []
    counter = [0]
    result = {}

    def strong(v):
        work = [(v, 0)]
        while work:
            node, pi = work.pop()
            if pi == 0:
                index[node] = low[node] = counter[0]
                counter[0] += 1
                stack.append(node)
                on.add(node)
            recurse = False
            for i in range(pi, len(adj[node])):
                w = adj[node][i]
                if w not in index:
                    work.append((node, i + 1))
                    work.append((w, 0))
                    recurse = True
                    break
                elif w in on:
                    low[node] = min(low[node], index[w])
            if not recurse:
                if low[node] == index[node]:
                    comp = []
                    while True:
                        w = stack.pop()
                        on.discard(w)
                        comp.append(w)
                        if w == node:
                            break
                    cid = max(comp)
                    for w in comp:
                        result[w] = cid
                if work:
                    parent = work[-1][0]
                    low[parent] = min(low[parent], low[node])

    for v in vertices:
        if v not in index:
            strong(v)
    return result
