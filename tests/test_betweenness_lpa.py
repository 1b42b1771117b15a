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


def _py_betweenness_gen(edges, verts, normalized=True, endpoints=False, weighted=False):
    """Independent oracle for the generic variant: per-source Dijkstra
    (dist-sorted topological order over the SP DAG), textbook Brandes
    accumulation, optional NetworkX-style endpoint counting."""
    import heapq

    adj = {}
    for e in edges:
        s, d = e[0], e[1]
        w = float(e[2]) if weighted else 1.0
        cur = adj.setdefault(s, {})
        cur[d] = min(cur.get(d, w), w)
    bc = {v: 0.0 for v in verts}
    for s in verts:
        dist = {s: 0.0}
        q = [(0.0, s)]
        while q:
            dv, v = heapq.heappop(q)
            if dv > dist.get(v, float("inf")):
                continue
            for w_, wt in adj.get(v, {}).items():
                nd = dv + wt
                if nd < dist.get(w_, float("inf")) - 1e-12:
                    dist[w_] = nd
                    heapq.heappush(q, (nd, w_))
        reached = sorted(dist, key=lambda v: dist[v])
        preds = {v: [] for v in reached}
        for u in reached:
            for v, wt in adj.get(u, {}).items():
                if v in dist and abs(dist[u] + wt - dist[v]) < 1e-9:
                    preds[v].append(u)
        sigma = {v: 0.0 for v in reached}
        sigma[s] = 1.0
        for v in reached[1:]:
            sigma[v] = sum(sigma[u] for u in preds[v])
        delta = {v: 0.0 for v in reached}
        for v in reversed(reached):
            for u in preds[v]:
                delta[u] += sigma[u] / sigma[v] * (1 + delta[v])
            if v != s:
                bc[v] += delta[v] + (1.0 if endpoints else 0.0)
        if endpoints:
            bc[s] += len(reached) - 1
    n = len(verts)
    if endpoints:
        scale = 1.0 / (n * (n - 1)) if (normalized and n > 1) else 1.0
    else:
        scale = 1.0 / ((n - 1) * (n - 2)) if (normalized and n > 2) else 1.0
    return {v: x * scale for v, x in bc.items()}


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


def test_betweenness_gen_oracle_agrees_with_base(spark):
    # the generic oracle must match the original BFS oracle when unweighted
    edges = rmat_edges(30, 90)
    verts = sorted({v for e in edges for v in e})
    a = _py_betweenness(edges, verts)
    b = _py_betweenness_gen(edges, verts)
    for v in verts:
        assert math.isclose(a[v], b[v], abs_tol=1e-9)


def test_betweenness_endpoints_small(spark):
    edges = [(0, 1), (1, 2), (2, 3), (0, 2), (3, 4), (1, 3)]
    verts = sorted({v for e in edges for v in e})
    g = graph_from_edge_vids(spark, edges)
    got = {r["vid"]: r["value"] for r in betweenness_centrality(g, endpoints=True).collect()}
    want = _py_betweenness_gen(edges, verts, endpoints=True)
    for v in verts:
        assert math.isclose(got[v], want[v], abs_tol=1e-9), (v, got[v], want[v])


def test_betweenness_endpoints_rmat(spark):
    edges = rmat_edges(40, 150)
    verts = sorted({v for e in edges for v in e})
    g = graph_from_edge_vids(spark, edges)
    got = {
        r["vid"]: r["value"]
        for r in betweenness_centrality(g, normalized=False, endpoints=True).collect()
    }
    want = _py_betweenness_gen(edges, verts, normalized=False, endpoints=True)
    for v in verts:
        assert math.isclose(got[v], want[v], abs_tol=1e-6), (v, got[v], want[v])


def _weighted_rmat(n_vertices, n_edges):
    base = rmat_edges(n_vertices, n_edges)
    return [(s, d, (s + d) % 7 + 1) for s, d in base]


def test_betweenness_weighted_rmat(spark):
    edges = _weighted_rmat(30, 100)
    verts = sorted({v for e in edges for v in (e[0], e[1])})
    g = graph_from_edge_vids(spark, [(s, d) for s, d, _ in edges])
    we = g.edges.select(
        "src", "dst",
        (F.pmod(F.col("src") + F.col("dst"), F.lit(7)) + 1).cast("double").alias("w"),
    )
    gw = LinkGraph(vertices=g.vertices, edges=we)
    got = {
        r["vid"]: r["value"]
        for r in betweenness_centrality(gw, normalized=False, weight="w").collect()
    }
    want = _py_betweenness_gen(edges, verts, normalized=False, weighted=True)
    for v in verts:
        assert math.isclose(got[v], want[v], abs_tol=1e-6), (v, got[v], want[v])


def test_betweenness_weighted_endpoints(spark):
    edges = _weighted_rmat(25, 80)
    verts = sorted({v for e in edges for v in (e[0], e[1])})
    g = graph_from_edge_vids(spark, [(s, d) for s, d, _ in edges])
    we = g.edges.select(
        "src", "dst",
        (F.pmod(F.col("src") + F.col("dst"), F.lit(7)) + 1).cast("double").alias("w"),
    )
    gw = LinkGraph(vertices=g.vertices, edges=we)
    got = {
        r["vid"]: r["value"]
        for r in betweenness_centrality(gw, endpoints=True, weight="w").collect()
    }
    want = _py_betweenness_gen(edges, verts, endpoints=True, weighted=True)
    for v in verts:
        assert math.isclose(got[v], want[v], abs_tol=1e-9), (v, got[v], want[v])


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


def test_lpa_u2i_vector_matches_python_oracle(spark):
    """Faithful gs::LPAU2I vector semantics vs a plain-Python replay of
    apps/lpa/lpa_u2i.h:120-239 (u2i weighted sum; i2u clamped
    degree-normalized update)."""
    import math

    from pyspark.sql import functions as F

    from linkgraph.algorithms import lpa_u2i_vector
    from linkgraph.graph import LinkGraph

    edges = [(0, 100), (0, 101), (1, 100), (1, 102), (2, 101), (2, 102), (3, 102)]
    w = {e: float((e[0] + e[1]) % 4 + 1) for e in edges}
    seeds = {0: [1.0, 0.3], 1: [0.0, 0.7], 2: [0.5, 1.0], 3: [0.25, 0.6]}

    e_df = spark.createDataFrame(
        [(s, d, w[(s, d)]) for s, d in edges], "src long, dst long, weight double"
    )
    v_df = (
        e_df.select(F.col("src").alias("vid"))
        .union(e_df.select(F.col("dst").alias("vid")))
        .distinct()
        .select("vid", F.col("vid").cast("string").alias("oid"))
    )
    g = LinkGraph(vertices=v_df, edges=e_df)
    users = spark.createDataFrame([(u,) for u in seeds], "vid long")
    feats = spark.createDataFrame(
        [(u, v) for u, v in seeds.items()], "vid long, props array<double>"
    )

    # plain-python oracle
    out_deg = {u: sum(1 for s, d in edges if s == u) for u in seeds}
    in_deg = {}
    for s, d in edges:
        in_deg[d] = in_deg.get(d, 0) + 1
    nbr_sum = {u: sum(in_deg[d] for s, d in edges if s == u) for u in seeds}
    x = {u: list(v) for u, v in seeds.items()}
    for _ in range(2):
        item = {}
        for (s, d), wt in w.items():
            acc = item.setdefault(d, [0.0, 0.0])
            for p in range(2):
                acc[p] += x[s][p] * wt
        tmp = {u: [0.0, 0.0] for u in seeds}
        for (s, d), wt in w.items():
            for p in range(2):
                tmp[s][p] += item[d][p] * wt
        for u in seeds:
            for p in range(2):
                xi = x[u][p]
                if xi in (0.0, 1.0) or nbr_sum[u] == out_deg[u]:
                    continue
                x[u][p] = (tmp[u][p] - out_deg[u] * xi) / (nbr_sum[u] - out_deg[u])

    got = {(r["vid"], r["pid"]): r["value"]
           for r in lpa_u2i_vector(g, users, feats, max_round=2).collect()}
    for u in seeds:
        for p in range(2):
            assert math.isclose(got[(u, p)], x[u][p], abs_tol=1e-9), (u, p, got[(u, p)], x[u][p])


def test_edge_betweenness_matches_networkx(spark):
    import networkx as nx

    from linkgraph.algorithms import edge_betweenness_centrality

    edges = rmat_edges(40, 200, seed=11)
    verts = sorted({v for e in edges for v in e})
    g = graph_from_edge_vids(spark, edges)
    got = {
        (r["src"], r["dst"]): r["value"]
        for r in edge_betweenness_centrality(g).collect()
    }
    G = nx.DiGraph()
    G.add_nodes_from(verts)
    G.add_edges_from(set(edges))
    want = nx.edge_betweenness_centrality(G, normalized=True)
    assert set(got) == set(want)
    for e, v in want.items():
        assert math.isclose(got[e], v, abs_tol=1e-9), (e, got[e], v)


def test_edge_betweenness_nx_wrapper_and_sampled(spark):
    import networkx as nx

    from linkgraph import nx as lnx
    from linkgraph.algorithms import edge_betweenness_centrality

    G = lnx.DiGraph(spark=spark)
    path = [("a", "b"), ("b", "c"), ("c", "d"), ("b", "d")]
    G.add_edges_from(path)
    got = lnx.edge_betweenness_centrality(G)
    H = nx.DiGraph(path)
    want = nx.edge_betweenness_centrality(H)
    for e, v in want.items():
        assert math.isclose(got[e], v, abs_tol=1e-9), (e, got[e], v)

    # sampled estimator: all-roots sample == exact
    edges = rmat_edges(25, 80, seed=3)
    verts = sorted({v for e in edges for v in e})
    g = graph_from_edge_vids(spark, edges)
    allv = g.vertices.select("vid")
    exact = {
        (r["src"], r["dst"]): r["value"]
        for r in edge_betweenness_centrality(g).collect()
    }
    samp = {
        (r["src"], r["dst"]): r["value"]
        for r in edge_betweenness_centrality(g, sources=allv).collect()
    }
    for e, v in exact.items():
        assert math.isclose(samp[e], v, abs_tol=1e-9)


def test_edge_betweenness_weighted_matches_networkx(spark):
    import networkx as nx

    from linkgraph.algorithms import edge_betweenness_centrality
    from linkgraph.graph import LinkGraph

    edges = rmat_edges(30, 110, seed=5)
    rows = sorted({(a, b) for a, b in edges if a != b})
    wrows = [(a, b, float((a * 13 + b * 7) % 23 + 1)) for a, b in rows]
    e = spark.createDataFrame(wrows, "src long, dst long, w double")
    v = (
        e.select(F.col("src").alias("vid"))
        .union(e.select(F.col("dst").alias("vid")))
        .distinct()
        .select("vid", F.col("vid").cast("string").alias("oid"))
    )
    g = LinkGraph(vertices=v, edges=e)
    got = {
        (r["src"], r["dst"]): r["value"]
        for r in edge_betweenness_centrality(g, weight="w").collect()
    }
    G = nx.DiGraph()
    G.add_nodes_from(r["vid"] for r in v.collect())
    G.add_weighted_edges_from(wrows)
    want = nx.edge_betweenness_centrality(G, weight="weight", normalized=True)
    assert set(got) == set(want)
    for k, val in want.items():
        assert math.isclose(got[k], val, abs_tol=1e-9), (k, got[k], val)
