"""Minimum spanning forest: Borůvka vs networkx (unique weights) and vs
a sequential Kruskal replay under the (w, lo, hi) total order (ties)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from linkgraph.algorithms import minimum_spanning_forest
from linkgraph.graph import graph_from_edge_vids
from tests.conftest import rmat_edges


def _kruskal(pairs_w):
    """Sequential Kruskal under the strict (w, lo, hi) order."""
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = []
    for w, lo, hi in sorted(pairs_w):
        a, b = find(lo), find(hi)
        if a != b:
            parent[max(a, b)] = min(a, b)
            out.append((lo, hi, w))
    return out


def _weighted_graph(spark, edges, wfn):
    und = sorted({(min(a, b), max(a, b)) for a, b in edges if a != b})
    rows = [(lo, hi, float(wfn(lo, hi))) for lo, hi in und]
    e = spark.createDataFrame(rows, "src long, dst long, w double")
    v = (
        e.select(F.col("src").alias("vid"))
        .union(e.select(F.col("dst").alias("vid")))
        .distinct()
        .select("vid", F.col("vid").cast("string").alias("oid"))
    )
    from linkgraph.graph import LinkGraph

    return LinkGraph(vertices=v, edges=e), rows


def test_mst_matches_networkx_unique_weights(spark):
    import networkx as nx

    edges = rmat_edges(60, 260, seed=7)
    # unique weights: strict order ⇒ unique MST, nx must agree exactly
    g, rows = _weighted_graph(
        spark, edges, lambda lo, hi: (lo * 1009 + hi * 31) % 99991 + 1
    )
    got = {
        (r["lo"], r["hi"]): r["w"]
        for r in minimum_spanning_forest(g, weight="w").collect()
    }
    G = nx.Graph()
    G.add_weighted_edges_from(rows)
    want = {
        (min(u, v), max(u, v)): d["weight"]
        for u, v, d in nx.minimum_spanning_edges(G, data=True)
    }
    assert got == want
    assert math.isclose(sum(got.values()), sum(want.values()))


def test_mst_ties_match_kruskal_total_order(spark):
    edges = rmat_edges(50, 220, seed=13)
    g, rows = _weighted_graph(spark, edges, lambda lo, hi: (lo + hi) % 7 + 1)
    got = sorted(
        (r["lo"], r["hi"], r["w"])
        for r in minimum_spanning_forest(g, weight="w").collect()
    )
    want = sorted(_kruskal([(w, lo, hi) for lo, hi, w in rows]))
    assert got == want


def test_mst_unit_weights_spans_components(spark):
    # two components: forest has (n1-1) + (n2-1) edges
    edges = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12)]
    g = graph_from_edge_vids(spark, edges)
    f = minimum_spanning_forest(g).collect()
    assert len(f) == 2 + 2
    assert all(r["w"] == 1.0 for r in f)


def test_nx_minimum_spanning_edges_wrapper(spark):
    import networkx as nx

    from linkgraph import nx as lnx

    G = lnx.Graph(spark=spark)
    rows = [("a", "b", 4.0), ("b", "c", 2.0), ("a", "c", 1.0), ("c", "d", 7.0)]
    for u, v, w in rows:
        G.add_edge(u, v, weight=w)
    got = {tuple(sorted(e)) for e in lnx.minimum_spanning_edges(G)}
    H = nx.Graph()
    H.add_weighted_edges_from(rows)
    want = {tuple(sorted((u, v))) for u, v in nx.minimum_spanning_edges(H, data=False)}
    assert got == want
    import pytest as _pytest

    D = lnx.DiGraph(spark=spark)
    D.add_edge("x", "y")
    with _pytest.raises(ValueError, match="undirected"):
        lnx.minimum_spanning_edges(D)


def test_diameter_approx_two_sweep(spark):
    from linkgraph.algorithms import diameter, diameter_approx

    # exact on trees
    tree = [(0, 1), (1, 2), (2, 3), (1, 4), (4, 5)]
    g = graph_from_edge_vids(spark, tree)
    assert diameter_approx(g) == 4
    # lower bound never exceeds the exact diameter on a random graph
    edges = rmat_edges(30, 100, seed=9)
    both = list({(a, b) for a, b in edges if a != b}) + [
        (b, a) for a, b in edges if a != b
    ]
    g2 = graph_from_edge_vids(spark, both)
    lb, ex = diameter_approx(g2), diameter(g2)
    assert 0 < lb <= ex
