"""Weighted (Onnela) clustering vs a brute-force python replay."""

import itertools

import pytest
from pyspark.sql import functions as F

from linkgraph.algorithms.clustering import clustering_weighted
from linkgraph.graph import LinkGraph, graph_from_edge_vids

EDGES = [(0, 1, 2.0), (1, 2, 4.0), (0, 2, 1.0), (2, 3, 3.0), (3, 0, 2.0), (4, 0, 5.0)]


def _brute(edges, vids):
    mx = max(w for _, _, w in edges)
    und = {}
    for s, d, w in edges:
        lo, hi = min(s, d), max(s, d)
        und[(lo, hi)] = max(und.get((lo, hi), 0.0), w / mx)
    nbrs = {}
    for (lo, hi), w in und.items():
        nbrs.setdefault(lo, {})[hi] = w
        nbrs.setdefault(hi, {})[lo] = w
    out = {}
    for v in vids:
        nb = nbrs.get(v, {})
        d = len(nb)
        if d < 2:
            out[v] = 0.0
            continue
        t = 0.0
        for b, c in itertools.combinations(sorted(nb), 2):
            key = (min(b, c), max(b, c))
            if key in und:
                t += (nb[b] * nb[c] * und[key]) ** (1.0 / 3.0)
        out[v] = 2.0 * t / (d * (d - 1))
    return out


@pytest.fixture(scope="module")
def g(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long, weight double")
    base = graph_from_edge_vids(spark, [(s, d) for s, d, _ in EDGES])
    return LinkGraph(vertices=base.vertices, edges=e)


def test_matches_brute_force(spark, g):
    got = {r.vid: r.value for r in clustering_weighted(g).collect()}
    want = _brute(EDGES, sorted(got))
    assert set(got) == set(want)
    for v in got:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    g.unpersist()


def test_asymmetric_multiweight_collapses_to_max(spark):
    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 0, 9.0), (1, 2, 9.0), (0, 2, 9.0)],
        "src long, dst long, weight double",
    )
    base = graph_from_edge_vids(spark, [(0, 1), (1, 2), (0, 2)])
    g = LinkGraph(vertices=base.vertices, edges=e)
    got = {r.vid: r.value for r in clustering_weighted(g).collect()}
    # all normalized weights are 1 after the max collapse → unweighted lcc
    assert got == pytest.approx({0: 1.0, 1: 1.0, 2: 1.0})
    g.unpersist()


def test_missing_weight_column_raises(spark, g):
    base = graph_from_edge_vids(spark, [(0, 1)])
    with pytest.raises(ValueError, match="no edge column"):
        clustering_weighted(base)


def test_nx_wrapper(spark):
    from linkgraph import nx as lnx

    G = lnx.Graph(spark)
    for s, d, w in EDGES:
        G.add_edge(s, d, weight=w)
    got = lnx.clustering(G, weight="weight")
    want = _brute(EDGES, sorted(got))
    for v in got:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    with pytest.raises(ValueError, match="weight"):
        lnx.clustering(G, weight="cost")
