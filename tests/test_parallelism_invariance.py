"""Parallelism invariance — reference's test_scalability.py analog.

The reference asserts identical sorted results at 1/2/3/4 workers
(/root/reference/python/graphscope/tests/unittest/test_scalability.py:40-58).
Here: the same algorithm over differently-partitioned copies of the same
input must produce identical results (exact for integer outputs, 1e-12
for PageRank — same float math, different reduction order).
"""

from __future__ import annotations

import numpy as np

from linkgraph.graph import LinkGraph, graph_from_edge_vids
from linkgraph.algorithms import cdlp, pagerank_nx, triangles, wcc
from tests.conftest import rmat_edges


def _variants(spark, edges):
    base = graph_from_edge_vids(spark, edges)
    for parts in (1, 3, 7):
        yield LinkGraph(
            vertices=base.vertices.repartition(parts),
            edges=base.edges.repartition(parts),
        )


def _d(df):
    return {r["vid"]: r["value"] for r in df.collect()}


def test_flagships_parallelism_invariant(spark):
    edges = rmat_edges(100, 500)
    results = {"wcc": [], "cdlp": [], "tri": [], "pr": []}
    for g in _variants(spark, edges):
        results["wcc"].append(_d(wcc(g)))
        results["cdlp"].append(_d(cdlp(g, max_round=3)))
        results["tri"].append(_d(triangles(g)))
        results["pr"].append(_d(pagerank_nx(g, max_iter=30, tol=1e-8)))
    for key in ("wcc", "cdlp", "tri"):
        assert results[key][0] == results[key][1] == results[key][2], key
    ks = sorted(results["pr"][0])
    for other in results["pr"][1:]:
        assert np.allclose(
            [results["pr"][0][k] for k in ks], [other[k] for k in ks], atol=1e-12, rtol=0
        )
