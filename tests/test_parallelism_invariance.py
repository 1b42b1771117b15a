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


def test_fast_tier_block_count_invariant(spark):
    """sssp_csr / cdlp_csr must give identical results at any num_blocks —
    on a cluster, block count tracks executor count, and adding executors
    must never change answers (the north rule's N vs 4N premise)."""
    import random

    from linkgraph.csr import cdlp_csr, sssp_csr

    rnd = random.Random(3)
    pairs = rmat_edges(120, 420, seed=41)
    rows = [(s, d, round(rnd.uniform(0.1, 4.0), 3)) for s, d in pairs]
    e = spark.createDataFrame(rows, "src long, dst long, weight double")
    from pyspark.sql import functions as F

    v = e.select(F.col("src").alias("vid")).union(e.select("dst")).distinct()
    g = LinkGraph(vertices=v, edges=e)

    sssp_ref = {r["vid"]: r["value"] for r in sssp_csr(g, src=0, num_blocks=3).collect()}
    cdlp_ref = {r["vid"]: r["value"] for r in cdlp_csr(g, max_round=4, num_blocks=3).collect()}
    for p in (5, 8):
        assert {r["vid"]: r["value"] for r in sssp_csr(g, src=0, num_blocks=p).collect()} == sssp_ref
        assert {r["vid"]: r["value"] for r in cdlp_csr(g, max_round=4, num_blocks=p).collect()} == cdlp_ref


def test_sampled_estimators_parallelism_invariant(spark):
    """Sampled betweenness (k-root rescale) and sampled-target harmonic
    must be partitioning-invariant: the root/target sample is chosen by
    vid arithmetic, not by partition, so results are exact across
    repartitioned copies (the N vs 4N premise for the estimator tier)."""
    from pyspark.sql import functions as F

    from linkgraph.algorithms import betweenness_centrality, harmonic_centrality

    edges = rmat_edges(100, 500, seed=11)
    res_b, res_h = [], []
    for g in _variants(spark, edges):
        srcs = g.vertices.where(F.col("vid") % 5 == 0).select("vid")
        res_b.append(
            {r["vid"]: round(r["value"], 12) for r in
             betweenness_centrality(g, sources=srcs).collect()}
        )
        res_h.append(_d(harmonic_centrality(g, sources=srcs)))
    assert res_b[0] == res_b[1] == res_b[2]
    assert res_h[0] == res_h[1] == res_h[2]


def test_msbfs_and_bridges_parallelism_invariant(spark):
    """msbfs_csr (any num_blocks) and bridges (any input partitioning)
    must give identical results — integer outputs, exact equality."""
    from linkgraph.algorithms.bridges import bridges
    from linkgraph.csr import msbfs_csr

    edges = rmat_edges(110, 330, seed=13)
    base = graph_from_edge_vids(spark, edges)
    seeds = [r["vid"] for r in base.vertices.orderBy("vid").limit(16).collect()]
    msbfs_runs, bridge_runs = [], []
    for parts in (1, 3, 7):
        g = LinkGraph(
            vertices=base.vertices.repartition(parts),
            edges=base.edges.repartition(parts),
        )
        msbfs_runs.append(
            {(r["seed"], r["vid"]): r["dist"] for r in msbfs_csr(g, seeds, num_blocks=parts).collect()}
        )
        bridge_runs.append({(r["lo"], r["hi"]) for r in bridges(g).collect()})
    assert msbfs_runs[0] == msbfs_runs[1] == msbfs_runs[2]
    assert bridge_runs[0] == bridge_runs[1] == bridge_runs[2]
