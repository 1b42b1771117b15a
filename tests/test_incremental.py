"""Incremental append (append-only fragment analog): stable vids, delta
union, warm-start PageRank resume on the grown graph."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from linkgraph import build_graph
from linkgraph.algorithms import pagerank_nx
from linkgraph.incremental import extend_dense_ids, extend_graph, pagerank_resume
from tests.conftest import rmat_edges


def _oid_edges(spark, pairs):
    return spark.createDataFrame(
        [(str(a), str(b)) for a, b in pairs], "src_oid string, dst_oid string"
    )


def test_extend_dense_ids_stable(spark):
    vmap = build_graph(_oid_edges(spark, [(1, 2), (2, 3)])).vertices
    before = {r["oid"]: r["vid"] for r in vmap.collect()}
    grown = extend_dense_ids(vmap, spark.createDataFrame([("9",), ("2",), ("05",)], "oid string"))
    after = {r["oid"]: r["vid"] for r in grown.collect()}
    for oid, vid in before.items():
        assert after[oid] == vid  # old ids untouched
    new = {o: v for o, v in after.items() if o not in before}
    assert set(new) == {"9", "05"}
    assert min(new.values()) == max(before.values()) + 1
    # deterministic order among fresh oids (sorted)
    assert new["05"] < new["9"]


def test_extend_graph_dedups_and_grows(spark):
    g1 = build_graph(_oid_edges(spark, [(1, 2), (2, 3)]))
    delta = _oid_edges(spark, [(2, 3), (3, 4), (3, 4), (4, 1)])  # 1 existing + 1 batch-dup
    g2 = extend_graph(g1, delta)
    assert g2.edges.count() == 4
    assert g2.vertices.count() == 4
    # old vids stable
    v1 = {r["oid"]: r["vid"] for r in g1.vertices.collect()}
    v2 = {r["oid"]: r["vid"] for r in g2.vertices.collect()}
    assert all(v2[o] == v for o, v in v1.items())


def test_pagerank_warm_resume_after_append(spark, tmp_path):
    """North-rule resumability: converge on batch 1, append a delta, warm
    resume -> identical converged result to a cold run on the full graph."""
    all_edges = rmat_edges(200, 700, seed=31)
    cut = 550
    g1 = build_graph(_oid_edges(spark, all_edges[:cut]))
    ranks1 = pagerank_nx(g1, tol=1e-10, max_iter=80)

    g2 = extend_graph(g1, _oid_edges(spark, all_edges[cut:]))
    warm = pagerank_resume(g2, ranks1, tol=1e-10, max_iter=80)
    cold = pagerank_nx(g2, tol=1e-10, max_iter=80)

    w = {r["vid"]: r["value"] for r in warm.collect()}
    c = {r["vid"]: r["value"] for r in cold.collect()}
    assert set(w) == set(c)
    ks = sorted(c)
    assert np.allclose([w[k] for k in ks], [c[k] for k in ks], atol=1e-8, rtol=0)


def test_pagerank_resume_from_checkpoint_snapshot(spark, tmp_path):
    """Mid-iteration snapshot of the OLD graph feeds the warm start on the
    grown graph (checkpoint -> append -> resume)."""
    from linkgraph.checkpoint import CheckpointStore

    all_edges = rmat_edges(150, 500, seed=33)
    g1 = build_graph(_oid_edges(spark, all_edges[:400]))
    ck = str(tmp_path / "pr")
    pagerank_nx(g1, tol=1e-12, max_iter=6, checkpoint_dir=ck)  # interrupted
    snap, rnd = CheckpointStore(ck).load_latest(spark)[:2]
    assert rnd >= 5

    g2 = extend_graph(g1, _oid_edges(spark, all_edges[400:]))
    warm = pagerank_resume(g2, snap.select("vid", F.col("rank").alias("value")),
                           tol=1e-10, max_iter=80)
    cold = pagerank_nx(g2, tol=1e-10, max_iter=80)
    w = {r["vid"]: r["value"] for r in warm.collect()}
    c = {r["vid"]: r["value"] for r in cold.collect()}
    ks = sorted(c)
    assert np.allclose([w[k] for k in ks], [c[k] for k in ks], atol=1e-8, rtol=0)


# ---- incremental triangle maintenance -----------------------------------


def test_triangle_total_incr_matches_cold(spark):
    from linkgraph.algorithms import triangle_total, triangle_total_incr
    from linkgraph.graph import LinkGraph, graph_from_edge_vids

    for seed in (1, 7):
        edges = rmat_edges(n_vertices=60, n_edges=400, seed=seed)
        g2 = graph_from_edge_vids(spark, edges)
        parity = F.pmod(F.col("src") + F.col("dst"), F.lit(3))
        base = LinkGraph(vertices=g2.vertices, edges=g2.edges.where(parity != 0))
        extra = g2.edges.where(parity == 0)
        got = triangle_total_incr(base, extra)
        assert got == triangle_total(g2)


def test_triangle_total_incr_edge_cases(spark):
    """Self-loops, reversed duplicates, already-present pairs, new
    vertices, and 2-/3-new-edge triangles all hit the S/W/T3 terms."""
    import importlib

    from linkgraph.algorithms import triangle_total_incr
    from linkgraph.graph import graph_from_edge_vids

    # the package re-exports the `triangles` function under the same name
    # as the submodule, so fetch the module itself for LAST_INCR
    tri_mod = importlib.import_module("linkgraph.algorithms.triangles")

    # base: path 0-1-2 plus isolated edge 3-4
    base = graph_from_edge_vids(spark, [(0, 1), (1, 2), (3, 4)])
    extra = spark.createDataFrame(
        [
            (2, 0),   # closes 0-1-2: one new-edge triangle (S term)
            (0, 2),   # reversed duplicate of the same pair
            (5, 5),   # self loop — dropped
            (1, 0),   # already present (reversed) — dropped by anti-join
            (3, 5), (4, 5),       # two new arms closed by old 3-4 (W term)
            (6, 7), (7, 8), (8, 6),  # all-new triangle (T3 term)
        ],
        "src long, dst long",
    )
    total = triangle_total_incr(base, extra, base_total=0)
    assert total == 3
    m = tri_mod.LAST_INCR
    assert m["n_appended"] == 6
    # S counts each triangle once per new edge: 1 + 2 + 3
    assert m["S"] == 6 and m["W"] == 4 and m["T3"] == 1
    assert m["delta_triangles"] == 3


def test_triangle_total_incr_empty_delta(spark):
    from linkgraph.algorithms import triangle_total, triangle_total_incr
    from linkgraph.graph import graph_from_edge_vids

    g = graph_from_edge_vids(spark, [(0, 1), (1, 2), (2, 0)])
    extra = g.edges.limit(0)
    assert triangle_total_incr(g, extra) == triangle_total(g) == 1


def test_triangle_total_incr_hypothesis(spark):
    """Property: for ANY base graph and ANY delta (dups, reversals,
    self-loops, already-present pairs, new vertices), incremental ==
    cold on the union. Deterministic example set via hypothesis."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from linkgraph.algorithms import triangle_total, triangle_total_incr
    from linkgraph.graph import LinkGraph, graph_from_edge_vids

    pair = st.tuples(st.integers(0, 14), st.integers(0, 14))

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        base=st.lists(pair, min_size=1, max_size=40),
        delta=st.lists(pair, min_size=0, max_size=15),
    )
    def check(base, delta):
        base = [(a, b) for a, b in base if a != b]
        if not base:
            return
        g = graph_from_edge_vids(spark, base)
        extra = spark.createDataFrame(
            delta or [(0, 0)], "src long, dst long"
        )
        got = triangle_total_incr(g, extra)
        g2_edges = base + [(a, b) for a, b in delta if a != b]
        want = triangle_total(
            LinkGraph(
                vertices=graph_from_edge_vids(spark, g2_edges).vertices,
                edges=spark.createDataFrame(g2_edges, "src long, dst long"),
            )
        )
        assert got == want

    check()
