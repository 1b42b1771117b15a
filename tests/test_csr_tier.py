"""CSR fast tier vs reference (pure-DataFrame) tier — SURVEY.md §7.1.

The fast tier must produce identical results: allclose(1e-12-ish; both
tiers compute the same float math, only reduction order differs) for
PageRank, exact equality for WCC labels.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from linkgraph.graph import graph_from_edge_vids
from linkgraph.algorithms import pagerank_nx, wcc
from linkgraph.csr import build_csr_blocks, pagerank_csr, wcc_csr
from tests.conftest import LANGVILLE_MEYER, TWO_COMPONENTS, rmat_edges


def _d(df):
    return {r["vid"]: r["value"] for r in df.collect()}


def test_csr_blocks_cover_all_edges(spark):
    edges = rmat_edges(80, 300)
    g = graph_from_edge_vids(spark, edges)
    blocks = build_csr_blocks(g.edges, 4).collect()
    assert sum(b["n_edges"] for b in blocks) == len(edges)
    seen = set()
    for b in blocks:
        us, indptr, udst, dst_idx = b["us"], b["indptr"], b["udst"], b["dst_idx"]
        assert list(indptr) == sorted(indptr) and indptr[-1] == b["n_edges"]
        for i, s in enumerate(us):
            assert s % 4 == b["bid"]
            for j in range(indptr[i], indptr[i + 1]):
                seen.add((s, udst[dst_idx[j]]))
    assert seen == set(edges)


@pytest.mark.parametrize("edges", [LANGVILLE_MEYER, rmat_edges(120, 600)])
def test_pagerank_csr_matches_reference_tier(spark, edges):
    g = graph_from_edge_vids(spark, edges)
    ref = _d(pagerank_nx(g, alpha=0.85, max_iter=40, tol=1e-8))
    fast = _d(pagerank_csr(g, alpha=0.85, max_iter=40, tol=1e-8, num_blocks=4))
    assert set(ref) == set(fast)
    ks = sorted(ref)
    assert np.allclose([fast[k] for k in ks], [ref[k] for k in ks], atol=1e-9, rtol=0)


def test_wcc_csr_matches_reference_tier(spark):
    edges = TWO_COMPONENTS + [(10, 11)]
    g = graph_from_edge_vids(spark, edges)
    assert _d(wcc_csr(g, num_blocks=3)) == _d(wcc(g))


def test_pagerank_csr_float32_scale_tier(spark):
    """rank_dtype='float32' (the bytes-halving scale knob) stays within
    float32 rounding of the float64 tier and converges."""
    g = graph_from_edge_vids(spark, rmat_edges(150, 700, seed=17))
    ref = _d(pagerank_csr(g, alpha=0.85, max_iter=60, tol=1e-8, num_blocks=4))
    f32 = _d(pagerank_csr(g, alpha=0.85, max_iter=60, tol=1e-8, num_blocks=4,
                          rank_dtype="float32"))
    assert set(ref) == set(f32)
    ks = sorted(ref)
    a, b = np.array([ref[k] for k in ks]), np.array([f32[k] for k in ks])
    assert np.allclose(a, b, rtol=5e-6, atol=1e-9)
    assert abs(b.sum() - 1.0) < 1e-5  # mass conserved


def test_pagerank_dense_matches_reference_tier(spark):
    """Dense-chunk tier (array-packed partials + chunked state) is exact
    vs the join tier on the dense vid space synth graphs provide."""
    from linkgraph.corpus import synth_edge_graph
    from linkgraph.csr import pagerank_csr_dense

    g = synth_edge_graph(spark, 400, partitions=4)
    ref = _d(pagerank_nx(g, alpha=0.85, max_iter=40, tol=1e-8))
    for p in (4, 3):  # even and ragged chunking (n % p != 0)
        fast = _d(pagerank_csr_dense(g, alpha=0.85, max_iter=40, tol=1e-8, num_blocks=p))
        assert set(ref) == set(fast)
        ks = sorted(ref)
        assert np.allclose([fast[k] for k in ks], [ref[k] for k in ks], atol=1e-12, rtol=0)


def test_pagerank_dense_float32(spark):
    from linkgraph.corpus import synth_edge_graph
    from linkgraph.csr import pagerank_csr_dense

    g = synth_edge_graph(spark, 300, partitions=4)
    ref = _d(pagerank_csr_dense(g, alpha=0.85, max_iter=60, tol=1e-8, num_blocks=4))
    f32 = _d(pagerank_csr_dense(g, alpha=0.85, max_iter=60, tol=1e-8, num_blocks=4,
                                rank_dtype="float32"))
    ks = sorted(ref)
    a, b = np.array([ref[k] for k in ks]), np.array([f32[k] for k in ks])
    assert np.allclose(a, b, rtol=5e-6, atol=1e-9)
    assert abs(b.sum() - 1.0) < 1e-5


def test_pagerank_dense_requires_dense_ids(spark):
    """Non-dense vid spaces (LANGVILLE_MEYER uses 1..6) must fail loudly,
    pointing at assign_dense_ids — not silently mis-place state."""
    from linkgraph.csr import pagerank_csr_dense

    g = graph_from_edge_vids(spark, LANGVILLE_MEYER)
    with pytest.raises(Exception, match="dense"):
        pagerank_csr_dense(g, max_iter=3, num_blocks=4).collect()


def test_sssp_csr_matches_join_tier_weighted(spark):
    """sssp_csr (weighted blocks, per-block minima) reaches the exact
    label-correcting fixpoint of the join tier, including unreachable
    -1.0 markers."""
    import random

    from linkgraph.algorithms.traversal import sssp
    from linkgraph.csr import sssp_csr

    rnd = random.Random(7)
    pairs = rmat_edges(150, 600, seed=23)
    rows = [(s, d, round(rnd.uniform(0.1, 5.0), 3)) for s, d in pairs]
    e = spark.createDataFrame(rows, "src long, dst long, weight double")
    v = e.select(F.col("src").alias("vid")).union(e.select("dst")).distinct()
    from linkgraph.graph import LinkGraph

    g = LinkGraph(vertices=v, edges=e)
    ref = _d(sssp(g, src=0))
    fast = _d(sssp_csr(g, src=0, num_blocks=4))
    assert ref == fast


def test_sssp_csr_unit_weights_is_bfs(spark):
    """weight_col=None → unit weights: sssp_csr equals BFS hop counts."""
    from linkgraph.algorithms.traversal import bfs
    from linkgraph.csr import sssp_csr

    g = graph_from_edge_vids(spark, rmat_edges(120, 300, seed=5))
    hops = _d(bfs(g, src=0))
    fast = _d(sssp_csr(g, src=0, weight_col=None, num_blocks=4))
    assert {k: float(v) for k, v in hops.items()} == fast


def test_cdlp_csr_matches_join_tier_exact(spark):
    """cdlp_csr (run-length (dst,label) combine over bidirectional blocks)
    is round-for-round EXACT vs the salted join tier — same most-frequent
    label, same min-label tie-break, same fixed round count."""
    from linkgraph.algorithms import cdlp
    from linkgraph.csr import cdlp_csr

    g = graph_from_edge_vids(spark, rmat_edges(150, 500, seed=31))
    for rounds in (1, 5):
        ref = _d(cdlp(g, max_round=rounds))
        fast = _d(cdlp_csr(g, max_round=rounds, num_blocks=4))
        assert ref == fast


def test_pagerank_csr_sparse_64bit_vid_space(spark):
    """The sparse CSR tier accepts non-dense vid spaces. int32 partial-key
    compaction must key on the vid VALUES, not the vertex count — 64-bit
    vids through a wrapped int32 key would aggregate under corrupted keys
    and silently zero out those vertices' in-rank."""
    base = rmat_edges(100, 350, seed=9)
    g_small = graph_from_edge_vids(spark, base)
    shift = 2**32
    g_big = graph_from_edge_vids(spark, [(s + shift, d + shift) for s, d in base])
    ref = _d(pagerank_csr(g_small, max_iter=25, tol=None, num_blocks=4))
    big = _d(pagerank_csr(g_big, max_iter=25, tol=None, num_blocks=4))
    assert {k + shift for k in ref} == set(big)
    ks = sorted(ref)
    assert np.allclose([ref[k] for k in ks], [big[k + shift] for k in ks], atol=1e-12, rtol=0)


def test_packed_paths_match_unpacked(spark):
    """The r4 packed-partials plans must equal the r1-r3 hash-agg plans:
    exactly for wcc/cdlp/sssp (order-free min / integer argmax),
    allclose for pagerank (float reduction order differs)."""
    from linkgraph.csr import cdlp_csr, pagerank_csr, sssp_csr, wcc_csr

    g = graph_from_edge_vids(spark, rmat_edges(150, 700, seed=23))
    pr_p = _d(pagerank_csr(g, max_iter=25, tol=None, num_blocks=4, packed=True))
    pr_u = _d(pagerank_csr(g, max_iter=25, tol=None, num_blocks=4, packed=False))
    ks = sorted(pr_p)
    assert np.allclose([pr_p[k] for k in ks], [pr_u[k] for k in ks], atol=1e-12, rtol=0)
    assert _d(wcc_csr(g, num_blocks=4, packed=True)) == _d(
        wcc_csr(g, num_blocks=4, packed=False)
    )
    assert _d(cdlp_csr(g, max_round=4, num_blocks=4, packed=True)) == _d(
        cdlp_csr(g, max_round=4, num_blocks=4, packed=False)
    )
    assert _d(sssp_csr(g, src=0, weight_col=None, num_blocks=4, packed=True)) == _d(
        sssp_csr(g, src=0, weight_col=None, num_blocks=4, packed=False)
    )


def test_pagerank_delta_converges_to_reference(spark):
    """The push tier's fixpoint equals the iterative tiers': stopping at
    resid L1 <= tol*n*(1-a) bounds the final L1 error by tol*n*alpha
    (csr.pagerank_delta_csr docstring), so at tol=1e-9 both tiers agree
    well inside 1e-7 per vertex."""
    from linkgraph.csr import pagerank_delta_csr

    for edges in (LANGVILLE_MEYER, rmat_edges(120, 600)):
        g = graph_from_edge_vids(spark, edges)
        ref = _d(pagerank_nx(g, alpha=0.85, max_iter=200, tol=1e-9))
        fast = _d(pagerank_delta_csr(g, alpha=0.85, max_iter=400, tol=1e-9, num_blocks=4))
        assert set(ref) == set(fast)
        ks = sorted(ref)
        assert np.allclose([fast[k] for k in ks], [ref[k] for k in ks], atol=1e-7, rtol=0)


def test_pagerank_delta_block_count_invariance(spark):
    """Block count changes partial grouping (reduction order) but never
    the push schedule: values agree to float-reduction noise."""
    from linkgraph.csr import pagerank_delta_csr

    g = graph_from_edge_vids(spark, rmat_edges(150, 700, seed=17))
    a = _d(pagerank_delta_csr(g, alpha=0.85, max_iter=12, tol=0.0, theta=7.5e-8, num_blocks=3))
    b = _d(pagerank_delta_csr(g, alpha=0.85, max_iter=12, tol=0.0, theta=7.5e-8, num_blocks=8))
    ks = sorted(a)
    assert np.allclose([a[k] for k in ks], [b[k] for k in ks], atol=1e-12, rtol=0)


def test_pagerank_delta_frontier_shrinks(spark):
    """The lever itself: as residuals fall below theta the per-round
    frontier (and with it the partial shuffle) must shrink; by the last
    rounds it is a strict subset of the vertex set."""
    from linkgraph import csr
    from linkgraph.csr import pagerank_delta_csr

    g = graph_from_edge_vids(spark, rmat_edges(200, 900, seed=7))
    n = g.vertices.count()
    pagerank_delta_csr(g, alpha=0.85, max_iter=300, tol=1e-6).count()
    frontiers = [h["frontier"] for h in csr.LAST_HISTORY]
    assert frontiers[0] == n  # round 1 pushes everything
    assert frontiers[-1] < n  # converged tail pushes a strict subset
    assert min(frontiers) == frontiers[-1] or frontiers[-1] <= sorted(frontiers)[1]


def test_pagerank_delta_warm_start_incremental(spark):
    """The tier's raison d'etre: after an edge append, seeding with the
    old converged ranks makes the initial residual the *defect* of the
    old solution under the new operator — near zero outside the blast
    radius of the change — so recomputation starts from a small
    frontier and still lands on the full-graph fixpoint."""
    from linkgraph import csr
    from linkgraph.csr import pagerank_delta_csr
    from linkgraph.graph import graph_from_edge_vids

    edges = rmat_edges(200, 900, seed=7)
    extra = [(1, 190), (190, 3), (5, 191)]
    g1 = graph_from_edge_vids(spark, edges)
    g2 = graph_from_edge_vids(spark, edges + extra)
    old = pagerank_delta_csr(g1, alpha=0.85, max_iter=400, tol=1e-9, num_blocks=4)

    warm = _d(
        pagerank_delta_csr(
            g2, alpha=0.85, max_iter=400, tol=1e-9, num_blocks=4, init_ranks=old
        )
    )
    frontiers = [h["frontier"] for h in csr.LAST_HISTORY]
    ref = _d(pagerank_nx(g2, alpha=0.85, max_iter=300, tol=1e-10))
    assert set(ref) == set(warm)
    ks = sorted(ref)
    assert np.allclose([warm[k] for k in ks], [ref[k] for k in ks], atol=1e-7, rtol=0)
    n = g2.vertices.count()
    # the warm frontier never reaches the whole graph: the append's
    # blast radius is what gets recomputed
    assert max(frontiers) < n


def test_sssp_incremental_warm_start_exact(spark):
    """Warm-started SSSP after an edge append is BIT-identical to the
    cold full-graph run: old distances are upper bounds, label
    correcting from the appended srcs closes the gap exactly."""
    from linkgraph.csr import sssp_csr
    from linkgraph.graph import LinkGraph

    edges = rmat_edges(150, 600, seed=23)
    extra = [(5, 149), (149, 7), (11, 148), (148, 5)]
    g_old = graph_from_edge_vids(spark, edges)
    g_new = graph_from_edge_vids(spark, edges + extra)

    def weighted(g):
        e = g.edges.select(
            "src", "dst",
            (F.pmod(F.col("src") + F.col("dst"), F.lit(7)) + 1)
            .cast("double").alias("weight"),
        )
        return LinkGraph(vertices=g.vertices, edges=e)

    cold = _d(sssp_csr(weighted(g_new), src=0, num_blocks=4))
    d_old = sssp_csr(weighted(g_old), src=0, num_blocks=4)
    fr = spark.createDataFrame([(s,) for s, _ in extra], "vid long")
    warm = _d(
        sssp_csr(weighted(g_new), src=0, num_blocks=4, init_dists=d_old, frontier=fr)
    )
    assert warm == cold  # bit-identical, not allclose

    # no-frontier fallback (full re-relax sweep) is equally exact
    sweep = _d(sssp_csr(weighted(g_new), src=0, num_blocks=4, init_dists=d_old))
    assert sweep == cold


def test_wcc_incremental_warm_start_exact(spark):
    """Warm-started WCC after an append equals the cold run exactly;
    components only merge, old labels are upper bounds."""
    from linkgraph.csr import wcc_csr

    edges = TWO_COMPONENTS + [(10, 11)]
    extra = [(0, 10)]  # merges the two components
    g_old = graph_from_edge_vids(spark, edges)
    g_new = graph_from_edge_vids(spark, edges + extra)
    cold = _d(wcc_csr(g_new, num_blocks=3))
    old = wcc_csr(g_old, num_blocks=3)
    fr = spark.createDataFrame([(u,) for e in extra for u in e], "vid long")
    warm = _d(wcc_csr(g_new, num_blocks=3, init_labels=old, frontier=fr))
    assert warm == cold

    # the BOTH-endpoints requirement is real: the appended edge's
    # smaller-label side (vid 0) holds the label that must cross it —
    # a frontier of only the larger side (vid 10) deadlocks the merge
    one_sided = spark.createDataFrame([(10,)], "vid long")
    stuck = _d(wcc_csr(g_new, num_blocks=3, init_labels=old, frontier=one_sided))
    assert stuck != cold
