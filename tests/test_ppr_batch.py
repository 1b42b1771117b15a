"""Batched multi-seed personalized PageRank (CSR tier).

Column-for-column the batch must equal the single-seed engine runs
(`pagerank_nx(personalization=...)`, the contract the reference wraps at
python/graphscope/analytical/app/pagerank.py:61-99): same trajectory per
round, so fixed-round and converged modes both match.
"""

import pytest
from pyspark.sql import functions as F

from linkgraph.csr import ppr_batch_csr
from linkgraph.graph import graph_from_edge_vids

EDGES = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2), (5, 0), (6, 3), (3, 6)]
SEEDS = [(0, [(0, 1.0), (1, 1.0)]), (1, [(3, 2.0), (4, 1.0)]), (2, [(6, 1.0)])]


@pytest.fixture(scope="module")
def g(spark):
    return graph_from_edge_vids(spark, EDGES)


def _seed_df(spark):
    rows = [(s, vid, w) for s, pairs in SEEDS for vid, w in pairs]
    return spark.createDataFrame(rows, "seed int, vid long, weight double")


def _single(spark, g, pairs, rounds, tol):
    from linkgraph.algorithms import pagerank_nx

    pdf = spark.createDataFrame(pairs, "vid long, weight double")
    return {
        r.vid: r.value
        for r in pagerank_nx(
            g, alpha=0.85, max_iter=rounds, tol=tol, personalization=pdf
        ).collect()
    }


@pytest.mark.parametrize("tol,rounds", [(None, 5), (1e-9, 60)])
def test_batch_matches_single_seed_runs(spark, g, tol, rounds):
    out = ppr_batch_csr(
        g, _seed_df(spark), alpha=0.85, max_iter=rounds, tol=tol, num_blocks=4
    )
    got = {(r.vid, r.seed): r.value for r in out.collect()}
    assert len(got) == 7 * len(SEEDS)
    for s, pairs in SEEDS:
        ref = _single(spark, g, pairs, rounds, tol)
        for vid, val in ref.items():
            assert got[(vid, s)] == pytest.approx(val, abs=1e-9)


def test_float32_tier_allclose(spark, g):
    f64 = ppr_batch_csr(g, _seed_df(spark), max_iter=5, tol=None, num_blocks=4)
    f32 = ppr_batch_csr(
        g, _seed_df(spark), max_iter=5, tol=None, num_blocks=4, rank_dtype="float32"
    )
    a = {(r.vid, r.seed): r.value for r in f64.collect()}
    b = {(r.vid, r.seed): r.value for r in f32.collect()}
    assert set(a) == set(b)
    for key in a:
        assert b[key] == pytest.approx(a[key], abs=1e-5)


def test_block_count_invariance(spark, g):
    one = ppr_batch_csr(g, _seed_df(spark), max_iter=4, tol=None, num_blocks=1)
    many = ppr_batch_csr(g, _seed_df(spark), max_iter=4, tol=None, num_blocks=7)
    a = sorted(map(tuple, one.collect()))
    b = sorted(map(tuple, many.collect()))
    for x, y in zip(a, b):
        assert x[:2] == y[:2]
        assert y[2] == pytest.approx(x[2], abs=1e-12)


def test_seed_validation(spark, g):
    empty = spark.createDataFrame([], "seed int, vid long, weight double")
    with pytest.raises(ValueError, match="empty"):
        ppr_batch_csr(g, empty)
    gap = spark.createDataFrame([(0, 0, 1.0), (2, 1, 1.0)], "seed int, vid long, weight double")
    with pytest.raises(ValueError, match="contiguous"):
        ppr_batch_csr(g, gap)
    zero = spark.createDataFrame([(0, 0, 0.0)], "seed int, vid long, weight double")
    with pytest.raises(ValueError, match="positive total"):
        ppr_batch_csr(g, zero)
