"""Bit-parallel multi-source BFS (csr.msbfs_csr) vs the per-seed
DataFrame-tier BFS — exact distance equality, including the bit-63
(int64 sign bit) seed lane and unreached pairs staying absent."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from linkgraph.algorithms.traversal import bfs
from linkgraph.csr import msbfs_csr
from linkgraph.graph import graph_from_edge_vids
from tests.conftest import TWO_COMPONENTS, rmat_edges


def _msbfs_dict(g, seeds):
    out = msbfs_csr(g, seeds, num_blocks=4)
    return {(r["seed"], r["vid"]): r["dist"] for r in out.collect()}


def test_msbfs_matches_per_seed_bfs_64_lanes(spark):
    # 64 seeds so lane 63 exercises the int64 sign bit
    g = graph_from_edge_vids(spark, rmat_edges(120, 700, seed=7))
    seeds = [r["vid"] for r in g.vertices.orderBy("vid").limit(64).collect()]
    assert len(seeds) == 64
    got = _msbfs_dict(g, seeds)
    for s in seeds[:4] + seeds[-4:]:  # spot-check 8 lanes incl. lane 63
        want = {
            r["vid"]: r["value"]
            for r in bfs(g, s).collect()
            if r["value"] >= 0
        }
        lane = {vid: d for (seed, vid), d in got.items() if seed == s}
        assert lane == want, f"seed {s} mismatch"


def test_msbfs_unreached_pairs_absent(spark):
    g = graph_from_edge_vids(spark, TWO_COMPONENTS)
    got = _msbfs_dict(g, [0, 3])
    # seed 0's component is {0,1,2}; seed 3's cycle is {3,4,5}
    assert got == {
        (0, 0): 0, (0, 1): 1, (0, 2): 2,
        (3, 3): 0, (3, 4): 1, (3, 5): 2,
    }


def test_msbfs_seed_validation(spark):
    g = graph_from_edge_vids(spark, TWO_COMPONENTS)
    with pytest.raises(ValueError):
        msbfs_csr(g, [])
    with pytest.raises(ValueError):
        msbfs_csr(g, list(range(65)))
    with pytest.raises(ValueError):
        msbfs_csr(g, [0, 0])
