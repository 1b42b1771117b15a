"""Superstep harness: checkpoint/resume equivalence + lineage manifest.

FIXTURES.md §6: kill after superstep k, resume, final output must equal
the uninterrupted run (allclose for PageRank, exact for labels).
"""

from __future__ import annotations

import json

import numpy as np

from linkgraph.checkpoint import CheckpointStore
from linkgraph.graph import graph_from_edge_vids
from linkgraph.algorithms import pagerank_nx, wcc
from tests.conftest import LANGVILLE_MEYER, rmat_edges


def _d(df):
    return {r["vid"]: r["value"] for r in df.collect()}


def test_pagerank_checkpoint_resume(spark, tmp_path):
    g = graph_from_edge_vids(spark, rmat_edges(120, 400, seed=11))
    full = _d(pagerank_nx(g, tol=1e-8, max_iter=60))

    ck = str(tmp_path / "pr")
    # "crash" after 6 rounds: run with max_iter=6 (checkpoint_every=5 → a
    # snapshot at round 5 exists), then resume to convergence
    _ = pagerank_nx(g, tol=1e-8, max_iter=6, checkpoint_dir=ck)
    store = CheckpointStore(ck)
    assert store.latest() is not None and store.latest()["round"] >= 5

    resumed = _d(pagerank_nx(g, tol=1e-8, max_iter=60, checkpoint_dir=ck))
    ks = sorted(full)
    assert np.allclose([full[k] for k in ks], [resumed[k] for k in ks], atol=1e-9, rtol=0)


def test_wcc_checkpoint_resume_exact(spark, tmp_path):
    g = graph_from_edge_vids(spark, rmat_edges(150, 220, seed=13))
    full = _d(wcc(g))
    ck = str(tmp_path / "wcc")
    _ = wcc(g, max_rounds=2, checkpoint_dir=ck)  # interrupted run
    resumed = _d(wcc(g, checkpoint_dir=ck))
    assert resumed == full


def test_manifest_records_lineage_and_metrics(spark, tmp_path):
    g = graph_from_edge_vids(spark, LANGVILLE_MEYER)
    ck = str(tmp_path / "m")
    pagerank_nx(g, tol=1e-10, max_iter=12, checkpoint_dir=ck)
    entries = CheckpointStore(ck).entries()
    assert entries, "manifest must not be empty"
    for e in entries:
        assert set(e) >= {"round", "path", "rows", "partition_lineage", "schema", "metrics", "skew"}
        assert sum(e["partition_lineage"].values()) == e["rows"] == 6
        assert "l1" in e["metrics"]
        # skew metrics are derived from the same lineage counts
        sk = e["skew"]
        assert sk["partitions"] == len(e["partition_lineage"])
        assert sk["max_rows"] >= sk["min_rows"] >= 0
        assert sk["skew_ratio"] >= 1.0 or sk["max_rows"] == 0
        assert abs(sk["mean_rows"] * sk["partitions"] - e["rows"]) < 1.0
    # manifest is valid JSONL
    with open(CheckpointStore(ck).manifest_path) as f:
        for line in f:
            json.loads(line)


def test_torn_manifest_line_ignored(spark, tmp_path):
    g = graph_from_edge_vids(spark, LANGVILLE_MEYER)
    ck = str(tmp_path / "t")
    pagerank_nx(g, tol=1e-10, max_iter=7, checkpoint_dir=ck)
    store = CheckpointStore(ck)
    before = store.latest()["round"]
    with open(store.manifest_path, "a") as f:
        f.write('{"round": 999, "path": "/nonexistent"')  # torn write
    assert CheckpointStore(ck).latest()["round"] == before


def test_old_round_checkpoint_blocks_freed(spark):
    """_free_local_checkpoint must actually drop old rounds' RDD blocks.

    It reaches into py4j internals (queryExecution().analyzed().rdd()), so a
    Spark upgrade could silently break it and reinstate the block-
    accumulation regression (round times drifting 15s -> 43s at 1e8 edges).
    Run a multi-round superstep job and assert cached-RDD count stays O(1),
    not O(rounds).
    """
    from pyspark.sql import functions as F

    from linkgraph.superstep import run_supersteps

    def n_cached() -> int:
        return sum(
            1
            for info in spark.sparkContext._jsc.sc().getRDDStorageInfo()
            if info.numCachedPartitions() > 0
        )

    spark.catalog.clearCache()
    base = n_cached()
    init = spark.range(1000).select(F.col("id").alias("vid"), F.lit(0.0).alias("value"))

    def step(state, rnd):
        new = state.select("vid", (F.col("value") + 1.0).alias("value"))
        stats = {"sum": new.agg(F.sum("value")).first()[0]}
        return new, stats

    res = run_supersteps(init, step, converged=lambda s: False, max_rounds=8)
    assert res.rounds == 8
    # only the final state's localCheckpoint (and possibly the in-flight
    # one) may hold blocks; 8 rounds must not leave 8 checkpoint RDDs
    assert n_cached() - base <= 2, (
        f"{n_cached() - base} cached RDDs after 8 rounds — old localCheckpoint "
        "blocks are not being freed (superstep._free_local_checkpoint broke)"
    )
    res.state.unpersist()


def test_csr_and_dense_tier_checkpoint_resume(spark, tmp_path):
    """North-rule resumability on the scale tiers: kill the CSR-tier run
    mid-iteration, resume from the parquet checkpoint, converge to the
    uninterrupted result, and the dense-chunk tier reads the same
    checkpoint layout. Comparison is at the convergence scale (tol=1e-8
    per round ⇒ per-vertex ≲1e-7): independent runs may stop one round
    apart and shuffle-order float summation is nondeterministic, so
    bit-near equality is the wrong assertion between two runs — the
    superstep harness's own resume test (above) covers bitwise state
    restore."""
    from linkgraph.csr import pagerank_csr, pagerank_csr_dense

    g = graph_from_edge_vids(spark, rmat_edges(120, 400, seed=11))
    full = _d(pagerank_csr(g, tol=1e-8, max_iter=60, num_blocks=4))

    ck = str(tmp_path / "csr")
    _ = pagerank_csr(g, tol=1e-8, max_iter=6, num_blocks=4, checkpoint_dir=ck)
    store = CheckpointStore(ck)
    assert store.latest() is not None and store.latest()["round"] >= 5
    resumed = _d(pagerank_csr(g, tol=1e-8, max_iter=60, num_blocks=4, checkpoint_dir=ck))
    ks = sorted(full)
    assert np.allclose([full[k] for k in ks], [resumed[k] for k in ks], atol=1e-7, rtol=1e-5)

    # dense tier needs the dense 0..n-1 vid space synth graphs provide
    from linkgraph.corpus import synth_edge_graph

    gd = synth_edge_graph(spark, 300, partitions=4)
    full_d = _d(pagerank_csr_dense(gd, tol=1e-8, max_iter=60, num_blocks=4))
    ck2 = str(tmp_path / "dense")
    _ = pagerank_csr_dense(gd, tol=1e-8, max_iter=6, num_blocks=4, checkpoint_dir=ck2)
    assert CheckpointStore(ck2).latest() is not None
    resumed_d = _d(pagerank_csr_dense(gd, tol=1e-8, max_iter=60, num_blocks=4, checkpoint_dir=ck2))
    ksd = sorted(full_d)
    assert np.allclose([full_d[k] for k in ksd], [resumed_d[k] for k in ksd], atol=1e-7, rtol=1e-5)


def test_delta_tier_checkpoint_resume(spark, tmp_path):
    """The delta-push tier's (rank, resid) state resumes from checkpoint
    exactly like the other tiers: interrupt mid-push, resume, land on
    the uninterrupted result (comparison at convergence scale, same
    rationale as the csr/dense test above)."""
    from linkgraph.csr import pagerank_delta_csr

    g = graph_from_edge_vids(spark, rmat_edges(120, 400, seed=11))
    full = _d(pagerank_delta_csr(g, tol=1e-8, max_iter=300, num_blocks=4))

    ck = str(tmp_path / "delta")
    _ = pagerank_delta_csr(g, tol=1e-8, max_iter=6, num_blocks=4, checkpoint_dir=ck)
    resumed = _d(
        pagerank_delta_csr(g, tol=1e-8, max_iter=300, num_blocks=4, checkpoint_dir=ck)
    )
    ks = sorted(full)
    assert np.allclose(
        [resumed[k] for k in ks], [full[k] for k in ks], atol=1e-6, rtol=0
    )
