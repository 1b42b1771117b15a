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
        assert set(e) >= {"round", "path", "rows", "partition_lineage", "schema", "metrics"}
        assert sum(e["partition_lineage"].values()) == e["rows"] == 6
        assert "l1" in e["metrics"]
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
