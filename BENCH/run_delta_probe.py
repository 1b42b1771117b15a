#!/usr/bin/env python
"""Delta-push PageRank probe at 1e8 edges: time-to-convergence of the
full-frontier CSR tier vs the frontier-damped delta tier at MATCHED
final accuracy, on the same synthetic skewed graph as the scaling
matrix (synth_edge_graph, seed 42, 32 blocks).

tol is set to 1e-12 (per-vertex scale): with n ≈ 1.25e7 the nx-style
n-scaled stop (l1 < tol*n) is ~1e-5, reached after ~60-70 rounds — at
tol=1e-6 a graph this large converges trivially in one round under the
nx criterion, which would measure nothing. The delta tier runs with
the matching theta guarantee theta = tol*(1-alpha)/2, so its final L1
error bound (tol*n*alpha) is at least as tight as the iterative stop.

Records per-round walls for both tiers, the delta tier's per-round
frontier sizes (the bytes/round lever made visible), and the max
absolute per-vertex rank difference between the two results.

Usage: python BENCH/run_delta_probe.py <cores> [edges]
Appends JSON lines to BENCH/delta_probe.jsonl.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OUT = Path(__file__).parent / "delta_probe.jsonl"
cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
EDGES = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000_000
PARTS = 32
TOL = 1e-12

from linkgraph.session import get_spark

os.makedirs("/dev/shm/linkgraph-spark", exist_ok=True)
spark = get_spark(
    app_name=f"linkgraph-delta-probe-{cores}",
    cores=cores,
    shuffle_partitions=PARTS,
    extra_conf={
        "spark.local.dir": "/dev/shm/linkgraph-spark",
        "spark.default.parallelism": str(PARTS),
        "spark.driver.memory": "64g",
        "spark.driver.extraJavaOptions": "-XX:+UseParallelGC",
        "spark.executor.heartbeatInterval": "120s",
        "spark.network.timeout": "600s",
        "spark.cleaner.periodicGC.interval": "45s",
    },
)
from pyspark.sql import functions as F

from linkgraph.corpus import synth_edge_graph
import linkgraph.csr as csr

t0 = time.time()
g = synth_edge_graph(spark, EDGES // 8, avg_out_degree=8, seed=42, partitions=PARTS)
n_edges = g.edges.count()
n_vertices = g.vertices.count()
build_sec = time.time() - t0
print(f"graph: {n_edges} edges, {n_vertices} vertices, build {build_sec:.1f}s", flush=True)


def run(algo, fn):
    t1 = time.time()
    out = fn().persist()
    checksum = out.agg(
        F.sum(F.col("value") * F.pmod(F.col("vid"), F.lit(997))).alias("c")
    ).first()["c"]
    wall = time.time() - t1
    hist = csr.LAST_HISTORY or []
    line = {
        "ts": time.time(), "probe": "delta-vs-full", "algo": algo, "cores": cores,
        "n_edges": n_edges, "n_vertices": n_vertices, "tol": TOL,
        "wall_sec": round(wall, 2), "rounds": csr.LAST_ROUNDS,
        "round_secs": [round(h.get("wall_sec", 0.0), 2) for h in hist],
        "frontiers": [h["frontier"] for h in hist if "frontier" in h],
        "checksum": checksum, "build_sec": round(build_sec, 2),
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(line) + "\n")
    print(json.dumps(line), flush=True)
    return out


full = run("pagerank_csr", lambda: csr.pagerank_csr(
    g, alpha=0.85, max_iter=200, tol=TOL, num_blocks=PARTS))
delta = run("pagerank_delta_csr", lambda: csr.pagerank_delta_csr(
    g, alpha=0.85, max_iter=400, tol=TOL, num_blocks=PARTS))

diff = (
    full.select("vid", F.col("value").alias("a"))
    .join(delta.select("vid", F.col("value").alias("b")), "vid")
    .agg(F.max(F.abs(F.col("a") - F.col("b"))).alias("m"))
    .first()["m"]
)
line = {"probe": "delta-vs-full-agreement", "max_abs_diff": diff,
        "n_vertices": n_vertices, "tol": TOL}
with open(OUT, "a") as f:
    f.write(json.dumps(line) + "\n")
print(json.dumps(line), flush=True)
spark.stop()
