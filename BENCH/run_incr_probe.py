#!/usr/bin/env python
"""Incremental-PageRank probe at 1e8 edges: after appending ~0.1% new
edges to a converged graph, how much cheaper is warm-start delta-push
than full reconvergence?

Scenario (all on the synth skewed graph, seed 42, 32 blocks):
  1. cold-converge pagerank_csr on the APPENDED graph G' — the
     "recompute from scratch" baseline a non-incremental engine pays;
  2. cold-converge pagerank_csr on the base graph G — produces the
     "yesterday's ranks" the warm start consumes (not part of the
     incremental cost: it was paid before the append);
  3. warm-start pagerank_delta_csr on G' with init_ranks from (2) —
     the incremental cost: one seed pass + push rounds whose frontier
     is the append's blast radius.
Agreement between (1) and (3) is reported as max |Δrank|.

tol=1e-10: small enough that the n-scaled nx stop criterion is
non-trivial at n=1.25e7 (see run_delta_probe.py), large enough that
the warm frontier dies before flooding the graph.

The base graph is converged at TOL*1e-3 — a REQUIREMENT of the warm
start, not a probe nicety (measured: with base and warm at the same
tol, the old solution's own per-vertex defect (~tol*alpha/(1-alpha))
exceeds theta(tol), so the seed residual is super-theta EVERYWHERE
and the frontier floods to ~n; incr_probe.jsonl keeps that run).
Incremental maintenance assumes yesterday's ranks are kept at the
accuracy you want to maintain — then the frontier is the append's
blast radius only.

Usage: python BENCH/run_incr_probe.py <cores> [edges] [append_frac]
Appends JSON lines to BENCH/incr_probe.jsonl.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OUT = Path(__file__).parent / "incr_probe.jsonl"
cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
EDGES = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000_000
FRAC = float(sys.argv[3]) if len(sys.argv) > 3 else 0.001
PARTS = 32
TOL = 1e-10

from linkgraph.session import get_spark

os.makedirs("/dev/shm/linkgraph-spark", exist_ok=True)
spark = get_spark(
    app_name=f"linkgraph-incr-probe-{cores}",
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
from linkgraph.graph import LinkGraph
import linkgraph.csr as csr

t0 = time.time()
g = synth_edge_graph(spark, EDGES // 8, avg_out_degree=8, seed=42, partitions=PARTS)
n_edges = g.edges.count()
n_vertices = g.vertices.count()

# deterministic append: ~FRAC*|E| extra edges whose srcs are sampled
# from EXISTING edges (so every appended src already has out-edges —
# "new imports added to active files"). Appending out-edges to a
# previously-DANGLING vertex instead perturbs every vertex's rank
# through the uniform dangling-redistribution term, so the warm
# frontier correctly floods to ~n at theta-scale (measured — the
# first incr_probe.jsonl runs, random-endpoint append, kept as the
# negative control); locality of incremental recompute is a property
# of the change, not of the algorithm.
k = int(EDGES * FRAC)
pick = F.pmod(F.xxhash64(F.col("src"), F.col("dst"), F.lit(5)), F.lit(int(1 / FRAC)))
extra = (
    g.edges.where(pick == 0)
    .select(
        "src",
        F.pmod(F.xxhash64(F.col("src"), F.col("dst"), F.lit(7)), F.lit(n_vertices)).alias("dst"),
    )
    .where(F.col("src") != F.col("dst"))
)
g2 = LinkGraph(vertices=g.vertices, edges=g.edges.union(extra))
k = extra.count()  # actual appended count (hash filter is approximate)
build_sec = time.time() - t0
print(f"graph: {n_edges} edges (+{k} appended), {n_vertices} vertices, "
      f"build {build_sec:.1f}s", flush=True)


def run(algo, fn):
    t1 = time.time()
    out = fn().persist()
    checksum = out.agg(
        F.sum(F.col("value") * F.pmod(F.col("vid"), F.lit(997))).alias("c")
    ).first()["c"]
    wall = time.time() - t1
    hist = csr.LAST_HISTORY or []
    line = {
        "ts": time.time(), "probe": "incremental", "algo": algo, "cores": cores,
        "n_edges": n_edges, "n_appended": k, "n_vertices": n_vertices, "tol": TOL,
        "wall_sec": round(wall, 2), "rounds": csr.LAST_ROUNDS,
        "round_secs": [round(h.get("wall_sec", 0.0), 2) for h in hist],
        "frontiers": [h["frontier"] for h in hist if "frontier" in h],
        "checksum": checksum, "build_sec": round(build_sec, 2),
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(line) + "\n")
    print(json.dumps(line), flush=True)
    return out


cold2 = run("cold_full_on_appended", lambda: csr.pagerank_csr(
    g2, alpha=0.85, max_iter=200, tol=TOL, num_blocks=PARTS))
old = run("cold_full_on_base", lambda: csr.pagerank_csr(
    g, alpha=0.85, max_iter=200, tol=TOL * 1e-3, num_blocks=PARTS))
warm = run("warm_delta_on_appended", lambda: csr.pagerank_delta_csr(
    g2, alpha=0.85, max_iter=400, tol=TOL, num_blocks=PARTS, init_ranks=old))

diff = (
    cold2.select("vid", F.col("value").alias("a"))
    .join(warm.select("vid", F.col("value").alias("b")), "vid")
    .agg(F.max(F.abs(F.col("a") - F.col("b"))).alias("m"))
    .first()["m"]
)
line = {"probe": "incremental-agreement", "max_abs_diff": diff,
        "n_vertices": n_vertices, "tol": TOL}
with open(OUT, "a") as f:
    f.write(json.dumps(line) + "\n")
print(json.dumps(line), flush=True)
spark.stop()
