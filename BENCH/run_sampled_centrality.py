#!/usr/bin/env python
"""Sampled betweenness + sampled-target harmonic centrality at bench
scale (VERDICT r4 #8): prove the k-sample estimators are the SCALE path,
not just small-graph twins. Runs on the synthetic skewed graph; appends
one JSON line per estimator to BENCH/sampled_centrality.jsonl.

The estimators' state is O(k·V) (k BFS frontiers ride one long-keyed
DataFrame), so edges enter only through the per-level frontier join —
the wall should track levels × |E|, independent of the full-V² exact
cost. Roots/targets are picked by vid arithmetic (vid % mod == 0), so
the sample — and therefore the result — is partitioning-invariant
(tests/test_parallelism_invariance.py pins this at two layouts).

Usage: python BENCH/run_sampled_centrality.py <cores> [edges] [mod]
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OUT = Path(__file__).parent / "sampled_centrality.jsonl"
cores = int(sys.argv[1])
EDGES = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000_000
MOD = int(sys.argv[3]) if len(sys.argv) > 3 else None
PARTS = 32

from linkgraph.session import get_spark

os.makedirs("/dev/shm/linkgraph-spark", exist_ok=True)
spark = get_spark(
    app_name=f"linkgraph-sampled-centrality-{cores}",
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

from linkgraph.algorithms import betweenness_centrality, harmonic_centrality
from linkgraph.corpus import synth_edge_graph

t0 = time.time()
n_vertices = EDGES // 8
g = synth_edge_graph(spark, n_vertices, avg_out_degree=8, seed=42, partitions=PARTS)
n_edges = g.edges.count()
build_sec = time.time() - t0

# sample size: k roots out of n — deterministic vid arithmetic; default
# targets k≈16 at any scale so the k/n rescale is a real estimator, not
# a near-exhaustive sweep
mod = MOD if MOD else max(1, n_vertices // 16)
roots = g.vertices.where(F.pmod(F.col("vid"), F.lit(mod)) == 0).select("vid")
k = roots.count()


def record(algo, fn, checksum_fn):
    t1 = time.time()
    out = fn()
    checksum = checksum_fn(out)
    wall = time.time() - t1
    line = {
        "ts": time.time(), "algo": algo, "cores": cores, "n_edges": n_edges,
        "n_vertices": n_vertices, "k_sample": k, "mod": mod,
        "wall_sec": round(wall, 2), "checksum": checksum,
        "build_sec": round(build_sec, 2),
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(line) + "\n")
    print(json.dumps(line), flush=True)


record(
    "harmonic_sampled",
    lambda: harmonic_centrality(g, sources=roots),
    lambda df: float(df.agg(F.sum("value")).first()[0] or 0.0),
)
record(
    "betweenness_sampled",
    lambda: betweenness_centrality(g, sources=roots),
    lambda df: float(df.agg(F.sum("value")).first()[0] or 0.0),
)
