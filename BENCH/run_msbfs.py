#!/usr/bin/env python
"""Bit-parallel multi-source BFS (csr.msbfs_csr) at bench scale.

Measures one 64-seed MSBFS pass on the synthetic skewed graph and, for
the sharing claim, a per-seed baseline: the SAME CSR BFS machinery
(sssp_csr with unit weights) run sequentially on the first
``BASELINE_SEEDS`` seeds — the per-seed wall extrapolates the 64-run
sequential cost, so the reported ``sharing_x`` is measured, not
asserted. Checksum = Σ dist over all reached (seed, vid) pairs — must
be identical across core counts (frontier OR is order-free).

Usage: python BENCH/run_msbfs.py <cores> [edges]
Appends one JSON line to BENCH/msbfs_scale.jsonl.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OUT = Path(__file__).parent / "msbfs_scale.jsonl"
cores = int(sys.argv[1])
EDGES = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
PARTS = 32
N_SEEDS = 64
BASELINE_SEEDS = 4

from linkgraph.session import get_spark

os.makedirs("/dev/shm/linkgraph-spark", exist_ok=True)
spark = get_spark(
    app_name=f"linkgraph-msbfs-{cores}",
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
from linkgraph.csr import msbfs_csr, sssp_csr

t0 = time.time()
n_vertices = EDGES // 8
g = synth_edge_graph(spark, n_vertices, avg_out_degree=8, seed=42, partitions=PARTS)
n_edges = g.edges.count()
build_sec = time.time() - t0

# deterministic seed pick: smallest 64 vids that actually have out-edges
seeds = [
    r["src"]
    for r in g.edges.select("src").distinct().orderBy("src").limit(N_SEEDS).collect()
]

t1 = time.time()
out = msbfs_csr(g, seeds, num_blocks=PARTS)
agg = out.agg(
    F.sum("dist").alias("s"), F.count("*").alias("n")
).first()
msbfs_sec = time.time() - t1

t2 = time.time()
base_rows = 0
for s in seeds[:BASELINE_SEEDS]:
    b = sssp_csr(g, src=s, weight_col=None, num_blocks=PARTS)
    base_rows += b.where(F.col("value") >= 0).count()
per_seed_sec = (time.time() - t2) / BASELINE_SEEDS

line = {
    "ts": time.time(),
    "algo": "msbfs",
    "cores": cores,
    "n_edges": n_edges,
    "n_vertices": n_vertices,
    "n_seeds": len(seeds),
    "wall_sec": round(msbfs_sec, 2),
    "checksum_sum_dist": int(agg["s"]),
    "reached_pairs": int(agg["n"]),
    "per_seed_bfs_sec": round(per_seed_sec, 2),
    "seq_64_extrapolated_sec": round(per_seed_sec * N_SEEDS, 1),
    "sharing_x": round(per_seed_sec * N_SEEDS / msbfs_sec, 1),
    "build_sec": round(build_sec, 2),
}
with open(OUT, "a") as f:
    f.write(json.dumps(line) + "\n")
print(json.dumps(line), flush=True)
