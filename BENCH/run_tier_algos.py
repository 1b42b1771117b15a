#!/usr/bin/env python
"""One-shot fast-tier algorithm measurement at 1e8 edges: wcc_csr,
sssp_csr (BFS mode) and cdlp_csr on the synthetic skewed graph, 32
blocks/partitions, fresh JVM. Appends one JSON line per algorithm to
BENCH/tier_algos.jsonl. Complements the PageRank scaling matrix
(run_scaling_level.py) — these are convergent/fixed-round frontier
algorithms, so the honest figure is total wall + per-round walls.

Usage: python BENCH/run_tier_algos.py <cores> [edges]
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

OUT = Path(__file__).parent / "tier_algos.jsonl"
cores = int(sys.argv[1])
EDGES = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000_000
PARTS = 32

from linkgraph.session import get_spark

os.makedirs("/dev/shm/linkgraph-spark", exist_ok=True)
spark = get_spark(
    app_name=f"linkgraph-tier-algos-{cores}",
    cores=cores,
    shuffle_partitions=PARTS,
    extra_conf={
        "spark.local.dir": "/dev/shm/linkgraph-spark",
        "spark.default.parallelism": str(PARTS),
        "spark.driver.memory": "64g",
        "spark.driver.extraJavaOptions": "-XX:+UseParallelGC",
        # local mode: a >10 s full-GC pause (64 GiB heap, 2e8-row
        # distinct in wcc) makes the in-process executor heartbeat time
        # out and kills the session — GC pauses are not liveness failures
        "spark.executor.heartbeatInterval": "120s",
        "spark.network.timeout": "600s",
        # dead shuffle files in RAM-backed tmpfs are freed by driver GC
        "spark.cleaner.periodicGC.interval": "45s",
    },
)
from pyspark.sql import functions as F

from linkgraph.corpus import synth_edge_graph
from linkgraph.csr import cdlp_csr, sssp_csr, wcc_csr
import linkgraph.superstep as superstep
import inspect as _inspect
import linkgraph.csr as _csr_mod

_PACKED = bool(_inspect.signature(_csr_mod.wcc_csr).parameters["packed"].default)

t0 = time.time()
g = synth_edge_graph(spark, EDGES // 8, avg_out_degree=8, seed=42, partitions=PARTS)
n_edges = g.edges.count()
build_sec = time.time() - t0

def record(algo, fn, checksum_fn):
    t1 = time.time()
    out = fn()
    checksum = checksum_fn(out)
    wall = time.time() - t1
    hist = superstep.LAST_RESULT.history if superstep.LAST_RESULT else []
    line = {
        "ts": time.time(), "algo": algo, "cores": cores, "n_edges": n_edges,
        "packed": _PACKED,
        "blocks": PARTS, "wall_sec": round(wall, 2),
        "rounds": len(hist),
        "round_secs": [round(h["wall_sec"], 2) for h in hist],
        "checksum": checksum, "build_sec": round(build_sec, 2),
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(line) + "\n")
    print(json.dumps(line), flush=True)

record("bfs_sssp_csr", lambda: sssp_csr(g, src=0, weight_col=None, num_blocks=PARTS),
       lambda o: float(o.agg(F.sum("value")).first()[0]))
record("cdlp_csr_r5", lambda: cdlp_csr(g, max_round=5, num_blocks=PARTS),
       lambda o: int(o.agg(F.sum("value")).first()[0]))
record("wcc_csr", lambda: wcc_csr(g, num_blocks=PARTS),
       lambda o: int(o.agg(F.sum("value")).first()[0]))
spark.stop()
