#!/usr/bin/env python
"""Luby MIS at scale (join tier): round count + wall at 1e7 edges.

Luby's analysis says the undecided set shrinks geometrically (a constant
fraction of EDGES dies per round in expectation), so the interesting
scale facts are (a) how many rounds the hub-skewed synthetic graph
actually needs and (b) how the per-round cost tracks the shrinking
frontier given the per-round full adjacency join. CSR-tier gather is the
known next lever if MIS latency ever matters (same treatment WCC got).

Usage: python BENCH/run_mis.py <cores> [edges]
Appends JSON lines to BENCH/mis_scale.jsonl.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OUT = Path(__file__).parent / "mis_scale.jsonl"
cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
EDGES = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
PARTS = 32

from linkgraph.session import get_spark

os.makedirs("/dev/shm/linkgraph-spark", exist_ok=True)
spark = get_spark(
    app_name=f"linkgraph-mis-{cores}",
    cores=cores,
    shuffle_partitions=PARTS,
    extra_conf={
        "spark.local.dir": "/dev/shm/linkgraph-spark",
        "spark.driver.memory": "64g",
        "spark.cleaner.periodicGC.interval": "45s",
    },
)
from pyspark.sql import functions as F

import importlib

from linkgraph.corpus import synth_edge_graph
from linkgraph.graph import LinkGraph

_mis = importlib.import_module("linkgraph.algorithms.mis")

t0 = time.time()
g = synth_edge_graph(spark, EDGES // 8, avg_out_degree=8, seed=42, partitions=PARTS)
g = LinkGraph(vertices=g.vertices, edges=g.edges.persist())
n_edges = g.edges.count()
n_vertices = g.vertices.count()
build_sec = time.time() - t0
print(f"graph: {n_edges} edges, {n_vertices} vertices, build {build_sec:.1f}s",
      flush=True)

t1 = time.time()
res = _mis.maximal_independent_set(g, seed=42)
n_mis = res.count()
checksum = int(res.agg(F.sum(F.col("vid") * F.col("value"))).first()[0])
wall = time.time() - t1
line = {
    "ts": time.time(), "probe": "mis", "cores": cores,
    "n_edges": n_edges, "n_vertices": n_vertices, "build_sec": round(build_sec, 2),
    "wall_sec": round(wall, 2), "rounds": _mis.LAST_ROUNDS,
    "mis_size": n_mis, "checksum": checksum,
}
with open(OUT, "a") as f:
    f.write(json.dumps(line) + "\n")
print(json.dumps(line), flush=True)
spark.stop()
