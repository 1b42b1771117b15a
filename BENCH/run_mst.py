#!/usr/bin/env python
"""Borůvka MST at scale: round count + wall + checksum at 1e7 edges.

What should scale: components at least halve per round (≤ log2 V
rounds); each round touches the weighted edge list once (two label
joins + one groupBy-min) and runs WCC only on the component-level pick
graph (≤ #components edges — vanishing after round 1). Checksum is the
total forest weight ×1e6 as int, bit-identical across core counts by
construction (the forest is unique under the (w, lo, hi) total order).

Usage: python BENCH/run_mst.py <cores> [edges]
Appends JSON lines to BENCH/mst_scale.jsonl.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OUT = Path(__file__).parent / "mst_scale.jsonl"
cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
EDGES = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
PARTS = 32

from linkgraph.session import get_spark

os.makedirs("/dev/shm/linkgraph-spark", exist_ok=True)
spark = get_spark(
    app_name=f"linkgraph-mst-{cores}",
    cores=cores,
    shuffle_partitions=PARTS,
    extra_conf={
        "spark.local.dir": "/dev/shm/linkgraph-spark",
        "spark.driver.memory": "64g",
        "spark.cleaner.periodicGC.interval": "45s",
    },
)
from pyspark.sql import functions as F

from linkgraph.algorithms.mst import minimum_spanning_forest
from linkgraph.corpus import synth_edge_graph
from linkgraph.graph import LinkGraph

t0 = time.time()
g = synth_edge_graph(spark, EDGES // 8, avg_out_degree=8, seed=42, partitions=PARTS)
# deterministic symmetric weights, same derivation as the g_mst oracle
e = g.edges.select(
    "src", "dst", ((F.col("src") * 31 + F.col("dst") * 31) % 97 + 1).cast("double").alias("w")
)
g = LinkGraph(vertices=g.vertices, edges=e.persist())
n_edges = g.edges.count()
n_vertices = g.vertices.count()
build_sec = time.time() - t0
print(f"graph: {n_edges} edges, {n_vertices} vertices, build {build_sec:.1f}s", flush=True)

t1 = time.time()
f = minimum_spanning_forest(g, weight="w")
agg = f.agg(
    F.count("*").alias("n"), F.sum("w").alias("tw")
).first()
wall = time.time() - t1
line = {
    "ts": time.time(), "probe": "mst", "cores": cores,
    "n_edges": n_edges, "n_vertices": n_vertices, "build_sec": round(build_sec, 2),
    "wall_sec": round(wall, 2), "forest_edges": agg["n"],
    "checksum": int(agg["tw"] * 1_000_000),
}
with open(OUT, "a") as f_:
    f_.write(json.dumps(line) + "\n")
print(json.dumps(line), flush=True)
spark.stop()
