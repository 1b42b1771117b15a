#!/usr/bin/env python
"""Maximal clique enumeration at scale: wall + clique checksums at
1e6–1e7 edges, two core counts.

What should scale: the ELS decomposition's only super-linear payload is
the per-corner triangle pair list (Σ_v tri(v) = 3·#triangles rows — the
clustering-coefficient budget), built by the degree-oriented wedge
join; the Bron–Kerbosch work itself is per-vertex-group inside an
Arrow-batched applyInPandas, bounded O(d·3^{d/3}) in the LATER-degree d
(small after degree ordering on power-law graphs). Checksums are exact
integers (clique count, Σ|C|, Σ min-member) — bit-identical across core
counts because the decomposition is a deterministic function of the
(degree, vid) total order, not of partitioning.

Usage: python BENCH/run_maxcliques.py <cores> [edges]
Appends JSON lines to BENCH/maxcliques_scale.jsonl.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OUT = Path(__file__).parent / "maxcliques_scale.jsonl"
cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
EDGES = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
PARTS = 32

from linkgraph.session import get_spark

os.makedirs("/dev/shm/linkgraph-spark", exist_ok=True)
spark = get_spark(
    app_name=f"linkgraph-maxcliques-{cores}",
    cores=cores,
    shuffle_partitions=PARTS,
    extra_conf={
        "spark.local.dir": "/dev/shm/linkgraph-spark",
        "spark.driver.memory": "64g",
        "spark.cleaner.periodicGC.interval": "45s",
    },
)
from pyspark.sql import functions as F

from linkgraph.algorithms.maxcliques import find_cliques
from linkgraph.corpus import synth_edge_graph

t0 = time.time()
g = synth_edge_graph(spark, EDGES // 8, avg_out_degree=8, seed=42, partitions=PARTS)
n_edges = g.edges.count()
n_vertices = g.vertices.count()
build_sec = time.time() - t0
print(f"graph: {n_edges} edges, {n_vertices} vertices, build {build_sec:.1f}s", flush=True)

t1 = time.time()
mc = find_cliques(g)
agg = mc.agg(
    F.count("*").alias("n_cliques"),
    F.sum(F.size("members")).alias("sum_size"),
    F.max(F.size("members")).alias("max_size"),
    F.sum(F.element_at("members", 1) % 1_000_003).alias("minsum"),
).first()
wall = time.time() - t1

rec = {
    "probe": "maxcliques",
    "cores": cores,
    "edges": n_edges,
    "vertices": n_vertices,
    "build_sec": round(build_sec, 2),
    "wall_sec": round(wall, 2),
    "n_cliques": agg["n_cliques"],
    "sum_size": int(agg["sum_size"]),
    "max_size": int(agg["max_size"]),
    "minsum_checksum": int(agg["minsum"]),
}
print(json.dumps(rec), flush=True)
with open(OUT, "a") as f:
    f.write(json.dumps(rec) + "\n")
spark.stop()
