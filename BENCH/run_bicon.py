#!/usr/bin/env python
"""Tarjan–Vishkin biconnectivity at scale: wall + block/articulation
checksums at 1e6–1e7 edges, two core counts.

What should scale: every stage is an edge- or vertex-sized join —
BFS depths (height rounds), two upward folds + one top-down pass
(height rounds each, one level's rows per round), the aux-graph build
(two interval-test joins), and two WCC runs. Nothing quadratic; the
preorder sibling prefix sum is a window PARTITIONED BY parent (scales
with the level, not the graph). Checksums are exact integers (block
label sums, articulation vid sum) — bit-identical across core counts
because every step is deterministic (min-parent, sorted siblings, min
label WCC).

Usage: python BENCH/run_bicon.py <cores> [edges]
Appends JSON lines to BENCH/bicon_scale.jsonl.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OUT = Path(__file__).parent / "bicon_scale.jsonl"
cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
EDGES = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
PARTS = 32

from linkgraph.session import get_spark

os.makedirs("/dev/shm/linkgraph-spark", exist_ok=True)
spark = get_spark(
    app_name=f"linkgraph-bicon-{cores}",
    cores=cores,
    shuffle_partitions=PARTS,
    extra_conf={
        "spark.local.dir": "/dev/shm/linkgraph-spark",
        "spark.driver.memory": "64g",
        "spark.cleaner.periodicGC.interval": "45s",
    },
)
from pyspark.sql import functions as F

from linkgraph.algorithms.biconnectivity import (
    articulation_points,
    biconnected_components,
)
from linkgraph.corpus import synth_edge_graph

t0 = time.time()
g = synth_edge_graph(spark, EDGES // 8, avg_out_degree=8, seed=42, partitions=PARTS)
n_edges = g.edges.count()
n_vertices = g.vertices.count()
build_sec = time.time() - t0
print(f"graph: {n_edges} edges, {n_vertices} vertices, build {build_sec:.1f}s", flush=True)

t1 = time.time()
blocks = biconnected_components(g)
bagg = blocks.agg(
    F.count("*").alias("rows"),
    F.countDistinct("block").alias("n_blocks"),
    F.sum(F.col("block") % 1_000_003).alias("bsum"),
).first()
bicon_wall = time.time() - t1

t2 = time.time()
art = articulation_points(g)
aagg = art.agg(F.count("*").alias("n"), F.sum("vid").alias("vsum")).first()
art_wall = time.time() - t2

line = {
    "ts": time.time(), "probe": "bicon", "cores": cores,
    "n_edges": n_edges, "n_vertices": n_vertices, "build_sec": round(build_sec, 2),
    "bicon_wall_sec": round(bicon_wall, 2), "art_wall_sec": round(art_wall, 2),
    "block_rows": bagg["rows"], "n_blocks": bagg["n_blocks"],
    "block_checksum": int(bagg["bsum"]),
    "n_articulation": aagg["n"], "art_checksum": int(aagg["vsum"] or 0),
}
with open(OUT, "a") as f_:
    f_.write(json.dumps(line) + "\n")
print(json.dumps(line), flush=True)
spark.stop()
