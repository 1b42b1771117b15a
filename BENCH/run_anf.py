#!/usr/bin/env python
"""ANF at scale: FM-sketch neighborhood function at 1e7 edges.

What should scale: state is trials·V rows of (vid, t, s:long); a round
is ONE edge join + ONE groupBy(vid, t).bit_or — OR is algebraic, so
map-side combine absorbs hub skew exactly like wcc's min. No quadratic
anything: ANF replaces the O(V·V) exact neighborhood function (APSP)
with O(h · trials · E) sketch traffic. sum_r is an exact integer —
bit-identical across core counts (md5 bit positions + OR are
deterministic and order-free).

Usage: python BENCH/run_anf.py <cores> [edges]
Appends JSON lines to BENCH/anf_scale.jsonl.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OUT = Path(__file__).parent / "anf_scale.jsonl"
cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
EDGES = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
PARTS = 32

from linkgraph.session import get_spark

os.makedirs("/dev/shm/linkgraph-spark", exist_ok=True)
spark = get_spark(
    app_name=f"linkgraph-anf-{cores}",
    cores=cores,
    shuffle_partitions=PARTS,
    extra_conf={
        "spark.local.dir": "/dev/shm/linkgraph-spark",
        "spark.driver.memory": "64g",
        "spark.cleaner.periodicGC.interval": "45s",
    },
)
from linkgraph.algorithms.anf import anf_sketch_stats
from linkgraph.corpus import synth_edge_graph

t0 = time.time()
g = synth_edge_graph(spark, EDGES // 8, avg_out_degree=8, seed=42, partitions=PARTS)
n_edges = g.edges.count()
n_vertices = g.vertices.count()
build_sec = time.time() - t0
print(f"graph: {n_edges} edges, {n_vertices} vertices, build {build_sec:.1f}s", flush=True)

t1 = time.time()
stats = {r["h"]: (r["sum_r"], r["n_rows"]) for r in anf_sketch_stats(g, max_h=4, trials=16).collect()}
wall = time.time() - t1
line = {
    "ts": time.time(), "probe": "anf", "cores": cores,
    "n_edges": n_edges, "n_vertices": n_vertices, "build_sec": round(build_sec, 2),
    "wall_sec": round(wall, 2), "rounds": 4, "trials": 16,
    "sum_r": {str(h): stats[h][0] for h in sorted(stats)},
    "sketch_rows": stats[max(stats)][1],
}
with open(OUT, "a") as f_:
    f_.write(json.dumps(line) + "\n")
print(json.dumps(line), flush=True)
spark.stop()
