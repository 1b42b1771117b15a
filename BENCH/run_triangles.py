#!/usr/bin/env python
"""Triangle counting at 1e8 edges: cold ordered-wedge join tier vs the
delta-driven incremental maintenance (triangle_total_incr) after a ~0.1%
edge append. The north rule names "triangle counting via ordered wedge
joins" as a flagship; this records its cost at scale and shows the
incremental path is append-set-proportional, with exact agreement
(cold count on the appended graph == base + delta).

Usage: python BENCH/run_triangles.py <cores> [edges] [append_frac]
Appends JSON lines to BENCH/triangles_1e8.jsonl.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OUT = Path(__file__).parent / "triangles_1e8.jsonl"
cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
EDGES = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000_000
FRAC = float(sys.argv[3]) if len(sys.argv) > 3 else 0.001
PARTS = 32

from linkgraph.session import get_spark

os.makedirs("/dev/shm/linkgraph-spark", exist_ok=True)
spark = get_spark(
    app_name=f"linkgraph-triangles-{cores}",
    cores=cores,
    shuffle_partitions=max(PARTS, cores * 4),
    extra_conf={
        "spark.local.dir": "/dev/shm/linkgraph-spark",
        "spark.driver.memory": "64g",
        "spark.driver.extraJavaOptions": "-XX:+UseParallelGC",
        "spark.network.timeout": "600s",
        "spark.cleaner.periodicGC.interval": "45s",
    },
)
from pyspark.sql import functions as F

import importlib

from linkgraph.algorithms import triangle_total, triangle_total_incr
from linkgraph.corpus import synth_edge_graph

# the package re-exports the `triangles` function under the submodule's
# name, so fetch the module itself for the LAST_INCR breakdown
_tri = importlib.import_module("linkgraph.algorithms.triangles")
from linkgraph.graph import LinkGraph

t0 = time.time()
g = synth_edge_graph(spark, EDGES // 8, avg_out_degree=8, seed=42, partitions=PARTS)
g = LinkGraph(vertices=g.vertices, edges=g.edges.persist())
n_edges = g.edges.count()
n_vertices = g.vertices.count()
pick = F.pmod(F.xxhash64(F.col("src"), F.col("dst"), F.lit(5)), F.lit(int(1 / FRAC)))
extra = (
    g.edges.where(pick == 0)
    .select(
        "src",
        F.pmod(F.xxhash64(F.col("src"), F.col("dst"), F.lit(7)), F.lit(n_vertices)).alias("dst"),
    )
    .where(F.col("src") != F.col("dst"))
    .persist()
)
k = extra.count()
g2 = LinkGraph(vertices=g.vertices, edges=g.edges.union(extra))
build_sec = time.time() - t0
print(f"graph: {n_edges} edges (+{k} appended), {n_vertices} vertices, "
      f"build {build_sec:.1f}s", flush=True)


def rec(**kw):
    kw.update(ts=time.time(), probe="triangles", cores=cores,
              n_edges=n_edges, n_appended=k, n_vertices=n_vertices,
              build_sec=round(build_sec, 2))
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


t1 = time.time()
base_total = triangle_total(g)
rec(job="cold_on_base", wall_sec=round(time.time() - t1, 2), total=base_total)

t1 = time.time()
incr_total = triangle_total_incr(g, extra, base_total=base_total)
rec(job="incr_on_appended", wall_sec=round(time.time() - t1, 2),
    total=incr_total, breakdown=_tri.LAST_INCR)

t1 = time.time()
cold_total = triangle_total(g2)
rec(job="cold_on_appended", wall_sec=round(time.time() - t1, 2), total=cold_total)

rec(job="summary", exact=bool(cold_total == incr_total),
    cold_total=cold_total, incr_total=incr_total)
assert cold_total == incr_total, (cold_total, incr_total)
spark.stop()
