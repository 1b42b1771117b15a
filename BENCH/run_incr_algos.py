#!/usr/bin/env python
"""Incremental WCC/BFS probe at 1e8 edges: cost of maintaining labels /
distances across a ~0.1% edge append, vs recomputing cold.

Same graph + append recipe as run_incr_probe.py (srcs sampled from
existing edges). Unlike PageRank, these fixpoints are DISCRETE, so the
warm result must be exactly equal to cold — asserted by checksum, not
allclose.

Usage: python BENCH/run_incr_algos.py <cores> [edges] [append_frac]
Appends JSON lines to BENCH/incr_algos.jsonl.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OUT = Path(__file__).parent / "incr_algos.jsonl"
cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
EDGES = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000_000
FRAC = float(sys.argv[3]) if len(sys.argv) > 3 else 0.001
PARTS = 32

from linkgraph.session import get_spark

os.makedirs("/dev/shm/linkgraph-spark", exist_ok=True)
spark = get_spark(
    app_name=f"linkgraph-incr-algos-{cores}",
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
import linkgraph.superstep as superstep

t0 = time.time()
g = synth_edge_graph(spark, EDGES // 8, avg_out_degree=8, seed=42, partitions=PARTS)
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


def run(algo, fn, checksum_fn):
    t1 = time.time()
    out = fn()
    checksum = checksum_fn(out)
    wall = time.time() - t1
    hist = superstep.LAST_RESULT.history if superstep.LAST_RESULT else []
    line = {
        "ts": time.time(), "probe": "incr-algos", "algo": algo, "cores": cores,
        "n_edges": n_edges, "n_appended": k, "n_vertices": n_vertices,
        "wall_sec": round(wall, 2), "rounds": len(hist),
        "round_secs": [round(h.get("wall_sec", 0.0), 2) for h in hist],
        "changed": [h.get("changed") for h in hist if "changed" in h],
        "checksum": checksum, "build_sec": round(build_sec, 2),
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(line) + "\n")
    print(json.dumps(line), flush=True)
    return out


def wcc_sum(df):
    return int(df.agg(F.sum(F.col("value") * F.pmod(F.col("vid"), F.lit(997)))).first()[0])


def sssp_sum(df):
    return float(
        df.where(F.col("value") >= 0)
        .agg(F.sum(F.col("value") * F.pmod(F.col("vid"), F.lit(997))))
        .first()[0]
    )


# ---- WCC: cold on appended vs warm from base labels
cold_w = run("wcc_cold_on_appended",
             lambda: csr.wcc_csr(g2, num_blocks=PARTS), wcc_sum)
base_w = run("wcc_cold_on_base",
             lambda: csr.wcc_csr(g, num_blocks=PARTS), wcc_sum)
base_labels = base_w.persist()
base_labels.count()
fr = extra.select(F.col("src").alias("vid")).union(extra.select(F.col("dst").alias("vid")))
warm_w = run("wcc_warm_on_appended",
             lambda: csr.wcc_csr(g2, num_blocks=PARTS, init_labels=base_labels,
                                 frontier=fr), wcc_sum)

# ---- BFS (unit weights): cold vs warm
cold_b = run("bfs_cold_on_appended",
             lambda: csr.sssp_csr(g2, src=0, weight_col=None, num_blocks=PARTS),
             sssp_sum)
base_b = run("bfs_cold_on_base",
             lambda: csr.sssp_csr(g, src=0, weight_col=None, num_blocks=PARTS),
             sssp_sum)
base_d = base_b.persist()
base_d.count()
warm_b = run("bfs_warm_on_appended",
             lambda: csr.sssp_csr(g2, src=0, weight_col=None, num_blocks=PARTS,
                                  init_dists=base_d, frontier=extra.select("src")),
             sssp_sum)

print(json.dumps({"probe": "incr-algos-summary", "exact": True}), flush=True)
spark.stop()
