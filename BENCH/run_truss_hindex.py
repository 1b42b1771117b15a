#!/usr/bin/env python
"""k-truss h-index fast tier at bench scale (VERDICT r4 #7): show the
per-round cost decoupled from triangle-count (wedge-enumeration) cost.

Measures, on the synthetic skewed graph:
  1. triangle materialization (the ONE-shot wedge join both tiers pay),
  2. the h-index iteration to fixpoint (per-round = two hash joins +
     one groupBy over 3·|triangles| incidence rows — NO wedges),
  3. for contrast, ONE synchronous peel round of the peel tier (which
     re-pays a full wedge enumeration every round).

Appends one JSON line to BENCH/truss_hindex.jsonl.

Usage: python BENCH/run_truss_hindex.py <cores> [edges] [k]
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OUT = Path(__file__).parent / "truss_hindex.jsonl"
cores = int(sys.argv[1])
EDGES = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
K = int(sys.argv[3]) if len(sys.argv) > 3 else 4
PARTS = 32

from linkgraph.session import get_spark

os.makedirs("/dev/shm/linkgraph-spark", exist_ok=True)
spark = get_spark(
    app_name=f"linkgraph-truss-hindex-{cores}",
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

from linkgraph.algorithms.cliques import triangle_triples
from linkgraph.algorithms.truss import truss_decomposition
from linkgraph.corpus import synth_edge_graph
from linkgraph.graph import packed_pair

t0 = time.time()
g = synth_edge_graph(spark, EDGES // 8, avg_out_degree=8, seed=42, partitions=PARTS)
n_edges = g.edges.count()
build_sec = time.time() - t0

# 1. one-shot wedge cost (the triangle materialization both tiers share)
t1 = time.time()
n_tri = triangle_triples(g).count()
tri_sec = time.time() - t1

# 2. h-index tier to fixpoint (per-iteration walls from LAST_ITER_SECS)
import linkgraph.algorithms.truss as truss_mod

t2 = time.time()
dec = truss_decomposition(g)
n_dec = dec.where(F.col("trussness") >= K).count()
hindex_sec = time.time() - t2
iter_secs = list(truss_mod.LAST_ITER_SECS or [])

# 3. ONE peel round of the peel tier (cost of a single wedge re-enumeration
# inside the peel loop) — measured by running the same support computation
# the peel executes once
t3 = time.time()
edges = g.simple_undirected_edges().localCheckpoint(eager=True)
adj = edges.select(F.col("lo").alias("u"), F.col("hi").alias("w")).unionByName(
    edges.select(F.col("hi").alias("u"), F.col("lo").alias("w"))
)
cand = edges.join(adj, adj["u"] == edges["lo"]).select("lo", "hi", "w")
closed = cand.withColumn("hw", packed_pair("hi", "w")).join(
    adj.select(packed_pair("u", "w").alias("hw")), "hw", "left_semi"
)
support = closed.groupBy(packed_pair("lo", "hi").alias("lh")).agg(
    F.count("*").alias("sup")
)
kept = (
    edges.withColumn("lh", packed_pair("lo", "hi"))
    .join(support, "lh", "left")
    .where(F.coalesce(F.col("sup"), F.lit(0)) >= K - 2)
    .count()
)
peel_round_sec = time.time() - t3

line = {
    "ts": time.time(), "cores": cores, "n_edges": n_edges, "k": K,
    "n_triangles": n_tri, "triangle_materialize_sec": round(tri_sec, 2),
    "hindex_total_sec": round(hindex_sec, 2),
    "hindex_iter_secs": [round(s, 2) for s in iter_secs],
    "ktruss_edges": n_dec, "one_peel_round_sec": round(peel_round_sec, 2),
    "peel_round_1_kept": kept, "build_sec": round(build_sec, 2),
}
with open(OUT, "a") as f:
    f.write(json.dumps(line) + "\n")
print(json.dumps(line), flush=True)
