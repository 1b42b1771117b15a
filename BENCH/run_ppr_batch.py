#!/usr/bin/env python
"""Batched multi-seed PPR probe: cost vs k on a fixed graph.

The batch tier's claim: the edge-sized term is paid ONCE per round for
all k seed columns, so wall time grows far slower than k× (sequential
single-seed runs pay the CSR gather + shuffle machinery k times). This
probe runs the identical fixed-round job at k = 1, 4, 8, 16 on one
synthetic skewed graph and a k=4 sequential baseline (4 × k=1 runs),
recording s/round and the per-column checksum so every k reproduces the
same column-0 result bit-for-bit.

Usage: python BENCH/run_ppr_batch.py [n_vertices] [avg_deg] [rounds]
Appends JSON lines to BENCH/ppr_batch.jsonl.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OUT = Path(__file__).parent / "ppr_batch.jsonl"
NV = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
DEG = int(sys.argv[2]) if len(sys.argv) > 2 else 8
ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 5
CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

os.makedirs("/dev/shm/linkgraph-spark", exist_ok=True)
from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

spark = (
    SparkSession.builder.master(f"local[{CORES}]")
    .appName("linkgraph-ppr-batch-probe")
    .config("spark.sql.shuffle.partitions", str(CORES))
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.driver.memory", "64g")
    .config("spark.local.dir", "/dev/shm/linkgraph-spark")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.maxPlanStringLength", "8192")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from linkgraph.corpus import synth_edge_graph  # noqa: E402
import linkgraph.csr as csr  # noqa: E402
from linkgraph.csr import ppr_batch_csr  # noqa: E402

g = synth_edge_graph(spark, NV, avg_out_degree=DEG, partitions=CORES)
g = type(g)(vertices=g.vertices.persist(), edges=g.edges.persist())
n_edges = g.edges.count()
g.vertices.count()


def seed_df(k):
    return g.vertices.where(F.pmod(F.col("vid"), F.lit(1000)) < k).select(
        F.pmod(F.col("vid"), F.lit(1000)).cast("int").alias("seed"),
        "vid",
        F.lit(1.0).alias("weight"),
    )


def run(k, label):
    t0 = time.time()
    out = ppr_batch_csr(
        g, seed_df(k), alpha=0.85, max_iter=ROUNDS, tol=None,
        num_blocks=CORES, rank_dtype="float32",
    )
    chk = out.where(F.col("seed") == 0).agg(F.sum("value")).first()[0]
    wall = time.time() - t0
    rounds = [h["wall_sec"] for h in (csr.LAST_HISTORY or [])]
    steady = sorted(rounds[1:]) if len(rounds) > 1 else rounds
    med = steady[len(steady) // 2] if steady else None
    rec = {
        "probe": "ppr_batch", "label": label, "k": k, "n_vertices": NV,
        "n_edges": n_edges, "rounds": ROUNDS, "cores": CORES,
        "wall_sec": round(wall, 2),
        "round_secs": [round(x, 2) for x in rounds],
        "median_steady_round": round(med, 3) if med else None,
        "col0_checksum": chk,
    }
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    return rec


# batch scaling in k (a throwaway k=1 warms the JVM so every measured
# run sees the same warm state)
run(1, "warmup")
recs = [run(k, f"batch_k{k}") for k in (1, 4, 8, 16)]

if os.environ.get("PPR_BATCH_SKIP_SEQ"):
    sys.exit(0)

# sequential baseline: 4 independent k=1 runs (what a user without the
# batch tier pays for 4 seed vectors)
t0 = time.time()
for _ in range(4):
    run(1, "seq_component")
seq_wall = time.time() - t0
rec = {
    "probe": "ppr_batch", "label": "seq_k4_total", "k": 4, "n_vertices": NV,
    "n_edges": n_edges, "rounds": ROUNDS, "cores": CORES,
    "wall_sec": round(seq_wall, 2),
    "batch_k4_wall": recs[1]["wall_sec"],
    "speedup_vs_batch": round(seq_wall / recs[1]["wall_sec"], 2),
}
print(json.dumps(rec), flush=True)
with open(OUT, "a") as f:
    f.write(json.dumps(rec) + "\n")
