#!/usr/bin/env python
"""Executor-level scaling measurement: CSR-tier PageRank on the 100M-edge
synthetic skewed graph under ``local-cluster[N, cores, mem]`` — separate
executor JVMs with their own heaps/GC and netty (loopback) shuffle, the
closest single-box approximation of an N-node cluster (VERDICT r3 #5:
threads in one JVM share one allocator + one memory-bandwidth pool;
separate JVMs at least separate the heaps and the shuffle path).

Methodology mirrors BENCH/run_scaling_level.py: job pinned to 32 blocks /
32 shuffle partitions (identical work at every level), fresh JVMs per
invocation, 2-round warmup discarded, measured 5-round run, median
per-round wall time reported, checksum recorded (must be identical across
levels). **Total executor memory is held constant** (default 96 GiB split
across executors): a real cluster would scale memory with N, which favors
the 4N level — constant-total is the conservative split a 128 GiB box can
actually back.

Usage: python BENCH/run_scaling_cluster.py <n_executors> <cores_per_exec> [tier]
Env:   SCALING_EDGES (1e8), SCALING_TOTAL_MEM_MB (98304), SCALING_DTYPE,
       SCALING_OUT (BENCH/scaling_r4_cluster.jsonl)
"""

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OUT = Path(os.environ.get("SCALING_OUT", Path(__file__).parent / "scaling_r4_cluster.jsonl"))
EDGES = int(os.environ.get("SCALING_EDGES", 100_000_000))
TOTAL_MEM_MB = int(os.environ.get("SCALING_TOTAL_MEM_MB", 98304))
PARTS = 32
WARMUP_ROUNDS = int(os.environ.get("SCALING_WARMUP", 2))
ROUNDS = int(os.environ.get("SCALING_ROUNDS", 5))
DTYPE = os.environ.get("SCALING_DTYPE", "float64")
n_exec = int(sys.argv[1])
cores_per = int(sys.argv[2])
TIER = sys.argv[3] if len(sys.argv) > 3 else "csr"
mem_mb = TOTAL_MEM_MB // n_exec

os.makedirs("/dev/shm/linkgraph-spark", exist_ok=True)
from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

spark = (
    SparkSession.builder.master(f"local-cluster[{n_exec},{cores_per},{mem_mb}]")
    .appName(f"linkgraph-cluster-scaling-{n_exec}x{cores_per}")
    # the local-cluster[] memory arg is the WORKER's capacity; the executor
    # JVM heap is spark.executor.memory (default 1g) — size it to match
    .config("spark.executor.memory", f"{mem_mb}m")
    .config("spark.sql.shuffle.partitions", str(PARTS))
    .config("spark.default.parallelism", str(PARTS))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.maxPlanStringLength", "1048576")
    .config("spark.driver.memory", "8g")
    .config("spark.local.dir", "/dev/shm/linkgraph-spark")
    .config("spark.ui.enabled", "false")
    # same GC story as the local harness: CSR block rows are ~50 MB byte
    # arrays — humongous under G1; ParallelGC handles few-huge-objects
    .config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC")
    .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
    # shuffle files live in RAM-backed /dev/shm and are only removed when
    # the driver GCs their ShuffleDependency — the 30 min default lets
    # ~1 GB/round of dead shuffle accumulate against the executors' heaps
    # (observed as round times degrading 11 s → 60 s within one run)
    .config("spark.cleaner.periodicGC.interval", "45s")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("WARN")

# executors are separate JVMs with their own python workers: ship the
# package the same way the north rule deploys it (spark-submit --py-files)
import subprocess  # noqa: E402

_zip = Path(__file__).resolve().parent.parent / "dist" / "linkgraph.zip"
subprocess.run(
    [sys.executable, str(_zip.parent.parent / "tools" / "make_pyfiles.py")],
    check=True, capture_output=True,
)
spark.sparkContext.addPyFile(str(_zip))

from linkgraph.corpus import synth_edge_graph  # noqa: E402

t0 = time.time()
g = synth_edge_graph(spark, EDGES // 8, avg_out_degree=8, seed=42, partitions=PARTS)
n_edges = g.edges.count()
build_sec = time.time() - t0


def run(max_iter):
    import linkgraph.csr as csr
    from linkgraph.algorithms.pagerank import _pagerank_impl
    import linkgraph.algorithms.pagerank as prmod

    t1 = time.time()
    if TIER == "csr":
        ranks = csr.pagerank_csr(g, alpha=0.85, max_iter=max_iter, tol=None,
                                 num_blocks=PARTS, rank_dtype=DTYPE)
        hist = csr.LAST_HISTORY
    elif TIER == "dense":
        ranks = csr.pagerank_csr_dense(g, alpha=0.85, max_iter=max_iter, tol=None,
                                       num_blocks=PARTS, rank_dtype=DTYPE)
        hist = csr.LAST_HISTORY
    else:
        ranks = _pagerank_impl(g, alpha=0.85, max_iter=max_iter, tol=None,
                               checkpoint_dir=None)
        hist = prmod.LAST_HISTORY
    checksum = ranks.agg(F.sum("value")).first()[0]
    return time.time() - t1, [h["wall_sec"] for h in hist], checksum


warm_sec, _, _ = run(WARMUP_ROUNDS)
pr_sec, round_secs, checksum = run(ROUNDS)
med = statistics.median(round_secs)

import inspect as _inspect  # noqa: E402
import linkgraph.csr as _csr_mod  # noqa: E402

_PACKED = (
    bool(_inspect.signature(_csr_mod.pagerank_csr).parameters["packed"].default)
    if TIER == "csr" else None
)
rec = {
    "mode": "local-cluster",
    "tier": TIER,
    "packed": _PACKED,
    "dtype": DTYPE,
    "n_executors": n_exec,
    "cores_per_executor": cores_per,
    "executor_mem_mb": mem_mb,
    "total_cores": n_exec * cores_per,
    "blocks": PARTS,
    "n_edges": n_edges,
    "build_sec": round(build_sec, 1),
    "warmup_sec": round(warm_sec, 1),
    "pr_sec": round(pr_sec, 1),
    "rounds": ROUNDS,
    "round_secs": [round(x, 2) for x in round_secs],
    "median_sec_per_round": round(med, 2),
    "iters_per_sec": round(1.0 / med, 4),
    "checksum": checksum,
}
with OUT.open("a") as f:
    f.write(json.dumps(rec) + "\n")
print(json.dumps(rec), flush=True)
spark.stop()
