#!/usr/bin/env python
"""One scaling-measurement level: CSR-tier PageRank on the 100M-edge
synthetic skewed graph at a given core count, with the job pinned to 32
blocks / 32 shuffle partitions (identical work at every level — a
cluster keeps its partitioning when executors are added).

Methodology (single-box noise control): fresh JVM per invocation, a
2-round warmup run (JIT + cache warm, discarded), then a measured
5-round run; the reported figure is the **median per-round wall time**
of the measured run. Appends one JSON line to BENCH/scaling_r2.jsonl.

Usage: python BENCH/run_scaling_level.py <cores> [tier]
"""

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os  # noqa: E402

OUT = Path(os.environ.get("SCALING_OUT", Path(__file__).parent / "scaling_r2.jsonl"))
EDGES = int(os.environ.get("SCALING_EDGES", 100_000_000))
PARTS = 32
WARMUP_ROUNDS = int(os.environ.get("SCALING_WARMUP", 2))
ROUNDS = int(os.environ.get("SCALING_ROUNDS", 5))
DTYPE = os.environ.get("SCALING_DTYPE", "float64")
cores = int(sys.argv[1])
TIER = sys.argv[2] if len(sys.argv) > 2 else "csr"

from linkgraph.session import get_spark  # noqa: E402

import os  # noqa: E402

os.makedirs("/dev/shm/linkgraph-spark", exist_ok=True)
spark = get_spark(
    app_name=f"linkgraph-scaling-{cores}",
    cores=cores,
    shuffle_partitions=PARTS,
    extra_conf={
        "spark.local.dir": "/dev/shm/linkgraph-spark",
        "spark.default.parallelism": str(PARTS),
        # local-mode driver == executor JVM; size it like a real executor
        # fleet would be (box has 128 GiB): 1e8-edge CSR cache + state +
        # shuffle pages need far more than the 8g interactive default
        "spark.driver.memory": "64g",
        # CSR block rows are ~50 MB byte arrays — humongous objects under
        # G1 (max region 32 MB on Java 17), which fragments the heap and
        # drives GCLocker retries + kernel page churn that grows round
        # over round. ParallelGC has no region limit and handles the
        # few-huge-objects allocation profile cleanly.
        "spark.driver.extraJavaOptions": "-XX:+UseParallelGC",
    },
)
from pyspark.sql import functions as F  # noqa: E402

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
        ranks = csr.pagerank_csr(g, alpha=0.85, max_iter=max_iter, tol=None, num_blocks=PARTS,
                                 rank_dtype=DTYPE)
        hist = csr.LAST_HISTORY
    elif TIER == "dense":
        ranks = csr.pagerank_csr_dense(g, alpha=0.85, max_iter=max_iter, tol=None,
                                       num_blocks=PARTS, rank_dtype=DTYPE)
        hist = csr.LAST_HISTORY
    else:
        ranks = _pagerank_impl(g, alpha=0.85, max_iter=max_iter, tol=None, checkpoint_dir=None)
        hist = prmod.LAST_HISTORY
    checksum = ranks.agg(F.sum("value")).first()[0]
    return time.time() - t1, [h["wall_sec"] for h in hist], checksum


warm_sec, _, _ = run(WARMUP_ROUNDS)
pr_sec, round_secs, checksum = run(ROUNDS)
med = statistics.median(round_secs)
import linkgraph.csr as _csr  # noqa: E402

prows = _csr.LAST_PARTIAL_ROWS or 0
n_vertices = EDGES // 8
val_b = 4 if DTYPE == "float32" else 8
dst_b = 4 if n_vertices < 2**31 - 1 else 8
import inspect as _inspect  # noqa: E402
import linkgraph.csr as _csr_mod  # noqa: E402

_PACKED = (
    bool(_inspect.signature(_csr_mod.pagerank_csr).parameters["packed"].default)
    if TIER == "csr" else None
)
rec = {
    "tier": TIER,
    "packed": _PACKED,
    "dtype": DTYPE,
    "partial_rows": prows,
    "logical_shuffle_bytes_per_round": (
        # dense tier: packed (pos,val) partials + chunked state arrays;
        # sparse packed (r4): state exchange + arrow-list partials only —
        # the hash-agg exchange and the state join are gone;
        # sparse unpacked: partial rows in, combined msg rows out, state join
        n_vertices * (4 + val_b) + prows * (4 + val_b)
        if TIER == "dense"
        else (
            n_vertices * (8 + 4 + val_b) + prows * (dst_b + val_b)
            if _PACKED
            else n_vertices * (8 + 4 + val_b) + prows * (dst_b + val_b)
            + min(prows, n_vertices) * (dst_b + 8)
        )
    ),
    "cores": cores,
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
