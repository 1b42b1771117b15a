#!/usr/bin/env python
"""Round-2 scaling evidence: CSR-tier PageRank, 100M-edge synthetic skewed
graph, fixed 5 rounds, at 8/16/32 cores (N vs 2N vs 4N — the sandbox
stand-in for executor-cluster sizes).

The JOB IS IDENTICAL at every level: 32 CSR blocks and 32 shuffle
partitions regardless of core count — only the number of worker threads
varies (exactly the N vs 4N *executor* comparison: a cluster keeps the
same partitioning while adding machines). Appends one JSON line per
level to BENCH/scaling_r2.jsonl.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OUT = Path(__file__).parent / "scaling_r2.jsonl"
EDGES = 100_000_000
ROUNDS = 5
PARTS = 32
TIER = sys.argv[1] if len(sys.argv) > 1 else "csr"
LEVELS = [int(x) for x in sys.argv[2].split(",")] if len(sys.argv) > 2 else [8, 32]

for cores in LEVELS:
    from linkgraph.session import get_spark

    spark = get_spark(
        app_name=f"linkgraph-scaling-{cores}",
        cores=cores,
        shuffle_partitions=PARTS,
        extra_conf={
            "spark.local.dir": "/dev/shm/linkgraph-spark",
            "spark.default.parallelism": str(PARTS),
        },
    )
    from pyspark.sql import functions as F

    from linkgraph.corpus import synth_edge_graph

    t0 = time.time()
    g = synth_edge_graph(spark, EDGES // 8, avg_out_degree=8, seed=42, partitions=PARTS)
    n_edges = g.edges.count()
    build_sec = time.time() - t0

    t1 = time.time()
    if TIER == "csr":
        from linkgraph.csr import pagerank_csr

        ranks = pagerank_csr(g, alpha=0.85, max_iter=ROUNDS, tol=None, num_blocks=PARTS)
    else:
        from linkgraph.algorithms.pagerank import _pagerank_impl

        ranks = _pagerank_impl(g, alpha=0.85, max_iter=ROUNDS, tol=None, checkpoint_dir=None)
    checksum = ranks.agg(F.sum("value")).first()[0]
    pr_sec = time.time() - t1
    spark.stop()

    rec = {
        "tier": TIER,
        "cores": cores,
        "blocks": PARTS,
        "n_edges": n_edges,
        "build_sec": round(build_sec, 1),
        "pr_sec": round(pr_sec, 1),
        "rounds": ROUNDS,
        "sec_per_round": round(pr_sec / ROUNDS, 2),
        "iters_per_sec": round(ROUNDS / pr_sec, 4),
        "checksum": checksum,
    }
    with OUT.open("a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)
