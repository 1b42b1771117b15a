#!/usr/bin/env python
"""Round-2 scaling evidence: CSR-tier PageRank, 100M-edge synthetic skewed
graph, fixed 5 rounds, at 8/16/32 cores (N vs 2N vs 4N — the sandbox
stand-in for executor-cluster sizes). Appends one JSON line per level to
BENCH/scaling_r2.jsonl; bench.py --scaling remains the driver-facing
two-level entry point."""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402

OUT = Path(__file__).parent / "scaling_r2.jsonl"
EDGES = 100_000_000
ROUNDS = 5
TIER = sys.argv[1] if len(sys.argv) > 1 else "csr"
LEVELS = [int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2 else [8, 16, 32])] if len(sys.argv) > 2 else [8, 16, 32]

for cores in LEVELS:
    spark = bench._mk_spark(cores)
    t0 = time.time()
    g, n_edges, build_sec = bench.build_synth_graph(spark, EDGES)
    pr_sec, rounds, checksum = bench._run_pagerank_tier(spark, g, TIER, None, ROUNDS)
    g.unpersist()
    spark.stop()
    rec = {
        "tier": TIER,
        "cores": cores,
        "n_edges": n_edges,
        "build_sec": round(build_sec, 1),
        "pr_sec": round(pr_sec, 1),
        "rounds": rounds,
        "sec_per_round": round(pr_sec / rounds, 2),
        "iters_per_sec": round(rounds / pr_sec, 4),
        "checksum": checksum,
    }
    with OUT.open("a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)
