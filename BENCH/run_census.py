#!/usr/bin/env python
"""Triadic-census scale probe: the new wedge-join family at synthetic
skewed-graph scale (same generator as the PageRank scaling levels).

Usage: python BENCH/run_census.py [edges] [cores]
Appends one JSON line to BENCH/census_scale.jsonl.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

EDGES = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
CORES = int(sys.argv[2]) if len(sys.argv) > 2 else 32
OUT = Path(__file__).parent / "census_scale.jsonl"

from linkgraph.session import get_spark  # noqa: E402

spark = get_spark(
    app_name=f"census-{EDGES}",
    cores=CORES,
    shuffle_partitions=32,
    extra_conf={
        # same sizing rationale as run_scaling_level.py: the wedge join
        # materializes O(Σ deg²) rows — give the single local JVM the
        # executor-fleet-sized heap and ParallelGC (few huge allocations)
        "spark.driver.memory": "64g",
        "spark.driver.extraJavaOptions": "-XX:+UseParallelGC",
    },
)
from linkgraph.corpus import synth_edge_graph  # noqa: E402
from linkgraph.algorithms.triads import triadic_census  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

t0 = time.time()
g = synth_edge_graph(spark, EDGES // 8, avg_out_degree=8, seed=42, partitions=32)
n_edges = g.edges.count()
build_sec = time.time() - t0

deg = g.edges.groupBy("dst").count().agg(F.max("count")).first()[0]

t1 = time.time()
# local mode shares ONE in-JVM broadcast copy, so the third-dyad lookup
# can stay a broadcast hash join well past the multi-executor default
# (on a real cluster 1e7 dyads ≈ 400 MB/executor — size to taste).
census = {
    r["triad_type"]: r["count"]
    for r in triadic_census(g, broadcast_rows=30_000_000).collect()
}
census_sec = time.time() - t1

rec = {
    "edges": n_edges,
    "cores": CORES,
    "max_in_degree": int(deg or 0),
    "build_sec": round(build_sec, 2),
    "census_sec": round(census_sec, 2),
    "census": census,
}
with OUT.open("a") as f:
    f.write(json.dumps(rec) + "\n")
print(json.dumps(rec))
