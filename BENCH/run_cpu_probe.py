#!/usr/bin/env python
"""CPU-bound scaling probe: corpus synthesis + regex edge derivation.

Complement to the PageRank scaling matrix: the CSR kernel is
DRAM-bandwidth-bound (BENCH/BASELINE.md — the box's own STREAM scaling
8→32 threads is 0.49, and the kernel tracks it), so its core-scaling
number measures the box, not the plan. This probe times a stage whose
bottleneck is CPU, not DRAM: whole-stage-codegen regexp extraction +
string synthesis over the corpus (`synth_corpus` → `derive_edges` →
count — the north rule's own edge-derivation front half). If THIS
scales ≥0.8 from N to 4N cores on the same box, the plan-level story
("nothing serial; the iterative kernel is capped by memory bandwidth,
not by the engine") is evidenced from both sides.

Usage: python BENCH/run_cpu_probe.py <cores> [n_files]
Appends one JSON line to BENCH/cpu_probe.jsonl.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OUT = Path(__file__).parent / "cpu_probe.jsonl"
CORES = int(sys.argv[1])
N_FILES = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000
PARTS = 32  # fixed job: same partitioning at every core count

os.makedirs("/dev/shm/linkgraph-spark", exist_ok=True)
from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master(f"local[{CORES}]")
    .appName(f"linkgraph-cpu-probe-{CORES}")
    .config("spark.sql.shuffle.partitions", str(PARTS))
    .config("spark.default.parallelism", str(PARTS))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "48g")
    .config("spark.local.dir", "/dev/shm/linkgraph-spark")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from linkgraph import derive_edges, synth_corpus  # noqa: E402

# warmup (JIT + codegen caches) on a smaller slice, discarded
derive_edges(synth_corpus(spark, 20_000, seed=7)).count()

t0 = time.time()
corpus = synth_corpus(spark, N_FILES, seed=42).repartition(PARTS)
n_edges = derive_edges(corpus).count()
wall = time.time() - t0

rec = {
    "probe": "synth+regex-derive",
    "cores": CORES,
    "parts": PARTS,
    "n_files": N_FILES,
    "n_edges": n_edges,
    "wall_sec": round(wall, 2),
    "files_per_sec": round(N_FILES / wall, 1),
}
print(json.dumps(rec))
with open(OUT, "a") as f:
    f.write(json.dumps(rec) + "\n")
spark.stop()
