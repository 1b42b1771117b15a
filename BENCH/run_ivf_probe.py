#!/usr/bin/env python
"""IVF quantizer-scaling probe: assignment cost vs n_centroids.

VERDICT r3 ask #7: show that moving the quantizer from plan literals to
an executor broadcast (similarity.py `_ivf_assign_arrow`, used above
MAX_PLAN_CENTROIDS) keeps assignment cost flat as the list count grows
— the plan-literal path embeds an n_centroids x dim matrix into the
Catalyst plan (fine at 8-256 lists, plan-bloat beyond), the Arrow path
ships it once per executor and runs a batched matmul.

Deterministic synthetic corpus: N vectors, dim 64, components from
xxhash64(id, j) — no RNG, reproducible at any parallelism. Each timing
forces the assignment with a sum(list_id) reduce (no row materialized
to the driver). At one size both paths run on identical centroids and
the probe asserts their assignments agree exactly (checksum equality).

Usage: python BENCH/run_ivf_probe.py [n_vectors]
Appends JSON lines to BENCH/ivf_probe.jsonl.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OUT = Path(__file__).parent / "ivf_probe.jsonl"
N = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
DIM = 64
CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

os.makedirs("/dev/shm/linkgraph-spark", exist_ok=True)
from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

spark = (
    SparkSession.builder.master(f"local[{CORES}]")
    .appName("linkgraph-ivf-probe")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "48g")
    .config("spark.local.dir", "/dev/shm/linkgraph-spark")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from linkgraph.pipeline import similarity as S  # noqa: E402

vec = F.array(
    *[
        (F.pmod(F.xxhash64(F.col("vec_id"), F.lit(j)), F.lit(2000)) / 1000.0 - 1.0).cast(
            "float"
        )
        for j in range(DIM)
    ]
)
emb = (
    spark.range(N)
    .select(F.col("id").alias("vec_id"), vec.alias("embedding"))
    .repartition(32)
    .persist()
)
emb.count()  # pin (and pay the synth once, outside the timings)


def time_assign(centroids, force_arrow=None):
    if force_arrow is True:
        fn = lambda: S._ivf_assign_arrow(emb, centroids, "embedding", "list_id")
    elif force_arrow is False:
        saved = S.MAX_PLAN_CENTROIDS
        S.MAX_PLAN_CENTROIDS = 10**9
        fn = lambda: S.ivf_assign(emb, centroids)
        # restored by caller after the run
    else:
        fn = lambda: S.ivf_assign(emb, centroids)
    t0 = time.time()
    row = fn().agg(F.sum("list_id").alias("s"), F.count("*").alias("c")).first()
    wall = time.time() - t0
    if force_arrow is False:
        S.MAX_PLAN_CENTROIDS = saved
    return wall, int(row["s"]), int(row["c"])


records = []
for n_cent in (16, 64, 256, 1024, 4096):
    ids = S.ivf_seed_ids(n_cent, 17)
    cents = S.ivf_centroids_from_ids(emb, ids)
    path = "arrow" if n_cent > S.MAX_PLAN_CENTROIDS else "literal"
    wall, checksum, cnt = time_assign(cents)
    rec = {
        "probe": "ivf-assign-scaling",
        "n_vectors": N,
        "dim": DIM,
        "n_centroids": n_cent,
        "path": path,
        "wall_sec": round(wall, 2),
        "vectors_per_sec": round(N / wall, 1),
        "checksum": checksum,
    }
    print(json.dumps(rec))
    records.append(rec)
    S.release_broadcasts()

# path-identity check at 256 lists: literal vs arrow on the same quantizer
ids = S.ivf_seed_ids(256, 17)
cents = S.ivf_centroids_from_ids(emb, ids)
w_lit, s_lit, c_lit = time_assign(cents, force_arrow=False)
w_arr, s_arr, c_arr = time_assign(cents, force_arrow=True)
S.release_broadcasts()
ident = {
    "probe": "ivf-assign-path-identity",
    "n_centroids": 256,
    "literal_sec": round(w_lit, 2),
    "arrow_sec": round(w_arr, 2),
    "checksum_literal": s_lit,
    "checksum_arrow": s_arr,
    "identical": s_lit == s_arr and c_lit == c_arr,
}
print(json.dumps(ident))
assert ident["identical"], "literal and arrow assignments diverged"

with open(OUT, "a") as f:
    for r in records + [ident]:
        f.write(json.dumps(r) + "\n")
spark.stop()
