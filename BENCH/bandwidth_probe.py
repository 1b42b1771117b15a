#!/usr/bin/env python
"""Aggregate memory-bandwidth probe (STREAM-triad-like) at 1..32 threads.

Purpose: evidence for the single-box scaling ceiling. The CSR PageRank
round is a sparse gather-scatter — essentially bandwidth-bound streaming
over the edge arrays + vertex state. If the box's aggregate DRAM
bandwidth saturates at ~K threads, core-scaling beyond K cannot speed up
a bandwidth-bound kernel, and N→4N *core* efficiency on one box stops
being a proxy for N→4N *executor* (machine) scaling — adding machines
multiplies aggregate bandwidth, adding cores on one box does not.

Method: each thread runs a triad a[i] = b[i] + s*c[i] over its own
private 256 MiB working set (no sharing, no NUMA pinning — same as the
Spark executors), repeated R times; reported figure is aggregate moved
bytes / wall time, median of 3 samples. Appends one JSON line per thread
count to BENCH/bandwidth.jsonl.
"""

import json
import statistics
import sys
import threading
import time
from pathlib import Path

import numpy as np

OUT = Path(__file__).parent / "bandwidth.jsonl"
N = 32 * 1024 * 1024 // 8  # 32 MiB per array, 3 arrays = 96 MiB per thread
REPS = 8
SAMPLES = 3


def worker(arrays, reps, barrier, times, idx):
    a, b, c = arrays
    barrier.wait()
    t0 = time.perf_counter()
    for _ in range(reps):
        np.add(b, c, out=a)  # 2 reads + 1 write per element
    times[idx] = time.perf_counter() - t0


def measure(threads: int) -> float:
    sets = [
        (np.zeros(N), np.random.default_rng(i).random(N), np.random.default_rng(i + 100).random(N))
        for i in range(threads)
    ]
    best = []
    for _ in range(SAMPLES):
        barrier = threading.Barrier(threads)
        times = [0.0] * threads
        ts = [
            threading.Thread(target=worker, args=(sets[i], REPS, barrier, times, i))
            for i in range(threads)
        ]
        t0 = time.perf_counter()
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        wall = time.perf_counter() - t0
        moved = threads * REPS * 3 * N * 8  # bytes (2 loads + 1 store)
        best.append(moved / wall / 1e9)
    return statistics.median(best)


if __name__ == "__main__":
    counts = [int(x) for x in sys.argv[1:]] or [1, 2, 4, 8, 16, 32]
    for k in counts:
        gbs = measure(k)
        rec = {"threads": k, "triad_gb_s": round(gbs, 1)}
        with OUT.open("a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)
