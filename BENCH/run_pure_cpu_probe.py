#!/usr/bin/env python
"""Pure-CPU scaling probe: register-only arithmetic, zero memory traffic.

The last rung of the scaling-ceiling ladder (BENCH/BASELINE.md). The
PageRank kernel's 8->32-core efficiency is bounded above by whatever
the box itself can deliver; this probe measures that bound with the
simplest possible workload — a Python busy-loop of register arithmetic
in N independent processes (no Spark, no shuffle, no DRAM streaming,
no page faults). If even THIS scales below the 0.8 target from N to 4N
workers, no workload on this box can meet the target, and the
efficiency number measures the box (hypervisor frequency/steal
behavior), not the engine.

Usage: python BENCH/run_pure_cpu_probe.py
Appends one JSON line per worker count to BENCH/cpu_probe.jsonl.
"""

import json
import multiprocessing as mp
import time
from pathlib import Path

OUT = Path(__file__).parent / "cpu_probe.jsonl"
SECS = 6.0


def burn(_):
    x = 1.0001
    t0 = time.perf_counter()
    iters = 0
    while time.perf_counter() - t0 < SECS:
        for _ in range(100_000):
            x = x * 1.0000001 + 1e-12
        iters += 100_000
    return iters


def main():
    rates = {}
    for workers in (1, 8, 32):
        with mp.Pool(workers) as pool:
            res = pool.map(burn, range(workers))
        rate = sum(res) / SECS
        rates[workers] = rate
        rec = {
            "probe": "pure-cpu-register-loop",
            "workers": workers,
            "secs": SECS,
            "aggregate_iters_per_sec": round(rate, 1),
            "per_worker_iters_per_sec": round(rate / workers, 1),
        }
        print(json.dumps(rec))
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
    eff = rates[32] / rates[8] / 4.0
    summary = {
        "probe": "pure-cpu-register-loop-summary",
        "speedup_8_to_32": round(rates[32] / rates[8], 3),
        "efficiency_8_to_32": round(eff, 3),
        "single_vs_32_per_core": round(rates[1] / (rates[32] / 32), 3),
    }
    print(json.dumps(summary))
    with open(OUT, "a") as f:
        f.write(json.dumps(summary) + "\n")


if __name__ == "__main__":
    main()
