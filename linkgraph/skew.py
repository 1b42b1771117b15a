"""Salted two-phase aggregation + skew metrics.

Power-law in-degree makes ``groupBy(dst)`` shuffles skewed: one reducer
receives the hub's entire message stream. The reference sidesteps this
with dense per-fragment arrays + MPI reduce; on Spark, algebraic aggs
(sum/count/min/max) already get map-side partial aggregation, but
*non-algebraic* paths (applyInPandas grouping, collect_list, exact
argmax-by-count over huge groups) do not. This module provides:

- :func:`salted_agg` — phase 1 groups on ``(key, salt)`` (salt =
  xxhash64(payload) % S, deterministic), phase 2 merges the ≤S partials
  per key. Results are identical to the unsalted agg for any
  commutative+associative merge (tested against unsalted in
  tests/test_skew.py).
- :func:`heavy_hitters` — keys whose frequency exceeds a threshold, for
  metrics and for salting only the hot keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def heavy_hitters(df: DataFrame, key: str, threshold: int) -> DataFrame:
    return (
        df.groupBy(key)
        .agg(F.count("*").alias("freq"))
        .where(F.col("freq") >= threshold)
        .select(key, "freq")
    )


def salted_agg(
    df: DataFrame,
    key: str,
    partial_aggs: list[Column],
    final_aggs: list[Column],
    salt_on: str,
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``partial_aggs`` aggregate within (key, salt); ``final_aggs`` merge
    the partials per key (they see the phase-1 output columns). Example —
    skew-safe sum of ``x`` by ``dst``::

        salted_agg(df, "dst",
                   [F.sum("x").alias("px")],
                   [F.sum("px").alias("x")],
                   salt_on="src")
    """
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col(salt_on)), F.lit(num_salts)))
    phase1 = salted.groupBy(key, "_salt").agg(*partial_aggs)
    return phase1.groupBy(key).agg(*final_aggs)


def salted_count_by_label(
    df: DataFrame, key: str, label: str, salt_on: str, num_salts: int = 16
) -> DataFrame:
    """Skew-safe ``groupBy(key, label).count()`` → (key, label, cnt).

    Used by CDLP's most-frequent-neighbor-label step where a hub vertex
    aggregates millions of neighbor labels.
    """
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col(salt_on)), F.lit(num_salts)))
    phase1 = salted.groupBy(key, label, "_salt").agg(F.count("*").alias("_pc"))
    return phase1.groupBy(key, label).agg(F.sum("_pc").alias("cnt"))
