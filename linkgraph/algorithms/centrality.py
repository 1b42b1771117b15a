"""Eigenvector and Katz centrality — power iterations.

References (NetworkX semantics, as the reference's C++ apps implement):
- gs::EigenvectorCentrality
  (/root/reference/analytical_engine/apps/centrality/eigenvector/eigenvector_centrality.h;
  python sig app/eigenvector_centrality.py:29-61):
  x'(v) = x(v) + Σ_{u→v} x(u); L2-normalize; stop when Σ|Δ| < n·tol.
- gs::KatzCentrality (registry yaml:90-92; python sig
  app/katz_centrality.py:29-72): x'(v) = α·Σ_{u→v} x(u) + β; stop when
  Σ|Δ| < n·tol; L2-normalize at the end if ``normalized``.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.superstep import run_supersteps


def _mat_vec(state: DataFrame, edges: DataFrame) -> DataFrame:
    """(vid, msum) = Σ over in-edges of x(src); missing → absent row."""
    return (
        state.join(edges, state["vid"] == edges["src"])
        .groupBy("dst")
        .agg(F.sum("x").alias("msum"))
    )


def eigenvector_centrality(
    graph: LinkGraph, tolerance: float = 1e-06, max_round: int = 100
) -> DataFrame:
    edges = graph.edges.select("src", "dst").persist()
    n = graph.vertices.count()
    if n == 0:
        return graph.vertices.sparkSession.createDataFrame([], "vid long, value double")
    state0 = graph.vertices.select("vid", F.lit(1.0 / n).alias("x"))

    def step(state: DataFrame, rnd: int) -> tuple[DataFrame, dict]:
        msgs = _mat_vec(state, edges)
        raw = (
            state.join(msgs, state["vid"] == msgs["dst"], "left")
            .select(
                state["vid"],
                (state["x"] + F.coalesce("msum", F.lit(0.0))).alias("x_raw"),
                state["x"].alias("x_last"),
            )
            .persist()
        )
        norm = math.sqrt(raw.agg(F.sum(F.col("x_raw") * F.col("x_raw"))).first()[0] or 0.0)
        norm = norm if norm > 0 else 1.0
        new_state = raw.select(
            "vid", (F.col("x_raw") / norm).alias("x"), "x_last"
        ).persist()
        err = new_state.agg(F.sum(F.abs(F.col("x") - F.col("x_last")))).first()[0] or 0.0
        raw.unpersist()
        return new_state, {"err": err}

    res = run_supersteps(state0, step, lambda s: s["err"] < n * tolerance, max_rounds=max_round)
    out = res.state.select("vid", F.col("x").alias("value"))
    edges.unpersist()
    return out


def katz_centrality(
    graph: LinkGraph,
    alpha: float = 0.1,
    beta: float = 1.0,
    tolerance: float = 1e-06,
    max_round: int = 100,
    normalized: bool = True,
) -> DataFrame:
    edges = graph.edges.select("src", "dst").persist()
    n = graph.vertices.count()
    if n == 0:
        return graph.vertices.sparkSession.createDataFrame([], "vid long, value double")
    state0 = graph.vertices.select("vid", F.lit(0.0).alias("x"))

    def step(state: DataFrame, rnd: int) -> tuple[DataFrame, dict]:
        msgs = _mat_vec(state, edges)
        new_state = (
            state.join(msgs, state["vid"] == msgs["dst"], "left")
            .select(
                state["vid"],
                (alpha * F.coalesce("msum", F.lit(0.0)) + beta).alias("x"),
                state["x"].alias("x_last"),
            )
            .persist()
        )
        err = new_state.agg(F.sum(F.abs(F.col("x") - F.col("x_last")))).first()[0] or 0.0
        return new_state, {"err": err}

    res = run_supersteps(state0, step, lambda s: s["err"] < n * tolerance, max_rounds=max_round)
    out = res.state
    if normalized:
        norm = math.sqrt(out.agg(F.sum(F.col("x") * F.col("x"))).first()[0] or 0.0)
        norm = norm if norm > 0 else 1.0
        out = out.select("vid", (F.col("x") / norm).alias("value"))
    else:
        out = out.select("vid", F.col("x").alias("value"))
    edges.unpersist()
    return out
