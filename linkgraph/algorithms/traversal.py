"""BFS and SSSP — frontier-based traversals.

References:
- BFS: grape::BFSAuto (external; registry
  /root/reference/coordinator/gscoordinator/builtin/app/.gs_conf.yaml:18-20)
  and gs::BFSGeneric (/root/reference/analytical_engine/apps/bfs/bfs_generic.h)
  — level-synchronous, per-vertex depth.
- SSSP: grape::SSSP (yaml:10-12) / gs::SSSPProjected
  (/root/reference/analytical_engine/apps/projected/sssp_projected.h) —
  single-source shortest path, non-negative weights, iterative relaxation
  until fixpoint.

Unreachable vertices get value -1 (depth) / -1.0 (distance) — an explicit
sentinel instead of the reference's context default, chosen because it
round-trips exactly through parquet/DuckDB for the oracle comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.superstep import run_supersteps

_INF = float("inf")


def bfs(graph: LinkGraph, src: int, max_depth: int = 10_000) -> DataFrame:
    """Per-vertex BFS depth from ``src``; unreachable → -1."""
    edges = graph.edges.select("src", "dst").persist()
    state0 = graph.vertices.select(
        "vid",
        F.when(F.col("vid") == src, F.lit(0)).otherwise(F.lit(None)).cast("long").alias("depth"),
        (F.col("vid") == src).alias("changed"),
    )

    def step(state: DataFrame, rnd: int) -> tuple[DataFrame, dict]:
        frontier = state.where(F.col("changed")).select("vid", "depth")
        nxt = (
            frontier.join(edges, frontier["vid"] == edges["src"])
            .groupBy("dst")
            .agg(F.min(F.col("depth") + 1).alias("cand"))
        )
        new_state = (
            state.join(nxt, state["vid"] == nxt["dst"], "left")
            .select(
                state["vid"],
                F.coalesce(state["depth"], F.col("cand")).alias("depth"),
                (state["depth"].isNull() & F.col("cand").isNotNull()).alias("changed"),
            )
            .persist()
        )
        n = new_state.agg(F.sum(F.col("changed").cast("long"))).first()[0] or 0
        return new_state, {"changed": n}

    res = run_supersteps(state0, step, lambda s: s["changed"] == 0, max_rounds=max_depth)
    out = res.state.select("vid", F.coalesce("depth", F.lit(-1)).alias("value"))
    edges.unpersist()
    return out


def sssp(
    graph: LinkGraph, src: int, weight_col: str | None = "weight", max_rounds: int = 10_000
) -> DataFrame:
    """Per-vertex shortest-path distance from ``src``; unreachable → -1.0.

    Bellman-Ford-style synchronous relaxation with a changed-vertex
    frontier (the Spark analog of the reference's per-fragment Dijkstra +
    boundary relaxation loop).
    """
    e = graph.edges
    if weight_col and weight_col in e.columns:
        edges = e.select("src", "dst", F.col(weight_col).cast("double").alias("w"))
    else:
        edges = e.select("src", "dst", F.lit(1.0).alias("w"))
    edges = edges.persist()

    state0 = graph.vertices.select(
        "vid",
        F.when(F.col("vid") == src, F.lit(0.0)).otherwise(F.lit(_INF)).alias("dist"),
        (F.col("vid") == src).alias("changed"),
    )

    def step(state: DataFrame, rnd: int) -> tuple[DataFrame, dict]:
        frontier = state.where(F.col("changed")).select("vid", "dist")
        relax = (
            frontier.join(edges, frontier["vid"] == edges["src"])
            .groupBy("dst")
            .agg(F.min(F.col("dist") + F.col("w")).alias("cand"))
        )
        new_state = (
            state.join(relax, state["vid"] == relax["dst"], "left")
            .select(
                state["vid"],
                F.least(state["dist"], F.coalesce("cand", state["dist"])).alias("dist"),
                (F.coalesce("cand", state["dist"]) < state["dist"]).alias("changed"),
            )
            .persist()
        )
        n = new_state.agg(F.sum(F.col("changed").cast("long"))).first()[0] or 0
        return new_state, {"changed": n}

    res = run_supersteps(state0, step, lambda s: s["changed"] == 0, max_rounds=max_rounds)
    out = res.state.select(
        "vid",
        F.when(F.col("dist") == _INF, F.lit(-1.0)).otherwise(F.col("dist")).alias("value"),
    )
    edges.unpersist()
    return out
