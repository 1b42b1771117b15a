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


def bidirectional_distance(
    graph: LinkGraph, src: int, dst: int, max_rounds: int = 10_000
) -> DataFrame:
    """Exact s→t hop distance by meet-in-the-middle BFS — the point-query
    scale path: two frontiers of radius d/2 touch ~2·b^(d/2) vertices
    against a single BFS's b^d.

    One state DataFrame carries both searches: (vid, df, db) — forward
    depth from ``src`` along out-edges, backward depth from ``dst``
    along in-edges. Rounds alternate frontiers (forward on odd rounds);
    after each expansion ``best = min(df + db)`` over doubly-reached
    vertices, and the loop stops once ``fwd_level + bwd_level >= best``
    (any undiscovered path would need a vertex beyond both current
    levels — the standard bidirectional-BFS bound), or both frontiers
    die. Returns one row (src, dst, dist); unreachable → -1.
    """
    edges = graph.edges.select("src", "dst").persist()
    state0 = graph.vertices.select(
        "vid",
        F.when(F.col("vid") == src, F.lit(0)).cast("long").alias("df"),
        F.when(F.col("vid") == dst, F.lit(0)).cast("long").alias("db"),
    )
    # trivial case: src == dst
    if src == dst:
        spark = graph.edges.sparkSession
        edges.unpersist()
        return spark.createDataFrame([(src, dst, 0)], "src long, dst long, dist long")

    levels = {"f": 0, "b": 0}

    def step(state, rnd):
        fwd = rnd % 2 == 1
        side, other = ("df", "db") if fwd else ("db", "df")
        lvl = levels["f" if fwd else "b"]
        frontier = state.where(F.col(side) == lvl).select(F.col("vid").alias("fv"))
        if fwd:
            nxt = frontier.join(edges, frontier["fv"] == edges["src"]).select(
                F.col("dst").alias("nv")
            )
        else:
            nxt = frontier.join(edges, frontier["fv"] == edges["dst"]).select(
                F.col("src").alias("nv")
            )
        nxt = nxt.distinct()
        new_state = state.join(nxt, state["vid"] == nxt["nv"], "left").select(
            state["vid"],
            *(
                [
                    F.when(
                        state[side].isNull() & F.col("nv").isNotNull(), F.lit(lvl + 1)
                    ).otherwise(state[side]).alias(side),
                    state[other].alias(other),
                ]
                if fwd
                else [
                    state[other].alias(other),
                    F.when(
                        state[side].isNull() & F.col("nv").isNotNull(), F.lit(lvl + 1)
                    ).otherwise(state[side]).alias(side),
                ]
            ),
        ).select("vid", "df", "db")
        levels["f" if fwd else "b"] = lvl + 1
        agg = new_state.agg(
            F.min(F.col("df") + F.col("db")).alias("best"),
            F.sum((F.col(side) == lvl + 1).cast("long")).alias("nf"),
        ).first()
        best = agg["best"]
        grown = agg["nf"] or 0
        done = (
            best is not None and levels["f"] + levels["b"] >= best
        ) or grown == 0
        return new_state, {"done": int(done), "best": best}

    result = run_supersteps(
        state0, step, converged=lambda s: s["done"] == 1, max_rounds=max_rounds
    )
    best_row = result.state.agg(F.min(F.col("df") + F.col("db")).alias("b")).first()
    dist = best_row["b"] if best_row["b"] is not None else -1
    spark = graph.edges.sparkSession
    edges.unpersist()
    return spark.createDataFrame([(src, dst, int(dist))], "src long, dst long, dist long")
