"""Betweenness centrality — Brandes dependency accumulation, all sources
level-parallel.

Reference: gs::BetweennessCentrality
(/root/reference/coordinator/gscoordinator/builtin/app/.gs_conf.yaml:238-240,
apps/centrality/betweenness/). Semantics follow NetworkX
``betweenness_centrality`` on the directed graph: for every ordered
source s, count shortest paths σ_s(v) (unweighted), then accumulate
dependencies backward over the shortest-path DAG:

    δ_s(v) = Σ_{w : v ∈ pred_s(w)} σ_s(v)/σ_s(w) · (1 + δ_s(w))
    bc(v)  = Σ_{s ≠ v} δ_s(v)        [· 1/((n-1)(n-2)) if normalized]

Spark shape: instead of looping over sources (the reference's per-source
fan-out), *all* sources advance together — the forward phase is a
multi-source BFS carrying path counts, one DataFrame job per level; the
backward phase walks levels in reverse, one job per level. State is
``(root, vid, dist, sigma)`` — O(V²) worst case, inherent to exact
betweenness; ``sources`` allows the standard sampled approximation at
scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph


def betweenness_centrality(
    graph: LinkGraph,
    normalized: bool = True,
    sources: DataFrame | None = None,
    max_depth: int = 10_000,
) -> DataFrame:
    """(vid, value). ``sources`` restricts the source set (sampled BC)."""
    spark = graph.edges.sparkSession
    n = graph.vertices.count()
    if n == 0:
        return spark.createDataFrame([], "vid long, value double")
    edges = graph.edges.select("src", "dst").distinct().persist()

    if sources is None:
        roots = graph.vertices.select(F.col("vid").alias("root"))
    else:
        roots = sources.select(F.col(sources.columns[0]).alias("root")).distinct()

    # ---- forward: multi-source BFS with path counting ----
    level = roots.select(
        "root", F.col("root").alias("vid"), F.lit(1.0).alias("sigma")
    ).localCheckpoint(eager=True)
    seen = level.select("root", "vid", F.lit(0).alias("dist"), "sigma").localCheckpoint(
        eager=True
    )
    levels = [level]  # levels[d] = (root, vid, sigma) at distance d
    d = 0
    while d < max_depth:
        nxt = (
            level.join(edges, level["vid"] == edges["src"])
            .select("root", F.col("dst").alias("vid"), "sigma")
            .join(seen.select("root", "vid"), ["root", "vid"], "left_anti")
            .groupBy("root", "vid")
            .agg(F.sum("sigma").alias("sigma"))
            .localCheckpoint(eager=True)
        )
        if nxt.limit(1).count() == 0:
            break
        d += 1
        seen = seen.union(
            nxt.select("root", "vid", F.lit(d).alias("dist"), "sigma")
        ).localCheckpoint(eager=True)
        levels.append(nxt)
        level = nxt

    # ---- backward: dependency accumulation, deepest level first ----
    # delta rows exist only where non-zero; start with the deepest level = 0
    delta = spark.createDataFrame([], "root long, vid long, delta double")
    acc = spark.createDataFrame([], "vid long, value double")
    for lvl in range(len(levels) - 1, 0, -1):
        w_rows = levels[lvl].join(delta, ["root", "vid"], "left").select(
            "root", "vid", "sigma", F.coalesce("delta", F.lit(0.0)).alias("delta")
        )
        # contribution flows from w back to each predecessor v on the SP DAG:
        # v at level-1 with edge v→w
        contrib = (
            w_rows.join(edges, w_rows["vid"] == edges["dst"])
            .select(
                "root",
                F.col("src").alias("pvid"),
                ((F.lit(1.0) + F.col("delta")) / F.col("sigma")).alias("per_sigma"),
            )
        )
        prev = levels[lvl - 1]
        delta = (
            prev.join(
                contrib,
                (prev["root"] == contrib["root"]) & (prev["vid"] == contrib["pvid"]),
            )
            .select(prev["root"].alias("root"), prev["vid"].alias("vid"),
                    (prev["sigma"] * F.col("per_sigma")).alias("c"))
            .groupBy("root", "vid")
            .agg(F.sum("c").alias("delta"))
            .localCheckpoint(eager=True)
        )
        # accumulate bc over non-root vertices of this (now finalized) delta
        acc = acc.union(
            delta.where(F.col("vid") != F.col("root")).select("vid", F.col("delta").alias("value"))
        ).localCheckpoint(eager=True)

    bc = acc.groupBy("vid").agg(F.sum("value").alias("value"))
    scale = 1.0 / ((n - 1) * (n - 2)) if (normalized and n > 2) else 1.0
    if sources is not None:
        # sampled estimator: raw sums cover only |sources| roots — rescale
        # by n/k exactly as NetworkX's _rescale does for k-sample BC
        k = roots.count()
        if k:
            scale *= n / k
    out = (
        graph.vertices.select("vid")
        .join(bc, "vid", "left")
        .select("vid", (F.coalesce("value", F.lit(0.0)) * F.lit(scale)).alias("value"))
    )
    edges.unpersist()
    return out
