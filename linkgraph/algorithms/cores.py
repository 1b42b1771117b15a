"""k-core / k-shell by iterative peeling.

Reference: gs::KCore (/root/reference/analytical_engine/apps/kcore/kcore.h:44-56
— repeatedly remove vertices with degree < k) and gs::KShell
(/root/reference/analytical_engine/apps/kshell/kshell.h — vertices in the
k-core but not the (k+1)-core). Degrees are undirected-simple (projection
removes multi-edges/self-loops).

Returns (vid, value) with value 1 if the vertex survives, else 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph


def _core_members(graph: LinkGraph, k: int, max_rounds: int = 10_000) -> DataFrame:
    """Vertex set (vid) of the k-core."""
    if k <= 0:  # every vertex (incl. isolated) has degree ≥ 0
        return graph.vertices.select("vid")
    und = graph.simple_undirected_edges().persist()  # (lo, hi)
    alive = und  # edges among alive vertices
    for _ in range(max_rounds):
        deg = (
            alive.select(F.col("lo").alias("vid"))
            .union(alive.select(F.col("hi").alias("vid")))
            .groupBy("vid")
            .agg(F.count("*").alias("deg"))
        )
        keep = deg.where(F.col("deg") >= k).select("vid").persist()
        nxt = (
            alive.join(keep.withColumnRenamed("vid", "lo"), "lo", "left_semi")
            .join(keep.withColumnRenamed("vid", "hi"), "hi", "left_semi")
            .select("lo", "hi")
            .localCheckpoint(eager=True)
        )
        before = alive.count()
        after = nxt.count()
        alive = nxt
        if after == before:
            survivors = keep
            break
        keep.unpersist()
    else:  # pragma: no cover
        survivors = keep
    und.unpersist()
    return survivors


def k_core(graph: LinkGraph, k: int) -> DataFrame:
    members = _core_members(graph, k)
    return (
        graph.vertices.select("vid")
        .join(members.withColumn("value", F.lit(1)), "vid", "left")
        .select("vid", F.coalesce("value", F.lit(0)).alias("value"))
    )


def k_shell(graph: LinkGraph, k: int) -> DataFrame:
    """Vertices in the k-core but not the (k+1)-core."""
    in_k = _core_members(graph, k).withColumn("a", F.lit(1))
    in_k1 = _core_members(graph, k + 1).withColumn("b", F.lit(1))
    return (
        graph.vertices.select("vid")
        .join(in_k, "vid", "left")
        .join(in_k1, "vid", "left")
        .select(
            "vid",
            F.when(F.col("a").isNotNull() & F.col("b").isNull(), 1).otherwise(0).alias("value"),
        )
    )


def core_number(graph: LinkGraph, max_rounds: int = 10_000) -> DataFrame:
    """Max k such that the vertex is in the k-core (networkx.core_number;
    0 for isolated vertices).

    The canonical iterate-k formulation: peel to the 1-core, then the
    2-core, ... until the surviving edge set empties — each level starts
    from the previous level's fixpoint, so level k costs only the
    additional cascade its threshold triggers, and the result is
    order-independent (the sequential Matula–Beck peel is not). Exactly
    replayable by an unrolled SQL oracle (g_core_number). Correctness
    tier: per inner round one degree aggregation + two semi-joins over
    the shrinking edge set; bucketed h-index iteration is the known
    scale path for full decomposition at 1e8+.
    """
    alive = graph.simple_undirected_edges().localCheckpoint(eager=True)
    n_alive = alive.count()
    levels: DataFrame | None = None
    k = 0
    while n_alive > 0:
        k += 1
        for _ in range(max_rounds):
            deg = (
                alive.select(F.col("lo").alias("vid"))
                .union(alive.select(F.col("hi").alias("vid")))
                .groupBy("vid")
                .agg(F.count("*").alias("deg"))
            )
            keep = deg.where(F.col("deg") >= k).select("vid")
            nxt = (
                alive.join(keep.withColumnRenamed("vid", "lo"), "lo", "left_semi")
                .join(keep.withColumnRenamed("vid", "hi"), "hi", "left_semi")
                .select("lo", "hi")
                .localCheckpoint(eager=True)
            )
            n_nxt = nxt.count()
            if n_nxt == n_alive:
                alive, n_alive = nxt, n_nxt
                break
            alive, n_alive = nxt, n_nxt
            if n_alive == 0:
                break
        else:  # pragma: no cover
            raise RuntimeError("core_number: inner peel did not converge")
        if n_alive > 0:
            members = (
                alive.select(F.col("lo").alias("vid"))
                .union(alive.select(F.col("hi").alias("vid")))
                .distinct()
                .withColumn("value", F.lit(k))
                .localCheckpoint(eager=True)
            )
            levels = members if levels is None else levels.unionByName(members)
    out = graph.vertices.select("vid")
    if levels is None:
        return out.withColumn("value", F.lit(0))
    best = levels.groupBy("vid").agg(F.max("value").alias("value"))
    return out.join(best, "vid", "left").select(
        "vid", F.coalesce("value", F.lit(0)).alias("value")
    )


def onion_layers(graph: LinkGraph, max_layers: int = 100_000) -> DataFrame:
    """Onion decomposition (Hébert-Dufresne, Allard & Young 2016 — the
    layer ORDER of the core peel; networkx.onion_layers analog).

    Synchronous batch rule, deterministic and order-independent: per
    layer, raise the running threshold k to the minimum remaining
    degree, peel ALL vertices with degree ≤ k at once, repeat. Vertices
    absent from every edge (isolated) land in layer 1. Exactly
    replayable by an unrolled SQL oracle (g_onion). Correctness tier,
    same shape as core_number.

    Returns ``(vid, value)`` with value = the 1-based layer.
    """
    alive = graph.simple_undirected_edges().localCheckpoint(eager=True)
    remaining = graph.vertices.select("vid").localCheckpoint(eager=True)
    n_remaining = remaining.count()
    out: DataFrame | None = None
    k = 1
    layer = 0
    while n_remaining > 0:
        layer += 1
        if layer > max_layers:  # pragma: no cover
            raise RuntimeError("onion_layers: did not converge")
        edeg = (
            alive.select(F.col("lo").alias("vid"))
            .union(alive.select(F.col("hi").alias("vid")))
            .groupBy("vid")
            .agg(F.count("*").alias("d"))
        )
        deg = remaining.join(edeg, "vid", "left").select(
            "vid", F.coalesce("d", F.lit(0)).alias("d")
        ).localCheckpoint(eager=True)
        k = max(k, int(deg.agg(F.min("d")).first()[0]))
        peeled = deg.where(F.col("d") <= k).select(
            "vid", F.lit(layer).alias("value")
        ).localCheckpoint(eager=True)
        out = peeled if out is None else out.unionByName(peeled).localCheckpoint(
            eager=True
        )
        remaining = remaining.join(peeled, "vid", "left_anti").localCheckpoint(
            eager=True
        )
        n_remaining = remaining.count()
        alive = (
            alive.join(remaining.withColumnRenamed("vid", "lo"), "lo", "left_semi")
            .join(remaining.withColumnRenamed("vid", "hi"), "hi", "left_semi")
            .select("lo", "hi")
            .localCheckpoint(eager=True)
        )
    if out is None:
        return graph.vertices.select("vid", F.lit(0).alias("value")).limit(0)
    return out


def k_corona(graph: LinkGraph, k: int) -> DataFrame:
    """(vid, value) — membership flag of the k-corona
    (networkx.k_corona): vertices of the k-core with EXACTLY k
    neighbors inside the k-core. One core-membership pass + one
    within-core degree aggregation."""
    members = _core_members(graph, k).persist()
    und = graph.simple_undirected_edges()
    adj = und.select(F.col("lo").alias("v"), F.col("hi").alias("n")).union(
        und.select(F.col("hi").alias("v"), F.col("lo").alias("n"))
    )
    core_deg = (
        adj.join(members.withColumnRenamed("vid", "v"), "v", "left_semi")
        .join(members.withColumnRenamed("vid", "n"), "n", "left_semi")
        .groupBy("v")
        .agg(F.count("*").alias("cd"))
    )
    corona = (
        members.join(core_deg.withColumnRenamed("v", "vid"), "vid", "left")
        .where(F.coalesce("cd", F.lit(0)) == k)
        .select("vid")
    )
    out = (
        graph.vertices.select("vid")
        .join(corona.withColumn("value", F.lit(1)), "vid", "left")
        .select("vid", F.coalesce("value", F.lit(0)).alias("value"))
        .localCheckpoint(eager=True)
    )
    members.unpersist()
    return out
