"""Triangle counting — degree-ordered wedge join.

Reference: /root/reference/analytical_engine/apps/clustering/triangles.h:
broadcast degrees (:49-68); orient each undirected edge from the
higher-(degree, id) endpoint to the lower so every edge survives exactly
once and hub adjacency lists stay short (:70-94 — the classic skew
mitigation); intersect oriented neighborhoods, +1 to all three corners
(:110-137). Output: per-vertex triangle count (each triangle counted at
each corner); graph total = Σ/3.

Spark shape: orientation = join degrees onto the deduped undirected edge
set and pick direction by (degree, vid); wedges = self-join of the
oriented edge table on the middle vertex; closure = semi-join of the
wedge's (v, w) pair back against oriented edges; corners = explode + one
``groupBy(vid).count``. AQE's skew-join handles residual imbalance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph


def _oriented_edges(graph: LinkGraph) -> DataFrame:
    und = graph.simple_undirected_edges()  # (lo, hi) once per edge
    deg = (
        und.select(F.col("lo").alias("vid"))
        .union(und.select(F.col("hi").alias("vid")))
        .groupBy("vid")
        .agg(F.count("*").alias("deg"))
    )
    e = (
        und.join(deg.withColumnRenamed("vid", "lo").withColumnRenamed("deg", "deg_lo"), "lo")
        .join(deg.withColumnRenamed("vid", "hi").withColumnRenamed("deg", "deg_hi"), "hi")
    )
    # orient from higher (deg, vid) → lower (deg, vid); ties impossible on vid
    hi_first = (F.col("deg_hi") > F.col("deg_lo")) | (
        (F.col("deg_hi") == F.col("deg_lo")) & (F.col("hi") > F.col("lo"))
    )
    return e.select(
        F.when(hi_first, F.col("hi")).otherwise(F.col("lo")).alias("src"),
        F.when(hi_first, F.col("lo")).otherwise(F.col("hi")).alias("dst"),
    )


# bounded residency (dedup.py pattern): the most recent triangles() call
# owns the oriented-edge cache; freeing an older one forces a
# deterministic recompute, never wrong data — without this, every call
# leaked one persisted edge-sized table for the session's lifetime.
_CACHED: list[DataFrame] = []


def _own_cache(df: DataFrame) -> DataFrame:
    while _CACHED:
        _CACHED.pop().unpersist()
    _CACHED.append(df.persist())
    return df


def triangles(graph: LinkGraph) -> DataFrame:
    """Per-vertex triangle counts ``(vid, value)``; zero rows included.

    The closure is deliberately NOT broadcast at scale: measured at 3e7
    oriented edges, a force-broadcast single-long closure relation ran
    2.4× SLOWER than the packed-key sort-merge semi-join (460.9 vs
    190.2 s at 32 cores — a multi-GB hash relation is a random-access,
    latency-bound probe per wedge, where the merge path keeps locality;
    1e8 keys additionally trips Spark's hard 8 GiB broadcast cap). Tiny
    edge sets still auto-broadcast via AQE. Contrast with the census's
    broadcast third-dyad lookup, which wins 9.3× — its relation is
    dyad-sized and its alternative was three composite-key joins plus a
    distinct, not one semi-join."""
    from linkgraph.graph import packed_pair

    o = _own_cache(_oriented_edges(graph))
    a, b = o.alias("a"), o.alias("b")
    # wedge: v→u (a), u→w (b); triangle iff v→w oriented edge exists (c).
    # 32-bit vid spaces pack the closure key into ONE long — the wedge
    # stream is Σ deg_oriented² rows and the semi-join sort/probe is the
    # hot loop (single-long sort key, census lesson).
    if graph.pair_key_packable():
        closer = o.select(packed_pair("src", "dst").alias("vw"))
        tri = (
            a.join(b, F.col("a.dst") == F.col("b.src"))
            .join(
                closer,
                packed_pair(F.col("a.src"), F.col("b.dst")) == F.col("vw"),
                "left_semi",
            )
            .select(
                F.col("a.src").alias("v"), F.col("a.dst").alias("u"), F.col("b.dst").alias("w")
            )
        )
    else:
        c = o.alias("c")
        tri = (
            a.join(b, F.col("a.dst") == F.col("b.src"))
            .join(
                c,
                (F.col("a.src") == F.col("c.src")) & (F.col("b.dst") == F.col("c.dst")),
                "left_semi",
            )
            .select(
                F.col("a.src").alias("v"), F.col("a.dst").alias("u"), F.col("b.dst").alias("w")
            )
        )
    corners = (
        tri.select(F.col("v").alias("vid"))
        .union(tri.select(F.col("u").alias("vid")))
        .union(tri.select(F.col("w").alias("vid")))
    )
    counts = corners.groupBy("vid").agg(F.count("*").alias("value"))
    out = (
        graph.vertices.select("vid")
        .join(counts, "vid", "left")
        .select("vid", F.coalesce("value", F.lit(0)).alias("value"))
    )
    return out


def triangle_total(graph: LinkGraph) -> int:
    """Total number of triangles in the graph (Σ per-vertex / 3)."""
    row = triangles(graph).agg((F.sum("value") / 3).cast("long").alias("t")).first()
    return int(row["t"] or 0)


# breakdown of the most recent triangle_total_incr call (bench/tests)
LAST_INCR: dict | None = None


def triangle_total_incr(
    graph: LinkGraph, extra_edges: DataFrame, base_total: int | None = None
) -> int:
    """Exact triangle-count maintenance after edge APPENDS.

    Every new triangle contains ≥1 appended edge, so the delta is
    computable by joins *driven by the tiny append set* instead of
    re-scanning all wedges. With Δ = appended undirected pairs (deduped,
    minus pairs already present) and G2 = G ∪ Δ, inclusion–exclusion on
    how many of a triangle's edges are new gives

        ΔT = S − W + T3

    - ``S``  = Σ over (u,v)∈Δ of |N₂(u) ∩ N₂(v)|   (counts a triangle
      once per its new edges: T1 + 2·T2 + 3·T3);
    - ``W``  = wedges with BOTH arms in Δ closed by any G2 edge
      (T2 + 3·T3);
    - ``T3`` = triangles entirely inside Δ.

    Scale shape: Δ is broadcast; the two ``S`` joins stream the G2
    adjacency exactly twice (no wedge self-join of the big edge table —
    that is the cold path's cost); ``W``/``T3`` touch only Δ-sized
    tables. A hub endpoint in Δ inflates the candidate set to its
    degree — AQE picks the second join's strategy at runtime rather
    than a forced broadcast. Mirrors the reference's triangle app
    (analytical_engine/apps/clustering/triangles.h) composed with its
    append-only fragment
    (analytical_engine/core/fragment/append_only_arrow_fragment.h).

    ``base_total`` is the already-known T(G); computed cold when omitted.
    Returns T(G2) exactly. Breakdown lands in ``LAST_INCR``.
    """
    global LAST_INCR
    und_old = graph.simple_undirected_edges()
    delta = (
        extra_edges.select(
            F.least("src", "dst").alias("lo"), F.greatest("src", "dst").alias("hi")
        )
        .where(F.col("lo") != F.col("hi"))
        .distinct()
        .join(und_old, ["lo", "hi"], "left_anti")
        .persist()
    )
    n_new = delta.count()
    if base_total is None:
        base_total = triangle_total(graph)
    if n_new == 0:
        LAST_INCR = {"n_appended": 0, "S": 0, "W": 0, "T3": 0, "delta_triangles": 0}
        delta.unpersist()
        return base_total

    # pin the deduped closure: S and W are separate count jobs, and S
    # streams the adjacency twice within one job — without this the
    # edge-distinct shuffle replays once per scan
    und2 = und_old.unionByName(delta).persist()
    adj2 = und2.select(F.col("lo").alias("u"), F.col("hi").alias("w")).unionByName(
        und2.select(F.col("hi").alias("u"), F.col("lo").alias("w"))
    )

    # S: neighbors of each appended pair's lo endpoint, then close at hi
    cand = adj2.join(F.broadcast(delta), adj2["u"] == delta["lo"]).select(
        "hi", F.col("w").alias("cw")
    )
    s = adj2.join(cand, (adj2["u"] == cand["hi"]) & (adj2["w"] == cand["cw"])).count()

    # W and T3: wedges with both arms in Δ (center = shared vertex)
    dsym = delta.select(F.col("lo").alias("u"), F.col("hi").alias("w")).unionByName(
        delta.select(F.col("hi").alias("u"), F.col("lo").alias("w"))
    )
    a, b = dsym.alias("a"), dsym.alias("b")
    wedges = (
        a.join(b, (F.col("a.w") == F.col("b.u")) & (F.col("a.u") < F.col("b.w")))
        .select(F.col("a.u").alias("lo"), F.col("b.w").alias("hi"))
        .persist()
    )
    w_closed = und2.join(F.broadcast(wedges), ["lo", "hi"]).count()
    t3_times3 = delta.join(F.broadcast(wedges), ["lo", "hi"]).count()
    t3 = t3_times3 // 3

    wedges.unpersist()
    und2.unpersist()
    delta.unpersist()
    LAST_INCR = {
        "n_appended": n_new,
        "S": s,
        "W": w_closed,
        "T3": t3,
        "delta_triangles": s - w_closed + t3,
    }
    return base_total + s - w_closed + t3
