"""Local clustering coefficient, average clustering, transitivity.

References:
- gs::Clustering / grape::LCC
  (/root/reference/analytical_engine/apps/clustering/clustering.h;
  registry yaml:114-122): lcc(v) = triangles(v) / (deg(v)·(deg(v)-1)/2)
  on the undirected simple graph (0 when deg < 2).
- gs::AvgClustering (apps/clustering/avg_clustering.h): mean of lcc over
  all vertices.
- gs::Transitivity (apps/clustering/transitivity.h): 3·triangles /
  open-triads, triads = Σ_v deg(v)·(deg(v)-1)/2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.algorithms.triangles import triangles


def _und_degrees(graph: LinkGraph) -> DataFrame:
    und = graph.simple_undirected_edges()
    deg = (
        und.select(F.col("lo").alias("vid"))
        .union(und.select(F.col("hi").alias("vid")))
        .groupBy("vid")
        .agg(F.count("*").alias("deg"))
    )
    return (
        graph.vertices.select("vid")
        .join(deg, "vid", "left")
        .select("vid", F.coalesce("deg", F.lit(0)).alias("deg"))
    )


def clustering(graph: LinkGraph) -> DataFrame:
    """(vid, value) — local clustering coefficient."""
    tri = triangles(graph).withColumnRenamed("value", "tri")
    deg = _und_degrees(graph)
    return tri.join(deg, "vid").select(
        "vid",
        F.when(
            F.col("deg") >= 2,
            2.0 * F.col("tri") / (F.col("deg") * (F.col("deg") - 1)),
        )
        .otherwise(F.lit(0.0))
        .alias("value"),
    )


def average_clustering(graph: LinkGraph) -> float:
    row = clustering(graph).agg(F.avg("value").alias("v")).first()
    return float(row["v"] or 0.0)


def transitivity(graph: LinkGraph) -> float:
    tri = triangles(graph).agg(F.sum("value").alias("t")).first()["t"] or 0
    deg = _und_degrees(graph)
    triads = deg.agg(F.sum(F.col("deg") * (F.col("deg") - 1) / 2).alias("p")).first()["p"] or 0
    return float(tri / triads) if triads else 0.0


def square_clustering(graph: LinkGraph) -> DataFrame:
    """networkx.square_clustering (Lind–González–Herrmann 2005 C4
    coefficient): for each vertex v, the fraction of possible squares
    through v that exist —

        C4(v) = Σ_{u<w ∈ N(v)} q_v(u,w) / Σ_{u<w} [q + a_u + a_w]

    with q_v(u,w) = |N(u)∩N(w)∖{v}| and a_x = k_x − (1 + q + θ_uw)
    (θ_uw = 1 iff u,w adjacent). All vertices emitted (0.0 when no
    neighbor pair exists, as nx).

    Plan: ONE wedge equi-join (Σ deg² rows) materialized once and used
    twice — grouped by the outer pair for the common-neighbor counts
    q, then rejoined per wedge — plus degree/adjacency lookups; integer
    sums divided once per vertex, so the doubles are engine-portable."""
    from linkgraph.graph import packed_pair

    su = graph.simple_undirected_edges()
    und = graph.symmetrized_simple_edges()
    deg = graph.simple_degrees()
    wedges_cached = (
        und.select(F.col("a").alias("v"), F.col("b").alias("u"))
        .join(und.select(F.col("a").alias("v"), F.col("b").alias("w")), "v")
        .where(F.col("u") < F.col("w"))
        .persist()
    )
    wedges = wedges_cached
    try:
        # the Σ deg² wedge stream aggregates and re-joins BY PAIR — on
        # 32-bit vid spaces pack (u,w) into one long key (census lesson:
        # single-long exchange/sort/probe beats a 2-column composite)
        if graph.pair_key_packable():
            wedges = wedges.withColumn("uw", packed_pair("u", "w"))
            pair_key = ["uw"]
            theta = su.select(
                packed_pair("lo", "hi").alias("uw"), F.lit(1).alias("theta")
            )
        else:
            pair_key = ["u", "w"]
            theta = su.select(
                F.col("lo").alias("u"), F.col("hi").alias("w"), F.lit(1).alias("theta")
            )
        cn = wedges.groupBy(*pair_key).agg(F.count("*").alias("cn"))
        per_wedge = (
            wedges.join(cn, pair_key)
            .join(theta, pair_key, "left")
            .join(deg.withColumnRenamed("vid", "u").withColumnRenamed("deg", "ku"), "u")
            .join(deg.withColumnRenamed("vid", "w").withColumnRenamed("deg", "kw"), "w")
            .select(
                "v",
                (F.col("cn") - 1).alias("q"),
                (
                    (F.col("cn") - 1)
                    + (F.col("ku") - 1 - (F.col("cn") - 1) - F.coalesce("theta", F.lit(0)))
                    + (F.col("kw") - 1 - (F.col("cn") - 1) - F.coalesce("theta", F.lit(0)))
                ).alias("d"),
            )
        )
        sums = per_wedge.groupBy(F.col("v").alias("vid")).agg(
            F.sum("q").alias("nq"), F.sum("d").alias("nd")
        )
        out = graph.vertices.join(sums, "vid", "left").select(
            "vid",
            F.round(
                F.when(
                    F.coalesce("nd", F.lit(0)) > 0, F.col("nq") / F.col("nd")
                ).otherwise(F.lit(0.0)),
                8,
            ).alias("value"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        wedges_cached.unpersist()


def clustering_weighted(graph: LinkGraph, weight: str = "weight") -> DataFrame:
    """(vid, value) — Onnela et al. weighted local clustering, the nx
    ``clustering(G, weight=...)`` formula: c(u) = 2/(d(d−1)) · Σ over
    triangles at u of (ŵ_uv · ŵ_uw · ŵ_vw)^(1/3), with ŵ = w / max(w)
    over all edges and d the simple undirected degree.

    Spark shape: one wedge self-join of the symmetrized simple adjacency
    centered at every vertex (each triangle reaches each of its three
    corners exactly once — no post-hoc redistribution join) closed by an
    equi-join back onto the undirected edge list; the Σ deg² wedge cost
    and its hub caveat are the same as the unweighted triangle kernel
    (triangles.py docstring). Directed multi-weights collapse to
    max(w) per undirected pair (deterministic; nx's Graph(DiGraph)
    last-write-wins is insertion-order-dependent and not reproducible
    distributed — documented divergence for asymmetric inputs)."""
    e = graph.edges
    if weight not in e.columns:
        raise ValueError(f"clustering_weighted: no edge column {weight!r}")
    und = (
        e.select(
            F.least("src", "dst").alias("lo"),
            F.greatest("src", "dst").alias("hi"),
            F.col(weight).cast("double").alias("w"),
        )
        .where(F.col("lo") != F.col("hi"))
        .groupBy("lo", "hi")
        .agg(F.max("w").alias("w"))
    )
    max_w = und.agg(F.max("w")).first()[0]
    if not max_w:
        raise ValueError("clustering_weighted: needs a positive max weight")
    und = und.select("lo", "hi", (F.col("w") / F.lit(float(max_w))).alias("w")).persist()
    # graph owns the cache (r3 ownership rule): the caller releases it via
    # graph.unpersist() once the result is materialized
    graph._cached.append(und)
    adj = und.select(
        F.col("lo").alias("v"), F.col("hi").alias("nbr"), "w"
    ).union(und.select(F.col("hi").alias("v"), F.col("lo").alias("nbr"), "w"))
    a1 = adj.select("v", F.col("nbr").alias("b"), F.col("w").alias("w1"))
    a2 = adj.select("v", F.col("nbr").alias("c"), F.col("w").alias("w2"))
    wedges = a1.join(a2, "v").where(F.col("b") < F.col("c"))
    closed = wedges.join(
        und.select(F.col("lo").alias("b"), F.col("hi").alias("c"), F.col("w").alias("w3")),
        ["b", "c"],
    )
    tw = closed.groupBy(F.col("v").alias("vid")).agg(
        F.sum(F.pow(F.col("w1") * F.col("w2") * F.col("w3"), F.lit(1.0 / 3.0))).alias("tw")
    )
    deg = (
        adj.groupBy(F.col("v").alias("vid")).agg(F.count("*").alias("deg"))
    )
    out = (
        graph.vertices.select("vid")
        .join(deg, "vid", "left")
        .join(tw, "vid", "left")
        .select(
            "vid",
            F.when(
                F.coalesce("deg", F.lit(0)) >= 2,
                2.0 * F.coalesce("tw", F.lit(0.0))
                / (F.col("deg") * (F.col("deg") - 1)),
            )
            .otherwise(F.lit(0.0))
            .alias("value"),
        )
    )
    return out
