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
