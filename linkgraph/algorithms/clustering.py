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
