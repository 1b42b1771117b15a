"""Degree assortativity and average degree connectivity.

References:
- gs::DegreeAssortativity
  (/root/reference/coordinator/gscoordinator/builtin/app/.gs_conf.yaml:186-188;
  python sig app/degree_assortativity_coefficient.py:31-82): Pearson
  correlation of endpoint degrees across directed edges — x-degree of the
  source (default "out") vs y-degree of the target (default "in").
- gs::AverageDegreeConnectivity (yaml:206-208; python sig
  app/average_degree_connectivity.py:31-95): for each degree class k, the
  mean degree of neighbors of degree-k vertices (undirected default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph


def degree_assortativity_coefficient(
    graph: LinkGraph, x: str = "out", y: str = "in"
) -> float:
    dx = graph.degrees(mode=x).withColumnRenamed("degree", "dx").withColumnRenamed("vid", "src")
    dy = graph.degrees(mode=y).withColumnRenamed("degree", "dy").withColumnRenamed("vid", "dst")
    joined = graph.edges.select("src", "dst").join(dx, "src").join(dy, "dst")
    r = joined.agg(F.corr("dx", "dy").alias("r")).first()["r"]
    return float(r) if r is not None else float("nan")


def average_degree_connectivity(graph: LinkGraph) -> DataFrame:
    """(degree, avg_nbr_degree) over the undirected simple graph."""
    und_once = graph.simple_undirected_edges()
    bidir = und_once.select(F.col("lo").alias("a"), F.col("hi").alias("b")).union(
        und_once.select(F.col("hi").alias("a"), F.col("lo").alias("b"))
    )
    deg = bidir.groupBy("a").agg(F.count("*").alias("deg"))
    j = (
        bidir.join(deg.withColumnRenamed("a", "a").withColumnRenamed("deg", "deg_a"), "a")
        .join(
            deg.withColumnRenamed("a", "b").withColumnRenamed("deg", "deg_b"),
            "b",
        )
    )
    return (
        j.groupBy(F.col("deg_a").alias("degree"))
        .agg(F.avg("deg_b").alias("avg_nbr_degree"))
        .orderBy("degree")
    )
