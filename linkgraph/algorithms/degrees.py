"""Degree centrality.

Reference: gs::DegreeCentrality
(/root/reference/coordinator/gscoordinator/builtin/app/.gs_conf.yaml:77-79;
python sig /root/reference/python/graphscope/analytical/app/degree_centrality.py:29-57):
value = degree / (n - 1), with ``centrality_type`` ∈ {in, out, both}.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph


def degree_centrality(graph: LinkGraph, centrality_type: str = "both") -> DataFrame:
    n = graph.vertices.count()
    denom = float(n - 1) if n > 1 else 1.0
    deg = graph.degrees(mode=centrality_type)
    return deg.select("vid", (F.col("degree") / denom).alias("value"))


def degree_histogram(graph: LinkGraph) -> DataFrame:
    """networkx.degree_histogram: ``(deg, count)`` for every degree
    0..max(deg) of the undirected simple graph (dense — zero-count
    degrees included, isolated vertices counted at 0), the tabular form
    of nx's list. One aggregation + a sequence explode for the dense
    axis; no iteration."""
    pv = graph.vertices.join(graph.simple_degrees(), "vid", "left").select(
        F.coalesce("deg", F.lit(0)).cast("long").alias("deg")
    )
    # single pass over the degree pipeline: the dense axis derives from
    # the (tiny) counts aggregate, not from a second scan of pv
    counts = pv.groupBy("deg").agg(F.count("*").alias("count"))
    axis = (
        counts.agg(F.max("deg").alias("m"))
        .where(F.col("m").isNotNull())
        .select(F.explode(F.sequence(F.lit(0).cast("long"), F.col("m"))).alias("deg"))
    )
    return axis.join(counts, "deg", "left").select(
        "deg", F.coalesce("count", F.lit(0)).cast("long").alias("count")
    )
