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
