"""Node / edge boundary (NetworkX semantics).

Reference: gs::NodeBoundary / gs::EdgeBoundary
(/root/reference/coordinator/gscoordinator/builtin/app/.gs_conf.yaml:194-202).

- node_boundary(G, S[, T]): vertices **not in S** with an in-edge from S
  (restricted to T when given).
- edge_boundary(G, S[, T]): directed edges from S to V∖S (or to T).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph


def _as_vid_set(df: DataFrame) -> DataFrame:
    return df.select(F.col(df.columns[0]).cast("long").alias("vid")).distinct()


def node_boundary(graph: LinkGraph, s: DataFrame, t: DataFrame | None = None) -> DataFrame:
    sv = _as_vid_set(s)
    out = (
        graph.edges.join(sv.withColumnRenamed("vid", "src"), "src", "left_semi")
        .select(F.col("dst").alias("vid"))
        .distinct()
        .join(sv, "vid", "left_anti")
    )
    if t is not None:
        out = out.join(_as_vid_set(t), "vid", "left_semi")
    return out


def edge_boundary(graph: LinkGraph, s: DataFrame, t: DataFrame | None = None) -> DataFrame:
    sv = _as_vid_set(s)
    e = graph.edges.select("src", "dst")
    out = e.join(sv.withColumnRenamed("vid", "src"), "src", "left_semi")
    if t is not None:
        out = out.join(
            _as_vid_set(t).withColumnRenamed("vid", "dst"), "dst", "left_semi"
        )
    else:
        out = out.join(sv.withColumnRenamed("vid", "dst"), "dst", "left_anti")
    return out.select("src", "dst")
