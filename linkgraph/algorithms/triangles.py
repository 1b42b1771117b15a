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


def triangles(graph: LinkGraph) -> DataFrame:
    """Per-vertex triangle counts ``(vid, value)``; zero rows included."""
    o = _oriented_edges(graph).persist()
    a, b, c = o.alias("a"), o.alias("b"), o.alias("c")
    # wedge: v→u (a), u→w (b); triangle iff v→w oriented edge exists (c)
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
