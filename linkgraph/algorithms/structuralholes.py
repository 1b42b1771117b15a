"""Burt structural-holes measures: effective_size and constraint.

NetworkX-parity extensions of the centrality family (same beyond-
reference status as scc/mis — the reference registry
(/root/reference/coordinator/gscoordinator/builtin/app/.gs_conf.yaml)
stops at the classic centralities; graphscope.nx forwards these to
NetworkX, python/graphscope/nx/algorithms/structuralholes semantics).
Unweighted, undirected form (Burt 1992; Borgatti 1997 simplification
for effective size).

Both are pure join-aggregation plans — no iteration, no UDF:

- ``effective_size(u) = deg(u) - 2·t(u)/deg(u)`` where ``t(u)`` is the
  number of edges among u's neighbors (= triangles through u): one
  reuse of the ordered-wedge triangle kernel plus one join.
- ``constraint(u) = Σ_{v∈N(u)} (p_uv + Σ_{w∈N(u)∩N(v)} p_uw·p_wv)²``
  with ``p_xy = 1/deg(x)``: the mutual-neighbor term is a wedge
  equi-join semi-filtered by the edge set, aggregated per (u,v) —
  edge-sized shuffles only, never vertex-pair-sized.

At 100-TB scale the wedge join is the standard triangle-counting
shape (hub skew absorbed by AQE skew-join + the map-side partial
aggregation of the per-(u,v) sum); nothing here materializes more
than O(wedges) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph


def _und_deg(graph: LinkGraph) -> tuple[DataFrame, DataFrame]:
    """Symmetrized simple edge list (a, b) + simple degrees (vid, deg)."""
    return graph.symmetrized_simple_edges(), graph.simple_degrees()


def effective_size(graph: LinkGraph) -> DataFrame:
    """networkx.effective_size (unweighted): ``deg - 2·t/deg`` per
    vertex with deg > 0 (nx returns NaN for isolates; we omit them).
    ``t`` = edges among the vertex's neighbors = triangles through it,
    so this is one extra join over the triangle kernel."""
    from linkgraph.algorithms.triangles import triangles

    _, deg = _und_deg(graph)
    tri = triangles(graph)  # (vid, value): per-vertex triangle counts
    return (
        deg.join(tri, "vid", "left")
        .select(
            "vid",
            F.round(
                F.col("deg").cast("double")
                - 2.0 * F.coalesce(F.col("value"), F.lit(0)).cast("double") / F.col("deg"),
                8,
            ).alias("value"),
        )
    )


def constraint(graph: LinkGraph) -> DataFrame:
    """networkx.constraint (unweighted, undirected): Burt's network
    constraint. For each neighbor pair (u, v): the direct investment
    ``p_uv = 1/deg(u)`` plus the indirect investment through mutual
    neighbors w, ``Σ 1/(deg(u)·deg(w))``; constraint(u) sums the square
    over v ∈ N(u). Vertices with deg 0 omitted (nx yields NaN)."""
    und, deg = _und_deg(graph)
    und = und.persist()
    try:
        dw = deg.withColumnRenamed("vid", "w").withColumnRenamed("deg", "deg_w")
        # wedge u -w- v (u != v), weighted by 1/deg_w; keep only v ∈ N(u).
        # The Σ deg² wedge stream is semi-filtered AND aggregated by the
        # (u, v) pair — on 32-bit vid spaces both ride a packed one-long
        # key (census lesson: LongHashedRelation / single-long exchange).
        w1 = und.select(F.col("a").alias("u"), F.col("b").alias("w"))
        w2 = und.select(F.col("a").alias("w"), F.col("b").alias("v"))
        wedges = w1.join(w2, "w").where(F.col("u") != F.col("v")).join(dw, "w")
        if graph.pair_key_packable():
            from linkgraph.graph import packed_pair

            wedges = wedges.withColumn("uv", packed_pair("u", "v")).join(
                und.select(packed_pair("a", "b").alias("uv")), "uv", "left_semi"
            )
            ind = wedges.groupBy("uv").agg(
                F.sum(1.0 / F.col("deg_w")).alias("ind_over_degu")
            )
            edge_uv = und.select(
                F.col("a").alias("u"), F.col("b").alias("v"),
                packed_pair("a", "b").alias("uv"),
            )
            joined = edge_uv.join(ind, "uv", "left").select("u", "v", "ind_over_degu")
        else:
            wedges = wedges.join(
                und.select(F.col("a").alias("u"), F.col("b").alias("v")),
                ["u", "v"],
                "left_semi",
            )
            ind = wedges.groupBy("u", "v").agg(
                F.sum(1.0 / F.col("deg_w")).alias("ind_over_degu")
            )
            joined = und.select(F.col("a").alias("u"), F.col("b").alias("v")).join(
                ind, ["u", "v"], "left"
            )
        du = deg.withColumnRenamed("vid", "u").withColumnRenamed("deg", "deg_u")
        terms = (
            joined
            .join(du, "u")
            .select(
                "u",
                F.pow(
                    (1.0 + F.coalesce("ind_over_degu", F.lit(0.0))) / F.col("deg_u"),
                    2,
                ).alias("sq"),
            )
        )
        out = terms.groupBy(F.col("u").alias("vid")).agg(
            F.round(F.sum("sq"), 8).alias("value")
        )
        out = out.localCheckpoint(eager=True)
        return out
    finally:
        und.unpersist()
