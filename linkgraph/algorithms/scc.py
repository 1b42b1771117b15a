"""Strongly connected components — forward/backward coloring.

**Beyond-reference extension** (SURVEY.md §2.3 note): GraphScope v0.10.0
ships no SCC app; the north rule lists "weakly/strongly connected
components", so SCC is provided as a flagged extension using the public
FW-BW coloring scheme (Orzan / Stergiou-style, as used by most BSP graph
engines):

repeat until no unassigned vertices:
  1. color(v) ← max vid; propagate **forward** along remaining edges to
     fixpoint (color(dst) ← max(color(dst), color(src)));
  2. every vertex with color(v) == v is the root of its color class;
     backward-propagate membership from the root **within the color
     class**: vertices backward-reachable from the root through
     same-colored vertices form one SCC (id = root vid);
  3. remove finished vertices; repeat on the remainder.

Deterministic; SCC id = the maximum vid inside the component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph


def _propagate_max_forward(verts: DataFrame, edges: DataFrame, max_rounds: int = 10_000) -> DataFrame:
    """verts(vid) × edges(src,dst) → (vid, color) fixpoint of forward max."""
    state = verts.select("vid", F.col("vid").alias("color")).localCheckpoint(eager=True)
    for rnd in range(max_rounds):
        msgs = (
            state.join(edges, state["vid"] == edges["src"])
            .groupBy("dst")
            .agg(F.max("color").alias("mc"))
        )
        new = (
            state.join(msgs, state["vid"] == msgs["dst"], "left")
            .select(
                state["vid"],
                F.greatest(state["color"], F.coalesce("mc", state["color"])).alias("color"),
                (F.coalesce("mc", state["color"]) > state["color"]).alias("chg"),
            )
            .localCheckpoint(eager=True)  # flat lineage every round
        )
        changed = new.agg(F.sum(F.col("chg").cast("long"))).first()[0] or 0
        state = new.select("vid", "color")
        if changed == 0:
            break
    return state


def scc(graph: LinkGraph, max_outer: int = 100) -> DataFrame:
    """(vid, value) — value = SCC id (max vid in the component)."""
    spark = graph.edges.sparkSession
    assigned = spark.createDataFrame([], "vid long, value long")
    remaining_v = graph.vertices.select("vid")
    remaining_e = graph.edges.select("src", "dst").where(F.col("src") != F.col("dst"))

    for _ in range(max_outer):
        remaining_v = remaining_v.localCheckpoint(eager=True)
        if remaining_v.limit(1).count() == 0:
            break
        remaining_e = remaining_e.localCheckpoint(eager=True)

        colors = _propagate_max_forward(remaining_v, remaining_e)  # (vid, color)
        # backward membership from root within same color class
        ce = (
            remaining_e.join(colors.withColumnRenamed("vid", "src"), "src")
            .withColumnRenamed("color", "c_src")
            .join(
                colors.withColumnRenamed("vid", "dst").withColumnRenamed("color", "c_dst"),
                "dst",
            )
            .where(F.col("c_src") == F.col("c_dst"))
            .select("src", "dst")
            .persist()
        )
        member = colors.where(F.col("vid") == F.col("color")).select(
            "vid", F.col("vid").alias("root")
        ).persist()
        member.count()
        while True:
            grow = (
                member.join(ce, member["vid"] == ce["dst"])
                .select(F.col("src").alias("vid"), "root")
                .distinct()
                .join(member.select("vid"), "vid", "left_anti")
            )
            grow = grow.localCheckpoint(eager=True)
            if grow.limit(1).count() == 0:
                break
            nxt = member.union(grow).localCheckpoint(eager=True)
            member.unpersist()
            member = nxt
        done = member.select("vid", F.col("root").alias("value"))
        assigned = assigned.union(done).localCheckpoint(eager=True)
        remaining_v = remaining_v.join(done.select("vid"), "vid", "left_anti")
        remaining_e = (
            remaining_e.join(done.select(F.col("vid").alias("src")), "src", "left_anti")
            .join(done.select(F.col("vid").alias("dst")), "dst", "left_anti")
            .select("src", "dst")
        )
        ce.unpersist()
        member.unpersist()
        colors.unpersist()
    return assigned


def condensation(graph: LinkGraph) -> LinkGraph:
    """DAG of strongly connected components (nx.condensation analog).

    SCC labels (canonical id = max member vid, :func:`scc`) feed
    :func:`linkgraph.graph.quotient_graph`: one vertex per component,
    one edge per ordered component pair with at least one underlying
    edge (``weight`` carries the underlying-edge count — extra signal
    NetworkX doesn't keep; nx's 0..k-1 relabeling and ``members`` node
    sets are intentionally not reproduced, the canonical component vid
    is the stabler id at scale). The result is always a DAG.
    """
    from linkgraph.graph import quotient_graph

    return quotient_graph(graph, scc(graph))
