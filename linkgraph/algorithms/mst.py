"""Minimum spanning forest — deterministic distributed Borůvka.

nx-parity extension (networkx minimum_spanning_edges/tree; the reference
ships no MST app — flagged beyond-reference like scc). Semantics: the
undirected simple graph with per-pair min weight; ties broken by the
strict total order (w, lo, hi), which makes the forest UNIQUE — so
Borůvka here and a sequential Kruskal replay (the DuckDB oracle, and
networkx when weights are unique) provably produce the same edge set.

Spark shape — the textbook scalable MST:
- each round every component picks its minimum outgoing edge under the
  total order (one groupBy(comp).min(struct) after two comp-label
  joins; both endpoints' components bid, so picks are symmetric);
- picked edges join the forest; the touched components contract by
  running the engine's own WCC over the (comp → comp) pick pairs (a
  graph with ≤ #components edges, NOT the data graph);
- labels update via one join; cross-component edges shrink.
Components at least halve per round → ≤ log2(V) rounds, each touching
the edge list once. No driver-side state beyond the per-round emptiness
check; localCheckpoint cuts lineage exactly like the other iterative
kernels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph


def minimum_spanning_forest(
    graph: LinkGraph, weight: str | None = None, max_rounds: int = 64
) -> DataFrame:
    """(lo, hi, w) — the unique minimum spanning forest under the strict
    edge order (w, lo, hi). ``weight`` names an edge column (per-pair
    minimum over both directions wins, matching the weighted-betweenness
    parallel-edge rule); None = unit weights (the forest is then a
    deterministic spanning forest, still unique under the order)."""
    spark = graph.edges.sparkSession
    und = graph.simple_undirected_edges()
    if weight is not None:
        w = (
            graph.edges.select(
                F.least("src", "dst").alias("lo"),
                F.greatest("src", "dst").alias("hi"),
                F.col(weight).cast("double").alias("w"),
            )
            .where(F.col("lo") != F.col("hi"))
            .groupBy("lo", "hi")
            .agg(F.min("w").alias("w"))
        )
        edges = und.join(w, ["lo", "hi"])
    else:
        edges = und.withColumn("w", F.lit(1.0))
    edges = edges.localCheckpoint(eager=True)

    comp = graph.vertices.select(
        "vid", F.col("vid").alias("comp")
    ).localCheckpoint(eager=True)
    forest = spark.createDataFrame([], "lo long, hi long, w double")

    for _ in range(max_rounds):
        ec = (
            edges.join(
                comp.select(F.col("vid").alias("lo"), F.col("comp").alias("ca")),
                "lo",
            )
            .join(
                comp.select(F.col("vid").alias("hi"), F.col("comp").alias("cb")),
                "hi",
            )
            .where(F.col("ca") != F.col("cb"))
        )
        s = F.struct("w", "lo", "hi", "ca", "cb")
        cand = ec.select(F.col("ca").alias("c"), s.alias("s")).union(
            ec.select(F.col("cb").alias("c"), s.alias("s"))
        )
        picked = (
            cand.groupBy("c")
            .agg(F.min("s").alias("s"))
            .select("s.lo", "s.hi", "s.w", "s.ca", "s.cb")
            .distinct()
            .localCheckpoint(eager=True)
        )
        if picked.limit(1).count() == 0:
            break
        forest = forest.union(picked.select("lo", "hi", "w")).localCheckpoint(
            eager=True
        )
        # contract: new label = component of the pick graph (nodes are
        # OLD comp labels — ≤ #components of them, not data vertices)
        from linkgraph.algorithms.wcc import wcc

        mg_e = picked.select(F.col("ca").alias("src"), F.col("cb").alias("dst"))
        mg_v = (
            mg_e.select(F.col("src").alias("vid"))
            .union(mg_e.select(F.col("dst").alias("vid")))
            .distinct()
            .select("vid", F.col("vid").cast("string").alias("oid"))
        )
        labels = wcc(LinkGraph(vertices=mg_v, edges=mg_e))
        comp = (
            comp.join(
                labels.select(
                    F.col("vid").alias("comp"), F.col("value").alias("nc")
                ),
                "comp",
                "left",
            )
            .select("vid", F.coalesce("nc", F.col("comp")).alias("comp"))
            .localCheckpoint(eager=True)
        )
    return forest
