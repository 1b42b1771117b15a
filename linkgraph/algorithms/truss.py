"""k-truss by synchronous edge peeling.

The cohesive-subgraph sibling of k-core (cores.py — gs::KCore peels
vertices by degree; the reference registry stops there, so this is a
beyond-reference extension, flagged like scc/mis): the k-truss is the
maximal subgraph whose every edge closes ≥ k-2 triangles *within the
subgraph* (Cohen 2008, "Trusses: cohesive subgraphs for social network
analysis"). Synchronous rounds — recompute every edge's support, drop
all below-threshold edges at once, repeat to fixpoint — give a
canonical, order-independent result, so a DuckDB oracle can replay the
rounds exactly.

Scale shape: each round is one adjacency join per wedge arm + an EXISTS
semi-join + a per-edge count (all equi hash joins, map-side combinable;
AQE handles the shrinking edge set). Rounds = peeling depth. This is a
correctness-tier operator — at 1e8+ edges the per-round wedge join costs
what triangle counting costs; bucket-decomposed h-index iteration is the
known scale path if truss decomposition ever needs the fast tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph

# rounds taken by the most recent k_truss call (tests / oracle sizing)
LAST_ROUNDS: int | None = None


def k_truss(graph: LinkGraph, k: int, max_rounds: int = 200) -> DataFrame:
    """Edges ``(lo, hi)`` of the k-truss of the undirected simple graph.

    ``k >= 3`` (the 2-truss is every edge; peeling is defined on triangle
    support). Synchronous peel: each round drops ALL edges whose support
    in the current subgraph is < k-2, so the fixpoint is canonical.
    """
    global LAST_ROUNDS
    if k < 3:
        raise ValueError("k_truss requires k >= 3 (2-truss is the whole graph)")
    from linkgraph.graph import packed_pair

    edges = graph.simple_undirected_edges().localCheckpoint(eager=True)
    n = edges.count()
    # per-round wedge stream closes/aggregates by PAIR — pack the keys
    # into one long on 32-bit vid spaces (census lesson)
    packable = graph.pair_key_packable()
    rounds = 0
    for _ in range(max_rounds):
        rounds += 1
        adj = edges.select(F.col("lo").alias("u"), F.col("hi").alias("w")).unionByName(
            edges.select(F.col("hi").alias("u"), F.col("lo").alias("w"))
        )
        # common neighbors w of (lo, hi): wedge from lo, closed at hi
        cand = edges.join(adj, adj["u"] == edges["lo"]).select("lo", "hi", "w")
        if packable:
            closed = cand.withColumn("hw", packed_pair("hi", "w")).join(
                adj.select(packed_pair("u", "w").alias("hw")), "hw", "left_semi"
            )
            support = closed.groupBy(
                packed_pair("lo", "hi").alias("lh")
            ).agg(F.count("*").alias("sup"))
            kept = (
                edges.withColumn("lh", packed_pair("lo", "hi"))
                .join(support, "lh", "left")
            )
        else:
            closed = cand.join(
                adj.select(F.col("u").alias("hi"), "w"), ["hi", "w"], "left_semi"
            )
            support = closed.groupBy("lo", "hi").agg(F.count("*").alias("sup"))
            kept = edges.join(support, ["lo", "hi"], "left")
        kept = (
            kept.where(F.coalesce(F.col("sup"), F.lit(0)) >= k - 2)
            .select("lo", "hi")
            .localCheckpoint(eager=True)
        )
        m = kept.count()
        if m == n:
            LAST_ROUNDS = rounds
            return kept
        edges, n = kept, m
        if m == 0:
            LAST_ROUNDS = rounds
            return kept
    raise RuntimeError(
        f"k_truss: not converged after {max_rounds} rounds — raise max_rounds"
    )
