"""Maximal matching — deterministic mutual-min proposal rounds.

NetworkX-parity surface: ``nx.maximal_matching(G)`` (greedy, undirected;
graphscope.nx forwards it — see /root/reference/python/graphscope/nx/
algorithms/tests/forward/test_matching.py).  NetworkX's greedy scans
edges in dict order, which has no distributed equivalent, so the engine
uses the classic symmetric proposal rule instead (the standard
distributed-greedy matching used in Pregel-style systems):

    each round, every unmatched vertex proposes to its minimum-vid
    unmatched neighbor; an edge (u, v) is matched iff the proposals are
    mutual (u→v AND v→u).  Matched endpoints and their incident edges
    leave the pool.

The result is a maximal matching (every avail edge eventually loses both
endpoints or gets matched) and is fully deterministic: round r's matched
set is a pure function of the edge set.  Progress is guaranteed — the
globally-minimum unmatched vid u is every neighbor's minimum, so u's own
proposal is always reciprocated — and in practice the pool collapses in
O(log V) rounds (many disjoint mutual-min pairs per round).

Spark shape per round: one ``groupBy(src).min`` (proposal), one
self-join on the proposal table (mutuality — both sides tiny: |V| rows
max), two anti-joins to shrink the pool.  The pool is localCheckpointed
eagerly each round to keep lineage flat (superstep invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph


def maximal_matching(graph: LinkGraph, max_rounds: int = 30) -> DataFrame:
    """(lo, hi) matched pairs, lo < hi.

    Runs until the pool is empty or ``max_rounds`` is hit; because each
    round is a pure function of the remaining pool, stopping early on an
    empty pool yields the same result as any larger round budget (the
    extra rounds are no-ops) — fixed-round oracles stay hash-identical.
    """
    spark = graph.edges.sparkSession
    avail = graph.simple_undirected_edges().localCheckpoint(eager=True)
    matched: DataFrame | None = None
    for _ in range(max_rounds):
        if avail.isEmpty():
            break
        und = avail.select(F.col("lo").alias("src"), F.col("hi").alias("dst")).union(
            avail.select(F.col("hi").alias("src"), F.col("lo").alias("dst"))
        )
        prop = und.groupBy("src").agg(F.min("dst").alias("pick"))
        b = prop.select(F.col("src").alias("bsrc"), F.col("pick").alias("bpick"))
        pairs = (
            prop.join(b, (prop["pick"] == b["bsrc"]) & (b["bpick"] == prop["src"]))
            .where(F.col("src") < F.col("pick"))
            .select(F.col("src").alias("lo"), F.col("pick").alias("hi"))
        )
        mvids = pairs.select(F.col("lo").alias("vid")).union(
            pairs.select(F.col("hi").alias("vid"))
        )
        matched = pairs if matched is None else matched.union(pairs)
        avail = (
            avail.join(mvids.withColumnRenamed("vid", "lo"), "lo", "left_anti")
            .join(mvids.withColumnRenamed("vid", "hi"), "hi", "left_anti")
            .select("lo", "hi")
            .localCheckpoint(eager=True)
        )
    if matched is None:
        return spark.createDataFrame([], "lo long, hi long")
    return matched.localCheckpoint(eager=True)
