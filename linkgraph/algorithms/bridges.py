"""Exact bridges of the undirected simple graph — spanning-forest
XOR-cover, fully distributed.

NetworkX parity: ``nx.bridges(G)`` (the reference exposes bridges through
its NetworkX-compat layer, /root/reference/python/graphscope/nx/). The
sequential algorithm is Tarjan's DFS lowpoint — inherently serial — so
the engine uses the parallel-connectivity folklore instead (the AGM
sketch / parallel-tree-contraction cover argument):

1. **BFS spanning forest.** One frontier min-propagation superstep per
   level from each component's min-vid root (the WCC label), then the
   deterministic parent choice ``parent(v) = min{u ∈ N(v) : depth(u) =
   depth(v)-1}``. Per-round cost = one edge-sized equi-join with
   map-side min combine — identical shape to wcc/bfs.
2. **Cover hashes.** Every non-tree undirected edge e gets the fixed
   64-bit value ``h(e) = xxhash64(lo, hi) | 1`` (the ``| 1`` keeps any
   single edge visible — h is never 0). Each vertex XORs the h of its
   incident non-tree edges.
3. **Subtree XOR, level by level.** Folding children's totals into
   parents from the deepest level up gives ``total(v) = XOR of h(e)
   over e with exactly one endpoint in subtree(v)`` — a non-tree edge
   with both (or neither) endpoints inside appears twice (or not at
   all) and cancels. A tree edge (parent(v), v) is a bridge iff **no**
   non-tree edge covers it, i.e. total(v) = 0; non-tree edges close a
   cycle with the tree path and are never bridges.

The only error mode is a nonempty cover set whose hashes XOR to exactly
0 — a fixed ~2⁻⁶³ event per tree edge under xxhash64 (deterministic:
the same graph always gives the same answer, and the oracle/tests would
see it). Rounds: BFS height for the forest + BFS height for the upward
fold; web-scale graphs have small diameter, and each fold round
shuffles only one level's rows. Deep-path graphs would want the
O(log V) Euler-tour/pointer-doubling fold instead — documented
trade-off, not implemented.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph


def bridges(graph: LinkGraph, max_rounds: int = 10_000) -> DataFrame:
    """All bridge edges of the undirected simple view of ``graph`` as
    ``(lo, hi)`` rows (lo < hi). Self-loops are never bridges and are
    dropped with the simple-undirected projection."""
    from linkgraph.algorithms.wcc import wcc
    from linkgraph.superstep import run_supersteps

    su = graph.simple_undirected_edges().persist()
    und = graph.symmetrized_simple_edges().select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).persist()
    depths = None

    try:
        comp = wcc(graph, max_rounds=max_rounds)
        # BFS depths from each component's min-vid root (= its WCC label)
        state0 = comp.select(
            "vid",
            F.when(F.col("vid") == F.col("value"), F.lit(0).cast("long")).alias("dist"),
            (F.col("vid") == F.col("value")).alias("changed"),
        )

        def bfs_step(state, rnd):
            frontier = state.where(F.col("changed")).select("vid", "dist")
            msgs = (
                frontier.join(und, frontier["vid"] == und["src"])
                .groupBy("dst")
                .agg((F.min("dist") + 1).alias("mdist"))
            )
            new_state = state.join(msgs, state["vid"] == msgs["dst"], "left").select(
                state["vid"],
                F.coalesce(state["dist"], F.col("mdist")).alias("dist"),
                (state["dist"].isNull() & F.col("mdist").isNotNull()).alias("changed"),
            )
            n = new_state.where(F.col("changed")).count()
            return new_state, {"changed": n}

        depths = run_supersteps(
            state0, bfs_step, converged=lambda s: s["changed"] == 0, max_rounds=max_rounds
        ).state.select("vid", "dist").persist()

        # deterministic parent: min neighbor one level up
        da = depths.select(F.col("vid").alias("src"), F.col("dist").alias("d_src"))
        db = depths.select(F.col("vid").alias("dst"), F.col("dist").alias("d_dst"))
        parents = (
            und.join(da, "src")
            .join(db, "dst")
            .where(F.col("d_src") == F.col("d_dst") - 1)
            .groupBy("dst")
            .agg(F.min("src").alias("parent"))
            .select(F.col("dst").alias("vid"), "parent")
        )

        tree = parents.select(
            F.least("parent", "vid").alias("lo"), F.greatest("parent", "vid").alias("hi")
        )
        non_tree = su.join(tree, ["lo", "hi"], "left_anti").select(
            "lo", "hi", F.xxhash64("lo", "hi").bitwiseOR(F.lit(1).cast("long")).alias("h")
        )
        vxor = (
            non_tree.select(F.col("lo").alias("vid"), "h")
            .union(non_tree.select(F.col("hi").alias("vid"), "h"))
            .groupBy("vid")
            .agg(F.expr("bit_xor(h)").alias("x"))
        )

        totals = (
            depths.join(parents, "vid", "left")
            .join(vxor, "vid", "left")
            .select(
                "vid",
                "parent",
                "dist",
                F.coalesce("x", F.lit(0).cast("long")).alias("total"),
            )
            .localCheckpoint(eager=True)
        )
        max_d = totals.agg(F.max("dist")).first()[0] or 0

        # upward fold: children at depth d (final totals) XOR into their
        # parents at d-1; one small shuffle per level, state re-checkpointed
        # so lineage stays flat across the fold
        for d in range(int(max_d), 0, -1):
            contrib = (
                totals.where(F.col("dist") == d)
                .groupBy("parent")
                .agg(F.expr("bit_xor(total)").alias("c"))
                .select(F.col("parent").alias("vid"), "c")
            )
            totals = (
                totals.join(contrib, "vid", "left")
                .select(
                    "vid",
                    "parent",
                    "dist",
                    F.when(
                        F.col("c").isNotNull(),
                        F.expr("total ^ c"),
                    )
                    .otherwise(F.col("total"))
                    .alias("total"),
                )
                .localCheckpoint(eager=True)
            )

        out = (
            totals.where(F.col("parent").isNotNull() & (F.col("total") == 0))
            .select(
                F.least("parent", "vid").alias("lo"),
                F.greatest("parent", "vid").alias("hi"),
            )
            .localCheckpoint(eager=True)
        )
        return out
    finally:
        su.unpersist()
        und.unpersist()
        if depths is not None:
            depths.unpersist()
