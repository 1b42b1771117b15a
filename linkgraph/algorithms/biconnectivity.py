"""Biconnected components + articulation points — Tarjan–Vishkin on a
BFS spanning forest, fully distributed and hash-free exact.

NetworkX parity: ``nx.biconnected_components`` / ``nx.articulation_points``
(the reference exposes both through its NetworkX-compat layer,
/root/reference/python/graphscope/nx/). Tarjan's sequential lowpoint DFS
is inherently serial; the engine uses the Tarjan–Vishkin (STOC'84 /
SICOMP'85) reduction instead, which works from an ARBITRARY rooted
spanning tree:

1. **BFS spanning forest** (same deterministic construction as
   algorithms/bridges.py: level min-propagation from each component's
   min-vid root, ``parent(v) = min{u ∈ N(v): depth(u) = depth(v)−1}``).
2. **Subtree sizes** by one upward fold (children sum into parents,
   deepest level first — the bridges XOR-fold shape with ``sum``).
3. **Preorder numbers** top-down: ``pre(c_i) = pre(u) + 1 +
   Σ_{j<i} sz(c_j)`` over siblings sorted by vid — the sibling prefix
   sum is a window PARTITIONED BY parent, so it shuffles one level per
   round and never needs an Euler tour / list ranking. Per-tree
   numbering starts at 0 (vids keep aux nodes globally unique, and
   interval tests only ever compare within one tree).
4. **low/high**: ``m(v) = min/max(pre(v), pre(u) over non-tree edges
   {v,u})``, folded up the tree (min/max) — low(v)/high(v) are the
   extreme preorders reachable from subtree(v) by one non-tree hop.
5. **Auxiliary graph** on the tree edges (edge ↔ its child vid):
   (i) each non-tree edge {u,w} with u,w NOT in ancestor–descendant
   relation (interval test) links e_u — e_w; (ii) each tree edge
   (v = parent(w), w) with v non-root links e_w — e_v iff
   ``low(w) < pre(v)`` or ``high(w) ≥ pre(v) + sz(v)`` (subtree(w)
   escapes subtree(v), so both edges lie on a common cycle).
   Biconnected components of G = connected components of the auxiliary
   graph (one more wcc run); block id = min child-vid in the block.
6. **Articulation points**: v is an articulation point iff its incident
   TREE edges fall in ≥ 2 distinct blocks (every block touching v
   contains a tree edge at v — cycles through a non-tree edge at v
   always include one of v's tree edges), covering the root case with
   no special-casing.

Everything is exact integer arithmetic — unlike the bridges XOR cover
there is no hash-collision error mode. Rounds: 2 BFS heights (depths +
two folds + the top-down pass) + two wcc runs; deep-path graphs would
want the O(log V) Euler-tour variant instead — same documented
trade-off as bridges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph


def _forest(graph: LinkGraph, max_rounds: int):
    """(depths, parents, su, und) — BFS spanning forest per component
    (deterministic min-parent), the simple-undirected edge list and its
    symmetrized adjacency. Caller unpersists all four."""
    from linkgraph.algorithms.wcc import wcc
    from linkgraph.superstep import run_supersteps

    su = graph.simple_undirected_edges().persist()
    und = graph.symmetrized_simple_edges().select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).persist()
    comp = wcc(graph, max_rounds=max_rounds)
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
    da = depths.select(F.col("vid").alias("src"), F.col("dist").alias("d_src"))
    db = depths.select(F.col("vid").alias("dst"), F.col("dist").alias("d_dst"))
    parents = (
        und.join(da, "src")
        .join(db, "dst")
        .where(F.col("d_src") == F.col("d_dst") - 1)
        .groupBy("dst")
        .agg(F.min("src").alias("parent"))
        .select(F.col("dst").alias("vid"), "parent")
        .persist()
    )
    return depths, parents, su, und


def _tree_frames(graph: LinkGraph, max_rounds: int):
    """Shared Tarjan–Vishkin preamble → (frame, su, non_tree, cached)
    where frame = (vid, parent, dist, sz, pre, low, high) and cached is
    the list of DataFrames to unpersist."""
    depths, parents, su, und = _forest(graph, max_rounds)
    nodes = (
        depths.join(parents, "vid", "left")
        .select("vid", "parent", "dist", F.lit(1).cast("long").alias("sz"))
        .localCheckpoint(eager=True)
    )
    max_d = nodes.agg(F.max("dist")).first()[0] or 0

    # ---- subtree sizes: upward fold, deepest level first
    for d in range(int(max_d), 0, -1):
        contrib = (
            nodes.where(F.col("dist") == d)
            .groupBy("parent")
            .agg(F.sum("sz").alias("c"))
            .select(F.col("parent").alias("vid"), "c")
        )
        nodes = (
            nodes.join(contrib, "vid", "left")
            .select(
                "vid",
                "parent",
                "dist",
                (F.col("sz") + F.coalesce("c", F.lit(0))).alias("sz"),
            )
            .localCheckpoint(eager=True)
        )

    # ---- preorder: top-down, sibling prefix sums partitioned by parent
    pre = nodes.where(F.col("dist") == 0).select(
        "vid", F.lit(0).cast("long").alias("pre")
    ).localCheckpoint(eager=True)
    sib = Window.partitionBy("parent").orderBy("vid")
    for d in range(1, int(max_d) + 1):
        level = nodes.where(F.col("dist") == d).select("vid", "parent", "sz")
        offs = level.select(
            "vid",
            "parent",
            (F.sum("sz").over(sib) - F.col("sz")).alias("before"),
        )
        step = (
            offs.join(
                pre.select(F.col("vid").alias("parent"), F.col("pre").alias("ppre")),
                "parent",
            )
            .select("vid", (F.col("ppre") + 1 + F.col("before")).alias("pre"))
        )
        pre = pre.union(step).localCheckpoint(eager=True)

    frame = nodes.join(pre, "vid").persist()

    # ---- non-tree edges + m/low/high
    tree = frame.where(F.col("parent").isNotNull()).select(
        F.least("parent", "vid").alias("lo"), F.greatest("parent", "vid").alias("hi")
    )
    non_tree = su.join(tree, ["lo", "hi"], "left_anti").persist()
    pre_of = frame.select(F.col("vid").alias("pvid"), F.col("pre").alias("ppre"))
    nt_reach = (
        non_tree.select(F.col("lo").alias("vid"), F.col("hi").alias("pvid"))
        .union(non_tree.select(F.col("hi").alias("vid"), F.col("lo").alias("pvid")))
        .join(pre_of, "pvid")
        .groupBy("vid")
        .agg(F.min("ppre").alias("nt_lo"), F.max("ppre").alias("nt_hi"))
    )
    lh = (
        frame.join(nt_reach, "vid", "left")
        .select(
            "vid",
            "parent",
            "dist",
            "sz",
            "pre",
            F.least("pre", F.coalesce("nt_lo", F.col("pre"))).alias("low"),
            F.greatest("pre", F.coalesce("nt_hi", F.col("pre"))).alias("high"),
        )
        .localCheckpoint(eager=True)
    )
    for d in range(int(max_d), 0, -1):
        contrib = (
            lh.where(F.col("dist") == d)
            .groupBy("parent")
            .agg(F.min("low").alias("clo"), F.max("high").alias("chi"))
            .select(F.col("parent").alias("vid"), "clo", "chi")
        )
        lh = (
            lh.join(contrib, "vid", "left")
            .select(
                "vid",
                "parent",
                "dist",
                "sz",
                "pre",
                F.least("low", F.coalesce("clo", F.col("low"))).alias("low"),
                F.greatest("high", F.coalesce("chi", F.col("high"))).alias("high"),
            )
            .localCheckpoint(eager=True)
        )
    frame.unpersist()
    frame = lh.persist()
    return frame, su, non_tree, [depths, parents, su, und, non_tree, frame]


def _blocks(graph: LinkGraph, max_rounds: int):
    """(frame, tree_blocks, non_tree, cached): tree_blocks = (vid,
    parent, block) per tree edge (edge ↔ child vid), block = min
    child-vid of its auxiliary component."""
    from linkgraph.algorithms.wcc import wcc

    frame, su, non_tree, cached = _tree_frames(graph, max_rounds)
    u_int = frame.select(
        F.col("vid").alias("u"),
        F.col("pre").alias("u_pre"),
        (F.col("pre") + F.col("sz")).alias("u_end"),
    )
    w_int = frame.select(
        F.col("vid").alias("w"),
        F.col("pre").alias("w_pre"),
        (F.col("pre") + F.col("sz")).alias("w_end"),
    )
    # rule (i): unrelated non-tree endpoints link their parent edges
    rule1 = (
        non_tree.select(F.col("lo").alias("u"), F.col("hi").alias("w"))
        .join(u_int, "u")
        .join(w_int, "w")
        .where(
            ~(
                (F.col("u_pre") <= F.col("w_pre")) & (F.col("w_pre") < F.col("u_end"))
            )
            & ~(
                (F.col("w_pre") <= F.col("u_pre")) & (F.col("u_pre") < F.col("w_end"))
            )
        )
        .select(F.col("u").alias("src"), F.col("w").alias("dst"))
    )
    # rule (ii): child edge links parent edge iff subtree(w) escapes
    # subtree(v); v must itself be a non-root (have a tree edge)
    vp = frame.select(
        F.col("vid").alias("parent"),
        F.col("pre").alias("v_pre"),
        (F.col("pre") + F.col("sz")).alias("v_end"),
        F.col("parent").alias("grand"),
    )
    rule2 = (
        frame.where(F.col("parent").isNotNull())
        .select("vid", "parent", "low", "high")
        .join(vp, "parent")
        .where(
            F.col("grand").isNotNull()
            & ((F.col("low") < F.col("v_pre")) | (F.col("high") >= F.col("v_end")))
        )
        .select(F.col("vid").alias("src"), F.col("parent").alias("dst"))
    )
    aux_nodes = frame.where(F.col("parent").isNotNull()).select(
        "vid", F.col("vid").cast("string").alias("oid")
    )
    aux = LinkGraph(vertices=aux_nodes, edges=rule1.union(rule2))
    labels = wcc(aux, max_rounds=max_rounds)  # (vid = child vid, value = block)
    tree_blocks = (
        frame.where(F.col("parent").isNotNull())
        .select("vid", "parent")
        .join(labels.select("vid", F.col("value").alias("block")), "vid")
        .localCheckpoint(eager=True)
    )
    return frame, tree_blocks, non_tree, cached


def articulation_points(graph: LinkGraph, max_rounds: int = 10_000) -> DataFrame:
    """(vid) — the articulation points (cut vertices) of the undirected
    simple view: vertices whose incident tree edges span ≥ 2 biconnected
    blocks. Deterministic and exact (see module docstring)."""
    frame, tree_blocks, _non_tree, cached = _blocks(graph, max_rounds)
    try:
        touch = tree_blocks.select(F.col("vid").alias("v"), "block").union(
            tree_blocks.select(F.col("parent").alias("v"), "block")
        )
        out = (
            touch.groupBy(F.col("v").alias("vid"))
            .agg(F.countDistinct("block").alias("nb"))
            .where(F.col("nb") >= 2)
            .select("vid")
            .localCheckpoint(eager=True)
        )
        return out
    finally:
        for df in cached:
            df.unpersist()


def biconnected_components(graph: LinkGraph, max_rounds: int = 10_000) -> DataFrame:
    """(lo, hi, block) — every simple undirected edge labeled with its
    biconnected-component id (= min child-vid of the block's tree
    edges). Tree edges carry their own label; a non-tree edge takes the
    label of its deeper endpoint's tree edge (that edge lies on the
    cycle the non-tree edge closes, so they share a block)."""
    frame, tree_blocks, non_tree, cached = _blocks(graph, max_rounds)
    try:
        t_rows = tree_blocks.select(
            F.least("parent", "vid").alias("lo"),
            F.greatest("parent", "vid").alias("hi"),
            "block",
        )
        deeper = (
            non_tree.join(
                frame.select(F.col("vid").alias("lo"), F.col("pre").alias("lo_pre")),
                "lo",
            )
            .join(
                frame.select(F.col("vid").alias("hi"), F.col("pre").alias("hi_pre")),
                "hi",
            )
            .select(
                "lo",
                "hi",
                F.when(F.col("lo_pre") >= F.col("hi_pre"), F.col("lo"))
                .otherwise(F.col("hi"))
                .alias("deep"),
            )
        )
        nt_rows = deeper.join(
            tree_blocks.select(F.col("vid").alias("deep"), "block"), "deep"
        ).select("lo", "hi", "block")
        return t_rows.union(nt_rows).localCheckpoint(eager=True)
    finally:
        for df in cached:
            df.unpersist()
