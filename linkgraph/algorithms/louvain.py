"""Louvain community detection — distributed local-moving + contraction.

Reference: gs::LouvainAppBase
(/root/reference/coordinator/gscoordinator/builtin/app/.gs_conf.yaml:158-160,
apps/pregel/louvain/; python sig app/louvain.py:31-73 — undirected
graphs only). The reference follows the Sotera distributed-Louvain
design: synchronous modularity-gain local moves with an oscillation
damper, then community contraction, repeated in phases.

This implementation (public Louvain/Sotera formulas, no reference code):

- undirected weighted graph, 2m = Σ_v k_v (k_v = weighted degree);
- phase = repeated synchronous **local-move rounds**: every vertex
  evaluates ΔQ of moving into each neighboring community
      ΔQ(v → C) = k_{v,C}/m − k_v · Σ_tot(C \\ v) / (2m²)
  and takes the best positive move (ties → smallest community id).
  To prevent the classic synchronous swap oscillation, only vertices
  whose ``pmod(vid, 2)`` matches the round parity may move in a given
  round (deterministic stand-in for Sotera's probabilistic damping);
- phase ends when a full even+odd round pair moves nothing; the graph
  is then **contracted** (communities → vertices, parallel edge weights
  summed, intra-community weight folded into self-loops) and the next
  phase runs on the condensed graph;
- stops when a phase improves modularity by < ``min_modularity_gain``.

Returns (vid, value) with the final community id of every original
vertex (community ids are vids of phase-1 representatives).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph


def _modularity(edges_w: DataFrame, assign: DataFrame, m2: float) -> float:
    """Q = Σ_C [ Σ_in(C)/2m − (Σ_tot(C)/2m)² ] over the undirected graph.

    ``edges_w``: symmetric (src, dst, w) incl. both directions and
    self-loops counted once per direction-pair convention below.
    """
    a = assign.select(F.col("vid").alias("src"), F.col("comm").alias("c_src"))
    b = assign.select(F.col("vid").alias("dst"), F.col("comm").alias("c_dst"))
    e = edges_w.join(a, "src").join(b, "dst")
    internal = (
        e.where(F.col("c_src") == F.col("c_dst")).agg(F.sum("w")).first()[0] or 0.0
    )
    deg = edges_w.groupBy("src").agg(F.sum("w").alias("k"))
    tot = (
        deg.join(a, "src")
        .groupBy("c_src")
        .agg(F.sum("k").alias("t"))
        .agg(F.sum(F.col("t") * F.col("t")))
        .first()[0]
        or 0.0
    )
    return internal / m2 - tot / (m2 * m2)


def _round_moves(
    edges_w: DataFrame, deg: DataFrame, assign: DataFrame, m: float, parity: int
) -> DataFrame:
    """One synchronous local-move round → (vid, new_comm) moves.

    Deterministic: best community by max ΔQ with ties to the smallest
    community id; only parity-matching vids may move (the oscillation
    damper); a move needs ΔQ strictly above the stay-put ΔQ (+1e-12).
    All inputs are integer-valued doubles (w=1 sums), so ΔQ is
    bit-reproducible across engines — the property the SQL oracle of
    ``louvain_phase1`` relies on."""
    tot = deg.join(assign, "vid").groupBy("comm").agg(F.sum("k").alias("tot"))
    nbr_comm = (
        edges_w.where(F.col("src") != F.col("dst"))
        .join(
            assign.select(F.col("vid").alias("dst"), F.col("comm").alias("c_nbr")),
            "dst",
        )
        .groupBy(F.col("src").alias("vid"), "c_nbr")
        .agg(F.sum("w").alias("k_in"))
    )
    cand = (
        nbr_comm.join(deg, "vid")
        .join(assign, "vid")
        .join(tot.withColumnRenamed("comm", "c_nbr"), "c_nbr")
        .select(
            "vid",
            "comm",
            "c_nbr",
            (
                F.col("k_in") / F.lit(m)
                - F.col("k")
                * (
                    F.col("tot")
                    - F.when(F.col("c_nbr") == F.col("comm"), F.col("k")).otherwise(
                        F.lit(0.0)
                    )
                )
                / F.lit(2.0 * m * m)
            ).alias("gain"),
        )
    )
    best = (
        cand.groupBy("vid", "comm")
        .agg(F.max(F.struct(F.col("gain"), (-F.col("c_nbr")).alias("neg"))).alias("top"))
        .select(
            "vid",
            "comm",
            F.col("top.gain").alias("gain"),
            (-F.col("top.neg")).alias("best_c"),
        )
    )
    stay = cand.where(F.col("c_nbr") == F.col("comm")).select(
        "vid", F.col("gain").alias("stay_gain")
    )
    return (
        best.join(stay, "vid", "left")
        .where(
            (F.pmod(F.col("vid"), F.lit(2)) == parity)
            & (F.col("best_c") != F.col("comm"))
            & (F.col("gain") > F.coalesce(F.col("stay_gain"), F.lit(0.0)) + 1e-12)
        )
        .select("vid", F.col("best_c").alias("new_comm"))
    )


def louvain_phase1(graph: LinkGraph, rounds: int = 4) -> DataFrame:
    """Deterministic fixed-round phase-1 local moving, canonicalized.

    Runs exactly ``rounds`` synchronous local-move rounds (parity 0, 1,
    0, 1, …) on the simple undirected closure — no convergence check, no
    contraction — then relabels each community to its **min member vid**.
    Every step is a join/group-by over exact integer-valued doubles, so
    an unrolled SQL twin reproduces it bit-for-bit: this is the
    hash-oracled face of ``louvain`` (whose multi-phase contraction is
    order-dependent and stays rows-only). Returns (vid, value) for every
    graph vertex; isolated vertices keep their own vid."""
    und = graph.simple_undirected_edges()
    edges_w = (
        und.select(F.col("lo").alias("src"), F.col("hi").alias("dst"), F.lit(1.0).alias("w"))
        .union(und.select(F.col("hi").alias("src"), F.col("lo").alias("dst"), F.lit(1.0).alias("w")))
    ).localCheckpoint(eager=True)
    m2 = edges_w.agg(F.sum("w")).first()[0] or 0.0
    if m2 == 0:
        return graph.vertices.select("vid", F.col("vid").alias("value"))
    m = m2 / 2.0
    deg = edges_w.groupBy("src").agg(F.sum("w").alias("k")).select(
        F.col("src").alias("vid"), "k"
    )
    verts = edges_w.select(F.col("src").alias("vid")).distinct()
    assign = verts.select("vid", F.col("vid").alias("comm")).localCheckpoint(eager=True)
    for rnd in range(rounds):
        moves = _round_moves(edges_w, deg, assign, m, rnd % 2)
        assign = (
            assign.join(moves, "vid", "left")
            .select("vid", F.coalesce("new_comm", F.col("comm")).alias("comm"))
            .localCheckpoint(eager=True)
        )
    canon = assign.groupBy("comm").agg(F.min("vid").alias("canon"))
    labeled = assign.join(canon, "comm").select("vid", F.col("canon").alias("value"))
    return (
        graph.vertices.select("vid")
        .join(labeled, "vid", "left")
        .select("vid", F.coalesce("value", F.col("vid")).alias("value"))
    )


def louvain(
    graph: LinkGraph,
    max_phases: int = 5,
    max_rounds_per_phase: int = 20,
    min_modularity_gain: float = 1e-6,
) -> DataFrame:
    """(vid, value) — Louvain community per original vertex."""
    spark = graph.edges.sparkSession

    # symmetric undirected weighted edge table (w=1 per undirected edge,
    # materialized in both directions; self-loops dropped at phase 1)
    und = graph.simple_undirected_edges()  # (lo, hi) once
    edges_w = (
        und.select(F.col("lo").alias("src"), F.col("hi").alias("dst"), F.lit(1.0).alias("w"))
        .union(und.select(F.col("hi").alias("src"), F.col("lo").alias("dst"), F.lit(1.0).alias("w")))
    ).localCheckpoint(eager=True)

    # mapping original vid -> current (condensed) vertex
    membership = graph.vertices.select("vid", F.col("vid").alias("cur")).localCheckpoint(
        eager=True
    )
    prev_q = None

    for _phase in range(max_phases):
        m2 = edges_w.agg(F.sum("w")).first()[0] or 0.0  # = 2m
        if m2 == 0:
            break
        m = m2 / 2.0

        deg = edges_w.groupBy("src").agg(F.sum("w").alias("k")).select(
            F.col("src").alias("vid"), "k"
        )
        verts = edges_w.select(F.col("src").alias("vid")).distinct()
        assign = verts.select("vid", F.col("vid").alias("comm")).localCheckpoint(eager=True)

        stable_pair = 0
        for rnd in range(max_rounds_per_phase):
            moves = _round_moves(edges_w, deg, assign, m, rnd % 2)
            new_assign = (
                assign.join(moves, "vid", "left")
                .select("vid", F.coalesce("new_comm", F.col("comm")).alias("comm"))
                .localCheckpoint(eager=True)
            )
            n_moved = moves.count()
            assign = new_assign
            if n_moved == 0:
                stable_pair += 1
                if stable_pair >= 2:  # even+odd both stable
                    break
            else:
                stable_pair = 0

        q = _modularity(edges_w, assign, m2)
        if prev_q is not None and q - prev_q < min_modularity_gain:
            membership = membership.join(
                assign.select(F.col("vid").alias("cur"), "comm"), "cur", "left"
            ).select("vid", F.coalesce("comm", F.col("cur")).alias("cur")).localCheckpoint(
                eager=True
            )
            break
        prev_q = q

        # fold this phase's assignment into the original-vid membership
        membership = membership.join(
            assign.select(F.col("vid").alias("cur"), "comm"), "cur", "left"
        ).select("vid", F.coalesce("comm", F.col("cur")).alias("cur")).localCheckpoint(
            eager=True
        )

        # contract: communities become vertices; parallel edges summed
        a = assign.select(F.col("vid").alias("src"), F.col("comm").alias("c_src"))
        b = assign.select(F.col("vid").alias("dst"), F.col("comm").alias("c_dst"))
        edges_w = (
            edges_w.join(a, "src")
            .join(b, "dst")
            .groupBy(F.col("c_src").alias("src"), F.col("c_dst").alias("dst"))
            .agg(F.sum("w").alias("w"))
        ).localCheckpoint(eager=True)

    return membership.select("vid", F.col("cur").alias("value"))


def louvain_canonical(
    graph: LinkGraph, rounds_per_phase: int = 4, phases: int = 2
) -> DataFrame:
    """Fully deterministic multi-phase Louvain — the hash-oracled face of
    the contraction pipeline (``louvain`` stays the convergence-driven
    fast variant; its round counts are data-dependent and its labels
    order-dependent, so it remains rows-only).

    Each phase runs EXACTLY ``rounds_per_phase`` parity-damped
    synchronous local-move rounds (the ``_round_moves`` recurrence with
    ties to the smallest community id), canonicalizes every community to
    its **min member vid**, folds the assignment into the original-vid
    membership, then contracts on the canonical ids (parallel edge
    weights summed, intra-community weight becoming self-loops — which
    the symmetric-table degree sum counts with the standard 2·w_self
    multiplicity automatically). Σw is contraction-invariant, so m is
    computed once. Every quantity is an integer-valued double, every
    tie-break ordered, every round count fixed: an unrolled SQL twin
    replays it bit-for-bit across engines.

    Returns (vid, value) over all original vertices; value = the min
    original member vid of the final community; isolated vertices keep
    their own vid.
    """
    und = graph.simple_undirected_edges()
    edges_w = (
        und.select(F.col("lo").alias("src"), F.col("hi").alias("dst"), F.lit(1.0).alias("w"))
        .union(und.select(F.col("hi").alias("src"), F.col("lo").alias("dst"), F.lit(1.0).alias("w")))
    ).localCheckpoint(eager=True)
    m2 = edges_w.agg(F.sum("w")).first()[0] or 0.0
    if m2 == 0:
        return graph.vertices.select("vid", F.col("vid").alias("value"))
    m = m2 / 2.0

    membership = graph.vertices.select("vid", F.col("vid").alias("cur"))
    for phase in range(phases):
        deg = edges_w.groupBy("src").agg(F.sum("w").alias("k")).select(
            F.col("src").alias("vid"), "k"
        )
        verts = edges_w.select(F.col("src").alias("vid")).distinct()
        assign = verts.select("vid", F.col("vid").alias("comm")).localCheckpoint(eager=True)
        for rnd in range(rounds_per_phase):
            moves = _round_moves(edges_w, deg, assign, m, rnd % 2)
            assign = (
                assign.join(moves, "vid", "left")
                .select("vid", F.coalesce("new_comm", F.col("comm")).alias("comm"))
                .localCheckpoint(eager=True)
            )
        canon = assign.groupBy("comm").agg(F.min("vid").alias("canon"))
        assign_c = assign.join(canon, "comm").select(
            "vid", F.col("canon").alias("comm")
        ).localCheckpoint(eager=True)
        membership = (
            membership.join(
                assign_c.select(F.col("vid").alias("cur"), "comm"), "cur", "left"
            )
            .select("vid", F.coalesce("comm", F.col("cur")).alias("cur"))
            .localCheckpoint(eager=True)
        )
        if phase < phases - 1:
            a = assign_c.select(F.col("vid").alias("src"), F.col("comm").alias("c_src"))
            b = assign_c.select(F.col("vid").alias("dst"), F.col("comm").alias("c_dst"))
            edges_w = (
                edges_w.join(a, "src")
                .join(b, "dst")
                .groupBy(F.col("c_src").alias("src"), F.col("c_dst").alias("dst"))
                .agg(F.sum("w").alias("w"))
            ).localCheckpoint(eager=True)

    return membership.select("vid", F.col("cur").alias("value"))
