"""Maximal independent set + greedy coloring — deterministic Luby /
Jones–Plassmann rounds (public formulas: Luby, SIAM J. Comput. 1986,
"A simple parallel algorithm for the maximal independent set problem";
Jones & Plassmann, SIAM J. Sci. Comput. 1993, "A parallel graph coloring
heuristic").

Beyond the reference's builtin registry (like scc.py — flagged as such in
SURVEY §2), but the same superstep fabric as its label-propagation apps
(/root/reference/analytical_engine/apps/): per round, an undecided vertex
joins the MIS when its priority is a strict local minimum among undecided
neighbors; winners and their neighborhoods leave the undecided set. With
a fixed priority this classic Luby process is fully deterministic, and
``md5(vid:seed)`` keeps it engine-portable (paths.py:428 idiom), so a
DuckDB oracle can replay the exact same rounds — ties broken by vid, so
even a hash collision between neighbors cannot deadlock or diverge.

Scale shape: each round is one edge-sized join + a per-destination
``min(struct(p, vid))`` aggregation (map-side combinable) + two
broadcast-sized anti-joins (winners and their neighborhoods shrink
geometrically — Luby removes a constant fraction of edges per round in
expectation, O(log n) rounds w.h.p.). State rides the superstep loop
with flat lineage; no driver-side iteration over rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph

# per-call round count of the most recent run (tests / oracle sizing)
LAST_ROUNDS: int | None = None


def _priority(col, seed: int):
    """Engine-portable priority: the md5 hex string itself, compared
    lexicographically (identical in Spark and DuckDB; no base-conversion
    builtin needed on either side)."""
    return F.md5(F.concat_ws(":", col.cast("string"), F.lit(str(seed))))


def maximal_independent_set(
    graph: LinkGraph, seed: int = 42, max_rounds: int = 60
) -> DataFrame:
    """Deterministic Luby MIS over the undirected simple graph.

    Returns ``(vid, value)`` with value = the 1-based round at which the
    vertex entered the set (vertices not in the MIS are absent).
    Independence and maximality are exact; the specific set is the one
    the seeded priorities select, identical at any parallelism.
    """
    global LAST_ROUNDS
    spark = graph.edges.sparkSession
    e = graph.edges.select("src", "dst")
    und = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    und.count()

    undecided = graph.vertices.select(
        "vid", _priority(F.col("vid"), seed).alias("p")
    ).localCheckpoint(eager=True)
    winners_acc: DataFrame | None = None

    rounds = 0
    for rnd in range(1, max_rounds + 1):
        # smallest (p, vid) among each vertex's undecided neighbors
        nbr_min = (
            und.join(undecided.select(F.col("vid").alias("dst"), "p"), "dst")
            .groupBy("src")
            .agg(F.min(F.struct("p", F.col("dst").alias("vid"))).alias("m"))
            .select(F.col("src").alias("vid"), "m")
        )
        winners = (
            undecided.join(nbr_min, "vid", "left")
            .where(
                F.col("m").isNull()
                | (F.struct("p", "vid") < F.col("m"))
            )
            .select("vid", F.lit(rnd).alias("value"))
            .localCheckpoint(eager=True)
        )
        n_win = winners.count()
        rounds = rnd
        if n_win == 0:
            break
        winners_acc = (
            winners if winners_acc is None else winners_acc.unionByName(winners)
        )
        touched = winners.select("vid").unionByName(
            und.join(winners.select(F.col("vid").alias("src")), "src").select(
                F.col("dst").alias("vid")
            )
        )
        undecided = undecided.join(touched, "vid", "left_anti").localCheckpoint(
            eager=True
        )
        if undecided.limit(1).count() == 0:
            break
    else:
        if undecided.limit(1).count() != 0:
            und.unpersist()
            raise RuntimeError(
                f"maximal_independent_set: not converged after {max_rounds} "
                "rounds (Luby needs O(log n) w.h.p.) — raise max_rounds"
            )

    und.unpersist()
    LAST_ROUNDS = rounds
    if winners_acc is None:
        return graph.vertices.select("vid", F.lit(0).alias("value")).limit(0)
    return winners_acc.localCheckpoint(eager=True)


def greedy_color(
    graph: LinkGraph, seed: int = 42, max_rounds: int = 200
) -> DataFrame:
    """Deterministic Jones–Plassmann greedy coloring.

    A vertex colors itself once every *smaller-(p, vid)* neighbor is
    colored, taking the smallest color unused by already-colored
    neighbors (the mex). Each round's ready set is exactly Luby's winner
    rule — an independent set — so same-round vertices can never
    conflict, the coloring is proper, uses ≤ Δ+1 colors, and is
    identical at any parallelism (same md5 priorities as
    :func:`maximal_independent_set`, so the DuckDB oracle replays it
    round for round).

    Scale shape per round: one edge-sized join against the undecided
    set (min-struct, map-side combinable) + one against the colored set
    (``collect_set`` of neighbor colors, bounded by degree); rounds =
    the longest priority-decreasing path, O(log n) w.h.p.

    Returns ``(vid, value)`` with value = the assigned color (every
    vertex present).
    """
    spark = graph.edges.sparkSession
    e = graph.edges.select("src", "dst")
    und = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    und.count()

    undecided = graph.vertices.select(
        "vid", _priority(F.col("vid"), seed).alias("p")
    ).localCheckpoint(eager=True)
    colored: DataFrame | None = None

    for _ in range(1, max_rounds + 1):
        nbr_min = (
            und.join(undecided.select(F.col("vid").alias("dst"), "p"), "dst")
            .groupBy("src")
            .agg(F.min(F.struct("p", F.col("dst").alias("vid"))).alias("m"))
            .select(F.col("src").alias("vid"), "m")
        )
        ready = (
            undecided.join(nbr_min, "vid", "left")
            .where(F.col("m").isNull() | (F.struct("p", "vid") < F.col("m")))
            .select("vid")
        )
        if colored is not None:
            nbr_colors = (
                und.join(colored.select(F.col("vid").alias("dst"), "value"), "dst")
                .groupBy("src")
                .agg(F.collect_set("value").alias("cs"))
                .select(F.col("src").alias("vid"), "cs")
            )
            newly = (
                ready.join(nbr_colors, "vid", "left")
                .select(
                    "vid",
                    F.when(F.col("cs").isNull(), F.lit(0))
                    .otherwise(
                        F.array_min(
                            F.array_except(
                                F.sequence(F.lit(0), F.size("cs")), F.col("cs")
                            )
                        )
                    )
                    .alias("value"),
                )
            )
        else:
            newly = ready.select("vid", F.lit(0).alias("value"))
        newly = newly.localCheckpoint(eager=True)
        if newly.limit(1).count() == 0:
            break
        colored = (
            newly
            if colored is None
            else colored.unionByName(newly).localCheckpoint(eager=True)
        )
        undecided = undecided.join(newly, "vid", "left_anti").localCheckpoint(
            eager=True
        )
    else:
        if undecided.limit(1).count() != 0:
            und.unpersist()
            raise RuntimeError(
                f"greedy_color: not converged after {max_rounds} rounds — "
                "raise max_rounds"
            )

    und.unpersist()
    if colored is None:
        return graph.vertices.select("vid", F.lit(0).alias("value")).limit(0)
    return colored


def dominating_set(graph: LinkGraph, seed: int = 42) -> DataFrame:
    """(vid) — a dominating set of the undirected simple view: every
    vertex is in the set or adjacent to a member.

    nx.dominating_set contract (SOME valid dominating set; nx's own
    greedy is arbitrary-order too). Implementation: the deterministic
    Luby maximal independent set — ANY maximal independent set
    dominates, since maximality means every excluded vertex has a
    selected neighbor — so this inherits MIS's parallel round structure
    and parallelism-independence instead of a sequential greedy scan.
    Isolated vertices enter the MIS (degree 0 ⇒ priority argmax of
    their own closed neighborhood), so they are covered too."""
    return maximal_independent_set(graph, seed=seed).select("vid")
