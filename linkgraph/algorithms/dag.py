"""DAG operators: topological generations, acyclicity test, longest path.

NetworkX-parity surface (nx.topological_generations /
is_directed_acyclic_graph / dag_longest_path_length) over the engine's
superstep loop — the reference exposes these through its NetworkX-compat
layer (python/graphscope/nx/ forwards builtins to GAE apps where one
exists and falls back otherwise; there is no dedicated C++ DAG app, so
this is engine-native like the other nx-parity families).

Spark shape: Kahn's algorithm as a superstep peel — per round the
frontier is every unassigned vertex whose remaining in-degree is zero;
one ``groupBy(dst).count()`` per round retires the frontier's out-edges.
Rounds = number of generations = longest path length; state is one row
per vertex (vid, indeg, layer) and edges are touched only by the
frontier join, so a round costs O(frontier out-edges) shuffle — the
peel-family shape core_number/onion already use at scale.

The generation index equals the longest path ending at the vertex
(standard Kahn ⇔ longest-path-DP equivalence), which is what the
unrolled SQL oracle replays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph


def _peel(graph: LinkGraph, max_rounds: int):
    """Shared Kahn peel → (assigned_state_df, remaining_count)."""
    edges = graph.edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    edges = edges.distinct().persist()
    indeg0 = edges.groupBy(F.col("dst").alias("vid")).agg(
        F.count("*").alias("indeg")
    )
    state = (
        graph.vertices.select("vid")
        .join(indeg0, "vid", "left")
        .select(
            "vid",
            F.coalesce("indeg", F.lit(0)).cast("long").alias("indeg"),
            F.lit(None).cast("int").alias("layer"),
        )
        .localCheckpoint(eager=True)
    )
    rounds = 0
    while rounds < max_rounds:
        frontier = state.where(F.col("layer").isNull() & (F.col("indeg") == 0))
        n_front = frontier.count()
        if n_front == 0:
            break
        dec = (
            edges.join(frontier.select(F.col("vid").alias("src")), "src")
            .groupBy(F.col("dst").alias("vid"))
            .agg(F.count("*").alias("dec"))
        )
        new_state = (
            state.join(dec, "vid", "left")
            .select(
                "vid",
                (F.col("indeg") - F.coalesce("dec", F.lit(0))).alias("indeg"),
                F.when(
                    F.col("layer").isNull() & (F.col("indeg") == 0), F.lit(rounds)
                )
                .otherwise(F.col("layer"))
                .alias("layer"),
            )
            .localCheckpoint(eager=True)
        )
        state = new_state
        rounds += 1
    remaining = state.where(F.col("layer").isNull()).count()
    edges.unpersist()
    return state, remaining, rounds


def topological_generations(graph: LinkGraph, max_rounds: int = 100_000) -> DataFrame:
    """(vid, layer) — Kahn generation index per vertex; raises (like
    nx.topological_generations' NetworkXUnfeasible) if the graph has a
    cycle. layer(v) = length of the longest path ending at v."""
    state, remaining, _ = _peel(graph, max_rounds)
    if remaining:
        raise ValueError(
            f"topological_generations: graph contains a cycle "
            f"({remaining} vertices unpeelable)"
        )
    return state.select("vid", F.col("layer").cast("long").alias("layer"))


def is_directed_acyclic_graph(graph: LinkGraph, max_rounds: int = 100_000) -> DataFrame:
    """One row (value: boolean) — true iff the Kahn peel consumes every
    vertex (no cycle). Self-loops are cycles in nx terms, but the engine's
    edge tables drop self-loops at build; callers keeping them should
    check separately (documented divergence, matching wcc/cdlp)."""
    spark = graph.edges.sparkSession
    _, remaining, _ = _peel(graph, max_rounds)
    return spark.createDataFrame([(remaining == 0,)], "value boolean")


def dag_longest_path_length(graph: LinkGraph, max_rounds: int = 100_000) -> DataFrame:
    """One row (value: long) — edges on the longest path in the DAG
    (= max generation index); raises on cycles."""
    layers = topological_generations(graph, max_rounds)
    return layers.agg(F.coalesce(F.max("layer"), F.lit(0)).alias("value"))


def transitive_reduction(
    graph: LinkGraph, max_rounds: int = 64, max_pairs: int = 50_000_000
) -> DataFrame:
    """(src, dst) — the DAG's transitive reduction (nx.transitive_reduction
    parity): the unique minimal edge subset with the same reachability.
    An edge (u, v) is dropped iff some other u→v path exists, i.e. iff
    (u, v) has a path of length ≥ 2.

    Spark shape: transitive closure by ITERATIVE DOUBLING — each round
    composes the closure-so-far with itself (``reach ∘ reach``), so a
    depth-D DAG converges in ⌈log₂ D⌉ rounds instead of D edge-join
    rounds (depth 54 → 6 supersteps; the superstep count, not the data
    volume, dominates at driver/test scale). Then ``two_plus = edges ∘
    closure`` and one anti-join keeps the reduction. Closure size is
    O(V·avg-reach) rows of two longs — inherently quadratic on dense
    DAGs, so a loud ``max_pairs`` guard bounds the correctness tier; at
    scale run per topological layer band or on the condensation
    quotient first (reference surface: nx.transitive_reduction has no
    GAE app either — python/graphscope/nx falls back). Raises on cyclic
    input (checked by the Kahn peel, same as topological_generations —
    doubling on a cycle would never converge)."""
    _, remaining, _ = _peel(graph, max_rounds=100_000)
    if remaining:
        raise ValueError("transitive_reduction: graph contains a cycle")
    edges = (
        graph.edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    reach = edges.localCheckpoint(eager=True)
    n_prev = reach.count()
    for _ in range(max_rounds):
        doubled = (
            reach.select(F.col("dst").alias("mid"), F.col("src"))
            .join(reach.select(F.col("src").alias("mid"), "dst"), "mid")
            .select("src", "dst")
        )
        reach = reach.union(doubled).distinct().localCheckpoint(eager=True)
        n = reach.count()
        if n > max_pairs:
            edges.unpersist()
            raise ValueError(
                f"transitive_reduction: closure exceeds max_pairs "
                f"({n} > {max_pairs}) — run per layer band or raise the cap"
            )
        if n == n_prev:
            break
        n_prev = n
    two_plus = (
        edges.select("src", F.col("dst").alias("mid"))
        .join(reach.select(F.col("src").alias("mid"), "dst"), "mid")
        .select("src", "dst")
        .distinct()
    )
    out = edges.join(two_plus, ["src", "dst"], "left_anti").localCheckpoint(
        eager=True
    )
    edges.unpersist()
    return out
