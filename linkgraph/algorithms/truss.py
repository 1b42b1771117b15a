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

Scale shape: each peel round is one adjacency join per wedge arm + an
EXISTS semi-join + a per-edge count (all equi hash joins, map-side
combinable; AQE handles the shrinking edge set). Rounds = peeling depth,
and every round re-enumerates wedges — at 1e8+ edges each round costs
what triangle counting costs.

``truss_decomposition`` is the fast tier: triangles are materialized
ONCE, then each round updates every edge's support estimate to the
h-index of {min(est(e1), est(e2))} over its triangles — the edge analog
of Lü et al.'s h-index coreness iteration, converging from above to the
truss support number τ(e) = trussness(e) − 2 (Sariyüce, Seshadhri &
Pinar, "Local algorithms for hierarchical dense subgraph discovery",
VLDB 2018). Per-round cost is two hash joins + one groupBy over
3·|triangles| incidence rows, fully decoupled from wedge enumeration;
``k_truss(..., method='hindex')`` filters τ ≥ k−2 (the k-truss IS the
set of edges with trussness ≥ k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph

# rounds taken by the most recent k_truss call (tests / oracle sizing)
LAST_ROUNDS: int | None = None
# per-iteration wall seconds of the most recent truss_decomposition call
# (bench instrumentation — BENCH/run_truss_hindex.py)
LAST_ITER_SECS: list[float] | None = None


def k_truss(
    graph: LinkGraph, k: int, max_rounds: int = 200, method: str = "peel"
) -> DataFrame:
    """Edges ``(lo, hi)`` of the k-truss of the undirected simple graph.

    ``k >= 3`` (the 2-truss is every edge; peeling is defined on triangle
    support). ``method='peel'``: synchronous peel — each round drops ALL
    edges whose support in the current subgraph is < k-2, so the
    fixpoint is canonical. ``method='hindex'``: the fast tier — filter
    ``truss_decomposition`` at trussness ≥ k (identical edge set: the
    k-truss is exactly the trussness-≥-k edges) without any per-round
    wedge re-enumeration.
    """
    global LAST_ROUNDS
    if k < 3:
        raise ValueError("k_truss requires k >= 3 (2-truss is the whole graph)")
    if method == "hindex":
        dec = truss_decomposition(graph, max_iters=max_rounds)
        return dec.where(F.col("trussness") >= k).select("lo", "hi")
    if method != "peel":
        raise ValueError(f"k_truss: unknown method {method!r} (peel|hindex)")
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


def truss_decomposition(graph: LinkGraph, max_iters: int = 100) -> DataFrame:
    """(lo, hi, trussness) for EVERY edge of the simple undirected graph;
    trussness = max k with the edge inside the k-truss (triangle-free
    edges get 2). Synchronous h-index iteration over a one-shot
    triangle-edge incidence table — see the module docstring for the
    convergence citation and the per-round cost shape."""
    from linkgraph.algorithms.cliques import triangle_triples
    from linkgraph.graph import packed_pair

    if not graph.pair_key_packable():
        raise ValueError(
            "truss_decomposition: needs vids in [0, 2^31) to pack edge keys"
        )
    edges = graph.simple_undirected_edges().localCheckpoint(eager=True)
    tri = triangle_triples(graph).select(
        packed_pair("a", "b").alias("e1"),
        packed_pair("a", "c").alias("e2"),
        packed_pair("b", "c").alias("e3"),
    )
    inc = (
        tri.select(F.col("e1").alias("e"), F.col("e2").alias("o1"), F.col("e3").alias("o2"))
        .union(tri.select("e2", "e1", "e3"))
        .union(tri.select("e3", "e1", "e2"))
    ).localCheckpoint(eager=True)

    global LAST_ITER_SECS
    LAST_ITER_SECS = []
    import time as _time

    est = inc.groupBy("e").agg(F.count("*").cast("int").alias("est")).localCheckpoint(
        eager=True
    )
    for _ in range(max_iters):
        _t0 = _time.time()
        contrib = (
            inc.join(est.select(F.col("e").alias("o1"), F.col("est").alias("s1")), "o1")
            .join(est.select(F.col("e").alias("o2"), F.col("est").alias("s2")), "o2")
            .select("e", F.least("s1", "s2").alias("c"))
        )
        arr = F.sort_array(F.collect_list("c"), asc=False)
        new_est = contrib.groupBy("e").agg(
            F.aggregate(
                F.zip_with(
                    arr,
                    F.sequence(F.lit(1), F.size(arr)),
                    lambda v, i: (v >= i).cast("int"),
                ),
                F.lit(0),
                lambda acc, x: acc + x,
            ).alias("est")
        ).localCheckpoint(eager=True)
        changed = (
            new_est.join(est.withColumnRenamed("est", "prev"), "e")
            .where(F.col("est") != F.col("prev"))
            .count()
        )
        est = new_est
        LAST_ITER_SECS.append(_time.time() - _t0)
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"truss_decomposition: not converged after {max_iters} iterations"
        )
    keyed = edges.withColumn("e", packed_pair("lo", "hi"))
    return (
        keyed.join(est, "e", "left")
        .select(
            "lo",
            "hi",
            (F.coalesce(F.col("est"), F.lit(0)) + F.lit(2)).cast("int").alias("trussness"),
        )
    )
