"""PageRank — NetworkX semantics and LDBC fixed-round semantics.

Reference: /root/reference/analytical_engine/apps/pagerank/pagerank_networkx.h
(init :65-74, round :90-156, dangling :83-85,117-126,152-153, convergence
:128-141) and the fixed-round LDBC twin
/root/reference/analytical_engine/benchmarks/apps/pagerank/pagerank.h:123-176.

Per round (α = damping, N = |V|):

    dangling = α · Σ_{deg(u)=0} rank(u)                 (previous round)
    msg(v)   = Σ_{(u,v)∈E, deg(u)>0} rank(u)/deg(u)
    rank'(v) = α·msg(v) + (1-α)/N + dangling/N

Stopping: NetworkX mode — L1 ``Σ|Δ| < tol·N``; LDBC mode — exactly
``max_iter`` rounds.

Spark shape per superstep: one big join (ranks ⋈ edges on src) + one
``groupBy(dst).sum`` shuffle (map-side partial aggregation handles hub
skew for the algebraic sum) + one scalar aggregate that fuses the L1
convergence test with the next round's dangling mass — a single action
per superstep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.superstep import run_supersteps

# Bench instrumentation: rounds/history of the most recent run (driver-side
# scalars only — analogous to the reference's per-round perf logging).
LAST_ROUNDS: int | None = None
LAST_HISTORY: list[dict] | None = None


def _pagerank_impl(
    graph: LinkGraph,
    alpha: float,
    max_iter: int,
    tol: float | None,
    checkpoint_dir: str | None,
    init_ranks: DataFrame | None = None,
    personalization: DataFrame | None = None,
) -> DataFrame:
    spark = graph.edges.sparkSession
    p = spark.sparkContext.defaultParallelism
    # cache edges partitioned on the per-round join key: the big table
    # shuffles once here and never again; only the small state moves. A
    # graph already partitioned+persisted on src (LinkGraph.partitioned)
    # is reused as-is — no second shuffle, no second cache.
    if graph.partition_key == "src":
        edges = graph.edges.select("src", "dst")
        owns_edges = False
    else:
        edges = graph.edges.select("src", "dst").repartition(p, "src").persist()
        owns_edges = True
    n = graph.vertices.count()
    if n == 0:
        return spark.createDataFrame([], "vid long, value double")

    out_deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    verts = graph.vertices.select("vid")
    if init_ranks is not None:
        # warm start (incremental append / nstart): previous values where
        # known, 1/N for vertices added since, renormalized to mass 1 —
        # the unique fixed point makes the converged result identical
        ir = init_ranks.select(
            "vid", F.col(init_ranks.columns[1]).cast("double").alias("r0")
        )
        filled = verts.join(ir, "vid", "left").select(
            "vid", F.coalesce("r0", F.lit(1.0 / n)).alias("r0")
        )
        total = filled.agg(F.sum("r0")).first()[0] or 1.0
        verts = filled.select("vid", (F.col("r0") / F.lit(total)).alias("r0"))
    state0 = (
        verts.join(out_deg.withColumnRenamed("src", "vid"), "vid", "left")
        .select(
            "vid",
            F.coalesce("deg", F.lit(0)).alias("deg"),
            (F.col("r0") if init_ranks is not None else F.lit(1.0 / n)).alias("rank"),
        )
    )
    has_pers = personalization is not None
    if has_pers:
        # NetworkX personalization semantics: teleport AND dangling mass
        # land on p_v (normalized; absent vids get 0). x0 stays uniform.
        pw = personalization.select(
            "vid", F.col(personalization.columns[1]).cast("double").alias("pw")
        )
        tot = pw.agg(F.sum("pw")).first()[0]
        if not tot:
            raise ValueError("personalization weights must not sum to zero")
        pcol = (
            graph.vertices.select("vid")
            .join(pw, "vid", "left")
            .select("vid", (F.coalesce("pw", F.lit(0.0)) / float(tot)).alias("p"))
        )
        state0 = state0.join(pcol, "vid")

    # mutable cross-round scalar: α · Σ rank over dangling vertices
    dangling = {"mass": None}

    def step(state: DataFrame, rnd: int) -> tuple[DataFrame, dict]:
        if dangling["mass"] is None:  # PEval: first round computes it fresh
            dangling["mass"] = (
                state.where(F.col("deg") == 0).agg(F.sum("rank")).first()[0] or 0.0
            ) * alpha
        if has_pers:
            base = (F.lit(1.0 - alpha) + F.lit(dangling["mass"])) * state["p"]
        else:
            base = F.lit((1.0 - alpha) / n + dangling["mass"] / n)
        msgs = (
            state.where(F.col("deg") > 0)
            .join(edges, state["vid"] == edges["src"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("msum"))
        )
        keep = [state["vid"], state["deg"]] + ([state["p"]] if has_pers else [])
        new_state = (
            state.join(msgs, state["vid"] == msgs["dst"], "left")
            .select(
                *keep,
                (alpha * F.coalesce(F.col("msum"), F.lit(0.0)) + base).alias("rank"),
                state["rank"].alias("prev_rank"),
            )
            .persist()
        )
        row = new_state.agg(
            F.sum(F.abs(F.col("rank") - F.col("prev_rank"))).alias("l1"),
            F.sum(F.when(F.col("deg") == 0, F.col("rank")).otherwise(F.lit(0.0))).alias("dg"),
        ).first()
        dangling["mass"] = (row["dg"] or 0.0) * alpha
        return new_state, {"l1": row["l1"] or 0.0}

    if tol is None:
        conv = lambda stats: False  # noqa: E731 — LDBC: fixed rounds
    else:
        conv = lambda stats: stats["l1"] < tol * n  # noqa: E731

    result = run_supersteps(
        state0, step, conv, max_rounds=max_iter, checkpoint_dir=checkpoint_dir
    )
    global LAST_ROUNDS, LAST_HISTORY
    LAST_ROUNDS = result.rounds
    LAST_HISTORY = result.history
    out = result.state.select("vid", F.col("rank").alias("value"))
    if owns_edges:
        edges.unpersist()
    return out


def pagerank_nx(
    graph: LinkGraph,
    alpha: float = 0.85,
    max_iter: int = 100,
    tol: float = 1e-06,
    checkpoint_dir: str | None = None,
    personalization: DataFrame | None = None,
) -> DataFrame:
    """NetworkX-semantics PageRank (gs::PageRankNetworkX,
    /root/reference/python/graphscope/analytical/app/pagerank.py:61-89).

    ``personalization``: optional (vid, weight) DataFrame — teleport and
    dangling mass follow the normalized weights (nx ``pagerank(G,
    personalization=...)``); absent vids teleport nothing.
    """
    return _pagerank_impl(
        graph, alpha, max_iter, tol, checkpoint_dir, personalization=personalization
    )


def pagerank_weighted(
    graph: LinkGraph,
    weights: DataFrame,
    alpha: float = 0.85,
    max_iter: int = 100,
    tol: float | None = 1e-06,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Edge-weighted PageRank (NetworkX ``pagerank(G, weight=...)``
    semantics, which graphscope.nx forwards — transition mass out of u
    splits proportionally to edge weight instead of 1/deg):

        msg(v)  = Σ_{(u,v)∈E, W(u)>0} rank(u) · w(u,v) / W(u),
        W(u)    = Σ_{(u,·)∈E} w(u,·)   (dangling ⇔ W(u) = 0)

    ``weights``: (src, dst, w) — one row per directed edge; parallel
    rows are legal (their weights add, exactly as nx MultiDiGraph).
    ``tol=None`` runs exactly ``max_iter`` rounds (LDBC twin).

    Same superstep shape as the unweighted kernel: the weighted edge
    table shuffles once onto src and is reused every round; per round
    one join + one ``groupBy(dst).sum`` (algebraic — map-side combine
    absorbs hub skew) + one fused L1/dangling scalar aggregate.
    """
    spark = graph.edges.sparkSession
    p = spark.sparkContext.defaultParallelism
    w = weights.columns[2]
    edges = (
        weights.select("src", "dst", F.col(w).cast("double").alias("w"))
        .repartition(p, "src")
        .persist()
    )
    n = graph.vertices.count()
    if n == 0:
        return spark.createDataFrame([], "vid long, value double")
    wout = edges.groupBy("src").agg(F.sum("w").alias("wout"))
    state0 = (
        graph.vertices.select("vid")
        .join(wout.withColumnRenamed("src", "vid"), "vid", "left")
        .select(
            "vid",
            F.coalesce("wout", F.lit(0.0)).alias("wout"),
            F.lit(1.0 / n).alias("rank"),
        )
    )
    dangling = {"mass": None}

    def step(state: DataFrame, rnd: int) -> tuple[DataFrame, dict]:
        if dangling["mass"] is None:
            dangling["mass"] = (
                state.where(F.col("wout") == 0.0).agg(F.sum("rank")).first()[0] or 0.0
            ) * alpha
        base = F.lit((1.0 - alpha) / n + dangling["mass"] / n)
        msgs = (
            state.where(F.col("wout") > 0.0)
            .join(edges, state["vid"] == edges["src"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("w") / F.col("wout")).alias("msum"))
        )
        new_state = (
            state.join(msgs, state["vid"] == msgs["dst"], "left")
            .select(
                state["vid"],
                state["wout"],
                (alpha * F.coalesce(F.col("msum"), F.lit(0.0)) + base).alias("rank"),
                state["rank"].alias("prev_rank"),
            )
            .persist()
        )
        row = new_state.agg(
            F.sum(F.abs(F.col("rank") - F.col("prev_rank"))).alias("l1"),
            F.sum(
                F.when(F.col("wout") == 0.0, F.col("rank")).otherwise(F.lit(0.0))
            ).alias("dg"),
        ).first()
        dangling["mass"] = (row["dg"] or 0.0) * alpha
        return new_state, {"l1": row["l1"] or 0.0}

    if tol is None:
        conv = lambda stats: False  # noqa: E731
    else:
        conv = lambda stats: stats["l1"] < tol * n  # noqa: E731
    result = run_supersteps(
        state0, step, conv, max_rounds=max_iter, checkpoint_dir=checkpoint_dir
    )
    out = result.state.select("vid", F.col("rank").alias("value"))
    edges.unpersist()
    return out


def pagerank(
    graph: LinkGraph,
    delta: float = 0.85,
    max_round: int = 10,
    checkpoint_dir: str | None = None,
    personalization: DataFrame | None = None,
) -> DataFrame:
    """Fixed-round LDBC-style PageRank (grape::PageRankAuto,
    /root/reference/python/graphscope/analytical/app/pagerank.py:29-56)."""
    return _pagerank_impl(
        graph, delta, max_round, None, checkpoint_dir, personalization=personalization
    )
