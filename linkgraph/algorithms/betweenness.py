"""Betweenness centrality — Brandes dependency accumulation, all sources
level-parallel; generic variant with ``endpoints`` and ``weight``.

Reference: gs::BetweennessCentrality / gs::BetweennessCentralityGeneric
(/root/reference/coordinator/gscoordinator/builtin/app/.gs_conf.yaml:238-250,
apps/centrality/betweenness/betweenness_centrality_generic.h — BFS for
unweighted, Dijkstra for weighted, ``ctx.endpoints`` added per reached
vertex). Semantics follow NetworkX ``betweenness_centrality`` on the
directed graph: for every ordered source s, count shortest paths σ_s(v),
then accumulate dependencies backward over the shortest-path DAG:

    δ_s(v) = Σ_{w : v ∈ pred_s(w)} σ_s(v)/σ_s(w) · (1 + δ_s(w))
    bc(v)  = Σ_{s ≠ v} δ_s(v)        [· 1/((n-1)(n-2)) if normalized]

With ``endpoints=True`` every reached vertex additionally counts the
paths it terminates (bc(w) += δ(w)+1 per source reaching it, bc(s) +=
|reached|−1; normalization 1/(n(n−1))), matching NetworkX
``_accumulate_endpoints`` and the reference's ``ctx.endpoints`` term.

Spark shape: instead of looping over sources (the reference's per-source
fan-out), *all* sources advance together — the forward phase is a
multi-source BFS carrying path counts, one DataFrame job per level; the
backward phase walks levels in reverse, one job per level. State is
``(root, vid, dist, sigma)`` — O(V²) worst case, inherent to exact
betweenness; ``sources`` allows the standard sampled approximation at
scale.

Weighted (``weight=<col>``): the forward phase is frontier Bellman-Ford
(only improved vertices re-relax — the label-correcting equivalent of
the reference's per-source Dijkstra, but batched over all sources), then
the shortest-path DAG (edges with dist(u)+w(u,v)=dist(v)) is layered by
*longest-hop* rank so σ and δ can be finalized one layer per job exactly
as the unweighted level walk does. Weights must be positive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph

_EPS = 1e-9


def _fresh(df: DataFrame) -> DataFrame:
    """Re-project through explicit aliases, minting new attribute ids.

    Union over outputs of alias-deduped self-joins can trip Catalyst's
    constraint rewriting (NoSuchElementException in rewriteConstraints);
    a fresh projection severs the stale attribute references."""
    return df.select(*[F.col(c).alias(c) for c in df.columns])


def betweenness_centrality(
    graph: LinkGraph,
    normalized: bool = True,
    sources: DataFrame | None = None,
    max_depth: int = 10_000,
    endpoints: bool = False,
    weight: str | None = None,
) -> DataFrame:
    """(vid, value). ``sources`` restricts the source set (sampled BC);
    ``endpoints`` counts path endpoints; ``weight`` names a positive
    edge-weight column (Dijkstra semantics)."""
    spark = graph.edges.sparkSession
    n = graph.vertices.count()
    if n == 0:
        return spark.createDataFrame([], "vid long, value double")

    if sources is None:
        roots = graph.vertices.select(F.col("vid").alias("root"))
    else:
        roots = sources.select(F.col(sources.columns[0]).alias("root")).distinct()

    if weight is not None:
        acc, seen = _weighted_phases(graph, roots, weight, max_depth, endpoints)
    else:
        acc, seen = _unweighted_phases(graph, roots, max_depth, endpoints)

    if endpoints:
        # bc(s) += |reached from s| − 1  (seen includes the root itself)
        src_term = (
            seen.groupBy("root")
            .agg((F.count(F.lit(1)) - F.lit(1)).cast("double").alias("value"))
            .select(F.col("root").alias("vid"), "value")
        )
        acc = acc.union(src_term)

    bc = acc.groupBy("vid").agg(F.sum("value").alias("value"))
    if endpoints:
        scale = 1.0 / (n * (n - 1)) if (normalized and n > 1) else 1.0
    else:
        scale = 1.0 / ((n - 1) * (n - 2)) if (normalized and n > 2) else 1.0
    if sources is not None:
        # sampled estimator: raw sums cover only |sources| roots — rescale
        # by n/k exactly as NetworkX's _rescale does for k-sample BC
        k = roots.count()
        if k:
            scale *= n / k
    return (
        graph.vertices.select("vid")
        .join(bc, "vid", "left")
        .select("vid", (F.coalesce("value", F.lit(0.0)) * F.lit(scale)).alias("value"))
    )


def edge_betweenness_centrality(
    graph: LinkGraph,
    normalized: bool = True,
    sources: DataFrame | None = None,
    max_depth: int = 10_000,
    weight: str | None = None,
) -> DataFrame:
    """(src, dst, value) — nx.edge_betweenness_centrality on the directed
    graph: for every shortest-path-DAG edge (v, w),
    ebc(v,w) = Σ_s σ_s(v)/σ_s(w) · (1 + δ_s(w)), normalized by 1/(n(n−1))
    (the nx directed rescale). Same level-parallel all-sources Brandes as
    the vertex variant — the per-edge contributions ARE the terms the
    backward walk already computes before its per-vertex aggregation, so
    edge mode only keys them by (v, w) instead of folding them into δ(v).
    ``sources`` gives the k-sample estimator (×n/k); ``weight`` names a
    positive edge-weight column (Dijkstra DAG — the per-edge terms are
    then computed once after the layered walk finalizes δ, see
    _weighted_phases). nx-parity extension (reference ships vertex BC
    only)."""
    spark = graph.edges.sparkSession
    n = graph.vertices.count()
    if n == 0:
        return spark.createDataFrame([], "src long, dst long, value double")
    if sources is None:
        roots = graph.vertices.select(F.col("vid").alias("root"))
    else:
        roots = sources.select(F.col(sources.columns[0]).alias("root")).distinct()
    if weight is not None:
        _, _, eacc = _weighted_phases(
            graph, roots, weight, max_depth, endpoints=False, collect_edges=True
        )
    else:
        _, _, eacc = _unweighted_phases(
            graph, roots, max_depth, endpoints=False, collect_edges=True
        )
    ebc = eacc.groupBy("esrc", "edst").agg(F.sum("value").alias("value"))
    scale = 1.0 / (n * (n - 1)) if (normalized and n > 1) else 1.0
    if sources is not None:
        k = roots.count()
        if k:
            scale *= n / k
    return (
        graph.edges.select("src", "dst")
        .distinct()
        .join(
            ebc,
            (F.col("src") == F.col("esrc")) & (F.col("dst") == F.col("edst")),
            "left",
        )
        .select(
            "src",
            "dst",
            (F.coalesce("value", F.lit(0.0)) * F.lit(scale)).alias("value"),
        )
    )


def _unweighted_phases(graph, roots, max_depth, endpoints, collect_edges=False):
    """Forward multi-source BFS + backward level walk.

    Returns (acc, seen[, eacc]): acc = (vid, value) raw dependency
    contributions, seen = (root, vid, …) reached set (for the endpoints
    source term); with ``collect_edges`` a third (esrc, edst, value)
    per-DAG-edge contribution table is returned (edge betweenness).
    """
    spark = graph.edges.sparkSession
    edges = graph.edges.select("src", "dst").distinct().persist()

    # ---- forward: multi-source BFS with path counting ----
    level = roots.select(
        "root", F.col("root").alias("vid"), F.lit(1.0).alias("sigma")
    ).localCheckpoint(eager=True)
    seen = level.select("root", "vid", F.lit(0).alias("dist"), "sigma").localCheckpoint(
        eager=True
    )
    levels = [level]  # levels[d] = (root, vid, sigma) at distance d
    d = 0
    while d < max_depth:
        nxt = (
            level.join(edges, level["vid"] == edges["src"])
            .select("root", F.col("dst").alias("vid"), "sigma")
            .join(seen.select("root", "vid"), ["root", "vid"], "left_anti")
            .groupBy("root", "vid")
            .agg(F.sum("sigma").alias("sigma"))
            .localCheckpoint(eager=True)
        )
        if nxt.limit(1).count() == 0:
            break
        d += 1
        seen = seen.union(
            nxt.select("root", "vid", F.lit(d).alias("dist"), "sigma")
        ).localCheckpoint(eager=True)
        levels.append(nxt)
        level = nxt

    # ---- backward: dependency accumulation, deepest level first ----
    # delta rows exist only where non-zero; the deepest level starts at 0
    delta = spark.createDataFrame([], "root long, vid long, delta double")
    acc = spark.createDataFrame([], "vid long, value double")
    eacc = spark.createDataFrame([], "esrc long, edst long, value double")
    per_w = (F.col("delta") + F.lit(1.0)) if endpoints else F.col("delta")
    for lvl in range(len(levels) - 1, 0, -1):
        w_rows = levels[lvl].join(delta, ["root", "vid"], "left").select(
            "root", "vid", "sigma", F.coalesce("delta", F.lit(0.0)).alias("delta")
        )
        # this level's delta is final — accumulate its bc contribution
        acc = acc.union(
            w_rows.where(F.col("vid") != F.col("root")).select(
                "vid", per_w.alias("value")
            )
        ).localCheckpoint(eager=True)
        # contribution flows from w back to each predecessor v on the SP DAG:
        # v at level-1 with edge v→w
        contrib = (
            w_rows.join(edges, w_rows["vid"] == edges["dst"])
            .select(
                "root",
                F.col("src").alias("pvid"),
                F.col("dst").alias("wvid"),
                ((F.lit(1.0) + F.col("delta")) / F.col("sigma")).alias("per_sigma"),
            )
        )
        prev = levels[lvl - 1]
        joined = prev.join(
            contrib,
            (prev["root"] == contrib["root"]) & (prev["vid"] == contrib["pvid"]),
        ).select(
            prev["root"].alias("root"),
            prev["vid"].alias("vid"),
            F.col("wvid"),
            (prev["sigma"] * F.col("per_sigma")).alias("c"),
        )
        if collect_edges:
            # each joined row IS one root's contribution to DAG edge
            # (v=vid, w=wvid): σ_v·(1+δ_w)/σ_w — edge betweenness keys it
            # by the edge instead of folding into δ(v)
            eacc = eacc.union(
                joined.select(
                    F.col("vid").alias("esrc"),
                    F.col("wvid").alias("edst"),
                    F.col("c").alias("value"),
                )
            ).localCheckpoint(eager=True)
        delta = (
            joined.groupBy("root", "vid")
            .agg(F.sum("c").alias("delta"))
            .localCheckpoint(eager=True)
        )
    edges.unpersist()
    if collect_edges:
        return acc, seen, eacc
    return acc, seen


def _weighted_phases(graph, roots, weight, max_depth, endpoints, collect_edges=False):
    """Weighted Brandes: Bellman-Ford dist fixpoint, longest-hop DAG
    layering, then layered σ forward / δ backward passes."""
    spark = graph.edges.sparkSession
    edges = (
        graph.edges.select(
            "src", "dst", F.col(weight).cast("double").alias("w")
        )
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w"))  # parallel edges: shortest wins
        .persist()
    )
    if edges.where(F.col("w") <= 0).limit(1).count() > 0:
        edges.unpersist()
        raise ValueError("weighted betweenness requires positive edge weights")

    # ---- dist: frontier Bellman-Ford (batched all-sources Dijkstra).
    # merge step is union + one aggregation (no self-joins: alias-deduped
    # self-joins leave stale attribute refs in checkpointed constraints) ----
    dist = roots.select(
        "root", F.col("root").alias("vid"), F.lit(0.0).alias("dist")
    ).localCheckpoint(eager=True)
    frontier = dist
    rounds = 0
    while rounds < max_depth:
        cand = (
            frontier.join(edges, frontier["vid"] == edges["src"])
            .select("root", F.col("dst").alias("vid"), (F.col("dist") + F.col("w")).alias("nd"))
        )
        merged = dist.select(
            "root", "vid", F.col("dist").alias("d"), F.lit(0).alias("is_new")
        ).union(cand.select("root", "vid", F.col("nd").alias("d"), F.lit(1).alias("is_new")))
        agg = (
            merged.groupBy("root", "vid")
            .agg(
                F.min("d").alias("nd"),
                F.min(F.when(F.col("is_new") == 0, F.col("d"))).alias("old"),
            )
            .localCheckpoint(eager=True)
        )
        improved = agg.where(
            F.col("old").isNull()
            | (
                F.col("nd")
                < F.col("old") - F.lit(_EPS) * F.greatest(F.lit(1.0), F.abs(F.col("old")))
            )
        ).select("root", "vid", F.col("nd").alias("dist"))
        if improved.limit(1).count() == 0:
            break
        dist = agg.select("root", "vid", F.col("nd").alias("dist")).localCheckpoint(
            eager=True
        )
        frontier = improved.localCheckpoint(eager=True)
        rounds += 1

    # ---- shortest-path DAG: edges with dist(u) + w = dist(v) ----
    du = dist.select("root", F.col("vid").alias("src"), F.col("dist").alias("du"))
    dv = dist.select("root", F.col("vid").alias("dst"), F.col("dist").alias("dv"))
    dag = (
        edges.join(du, "src")
        .join(dv, ["root", "dst"])
        .where(
            # relative tolerance: with large weights / long paths the
            # accumulated float error scales with |dv|, so an absolute
            # epsilon would silently drop (or add) DAG edges
            F.abs(F.col("du") + F.col("w") - F.col("dv"))
            < F.lit(_EPS) * F.greatest(F.lit(1.0), F.abs(F.col("dv")))
        )
        .select("root", "src", "dst")
        .persist()
    )
    dag.count()

    # ---- longest-hop layering h(v): DAG edge u→v forces h(v) ≥ h(u)+1,
    # so a layer's σ/δ only depends on strictly lower/higher layers ----
    h = roots.select("root", F.col("root").alias("vid"), F.lit(0).alias("h")).localCheckpoint(
        eager=True
    )
    frontier = h
    rounds = 0
    while rounds < max_depth:
        cand = (
            frontier.alias("f")
            .join(
                dag.alias("g"),
                (F.col("f.vid") == F.col("g.src")) & (F.col("f.root") == F.col("g.root")),
            )
            .select(
                F.col("g.root").alias("root"),
                F.col("g.dst").alias("vid"),
                (F.col("f.h") + 1).alias("nh"),
            )
        )
        merged = h.select("root", "vid", F.col("h").alias("x"), F.lit(0).alias("is_new")).union(
            cand.select("root", "vid", F.col("nh").alias("x"), F.lit(1).alias("is_new"))
        )
        agg = (
            merged.groupBy("root", "vid")
            .agg(
                F.max("x").alias("nh"),
                F.max(F.when(F.col("is_new") == 0, F.col("x"))).alias("old"),
            )
            .localCheckpoint(eager=True)
        )
        improved = agg.where(F.col("old").isNull() | (F.col("nh") > F.col("old"))).select(
            "root", "vid", F.col("nh").alias("h")
        )
        if improved.limit(1).count() == 0:
            break
        h = agg.select("root", "vid", F.col("nh").alias("h")).localCheckpoint(eager=True)
        frontier = improved.localCheckpoint(eager=True)
        rounds += 1
    max_h = h.agg(F.max("h")).first()[0] or 0

    # ---- σ forward, one finalized layer per job ----
    layer0 = roots.select("root", F.col("root").alias("vid"), F.lit(1.0).alias("sigma"))
    layers = [layer0.localCheckpoint(eager=True)]
    known = layers[0]
    for d in range(1, max_h + 1):
        members = h.where(F.col("h") == d).select("root", "vid")
        s_d = (
            known.alias("k")
            .join(
                dag.alias("g"),
                (F.col("k.vid") == F.col("g.src")) & (F.col("k.root") == F.col("g.root")),
            )
            .select(
                F.col("g.root").alias("root"),
                F.col("g.dst").alias("vid"),
                F.col("k.sigma").alias("sigma"),
            )
            .join(members, ["root", "vid"])
            .groupBy("root", "vid")
            .agg(F.sum("sigma").alias("sigma"))
            .localCheckpoint(eager=True)
        )
        layers.append(s_d)
        known = _fresh(known.union(_fresh(s_d))).localCheckpoint(eager=True)

    # ---- δ backward, deepest layer first ----
    acc = spark.createDataFrame([], "vid long, value double")
    final = spark.createDataFrame([], "root long, vid long, sigma double, delta double")
    per_w = (F.col("delta") + F.lit(1.0)) if endpoints else F.col("delta")
    for d in range(max_h, 0, -1):
        wpart = final.select(
            "root", F.col("vid").alias("wvid"),
            ((F.lit(1.0) + F.col("delta")) / F.col("sigma")).alias("per_sigma"),
        )
        contrib = (
            dag.alias("g")
            .join(
                wpart.alias("wp"),
                (F.col("g.dst") == F.col("wp.wvid")) & (F.col("g.root") == F.col("wp.root")),
            )
            .select(
                F.col("g.root").alias("root"),
                F.col("g.src").alias("vid"),
                F.col("wp.per_sigma").alias("per_sigma"),
            )
            .groupBy("root", "vid")
            .agg(F.sum("per_sigma").alias("psum"))
        )
        lay = layers[d]
        lay_final = (
            lay.join(contrib, ["root", "vid"], "left")
            .select(
                "root", "vid", "sigma",
                (F.col("sigma") * F.coalesce("psum", F.lit(0.0))).alias("delta"),
            )
            .localCheckpoint(eager=True)
        )
        final = _fresh(final.union(_fresh(lay_final))).localCheckpoint(eager=True)
        acc = acc.union(
            lay_final.where(F.col("vid") != F.col("root")).select("vid", per_w.alias("value"))
        ).localCheckpoint(eager=True)

    seen = dist  # (root, vid, dist) — reached set incl. root
    if collect_edges:
        # per-DAG-edge terms σ_v·(1+δ_w)/σ_w, computed ONCE at the end
        # (δ is final everywhere): the per-layer contrib joins above
        # revisit a (v, w) pair at every layer between v and w, so
        # collecting there would double-count — one join here doesn't.
        wterm = final.select(
            "root",
            F.col("vid").alias("dst"),
            ((F.lit(1.0) + F.col("delta")) / F.col("sigma")).alias("per_sigma"),
        )
        vsig = known.select(
            "root", F.col("vid").alias("src"), F.col("sigma").alias("vsigma")
        )
        eacc = (
            dag.join(wterm, ["root", "dst"])
            .join(vsig, ["root", "src"])
            .select(
                F.col("src").alias("esrc"),
                F.col("dst").alias("edst"),
                (F.col("vsigma") * F.col("per_sigma")).alias("value"),
            )
            .localCheckpoint(eager=True)
        )
        edges.unpersist()
        dag.unpersist()
        return acc, seen, eacc
    edges.unpersist()
    dag.unpersist()
    return acc, seen
