"""Path queries: sssp_path / sssp_has_path / is_simple_path / bfs_generic,
plus multi-source BFS utilities (closeness centrality, average shortest
path length, all-pairs shortest path lengths).

References:
- gs::SSSPPath / gs::SSSPHasPath
  (/root/reference/coordinator/gscoordinator/builtin/app/.gs_conf.yaml:49-59;
  impls apps/sssp/sssp_path.h, sssp_has_path.h) — path extraction via
  predecessor tracking / reachability.
- gs::IsSimplePath (yaml:222-224, apps/simple_path/is_simple_path.h) —
  validate a node list is a simple path.
- gs::BFSGeneric (yaml:96-98, apps/bfs/bfs_generic.h) — NetworkX
  bfs_edges/bfs_predecessors/bfs_successors/bfs_tree formats
  (/root/reference/python/graphscope/nx/algorithms/builtin.py:358-506).
- gs::ClosenessCentrality (yaml:166-168,
  apps/centrality/closeness_centrality.h) — Wasserman-Faust improved
  closeness over *incoming* distances (NetworkX semantics).
- gs::SSSPAverageLength (yaml:63-65, apps/sssp/sssp_average_length.h) —
  mean pairwise shortest-path distance over connected pairs.
- gs::AllPairsShortestPathLength (yaml:172-174).

The multi-source kernel keeps a frontier of ``(root, vid)`` pairs and
expands all roots simultaneously — one DataFrame job per BFS level for
*all* sources (the Spark-friendly shape: level-parallel, not
source-loop), with the usual flat-lineage superstep loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.superstep import run_supersteps

# instrumentation: doubling rounds of the most recent sssp_path extraction
LAST_SSSP_PATH_ROUNDS: int | None = None


def bfs_parents(graph: LinkGraph, src: int, max_depth: int = 10_000) -> DataFrame:
    """(vid, depth, parent) — BFS tree from ``src``; deterministic parent
    choice = smallest-vid predecessor at the discovering level. Unreached
    vertices are absent."""
    edges = graph.edges.select("src", "dst").persist()
    spark = graph.edges.sparkSession
    state0 = spark.createDataFrame(
        [(src, 0, None)], "vid long, depth long, parent long"
    ).withColumn("changed", F.lit(True))

    def step(state: DataFrame, rnd: int) -> tuple[DataFrame, dict]:
        frontier = state.where(F.col("changed")).select("vid")
        cand = (
            frontier.join(edges, frontier["vid"] == edges["src"])
            .groupBy("dst")
            .agg(F.min(edges["src"]).alias("parent"))
        )
        nxt = cand.join(state.select("vid"), cand["dst"] == state["vid"], "left_anti")
        new_state = state.select("vid", "depth", "parent").withColumn(
            "changed", F.lit(False)
        ).union(
            nxt.select(
                F.col("dst").alias("vid"),
                F.lit(rnd).cast("long").alias("depth"),
                F.col("parent"),
                F.lit(True).alias("changed"),
            )
        )
        new_state = new_state.persist()
        n = new_state.agg(F.sum(F.col("changed").cast("long"))).first()[0] or 0
        return new_state, {"changed": n}

    res = run_supersteps(state0, step, lambda s: s["changed"] == 0, max_rounds=max_depth)
    out = res.state.select("vid", "depth", "parent")
    edges.unpersist()
    return out


def bfs_generic(graph: LinkGraph, src: int, format: str = "edges") -> DataFrame:
    """NetworkX-style BFS outputs over the BFS tree from ``src``.

    format ∈ {edges, predecessors, successors, tree}:
    - edges / tree: (src, dst) tree edges
    - predecessors: (vid, predecessor)
    - successors: (vid, successors array, sorted)
    """
    tree = bfs_parents(graph, src)
    tree_edges = tree.where(F.col("parent").isNotNull()).select(
        F.col("parent").alias("src"), F.col("vid").alias("dst")
    )
    if format in ("edges", "tree"):
        return tree_edges
    if format == "predecessors":
        return tree.where(F.col("parent").isNotNull()).select(
            "vid", F.col("parent").alias("predecessor")
        )
    if format == "successors":
        return tree_edges.groupBy(F.col("src").alias("vid")).agg(
            F.sort_array(F.collect_list("dst")).alias("successors")
        )
    raise ValueError(f"unknown bfs_generic format: {format}")


def sssp_predecessors(
    graph: LinkGraph, src: int, weight_col: str | None = "weight", max_rounds: int = 10_000
) -> DataFrame:
    """(vid, dist, pred) — shortest-path tree with deterministic
    predecessor (min (dist_u + w, u) relaxation winner)."""
    e = graph.edges
    if weight_col and weight_col in e.columns:
        edges = e.select("src", "dst", F.col(weight_col).cast("double").alias("w"))
    else:
        edges = e.select("src", "dst", F.lit(1.0).alias("w"))
    edges = edges.persist()
    inf = float("inf")

    state0 = graph.vertices.select(
        "vid",
        F.when(F.col("vid") == src, F.lit(0.0)).otherwise(F.lit(inf)).alias("dist"),
        F.lit(None).cast("long").alias("pred"),
        (F.col("vid") == src).alias("changed"),
    )

    def step(state: DataFrame, rnd: int) -> tuple[DataFrame, dict]:
        frontier = state.where(F.col("changed")).select("vid", "dist")
        relax = (
            frontier.join(edges, frontier["vid"] == edges["src"])
            .groupBy("dst")
            .agg(F.min(F.struct((F.col("dist") + F.col("w")).alias("d"), F.col("src").alias("u"))).alias("best"))
            .select("dst", F.col("best.d").alias("cand"), F.col("best.u").alias("cand_pred"))
        )
        new_state = (
            state.join(relax, state["vid"] == relax["dst"], "left")
            .select(
                state["vid"],
                F.least(state["dist"], F.coalesce("cand", state["dist"])).alias("dist"),
                F.when(
                    F.coalesce("cand", state["dist"]) < state["dist"], F.col("cand_pred")
                ).otherwise(state["pred"]).alias("pred"),
                (F.coalesce("cand", state["dist"]) < state["dist"]).alias("changed"),
            )
            .persist()
        )
        n = new_state.agg(F.sum(F.col("changed").cast("long"))).first()[0] or 0
        return new_state, {"changed": n}

    res = run_supersteps(state0, step, lambda s: s["changed"] == 0, max_rounds=max_rounds)
    out = res.state.select("vid", "dist", "pred").where(F.col("dist") != inf)
    edges.unpersist()
    return out


def sssp_has_path(graph: LinkGraph, src: int, dst: int) -> bool:
    """gs::SSSPHasPath — reachability src → dst."""
    tree = sssp_predecessors(graph, src, weight_col=None)
    return tree.where(F.col("vid") == dst).limit(1).count() > 0


def sssp_path(
    graph: LinkGraph,
    src: int,
    dst: int,
    weight_col: str | None = "weight",
    tree: DataFrame | None = None,
) -> list[int]:
    """gs::SSSPPath — one shortest path src → dst as a vid list.
    ``tree`` optionally supplies a precomputed sssp_predecessors result.

    The predecessor tree is computed distributed; the path is extracted by
    **pointer doubling** (O(log |path|) Spark jobs, not one job per hop):
    each round the ancestor set of ``dst`` absorbs its jump-pointer
    targets and the jump table composes with itself, so after k rounds
    the set covers all ancestors within 2^k hops. Only the ≤|path|
    resulting rows are collected, ordered by distance (strictly
    increasing along a shortest path for positive weights — the
    engine's weights are ≥ 1; zero-weight edges would need a hop index).
    """
    if tree is None:
        tree = sssp_predecessors(graph, src, weight_col)
    spark = graph.edges.sparkSession
    if tree.where(F.col("vid") == dst).limit(1).count() == 0:
        return []  # unreachable
    if src == dst:
        return [src]
    ptr = (
        tree.where(F.col("pred").isNotNull())
        .select("vid", F.col("pred").alias("anc"))
        .localCheckpoint(eager=True)
    )
    members = spark.createDataFrame([(int(dst),)], "vid long").localCheckpoint(eager=True)
    prev = 1
    rounds = 0
    while True:
        grown = members.join(ptr, "vid").select(F.col("anc").alias("vid"))
        members = members.union(grown).distinct().localCheckpoint(eager=True)
        rounds += 1
        cnt = members.count()
        if cnt == prev:
            break
        prev = cnt
        p, q = ptr.alias("p"), ptr.alias("q")
        ptr = (
            p.join(q, F.col("p.anc") == F.col("q.vid"))
            .select(F.col("p.vid").alias("vid"), F.col("q.anc").alias("anc"))
            .localCheckpoint(eager=True)
        )
    global LAST_SSSP_PATH_ROUNDS
    LAST_SSSP_PATH_ROUNDS = rounds
    rows = (
        tree.join(members, "vid", "left_semi")
        .select("vid", "dist")
        .orderBy("dist")
        .collect()
    )
    path = [r["vid"] for r in rows]
    if not path or path[0] != src or path[-1] != dst:
        return []
    return path


def is_simple_path(graph: LinkGraph, nodes: list[int]) -> bool:
    """gs::IsSimplePath — NetworkX semantics: nodes form a path (each
    consecutive pair an edge), all distinct, all present in the graph.
    A single present node is a trivial simple path; empty list is not."""
    if len(nodes) == 0:
        return False
    if len(set(nodes)) != len(nodes):
        return False
    spark = graph.edges.sparkSession
    node_df = spark.createDataFrame([(int(n),) for n in nodes], "vid long")
    present = node_df.join(graph.vertices.select("vid"), "vid", "left_semi").count()
    if present != len(nodes):
        return False
    if len(nodes) == 1:
        return True
    hops = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(nodes, nodes[1:])], "src long, dst long"
    )
    matched = hops.join(graph.edges.select("src", "dst").distinct(), ["src", "dst"], "left_semi").count()
    return matched == len(nodes) - 1


def all_simple_paths(
    graph: LinkGraph, src: int, dst: int, cutoff: int = 5
) -> DataFrame:
    """(path: array<long>) — every simple path src → dst with ≤ ``cutoff``
    edges.

    Reference: gs::AllSimplePaths
    (/root/reference/coordinator/gscoordinator/builtin/app/.gs_conf.yaml:230-232,
    apps/simple_path/all_simple_paths.h). Enumeration is exponential in
    general — the reference ships it regardless; here the mandatory
    ``cutoff`` bounds the frontier. Spark shape: the path frontier is a
    DataFrame of (cur, path) rows expanded one hop per round (join on
    cur = edges.src, reject revisits with array_contains) — all paths
    advance level-parallel; completed paths accumulate. A path ending at
    dst is never extended (a simple path cannot leave and re-enter dst).
    """
    spark = graph.edges.sparkSession
    edges = graph.edges.select("src", "dst")
    state = spark.createDataFrame(
        [(int(src), [int(src)])], "cur long, path array<long>"
    )
    done = state.where(F.col("cur") == dst).select("path")
    state = state.where(F.col("cur") != dst).localCheckpoint(eager=True)
    for _ in range(cutoff):
        expand = (
            state.join(edges, state["cur"] == edges["src"])
            .where(~F.array_contains(F.col("path"), F.col("dst")))
            .select(F.col("dst").alias("cur"), F.array_append("path", F.col("dst")).alias("path"))
        )
        done = done.union(expand.where(F.col("cur") == dst).select("path")).localCheckpoint(
            eager=True
        )
        state = expand.where(F.col("cur") != dst).localCheckpoint(eager=True)
        if state.limit(1).count() == 0:
            break
    return done


def dfs(
    graph: LinkGraph, src: int, max_vertices: int = 1_000_000
) -> DataFrame:
    """(vid, rank, parent) — DFS preorder from ``src``, neighbors visited
    in ascending vid; rank 0 = source; parent = discovering vertex.

    Reference: apps/dfs/dfs.h — the reference's DFS is itself strictly
    sequential (a single token walks the graph, one message per step,
    dfs.h:55-120); the distributed part is only adjacency lookup. Here
    the *reachable* subgraph is pruned distributed (BFS semi-join), then
    its adjacency is collected and walked on the driver — same O(V)
    sequential core, bounded by ``max_vertices`` (raise the cap
    deliberately for big reachable sets; an inherently sequential order
    cannot be computed distributed any faster than the reference does).
    """
    spark = graph.edges.sparkSession
    reach = bfs_parents(graph, src, max_depth=max_vertices).select("vid")
    n_reach = reach.count()
    if n_reach > max_vertices:
        raise ValueError(
            f"dfs: reachable set {n_reach} exceeds max_vertices={max_vertices} "
            "(DFS order is inherently sequential; raise the cap deliberately)"
        )
    sub = (
        graph.edges.select("src", "dst")
        .join(reach.withColumnRenamed("vid", "src"), "src", "left_semi")
        .join(reach.withColumnRenamed("vid", "dst"), "dst", "left_semi")
        .groupBy("src")
        .agg(F.sort_array(F.collect_set("dst")).alias("nbrs"))
    )
    adj = {r["src"]: list(r["nbrs"]) for r in sub.collect()}
    order: list[tuple[int, int, int | None]] = []
    visited: set[int] = set()
    stack: list[tuple[int, int | None]] = [(src, None)]
    while stack:
        v, parent = stack.pop()
        if v in visited:  # re-pushed by an earlier sibling branch
            continue
        visited.add(v)
        order.append((v, len(order), parent))
        # push reversed so the smallest-vid unvisited neighbor pops first
        # (visited is checked again at pop — matches recursive preorder)
        for u in reversed(adj.get(v, [])):
            if u not in visited:
                stack.append((u, v))
    return spark.createDataFrame(order, "vid long, rank long, parent long")


# ---------------- multi-source BFS family ----------------


def multi_source_bfs(
    graph: LinkGraph,
    sources: DataFrame | None = None,
    reverse: bool = False,
    max_depth: int = 10_000,
) -> DataFrame:
    """(root, vid, dist) — unweighted shortest-path lengths from every
    source (default: all vertices) to every reachable vertex, all roots
    expanded level-parallel in one superstep loop.

    ``reverse=True`` walks edges backwards (distances *to* the roots —
    what closeness centrality wants). O(V·V) state in the worst case —
    intended for APSP-family operators where that is inherent
    (apps/flags: AllPairsShortestPathLength, yaml:172-174).
    """
    e = graph.edges.select("src", "dst")
    if reverse:
        e = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    edges = e.persist()
    if sources is None:
        roots = graph.vertices.select(F.col("vid").alias("root"))
    else:
        roots = sources.select(F.col(sources.columns[0]).alias("root")).distinct()

    state0 = roots.select(
        "root", F.col("root").alias("vid"), F.lit(0).cast("long").alias("dist"),
        F.lit(True).alias("changed"),
    )

    def step(state: DataFrame, rnd: int) -> tuple[DataFrame, dict]:
        frontier = state.where(F.col("changed")).select("root", "vid")
        nxt = (
            frontier.join(edges, frontier["vid"] == edges["src"])
            .select("root", F.col("dst").alias("vid"))
            .distinct()
            .join(state.select("root", "vid"), ["root", "vid"], "left_anti")
            .select("root", "vid", F.lit(rnd).cast("long").alias("dist"), F.lit(True).alias("changed"))
        )
        new_state = state.select("root", "vid", "dist").withColumn(
            "changed", F.lit(False)
        ).union(nxt).persist()
        n = new_state.agg(F.sum(F.col("changed").cast("long"))).first()[0] or 0
        return new_state, {"changed": n}

    res = run_supersteps(state0, step, lambda s: s["changed"] == 0, max_rounds=max_depth)
    out = res.state.select("root", "vid", "dist")
    edges.unpersist()
    return out


def all_pairs_shortest_path_length(
    graph: LinkGraph, sources: DataFrame | None = None
) -> DataFrame:
    """gs::AllPairsShortestPathLength — (root, vid, dist), unweighted.

    ``sources`` restricts the roots (the scale escape hatch: all-roots
    state is O(V²), sampled roots O(k·V))."""
    return multi_source_bfs(graph, sources=sources)


def closeness_centrality(
    graph: LinkGraph, wf_improved: bool = True, sources: DataFrame | None = None
) -> DataFrame:
    """(vid, value) — closeness over incoming distances (NetworkX /
    gs::ClosenessCentrality semantics): for vertex v with r vertices
    that can reach v (incl. v) at total distance S,
    value = (r-1)/S · [(r-1)/(n-1) if wf_improved]; 0 when S == 0.

    ``sources`` computes closeness for a vertex subset only — the 100×-
    scale knob (all-vertices state is O(V²); k sampled vertices O(k·V)).
    Unlike sampled betweenness there is NO estimator rescale: each
    vertex's closeness depends only on distances *to it*, so the values
    returned for the sampled vertices are exact, just fewer rows.
    """
    n = graph.vertices.count()
    if n == 0:
        return graph.vertices.sparkSession.createDataFrame([], "vid long, value double")
    # root = target v; dist from v over reversed edges = dist to v
    d = multi_source_bfs(graph, sources=sources, reverse=True)
    agg = d.groupBy("root").agg(
        (F.count("*") - 1).alias("r_minus_1"), F.sum("dist").alias("s")
    )
    base = F.when(F.col("s") > 0, F.col("r_minus_1") / F.col("s")).otherwise(F.lit(0.0))
    if wf_improved and n > 1:
        base = base * F.col("r_minus_1") / F.lit(float(n - 1))
    if sources is None:
        out_vids = graph.vertices.select("vid")
    else:
        out_vids = sources.select(F.col(sources.columns[0]).alias("vid")).distinct()
    return (
        out_vids
        .join(agg.withColumnRenamed("root", "vid"), "vid", "left")
        .select("vid", F.coalesce(base, F.lit(0.0)).cast("double").alias("value"))
    )


def _walk_hash(col, salt: int):
    """Engine-portable walk hash: md5 over "<value>:<salt>" — identical
    text in Spark and DuckDB, so the seeded walk is oracle-reproducible."""
    return F.md5(F.concat_ws(":", col.cast("string"), F.lit(str(salt))))


def sampling_path(
    graph: LinkGraph, num_paths: int = 10, length: int = 3, seed: int = 42
) -> DataFrame:
    """(path_id, path: array<long>) — seeded pseudo-random walk sampling.

    Reference: apps/sampling_path/sampling_path.h (random path sampling
    over hops). Determinism: start vertices are the ``num_paths`` smallest
    ``md5(vid:seed)`` values; each hop follows the out-edge with the
    smallest ``md5(dst:seed+hop)`` — reproducible at any parallelism and
    byte-identical to the DuckDB oracle (md5 is engine-portable, unlike
    xxhash64). Paths stop early at sinks.
    """
    edges = graph.edges.select("src", "dst")
    starts = (
        graph.vertices.select("vid", _walk_hash(F.col("vid"), seed).alias("h"))
        .orderBy("h", "vid")
        .limit(num_paths)
        .select(
            F.col("vid").alias("path_id"),
            F.col("vid").alias("cur"),
            F.array(F.col("vid")).alias("path"),
        )
    )
    state = starts.localCheckpoint(eager=True)
    for hop in range(1, length + 1):
        nxt = (
            state.join(edges, state["cur"] == edges["src"])
            .groupBy("path_id")
            .agg(
                F.min(
                    F.struct(_walk_hash(F.col("dst"), seed + hop).alias("h"), F.col("dst"))
                ).alias("pick")
            )
            .select("path_id", F.col("pick.dst").alias("nxt"))
        )
        state = (
            state.join(nxt, "path_id", "left")
            .select(
                "path_id",
                F.coalesce("nxt", F.col("cur")).alias("cur"),
                F.when(
                    F.col("nxt").isNotNull(), F.array_append("path", F.col("nxt"))
                ).otherwise(F.col("path")).alias("path"),
            )
            .localCheckpoint(eager=True)
        )
    return state.select("path_id", "path")


def average_shortest_path_length(graph: LinkGraph) -> float:
    """gs::SSSPAverageLength — mean dist over ordered reachable pairs
    (excluding self-pairs), unweighted."""
    d = multi_source_bfs(graph)
    row = d.where(F.col("dist") > 0).agg(
        F.sum("dist").alias("s"), F.count("*").alias("c")
    ).first()
    return float(row["s"] / row["c"]) if row["c"] else 0.0


def eccentricity(graph: LinkGraph) -> DataFrame:
    """(vid, ecc) — reachable-set eccentricity: max unweighted distance
    from each vertex to the vertices it can reach (0 for sinks).

    NetworkX raises on graphs that are not (strongly) connected; this
    core operator instead keeps the reachable-set definition so it is
    total — :mod:`linkgraph.nx` adds the faithful connectivity guard.
    Reference surface: nx eccentricity/diameter forward to the APSP app
    family (same `multi_source_bfs` O(V·V) state; use on subgraphs or
    sampled roots at scale, as with apsp)."""
    d = multi_source_bfs(graph)
    return d.groupBy(F.col("root").alias("vid")).agg(
        F.max("dist").cast("long").alias("ecc")
    )


def diameter(graph: LinkGraph, ecc: DataFrame | None = None) -> int:
    """Max reachable-set eccentricity (see :func:`eccentricity`)."""
    e = ecc if ecc is not None else eccentricity(graph)
    row = e.agg(F.max("ecc").alias("d")).first()
    return int(row["d"]) if row["d"] is not None else 0


def diameter_approx(graph: LinkGraph, start: int | None = None) -> int:
    """Double-sweep (2-sweep) diameter lower bound — the
    nx.approximation.diameter heuristic made deterministic: BFS over the
    symmetrized simple graph from ``start`` (default: min vid), hop to
    the farthest reached vertex (tie-break min vid), BFS again; the
    second eccentricity is the bound. Cost = 2 BFS runs instead of the
    exact diameter's V-source APSP — THE scale path for diameter
    estimation (the bound is exact on trees and empirically tight on
    real graphs, Magnien–Latapy–Habib 2009). Disconnected input bounds
    the start vertex's component (reachable-set semantics, like
    :func:`eccentricity`)."""
    from linkgraph.algorithms.traversal import bfs

    sym = LinkGraph(
        vertices=graph.vertices,
        edges=graph.symmetrized_simple_edges().select(
            F.col("a").alias("src"), F.col("b").alias("dst")
        ),
    )
    if start is None:
        row = graph.vertices.agg(F.min("vid")).first()
        if row[0] is None:
            return 0
        start = int(row[0])
    far = (
        bfs(sym, src=start)
        .where(F.col("value") >= 0)
        .orderBy(F.col("value").desc(), F.col("vid").asc())
        .first()
    )
    if far is None:
        return 0
    row = bfs(sym, src=int(far["vid"])).agg(F.max("value")).first()
    return int(row[0]) if row[0] is not None else 0


def radius(graph: LinkGraph, ecc: DataFrame | None = None) -> int:
    """Min reachable-set eccentricity (see :func:`eccentricity`)."""
    e = ecc if ecc is not None else eccentricity(graph)
    row = e.agg(F.min("ecc").alias("r")).first()
    return int(row["r"]) if row["r"] is not None else 0


def center(graph: LinkGraph, ecc: DataFrame | None = None) -> DataFrame:
    """(vid) — vertices whose eccentricity equals the radius."""
    e = (ecc if ecc is not None else eccentricity(graph)).persist()
    out = e.where(F.col("ecc") == F.lit(radius(graph, ecc=e))).select("vid")
    return out


def periphery(graph: LinkGraph, ecc: DataFrame | None = None) -> DataFrame:
    """(vid) — vertices whose eccentricity equals the diameter."""
    e = (ecc if ecc is not None else eccentricity(graph)).persist()
    out = e.where(F.col("ecc") == F.lit(diameter(graph, ecc=e))).select("vid")
    return out


def barycenter(graph: LinkGraph) -> DataFrame:
    """(vid) — vertices minimizing the total distance Σ d(v, u) over
    their reachable set (nx.barycenter semantics on connected graphs;
    like :func:`eccentricity`, the core operator keeps the reachable-set
    definition so it is total — the :mod:`linkgraph.nx` wrapper adds the
    faithful connectivity guard, without which a sink's empty sum would
    trivially win). Same one multi-source BFS as the eccentricity
    family."""
    d = multi_source_bfs(graph)
    tot = d.groupBy(F.col("root").alias("vid")).agg(
        F.sum("dist").cast("long").alias("td")
    )
    row = tot.agg(F.min("td")).first()
    if row[0] is None:
        return tot.select("vid").limit(0)
    return tot.where(F.col("td") == int(row[0])).select("vid")


def descendants(graph: LinkGraph, source: int) -> DataFrame:
    """(vid) — vertices reachable from ``source`` by directed edges,
    excluding the source itself (nx.descendants). One single-root
    frontier BFS — the multi_source_bfs machinery with a 1-row source
    set, so cost is O(reachable), not O(V²)."""
    spark = graph.edges.sparkSession
    src = spark.createDataFrame([(int(source),)], "vid long")
    d = multi_source_bfs(graph, sources=src)
    return d.where(F.col("dist") > 0).select("vid")


def ancestors(graph: LinkGraph, source: int) -> DataFrame:
    """(vid) — vertices that can reach ``source`` (nx.ancestors): the
    same single-root sweep over reversed edges."""
    spark = graph.edges.sparkSession
    src = spark.createDataFrame([(int(source),)], "vid long")
    d = multi_source_bfs(graph, sources=src, reverse=True)
    return d.where(F.col("dist") > 0).select("vid")


def harmonic_centrality(
    graph: LinkGraph, sources: DataFrame | None = None
) -> DataFrame:
    """(vid, value) — sum of 1/d(u, v) over incoming distances
    (NetworkX harmonic_centrality semantics: distance TO v), 0.0 for
    vertices nothing reaches. Same reversed multi-source BFS closeness
    uses; round(…, 6) for engine-portable comparison.

    ``sources`` restricts the TARGET set (the closeness_centrality
    contract): exact values for the sampled vertices, fewer rows, O(k·V)
    state instead of O(V²) — no estimator rescale needed since harmonic
    centrality of v depends only on distances to v."""
    d = multi_source_bfs(graph, sources=sources, reverse=True)
    agg = (
        d.where(F.col("dist") > 0)
        .groupBy("root")
        .agg(F.round(F.sum(F.lit(1.0) / F.col("dist")), 6).alias("value"))
    )
    if sources is None:
        out_vids = graph.vertices.select("vid")
    else:
        out_vids = sources.select(F.col(sources.columns[0]).alias("vid")).distinct()
    return (
        out_vids
        .join(agg, F.col("vid") == F.col("root"), "left")
        .select("vid", F.coalesce("value", F.lit(0.0)).alias("value"))
    )


def effective_diameter(
    graph: LinkGraph, n_roots: int = 64, q: float = 0.9
) -> DataFrame:
    """One row (n_pairs, effective_diameter): the q-quantile (default
    90th percentile) of directed shortest-path distances from a
    deterministic ``n_roots``-root sample — the ANF/HyperANF headline
    statistic, computed exactly for the sampled roots.

    Scale shape: the roots ride ONE bit-parallel multi-source BFS
    (csr.msbfs_csr — 64 BFS trees per int64 mask, one shared edge pass
    per round) instead of ``n_roots`` sequential BFS runs, so the cost
    is a single BFS sweep regardless of root count ≤64; the distance
    histogram is a groupBy over reached (root, vid) pairs and the
    quantile an integer cumulative-sum threshold (ceil(q·pairs), exact
    integer arithmetic — no percentile_approx), so the result is
    bit-stable across partitionings. Roots = the ``n_roots`` smallest
    vids (deterministic, like the msbfs/harmonic batch entries).
    Self-pairs (dist 0) are excluded, matching the pairwise-distance
    definition."""
    if not 0 < q <= 1:
        raise ValueError("effective_diameter: q must be in (0, 1]")
    from linkgraph.csr import msbfs_csr

    num, den = int(round(q * 1000)), 1000
    seeds = [
        r["vid"]
        for r in graph.vertices.select("vid").orderBy("vid").limit(n_roots).collect()
    ]
    d = msbfs_csr(graph, seeds).where(F.col("dist") > 0)
    hist = d.groupBy("dist").agg(F.count("*").alias("cnt"))
    w = Window.orderBy("dist").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy()
    return (
        hist.select(
            "dist",
            F.sum("cnt").over(w).alias("cum"),
            F.sum("cnt").over(tot).alias("n_pairs"),
        )
        .where(F.col("cum") * den >= F.col("n_pairs") * num)
        .agg(
            F.max("n_pairs").cast("long").alias("n_pairs"),
            F.min("dist").cast("long").alias("effective_diameter"),
        )
    )
