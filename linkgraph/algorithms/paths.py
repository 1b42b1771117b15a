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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.superstep import run_supersteps


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


def sssp_path(graph: LinkGraph, src: int, dst: int, weight_col: str | None = "weight") -> list[int]:
    """gs::SSSPPath — one shortest path src → dst as a vid list (driver-side
    backtrack over the collected predecessor map of path vertices only).

    The predecessor *tree* is computed distributed; only the ≤|path| hops
    are walked on the driver (each hop is one lookup in a broadcast-sized
    dict of the tree — at 100 TB the tree is still ≤ |V| rows, and the
    walk touches ≤ diameter entries fetched via targeted filters).
    """
    tree = sssp_predecessors(graph, src, weight_col)
    # fetch only the chain: iterate targeted single-row lookups
    path: list[int] = []
    cur = dst
    seen = set()
    while cur is not None and cur not in seen:
        seen.add(cur)
        row = tree.where(F.col("vid") == cur).select("pred").first()
        if row is None:
            return []  # unreachable
        path.append(cur)
        if cur == src:
            break
        cur = row["pred"]
    if not path or path[-1] != src:
        return []
    return list(reversed(path))


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


def all_pairs_shortest_path_length(graph: LinkGraph) -> DataFrame:
    """gs::AllPairsShortestPathLength — (root, vid, dist), unweighted."""
    return multi_source_bfs(graph)


def closeness_centrality(graph: LinkGraph, wf_improved: bool = True) -> DataFrame:
    """(vid, value) — closeness over incoming distances (NetworkX /
    gs::ClosenessCentrality semantics): for vertex v with r vertices
    that can reach v (incl. v) at total distance S,
    value = (r-1)/S · [(r-1)/(n-1) if wf_improved]; 0 when S == 0."""
    n = graph.vertices.count()
    if n == 0:
        return graph.vertices.sparkSession.createDataFrame([], "vid long, value double")
    d = multi_source_bfs(graph, reverse=True)  # root = target v; dist from v backwards = dist to v
    agg = d.groupBy("root").agg(
        (F.count("*") - 1).alias("r_minus_1"), F.sum("dist").alias("s")
    )
    base = F.when(F.col("s") > 0, F.col("r_minus_1") / F.col("s")).otherwise(F.lit(0.0))
    if wf_improved and n > 1:
        base = base * F.col("r_minus_1") / F.lit(float(n - 1))
    return (
        graph.vertices.select("vid")
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
