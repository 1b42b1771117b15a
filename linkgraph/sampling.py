"""GNN training-data sampling (the GLE / graph-learn analog).

The reference ships a learning engine (GLE, ``learning_engine/`` — the
graph-learn submodule) whose data plane is exactly this: k-hop
neighbor sampling with per-hop fanouts, strategy-selectable neighbor
pickers, and negative sampling for contrastive losses. The submodule is
empty in the checkout, so semantics here follow the public GSL surface
(``g.V().outV(..).sample(k).by('random'|'topk')``, negative sampling);
everything is re-expressed as Catalyst plans.

Determinism (the repo-wide rule): "random" picks are ranked by the
engine-portable ``md5(src:dst:seed)`` string — reproducible at any
parallelism AND byte-identical in the DuckDB oracles (xxhash64 is not
portable). Every sampler is therefore exactly replayable.

Scale shape:
- ``sample_neighbors`` — one window (hash-partitioned by src) over the
  edge table: rank, keep k. No driver loop, no collect. Hub vertices
  put deg(hub) rows in one partition — the same skew every top-k-per-
  key has; AQE skew handling applies.
- ``k_hop_sample`` — L windows over frontier-restricted edges (L =
  len(fanouts), typically 2-3). Frontiers stay DataFrames.
- ``negative_sample`` — candidates are generated arithmetically
  (``md5(src:i:seed) % V`` → dense-index join), verified by one
  anti-join against the adjacency; ``attempts`` fixed up front keeps
  the result deterministic (per-src yield is min(n, valid attempts) —
  documented, not silent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph


def _pick_hash(*cols, seed: int):
    return F.md5(F.concat_ws(":", *[c.cast("string") for c in cols], F.lit(str(seed))))


def sample_neighbors(
    graph: LinkGraph,
    k: int,
    strategy: str = "random",
    seed: int = 42,
    weight_col: str = "weight",
) -> DataFrame:
    """Up to ``k`` out-neighbors per source — (src, dst, sample_rank).

    strategy 'random': seeded md5 order; 'topk': by ``weight_col``
    descending; 'weighted': weight-proportional sampling WITHOUT
    replacement (GLE's edge_weight picker) via Efraimidis–Spirakis —
    key = u^(1/w) with u a deterministic md5-derived uniform in (0,1],
    take the k largest keys. All three are exactly replayable.
    """
    e = graph.edges
    if strategy == "random":
        order = [_pick_hash(F.col("src"), F.col("dst"), seed=seed).asc(), F.col("dst").asc()]
    elif strategy == "topk":
        if weight_col not in e.columns:
            raise ValueError(f"sample_neighbors: no {weight_col!r} column for topk")
        order = [F.col(weight_col).desc(), F.col("dst").asc()]
    elif strategy == "weighted":
        if weight_col not in e.columns:
            raise ValueError(f"sample_neighbors: no {weight_col!r} column for weighted")
        # u = (h32 + 1) / 2^32 ∈ (0, 1]; exponent 1/w; ties → smallest dst
        h32 = F.conv(
            F.substring(_pick_hash(F.col("src"), F.col("dst"), seed=seed), 1, 8), 16, 10
        ).cast("double")
        u = (h32 + 1.0) / F.lit(float(2**32))
        key = F.pow(u, 1.0 / F.col(weight_col))
        order = [key.desc(), F.col("dst").asc()]
    else:
        raise ValueError(f"sample_neighbors: unknown strategy {strategy!r}")
    w = Window.partitionBy("src").orderBy(*order)
    return (
        e.select("src", "dst", *([weight_col] if strategy in ("topk", "weighted") else []))
        .withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= k)
        .select("src", "dst", "sample_rank")
    )


def k_hop_sample(
    graph: LinkGraph,
    seeds: DataFrame,
    fanouts: list[int],
    seed: int = 42,
) -> DataFrame:
    """Layered GraphSAGE-style sampling — (layer, src, dst).

    Layer i (1-based) samples ``fanouts[i-1]`` out-neighbors of the
    previous frontier (layer 0 frontier = ``seeds`` first column);
    frontiers are the distinct sampled dsts, revisits allowed (GLE
    semantics — the sampled block is a DAG of edges, not a simple set).
    """
    e = graph.edges.select("src", "dst")
    frontier = seeds.select(F.col(seeds.columns[0]).cast("long").alias("src")).distinct()
    layers = []
    for i, f in enumerate(fanouts, start=1):
        hop = e.join(frontier, "src")
        w = Window.partitionBy("src").orderBy(
            _pick_hash(F.col("src"), F.col("dst"), seed=seed + i).asc(), F.col("dst").asc()
        )
        picked = (
            hop.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= f)
            .select(F.lit(i).alias("layer"), "src", "dst")
        )
        layers.append(picked)
        frontier = picked.select(F.col("dst").alias("src")).distinct()
    out = layers[0]
    for l in layers[1:]:
        out = out.unionByName(l)
    return out


def negative_sample(
    graph: LinkGraph,
    n: int,
    seed: int = 42,
    attempts: int | None = None,
) -> DataFrame:
    """Up to ``n`` non-neighbors per vertex — (src, neg, neg_rank).

    Candidate j for vertex s is the vertex at dense index
    ``md5(s:j:seed) % V``; candidates equal to s or adjacent to s (either
    direction) are discarded and the first ``n`` survivors by attempt
    order are kept. ``attempts`` defaults to 4n+8; vertices whose
    neighborhood covers most of the graph may yield fewer than n.
    """
    from linkgraph.graph import assign_dense_ids

    m = attempts if attempts is not None else 4 * n + 8
    verts = graph.vertices.select("vid")
    n_v = verts.count()
    if n_v == 0:
        return verts.sparkSession.createDataFrame([], "src long, neg long, neg_rank int")
    # dense index = rank of str(vid) in sorted order — assign_dense_ids
    # range-partitions instead of a global row_number window (no
    # single-partition bottleneck); the string ordering is the
    # deterministic contract the SQL oracle replays (ORDER BY
    # CAST(vid AS VARCHAR)).
    idx = assign_dense_ids(verts.select(F.col("vid").cast("string").alias("oid"))).select(
        F.col("oid").cast("long").alias("vid"), F.col("vid").alias("idx")
    )
    cand = (
        verts.select(F.col("vid").alias("src"))
        .crossJoin(F.broadcast(verts.sparkSession.range(m).select(F.col("id").alias("j"))))
        .select(
            "src",
            "j",
            F.pmod(
                F.conv(
                    F.substring(_pick_hash(F.col("src"), F.col("j"), seed=seed), 1, 8),
                    16,
                    10,
                ).cast("long"),
                F.lit(n_v),
            ).alias("cidx"),
        )
        .join(idx.select(F.col("idx").alias("cidx"), F.col("vid").alias("neg")), "cidx")
        .where(F.col("neg") != F.col("src"))
    )
    e = graph.edges.select("src", "dst")
    adj = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
    valid = cand.join(
        adj.select("src", F.col("dst").alias("neg")), ["src", "neg"], "left_anti"
    )
    # two attempts may hash to the same candidate — keep the earliest
    first = Window.partitionBy("src", "neg").orderBy("j")
    valid = (
        valid.withColumn("dup_rn", F.row_number().over(first))
        .where(F.col("dup_rn") == 1)
        .drop("dup_rn")
    )
    w = Window.partitionBy("src").orderBy("j")
    return (
        valid.withColumn("neg_rank", F.row_number().over(w))
        .where(F.col("neg_rank") <= n)
        .select("src", "neg", "neg_rank")
    )


def node2vec_walk(
    graph: LinkGraph,
    num_walks: int = 10,
    length: int = 3,
    p: float = 1.0,
    q: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """(walk_id, walk: array<long>) — second-order biased random walks
    (node2vec, Grover & Leskovec, KDD'16) — the walk sampler of the
    reference's learning-engine data plane (GLE/graph-learn GSL exposes
    random-walk based samplers; the submodule is empty in the checkout,
    so semantics follow the public node2vec definition).

    Transition bias from step (t -> v) to candidate x:
    alpha = 1/p if x == t (return), 1 if edge (t, x) exists (stay near),
    else 1/q (explore). Deterministic pick: Efraimidis-Spirakis key
    u^(1/alpha) with u = (h32+1)/2^32 from the engine-portable
    ``md5(x:seed+hop)`` — the max key wins, ties break to smallest x, so
    the walk replays at any parallelism AND bit-identically in the
    DuckDB oracle (g_node2vec). Hop 1 has no predecessor and is the
    unbiased first-order pick (same ranking as ``sampling_path``).

    Scale shape: per hop, one equi-join frontier->edges (deg(cur) rows
    per walk — hub-vertex skew is the usual top-k-per-key skew, AQE
    applies), one (prev, x) edge probe join for the distance-1 flag,
    and one per-walk window (partitioned by walk_id — scales to any
    number of concurrent walks). State is localCheckpoint-ed per hop to
    cut lineage, mirroring ``sampling_path``. Duplicate (src, dst)
    multi-edges cannot change the argmax (the key depends only on x),
    so no distinct() pass is needed.
    """
    edges = graph.edges.select("src", "dst")
    starts = (
        graph.vertices.select("vid", _pick_hash(F.col("vid"), seed=seed).alias("h"))
        .orderBy("h", "vid")
        .limit(num_walks)
        .select(
            F.col("vid").alias("walk_id"),
            F.col("vid").alias("prev"),
            F.col("vid").alias("cur"),
            F.array(F.col("vid")).alias("walk"),
        )
    )
    state = starts.localCheckpoint(eager=True)
    for hop in range(1, length + 1):
        cand = state.join(edges, state["cur"] == edges["src"]).select(
            "walk_id", "prev", F.col("dst").alias("x")
        )
        if hop == 1:
            order = [_pick_hash(F.col("x"), seed=seed + hop).asc(), F.col("x").asc()]
        else:
            probe = edges.select(
                F.col("src").alias("p_src"), F.col("dst").alias("p_dst")
            )
            cand = cand.join(
                probe,
                (cand["prev"] == probe["p_src"]) & (cand["x"] == probe["p_dst"]),
                "left",
            )
            h32 = F.conv(
                F.substring(_pick_hash(F.col("x"), seed=seed + hop), 1, 8), 16, 10
            ).cast("double")
            u = (h32 + 1.0) / F.lit(float(2**32))
            exponent = (
                F.when(F.col("x") == F.col("prev"), F.lit(float(p)))
                .when(F.col("p_dst").isNotNull(), F.lit(1.0))
                .otherwise(F.lit(float(q)))
            )
            order = [F.pow(u, exponent).desc(), F.col("x").asc()]
        w = Window.partitionBy("walk_id").orderBy(*order)
        pick = (
            cand.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("walk_id", F.col("x").alias("nxt"))
        )
        state = (
            state.join(pick, "walk_id", "left")
            .select(
                "walk_id",
                F.when(F.col("nxt").isNotNull(), F.col("cur"))
                .otherwise(F.col("prev"))
                .alias("prev"),
                F.coalesce(F.col("nxt"), F.col("cur")).alias("cur"),
                F.when(
                    F.col("nxt").isNotNull(),
                    F.concat(F.col("walk"), F.array(F.col("nxt"))),
                )
                .otherwise(F.col("walk"))
                .alias("walk"),
            )
            .localCheckpoint(eager=True)
        )
    return state.select("walk_id", "walk")
