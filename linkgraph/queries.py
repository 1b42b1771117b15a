"""Driver-contract query registry: Spark queries + DuckDB oracle SQL.

Every SQL-expressible operator from SURVEY.md §2 gets a ``queries()``
entry (a (spark, sf_dir) → DataFrame callable) and a matching
``oracle_sql()`` ANSI-SQL string executed by DuckDB over the same parquet
tables. Column names/types are aligned on both sides (driver hashes
values after sorting columns by name).

Rows-only entries (no SQL oracle), each justified:

- ``corpus_pagerank`` / ``corpus_wcc`` — convergence-driven round counts
  are not SQL-unrollable; verified BY COMPOSITION (input edge table is
  oracle-green via ``corpus_edges``; the kernels are oracle-green via
  ``g_pagerank_r3``/``g_wcc`` and convergence pytest oracles).
- ``g_louvain`` — the convergence-driven FAST variant only: its
  data-dependent round counts make labels engine-specific. pytest checks
  community structure and a quantitative modularity bound instead
  (tests/test_louvain.py). The multi-phase contraction pipeline itself
  IS hash-verified via ``g_louvain_full`` (louvain_canonical: fixed
  rounds per phase + min-member-vid contraction ids, two-phase unrolled
  oracle in queries_r5.py) and phase-1 via ``g_louvain_p1``.
- ``g_dfs`` — discovery order requires sequential stack semantics DuckDB
  recursive CTEs cannot express without enumerating all simple paths
  (exponential). pytest checks it against an independent driver-side DFS.

The **oracle graph** is derived from the ``orders`` table with pure
arithmetic both engines compute identically::

    edges: src = o_custkey % 400, dst = o_orderkey % 400  (distinct, no loops)
    vertices: all endpoints
    weights (sssp): (src + dst) % 7 + 1

Floating-point outputs are rounded to 6 decimals on both sides; summation
order between engines can differ in the last ulp, far below 1e-6.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.corpus import synth_corpus, derive_edges
from linkgraph import build_graph

V_MOD = 400
PR_ROUNDS = 3
CDLP_ROUNDS = 2
ALPHA = 0.85

# ---------------------------------------------------------------- helpers


def _oracle_graph(spark: SparkSession, sf_dir: str) -> LinkGraph:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    e = (
        orders.select(
            F.pmod(F.col("o_custkey"), F.lit(V_MOD)).alias("src"),
            F.pmod(F.col("o_orderkey"), F.lit(V_MOD)).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    v = (
        e.select(F.col("src").alias("vid"))
        .union(e.select(F.col("dst").alias("vid")))
        .distinct()
        .select("vid", F.col("vid").cast("string").alias("oid"))
    )
    return LinkGraph(vertices=v, edges=e)


_EDGES_SQL = f"""
  SELECT DISTINCT o_custkey % {V_MOD} AS src, o_orderkey % {V_MOD} AS dst
  FROM orders WHERE o_custkey % {V_MOD} <> o_orderkey % {V_MOD}
"""

_VERTS_SQL = "SELECT src AS vid FROM e UNION SELECT dst AS vid FROM e"

_UND_SQL = """
  und AS (SELECT src, dst FROM e UNION SELECT dst AS src, src AS dst FROM e),
  simple_und AS (SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi FROM e)
"""


def _with_graph(body: str) -> str:
    return f"WITH e AS ({_EDGES_SQL}), v AS ({_VERTS_SQL}), {_UND_SQL}, {body}"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _corpus_graph(spark: SparkSession) -> LinkGraph:
    # md5 hash mode → the exact edge table these kernels consume is
    # oracle-verified end-to-end by the ``corpus_edges`` entry.
    corpus = synth_corpus(spark, 2000, seed=42, hash_mode="md5")
    return build_graph(derive_edges(corpus))


# ---------------------------------------------------------------- queries


def q_edges(spark, sf_dir):
    return _oracle_graph(spark, sf_dir).edges


def q_graph_summary(spark, sf_dir):
    g = _oracle_graph(spark, sf_dir)
    return (
        g.edges.agg(F.count("*").alias("n_edges"))
        .crossJoin(g.vertices.agg(F.count("*").alias("n_vertices")))
        .select("n_vertices", "n_edges")
    )


def q_out_degree(spark, sf_dir):
    return _oracle_graph(spark, sf_dir).degrees("out").select(
        "vid", F.col("degree").cast("long").alias("degree")
    )


def q_in_degree(spark, sf_dir):
    return _oracle_graph(spark, sf_dir).degrees("in").select(
        "vid", F.col("degree").cast("long").alias("degree")
    )


def q_degree_centrality(spark, sf_dir):
    from linkgraph.algorithms import degree_centrality

    g = _oracle_graph(spark, sf_dir)
    return degree_centrality(g, "both").select("vid", F.round("value", 6).alias("value"))


def q_triangles(spark, sf_dir):
    from linkgraph.algorithms import triangles

    return triangles(_oracle_graph(spark, sf_dir)).select(
        "vid", F.col("value").cast("long").alias("value")
    )


def q_triangle_total(spark, sf_dir):
    from linkgraph.algorithms import triangles

    return triangles(_oracle_graph(spark, sf_dir)).agg(
        (F.sum("value") / 3).cast("long").alias("total_triangles")
    )


def q_wcc(spark, sf_dir):
    from linkgraph.algorithms import wcc

    return wcc(_oracle_graph(spark, sf_dir)).select(
        "vid", F.col("value").cast("long").alias("comp")
    )


def q_wcc_csr(spark, sf_dir):
    """The SAME WCC on the CSR fast tier with r4 packed partials
    (csr.py wcc_csr: per-block np.minimum.at scatter, Arrow-list packed
    minima, cogroup state update) — exact labels, same oracle as g_wcc."""
    from linkgraph.csr import wcc_csr

    return wcc_csr(_oracle_graph(spark, sf_dir), num_blocks=8).select(
        "vid", F.col("value").cast("long").alias("comp")
    )


def q_mis(spark, sf_dir):
    """Deterministic Luby maximal independent set (beyond-reference,
    flagged like g_scc): md5-string priorities make every round
    engine-portable, so the DuckDB oracle replays the identical rounds
    (unrolled below) — a hash match proves the exact same set AND the
    same per-vertex selection round."""
    from linkgraph.algorithms import maximal_independent_set

    g = _oracle_graph(spark, sf_dir)
    return maximal_independent_set(g, seed=42).select(
        "vid", F.col("value").cast("long").alias("value")
    )


def q_ktruss(spark, sf_dir):
    """4-truss by synchronous edge peeling (beyond-reference cohesive
    subgraph, sibling of k_core). Runs on an arithmetically sparsified
    edge set ((src*31+dst)%10 < 2 — portable to DuckDB, unlike xxhash)
    because the full oracle graph is too dense to peel (avg degree ~68:
    its 5-truss still keeps 99.9% of edges); the sparsified graph
    cascades through 7 peel rounds down to 163 edges. Oracle replays the
    synchronous rounds exactly (canonical fixpoint)."""
    from linkgraph.algorithms import k_truss

    g = _oracle_graph(spark, sf_dir)
    keep = (F.col("src") * 31 + F.col("dst")) % 10 < 2
    sparse = LinkGraph(vertices=g.vertices, edges=g.edges.where(keep))
    return k_truss(sparse, k=4)


def q_core_number(spark, sf_dir):
    """core_number (max k with v in the k-core) by the canonical
    iterate-k peel, on the same sparsified edge set as g_ktruss (the
    full oracle graph's min degree is high enough that levels barely
    cascade). Max core 9 there, worst inner cascade 18 rounds — the
    oracle unrolls 12 levels × 20 rounds (extra rounds/levels no-op)."""
    from linkgraph.algorithms import core_number

    g = _oracle_graph(spark, sf_dir)
    keep = (F.col("src") * 31 + F.col("dst")) % 10 < 2
    sparse = LinkGraph(vertices=g.vertices, edges=g.edges.where(keep))
    return core_number(sparse).select(
        "vid", F.col("value").cast("long").alias("value")
    )


def q_rich_club(spark, sf_dir):
    """Rich-club coefficient per degree threshold (unnormalized nx
    form) on the full oracle graph — pure aggregation (degree + edge
    min-degree histograms, one window each), no iteration."""
    from linkgraph.algorithms import rich_club_coefficient

    return rich_club_coefficient(_oracle_graph(spark, sf_dir))


def q_s_metric(spark, sf_dir):
    """s-metric: Σ deg(u)·deg(v) over undirected simple edges."""
    from linkgraph.algorithms import s_metric

    return s_metric(_oracle_graph(spark, sf_dir))


def q_global_efficiency(spark, sf_dir):
    """Global efficiency: mean 1/d over ordered pairs of the
    symmetrized graph (multi-source BFS kernel + one aggregation)."""
    from linkgraph.algorithms import global_efficiency

    return global_efficiency(_oracle_graph(spark, sf_dir))


def q_wiener(spark, sf_dir):
    """Wiener index (Σ d(u,v), unordered pairs) on the full oracle
    graph — the multi-source BFS kernel + one exact integer sum."""
    from linkgraph.algorithms import wiener_index

    return wiener_index(_oracle_graph(spark, sf_dir))


def q_effective_size(spark, sf_dir):
    """Burt effective size (unweighted): deg − 2·tri/deg per vertex —
    the triangle kernel + one join, on the full oracle graph."""
    from linkgraph.algorithms import effective_size

    return effective_size(_oracle_graph(spark, sf_dir))


def q_constraint(spark, sf_dir):
    """Burt network constraint (unweighted, undirected): mutual-
    neighbor wedge join + per-(u,v) sum + squared-term aggregation, on
    the same sparsified edge set as g_ktruss (the full graph's wedge
    count is fine for Spark but slow on the single-threaded oracle)."""
    from linkgraph.algorithms import constraint

    g = _oracle_graph(spark, sf_dir)
    keep = (F.col("src") * 31 + F.col("dst")) % 10 < 2
    sparse = LinkGraph(vertices=g.vertices, edges=g.edges.where(keep))
    return constraint(sparse)


def q_local_bridges(spark, sf_dir):
    """Local bridges (edges on no triangle, nx with_span=False) on the
    sparsified g_ktruss edge set (the full oracle graph is so dense
    every edge closes a triangle — 2,053 of the 2,694 sparse edges are
    local bridges, a non-trivial answer set)."""
    from linkgraph.algorithms import local_bridges

    g = _oracle_graph(spark, sf_dir)
    keep = (F.col("src") * 31 + F.col("dst")) % 10 < 2
    sparse = LinkGraph(vertices=g.vertices, edges=g.edges.where(keep))
    return local_bridges(sparse)


def q_is_bipartite(spark, sf_dir):
    """Bipartiteness + same-BFS-layer edge count of the full oracle
    graph (WCC roots → frontier BFS layering → one join)."""
    from linkgraph.algorithms import is_bipartite

    return is_bipartite(_oracle_graph(spark, sf_dir))


def q_degree_histogram(spark, sf_dir):
    """Dense nx degree_histogram (deg 0..max with zero-count rows) of
    the full oracle graph."""
    from linkgraph.algorithms import degree_histogram

    return degree_histogram(_oracle_graph(spark, sf_dir))


def q_triadic_census(spark, sf_dir):
    """Directed 16-class Holland–Leinhardt triadic census on the full
    oracle graph (wedge join over the dyad graph + literal 64→16 code
    lookup; single-dyad classes by counting correction, empty class by
    complement — no O(n³) work)."""
    from linkgraph.algorithms import triadic_census

    return triadic_census(_oracle_graph(spark, sf_dir))


def q_square_clustering(spark, sf_dir):
    """C4 (square) clustering coefficient per vertex on the full oracle
    graph — one materialized wedge join used twice (pair common-neighbor
    counts + per-wedge terms), integer sums, one division per vertex."""
    from linkgraph.algorithms.clustering import square_clustering

    return square_clustering(_oracle_graph(spark, sf_dir))


def q_onion(spark, sf_dir):
    """Onion decomposition (layer order of the core peel) on the same
    sparsified edge set as g_ktruss/g_core_number — 24 layers there; the
    oracle unrolls 30 (extras no-op)."""
    from linkgraph.algorithms import onion_layers

    g = _oracle_graph(spark, sf_dir)
    keep = (F.col("src") * 31 + F.col("dst")) % 10 < 2
    sparse = LinkGraph(vertices=g.vertices, edges=g.edges.where(keep))
    return onion_layers(sparse).select(
        "vid", F.col("value").cast("long").alias("value")
    )


def q_coloring(spark, sf_dir):
    """Deterministic Jones–Plassmann greedy coloring (beyond-reference,
    flagged like g_scc/g_mis): ready sets are Luby winner rounds, color =
    mex over already-colored neighbors. The md5 priorities make the
    DuckDB oracle an exact round-for-round replay (unrolled below)."""
    from linkgraph.algorithms import greedy_color

    g = _oracle_graph(spark, sf_dir)
    return greedy_color(g, seed=42).select(
        "vid", F.col("value").cast("long").alias("value")
    )


def q_triangles_incr(spark, sf_dir):
    """Incremental triangle maintenance: count on the 2/3 of edges with
    (src+dst)%3 != 0, append the rest, and update via the Δ-driven
    inclusion–exclusion (triangle_total_incr: ΔT = S − W + T3 — joins
    stream the adjacency only against the broadcast append set). The
    oracle is the plain full-graph ordered-wedge count, so a hash match
    proves the maintained total is exactly the cold total."""
    from linkgraph.algorithms import triangle_total_incr

    g = _oracle_graph(spark, sf_dir)
    parity = F.pmod(F.col("src") + F.col("dst"), F.lit(3))
    base = LinkGraph(vertices=g.vertices, edges=g.edges.where(parity != 0))
    extra = g.edges.where(parity == 0)
    total = triangle_total_incr(base, extra)
    return spark.createDataFrame([(total,)], "total_triangles long")


def q_wcc_incr(spark, sf_dir):
    """Incremental WCC: solve on the parity-0 half of the edges, append
    the parity-1 half, warm-start min-propagation with the old labels
    and frontier = BOTH endpoints of the appended edges
    (csr.wcc_csr(init_labels=…, frontier=…)). Oracle is the plain
    full-graph g_wcc recursive CTE: components can only merge under
    appends, so the warm start lands on the exact merged labels."""
    from linkgraph.csr import wcc_csr

    g = _oracle_graph(spark, sf_dir)
    parity = F.pmod(F.col("src") + F.col("dst"), F.lit(2))
    e1, e2 = g.edges.where(parity == 0), g.edges.where(parity == 1)
    g1 = LinkGraph(vertices=g.vertices, edges=e1)
    old = wcc_csr(g1, num_blocks=8)
    fr = e2.select(F.col("src").alias("vid")).union(e2.select(F.col("dst").alias("vid")))
    warm = wcc_csr(g, num_blocks=8, init_labels=old, frontier=fr)
    return warm.select("vid", F.col("value").cast("long").alias("comp"))


def q_bfs_csr(spark, sf_dir):
    """The SAME BFS (unit-weight sssp_csr) on the packed CSR fast tier —
    identical fixpoint, same oracle as g_bfs (unreachable filtered, as
    the join tier reports them as -1)."""
    from linkgraph.csr import sssp_csr

    g = _oracle_graph(spark, sf_dir)
    src = g.vertices.agg(F.min("vid")).first()[0]
    return (
        sssp_csr(g, src=src, weight_col=None, num_blocks=8)
        .where(F.col("value") >= 0)
        .select("vid", F.col("value").cast("long").alias("depth"))
    )


def q_scc(spark, sf_dir):
    from linkgraph.algorithms import scc

    return scc(_oracle_graph(spark, sf_dir)).select(
        "vid", F.col("value").cast("long").alias("comp")
    )


def q_cdlp(spark, sf_dir):
    from linkgraph.algorithms import cdlp

    return cdlp(_oracle_graph(spark, sf_dir), max_round=CDLP_ROUNDS).select(
        "vid", F.col("value").cast("long").alias("label")
    )


def q_cdlp_csr(spark, sf_dir):
    """The SAME fixed-round CDLP on the CSR fast tier (csr.py cdlp_csr:
    bidirectional multiset blocks, run-length (dst,label) map-side
    combine) — exact labels, same unrolled oracle."""
    from linkgraph.csr import cdlp_csr

    return cdlp_csr(_oracle_graph(spark, sf_dir), max_round=CDLP_ROUNDS, num_blocks=8).select(
        "vid", F.col("value").cast("long").alias("label")
    )


def q_pagerank_rounds(spark, sf_dir):
    from linkgraph.algorithms import pagerank

    return pagerank(_oracle_graph(spark, sf_dir), delta=ALPHA, max_round=PR_ROUNDS).select(
        "vid", F.round("value", 6).alias("value")
    )


# Fixed-round replay parameters for the delta-push tier: theta is the
# production default for (tol=1e-6, alpha=0.85); 6 rounds keeps the
# unrolled oracle cheap while exercising the frontier rule on every round.
DELTA_ROUNDS = 6
DELTA_THETA = 1e-06 * (1.0 - ALPHA) / 2.0


def q_pagerank_delta(spark, sf_dir):
    """Push-style (frontier-damped) PageRank on the CSR fast tier, run
    for a FIXED round count so the deterministic push schedule —
    frontier = resid > theta each round, held-back residual accumulating
    — replays exactly in the unrolled DuckDB twin. Hash-green here means
    the bytes/round lever (csr.pagerank_delta_csr) computes the same
    (rank, resid) trajectory the SQL does, not merely the same limit."""
    from linkgraph.csr import pagerank_delta_csr

    pr = pagerank_delta_csr(
        _oracle_graph(spark, sf_dir),
        alpha=ALPHA,
        max_iter=DELTA_ROUNDS,
        tol=0.0,
        theta=DELTA_THETA,
    )
    return pr.select("vid", F.round("value", 6).alias("value"))


def q_pagerank_incr(spark, sf_dir):
    """Incremental PageRank, the delta tier's flagship composition:
    converge (fixed-round) on the parity-0 half-graph, append the
    parity-1 half with stable vids (extend_graph), warm-start the push
    tier with the old ranks — seed residual = the old solution's defect
    under the new operator — and run a fixed number of push rounds. The
    oracle unrolls ALL of it (old rounds → seed → push rounds) in one
    DuckDB CTE chain; hash-green means the entire incremental pipeline
    replays deterministically, not just its final fixpoint."""
    from linkgraph import build_graph
    from linkgraph.algorithms import pagerank
    from linkgraph.csr import pagerank_delta_csr
    from linkgraph.incremental import extend_graph

    full = _oracle_graph(spark, sf_dir).edges.select(
        F.col("src").cast("string").alias("src_oid"),
        F.col("dst").cast("string").alias("dst_oid"),
    )
    parity = F.pmod(
        F.col("src_oid").cast("long") + F.col("dst_oid").cast("long"), F.lit(2)
    )
    g1 = build_graph(full.where(parity == 0))
    r_old = pagerank(g1, delta=ALPHA, max_round=PR_ROUNDS)
    g2 = extend_graph(g1, full.where(parity == 1))
    pr = pagerank_delta_csr(
        g2,
        alpha=ALPHA,
        max_iter=DELTA_ROUNDS,
        tol=0.0,
        theta=DELTA_THETA,
        init_ranks=r_old,
    )
    return pr.join(g2.vertices, "vid").select(
        F.col("oid").cast("long").alias("vid"), F.round("value", 6).alias("value")
    )


def q_stream_pagerank(spark, sf_dir):
    """The oracle graph's edges ingested as a 4-micro-batch edge STREAM:
    each batch extends the graph append-only (stable vids) and
    re-converges ranks on the delta-push tier warm-started from the
    previous batch (streaming.streaming_pagerank). Ranks are maintained
    at 1e-11 (tol=1e-8 × maintain_factor 1e-3); the oracle is 100
    unrolled static rounds on the full graph (worst-case α-decay error
    ≈ 2.6e-8 L1 — both sides are far inside the round(6) quantum), so a
    hash match proves streaming arrival order does not perturb the
    maintained fixpoint."""
    import tempfile

    from linkgraph.streaming import stream_parquet, streaming_pagerank

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    edges = (
        orders.select(
            F.pmod(F.col("o_custkey"), F.lit(V_MOD)).alias("s"),
            F.pmod(F.col("o_orderkey"), F.lit(V_MOD)).alias("d"),
        )
        .where(F.col("s") != F.col("d"))
        .select(
            F.col("s").cast("string").alias("src_oid"),
            F.col("d").cast("string").alias("dst_oid"),
        )
    )
    tmp = tempfile.mkdtemp(prefix="lg_stream_pr_")
    edges.repartition(4).write.mode("overwrite").parquet(tmp)
    sdf = stream_parquet(spark, tmp, "src_oid string, dst_oid string")
    g, ranks = streaming_pagerank(sdf, tol=1e-8, maintain_factor=1e-3)
    return ranks.join(g.vertices, "vid").select(
        F.col("oid").cast("long").alias("vid"), F.round("value", 6).alias("value")
    )


def q_density(spark, sf_dir):
    from linkgraph.algorithms import density

    return density(_oracle_graph(spark, sf_dir))


def q_reciprocity(spark, sf_dir):
    from linkgraph.algorithms import reciprocity

    return reciprocity(_oracle_graph(spark, sf_dir))


def q_avg_neighbor_degree(spark, sf_dir):
    from linkgraph.algorithms import average_neighbor_degree

    return average_neighbor_degree(_oracle_graph(spark, sf_dir), "out", "out")


def q_append_pagerank(spark, sf_dir):
    """Incremental append (append_only_arrow_fragment.h analog): build the
    graph from half the oracle edges, append the other half as a delta
    batch with stable vids, run fixed-round PageRank on the grown graph.
    The oracle is the full-graph g_pagerank_r3 SQL — a hash match proves
    the appended graph is bit-identical to the all-at-once build."""
    from linkgraph import build_graph
    from linkgraph.algorithms import pagerank
    from linkgraph.incremental import extend_graph

    full = _oracle_graph(spark, sf_dir).edges.select(
        F.col("src").cast("string").alias("src_oid"),
        F.col("dst").cast("string").alias("dst_oid"),
    )
    batch1 = full.where(F.pmod(F.col("src_oid").cast("long") + F.col("dst_oid").cast("long"), F.lit(2)) == 0)
    delta = full.where(F.pmod(F.col("src_oid").cast("long") + F.col("dst_oid").cast("long"), F.lit(2)) == 1)
    g = extend_graph(build_graph(batch1), delta)
    pr = pagerank(g, delta=ALPHA, max_round=PR_ROUNDS)
    return pr.join(g.vertices, "vid").select(
        F.col("oid").cast("long").alias("vid"), F.round("value", 6).alias("value")
    )


def q_bfs(spark, sf_dir):
    from linkgraph.algorithms import bfs

    g = _oracle_graph(spark, sf_dir)
    src = g.vertices.agg(F.min("vid")).first()[0]
    return (
        bfs(g, src=src)
        .where(F.col("value") >= 0)
        .select("vid", F.col("value").cast("long").alias("depth"))
    )


def q_sssp(spark, sf_dir):
    from linkgraph.algorithms import sssp

    g = _oracle_graph(spark, sf_dir)
    e = g.edges.select(
        "src", "dst", (F.pmod(F.col("src") + F.col("dst"), F.lit(7)) + 1).cast("double").alias("weight")
    )
    g2 = LinkGraph(vertices=g.vertices, edges=e)
    src = g.vertices.agg(F.min("vid")).first()[0]
    return (
        sssp(g2, src=src)
        .where(F.col("value") >= 0)
        .select("vid", F.col("value").cast("long").alias("dist"))
    )


def q_sssp_csr(spark, sf_dir):
    """The SAME weighted SSSP, on the CSR fast tier (csr.py sssp_csr:
    weighted blocks, per-block np.minimum.at combine, ≤P partial rows per
    destination) — identical fixpoint, identical oracle."""
    from linkgraph.csr import sssp_csr

    g = _oracle_graph(spark, sf_dir)
    e = g.edges.select(
        "src", "dst", (F.pmod(F.col("src") + F.col("dst"), F.lit(7)) + 1).cast("double").alias("weight")
    )
    g2 = LinkGraph(vertices=g.vertices, edges=e)
    src = g.vertices.agg(F.min("vid")).first()[0]
    return (
        sssp_csr(g2, src=src, num_blocks=8)
        .where(F.col("value") >= 0)
        .select("vid", F.col("value").cast("long").alias("dist"))
    )


def q_sssp_incr(spark, sf_dir):
    """Incremental SSSP: solve on the parity-0 half of the weighted
    edges, append the parity-1 half, warm-start relaxation with the old
    distances and frontier = the appended edges' srcs
    (csr.sssp_csr(init_dists=…, frontier=…)). The oracle is the plain
    full-graph g_sssp recursive CTE: a hash match proves the
    incremental result is BIT-identical to solving from scratch — old
    distances are upper bounds, label correcting closes the gap
    exactly."""
    from linkgraph.csr import sssp_csr

    g = _oracle_graph(spark, sf_dir)
    e = g.edges.select(
        "src",
        "dst",
        (F.pmod(F.col("src") + F.col("dst"), F.lit(7)) + 1).cast("double").alias("weight"),
    )
    parity = F.pmod(F.col("src") + F.col("dst"), F.lit(2))
    e1, e2 = e.where(parity == 0), e.where(parity == 1)
    src = g.vertices.agg(F.min("vid")).first()[0]
    g1 = LinkGraph(vertices=g.vertices, edges=e1)
    d_old = sssp_csr(g1, src=src, num_blocks=8)
    g_full = LinkGraph(vertices=g.vertices, edges=e)
    warm = sssp_csr(
        g_full, src=src, num_blocks=8, init_dists=d_old, frontier=e2.select("src")
    )
    return (
        warm.where(F.col("value") >= 0)
        .select("vid", F.col("value").cast("long").alias("dist"))
    )


def q_closeness(spark, sf_dir):
    from linkgraph.algorithms import closeness_centrality

    return closeness_centrality(_oracle_graph(spark, sf_dir)).select(
        "vid", F.round("value", 6).alias("value")
    )


def q_closeness_sampled(spark, sf_dir):
    """Sampled-sources closeness — the O(k·V) scale knob (r2 ask #5):
    exact values for the sampled vertices (no estimator rescale needed;
    closeness of v depends only on distances to v)."""
    from linkgraph.algorithms import closeness_centrality

    g = _oracle_graph(spark, sf_dir)
    sample = g.vertices.where(F.pmod(F.col("vid"), F.lit(5)) == 0).select("vid")
    return closeness_centrality(g, sources=sample).select(
        "vid", F.round("value", 6).alias("value")
    )


def q_nx_degree_centrality(spark, sf_dir):
    """NetworkX-compat surface (SURVEY.md §2.6, reference graphscope.nx):
    the oracle graph rebuilt through the nx-style DiGraph mutation API,
    degree_centrality returned as the builtin dict, re-emitted as a
    DataFrame — hash-identical to g_degree_centrality."""
    from linkgraph import nx as lnx

    g0 = _oracle_graph(spark, sf_dir)
    G = lnx.DiGraph(spark)
    G.add_nodes_from(r["vid"] for r in g0.vertices.collect())
    G.add_edges_from((r["src"], r["dst"]) for r in g0.edges.collect())
    dc = lnx.degree_centrality(G)
    return spark.createDataFrame(
        [(int(k), v) for k, v in dc.items()], "vid long, value double"
    ).select("vid", F.round("value", 6).alias("value"))


def q_csv_load(spark, sf_dir):
    """Loader-surface parity (reference loader.py:44-132): the oracle
    graph's edges round-trip through a pipe-delimited CSV e-file with a
    header row, reload through load_graph_csv, and come back as oid pairs
    — hash-identical to g_edges (checks delimiter/header options, the
    string-oid path, and dense-id join resolution)."""
    import os
    import tempfile

    from linkgraph.loader import load_graph_csv

    g0 = _oracle_graph(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="lg_csv_")
    epath = os.path.join(d, "edges")
    (
        g0.edges.select(F.col("src").cast("string").alias("from_id"),
                        F.col("dst").cast("string").alias("to_id"))
        .coalesce(1)
        .write.mode("overwrite").option("header", "true").option("sep", "|")
        .csv(epath)
    )
    g = load_graph_csv(spark, epath, delimiter="|", header_row=True,
                       src_field="from_id", dst_field="to_id")
    oid = g.vertices
    return (
        g.edges
        .join(oid.select(F.col("vid").alias("src"), F.col("oid").alias("src_oid")), "src")
        .join(oid.select(F.col("vid").alias("dst"), F.col("oid").alias("dst_oid")), "dst")
        .select(F.col("src_oid").cast("long").alias("src"),
                F.col("dst_oid").cast("long").alias("dst"))
    )


def q_apsp(spark, sf_dir):
    from linkgraph.algorithms import all_pairs_shortest_path_length

    return all_pairs_shortest_path_length(_oracle_graph(spark, sf_dir)).select(
        "root", "vid", F.col("dist").cast("long").alias("dist")
    )


def q_eccentricity(spark, sf_dir):
    from linkgraph.algorithms import eccentricity

    return eccentricity(_oracle_graph(spark, sf_dir))


def q_diameter_radius(spark, sf_dir):
    from linkgraph.algorithms import diameter, eccentricity, radius

    g = _oracle_graph(spark, sf_dir)
    ecc = eccentricity(g).persist()
    return spark.createDataFrame(
        [(diameter(g, ecc=ecc), radius(g, ecc=ecc))], "diameter long, radius long"
    )


def q_harmonic(spark, sf_dir):
    from linkgraph.algorithms import harmonic_centrality

    return harmonic_centrality(_oracle_graph(spark, sf_dir))


def q_avg_path_length(spark, sf_dir):
    from linkgraph.algorithms import average_shortest_path_length

    r = average_shortest_path_length(_oracle_graph(spark, sf_dir))
    return spark.createDataFrame([(round(r, 6),)], "avg_path_length double")


def q_bfs_tree(spark, sf_dir):
    from linkgraph.algorithms import bfs_generic

    g = _oracle_graph(spark, sf_dir)
    src = g.vertices.agg(F.min("vid")).first()[0]
    return bfs_generic(g, src=src, format="edges").select("src", "dst")


def q_numeric_assortativity(spark, sf_dir):
    from linkgraph.algorithms import numeric_assortativity_coefficient

    g = _oracle_graph(spark, sf_dir)
    attrs = g.vertices.select("vid", F.pmod(F.col("vid"), F.lit(5)).alias("attr"))
    r = numeric_assortativity_coefficient(g, attrs)
    return spark.createDataFrame([(round(r, 6),)], "numeric_assortativity double")


def q_attr_assortativity(spark, sf_dir):
    from linkgraph.algorithms import attribute_assortativity_coefficient

    g = _oracle_graph(spark, sf_dir)
    attrs = g.vertices.select("vid", F.pmod(F.col("vid"), F.lit(5)).alias("attr"))
    r = attribute_assortativity_coefficient(g, attrs)
    return spark.createDataFrame([(round(r, 6),)], "attr_assortativity double")


def _bipartite_graph(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    e = (
        orders.select(
            F.pmod(F.col("o_custkey"), F.lit(200)).alias("src"),
            (F.lit(1000) + F.pmod(F.col("o_orderkey"), F.lit(300))).alias("dst"),
        )
        .distinct()
        .withColumn(
            "weight", (F.pmod(F.col("src") + F.col("dst"), F.lit(5)) + 1).cast("double")
        )
    )
    v = (
        e.select(F.col("src").alias("vid"))
        .union(e.select(F.col("dst").alias("vid")))
        .distinct()
        .select("vid", F.col("vid").cast("string").alias("oid"))
    )
    users = e.select(F.col("src").alias("vid")).distinct()
    return LinkGraph(vertices=v, edges=e), users


def q_lpa_u2i_r2(spark, sf_dir):
    from linkgraph.algorithms import lpa_u2i

    g, users = _bipartite_graph(spark, sf_dir)
    return lpa_u2i(g, users, max_round=2).select(
        "vid", F.col("value").cast("long").alias("label")
    )


def q_lpa_u2i_vector_r2(spark, sf_dir):
    """Faithful gs::LPAU2I vector-averaging semantics (2 stage pairs);
    seeds: per-user 2-prop vectors with exact-0/1 clamped entries."""
    from linkgraph.algorithms import lpa_u2i_vector

    g, users = _bipartite_graph(spark, sf_dir)
    p0 = (
        F.when(F.pmod(F.col("vid"), F.lit(7)) == 0, F.lit(1.0))
        .when(F.pmod(F.col("vid"), F.lit(7)) == 1, F.lit(0.0))
        .otherwise(F.pmod(F.col("vid"), F.lit(100)) / F.lit(100.0))
    )
    p1 = F.when(F.pmod(F.col("vid"), F.lit(5)) == 0, F.lit(1.0)).otherwise(
        F.pmod(F.col("vid") * 3, F.lit(100)) / F.lit(100.0)
    )
    feats = users.select("vid", F.array(p0, p1).alias("props"))
    return lpa_u2i_vector(g, users, feats, max_round=2).select(
        "vid", F.col("pid").cast("long").alias("pid"), F.round("value", 6).alias("value")
    )


def q_louvain_p1(spark, sf_dir):
    """Deterministic fixed-round Louvain phase-1 (louvain.py phase
    kernel, canonical community = min member vid) — hash-oracled by an
    unrolled SQL twin of the same 4 local-move rounds; the multi-phase
    contraction variant stays rows-only (g_louvain)."""
    from linkgraph.algorithms import louvain_phase1

    return louvain_phase1(_oracle_graph(spark, sf_dir), rounds=4).select(
        "vid", F.col("value").cast("long").alias("comm")
    )


def q_linkpred(spark, sf_dir):
    """Link-prediction indices (linkpred.py — the nx-forwarded suite):
    default candidates = non-adjacent pairs with ≥1 common neighbor;
    floats rounded to 6 so summation order can't flip the hash."""
    from linkgraph.algorithms import link_prediction

    return link_prediction(_oracle_graph(spark, sf_dir)).select(
        "u",
        "v",
        "cn",
        F.round("jaccard", 6).alias("jaccard"),
        F.round("adamic_adar", 6).alias("adamic_adar"),
        F.round("resource_allocation", 6).alias("resource_allocation"),
        "preferential_attachment",
    )


def q_voterank(spark, sf_dir):
    """VoteRank 5-seed election (voterank.py) — integer output
    (rank, vid); scores rounded to 9 before each argmax in BOTH engines
    so the election is summation-order invariant."""
    from linkgraph.algorithms import voterank

    return voterank(_oracle_graph(spark, sf_dir), 5)


def q_sample_neighbors(spark, sf_dir):
    """GLE-style neighbor sampling (sampling.py): up to 5 out-neighbors
    per source, md5-portable 'random' strategy — exactly replayable."""
    from linkgraph.sampling import sample_neighbors

    return sample_neighbors(_oracle_graph(spark, sf_dir), 5, seed=42)


def q_khop_sample(spark, sf_dir):
    """Layered GraphSAGE-style 2-hop sampling, fanouts [3, 2], seeds =
    vids divisible by 50."""
    from linkgraph.sampling import k_hop_sample

    g = _oracle_graph(spark, sf_dir)
    seeds = g.vertices.where(F.col("vid") % 50 == 0).select("vid")
    return k_hop_sample(g, seeds, [3, 2], seed=42)


def q_negative_sample(spark, sf_dir):
    """Deterministic negative sampling: 3 non-neighbors per vertex via
    md5(src:j:seed) % V dense-index candidates, anti-joined against the
    undirected adjacency."""
    from linkgraph.sampling import negative_sample

    return negative_sample(_oracle_graph(spark, sf_dir), 3, seed=11)


def q_saveload(spark, sf_dir):
    """Graph serialization round-trip (serde.py — Graph.save_to/
    load_from analog, framework/graph.py:975-1060): the oracle graph is
    saved to parquet+meta and reloaded; its edges must hash-match the
    never-serialized g_edges oracle."""
    import tempfile

    from linkgraph.serde import load_graph, save_graph

    g0 = _oracle_graph(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="lg_serde_q_")
    save_graph(g0, d, mode="overwrite")
    return load_graph(spark, d).edges.select("src", "dst")


def q_louvain(spark, sf_dir):  # rows-only: multi-phase contraction not SQL
    from linkgraph.algorithms import louvain

    return louvain(
        _oracle_graph(spark, sf_dir), max_phases=1, max_rounds_per_phase=4
    ).select("vid", F.col("value").cast("long").alias("comm"))


def q_betweenness(spark, sf_dir):
    from linkgraph.algorithms import betweenness_centrality

    return betweenness_centrality(_oracle_graph(spark, sf_dir)).select(
        "vid", F.round("value", 6).alias("value")
    )


def q_betweenness_ep(spark, sf_dir):
    """Generic-variant betweenness with endpoint counting
    (betweenness_centrality_generic.h ``ctx.endpoints``)."""
    from linkgraph.algorithms import betweenness_centrality

    return betweenness_centrality(_oracle_graph(spark, sf_dir), endpoints=True).select(
        "vid", F.round("value", 6).alias("value")
    )


def q_betweenness_w(spark, sf_dir):
    """Weighted betweenness (Dijkstra semantics), sampled sources
    (vid % 20 == 0) with the standard n/k rescale."""
    from linkgraph.algorithms import betweenness_centrality

    g = _oracle_graph(spark, sf_dir)
    we = g.edges.select(
        "src", "dst",
        (F.pmod(F.col("src") + F.col("dst"), F.lit(7)) + 1).cast("double").alias("w"),
    )
    gw = LinkGraph(vertices=g.vertices, edges=we)
    srcs = g.vertices.select("vid").where(F.col("vid") % 20 == 0)
    return betweenness_centrality(gw, sources=srcs, weight="w").select(
        "vid", F.round("value", 6).alias("value")
    )


def q_sampling_paths(spark, sf_dir):
    from linkgraph.algorithms import sampling_path

    return sampling_path(_oracle_graph(spark, sf_dir), num_paths=10, length=4).select(
        "path_id", F.concat_ws(",", F.transform("path", lambda x: x.cast("string"))).alias("path_csv")
    )


def q_node2vec(spark, sf_dir):
    """Second-order biased walks (node2vec p/q) — p=0.25 (return-prone)
    and q=4.0 (stay-local) exercise all three bias branches; csv-packed
    for a deterministic hash across engines (same idiom as
    g_sampling_paths)."""
    from linkgraph.sampling import node2vec_walk

    return node2vec_walk(
        _oracle_graph(spark, sf_dir), num_walks=10, length=4, p=0.25, q=4.0, seed=42
    ).select(
        "walk_id",
        F.concat_ws(",", F.transform("walk", lambda x: x.cast("string"))).alias("walk_csv"),
    )


def q_degree_assortativity(spark, sf_dir):
    from linkgraph.algorithms import degree_assortativity_coefficient

    g = _oracle_graph(spark, sf_dir)
    r = degree_assortativity_coefficient(g, "out", "in")
    return spark.createDataFrame([(round(r, 6),)], "assortativity double")


def q_avg_degree_connectivity(spark, sf_dir):
    from linkgraph.algorithms import average_degree_connectivity

    return average_degree_connectivity(_oracle_graph(spark, sf_dir)).select(
        F.col("degree").cast("long").alias("degree"),
        F.round("avg_nbr_degree", 6).alias("avg_nbr_degree"),
    )


def q_node_boundary(spark, sf_dir):
    from linkgraph.algorithms import node_boundary

    g = _oracle_graph(spark, sf_dir)
    s = g.vertices.where(F.col("vid") < 50).select("vid")
    return node_boundary(g, s).select(F.col("vid").cast("long").alias("vid"))


def q_edge_boundary(spark, sf_dir):
    from linkgraph.algorithms import edge_boundary

    g = _oracle_graph(spark, sf_dir)
    s = g.vertices.where(F.col("vid") < 50).select("vid")
    return edge_boundary(g, s).select("src", "dst")


def q_clustering(spark, sf_dir):
    from linkgraph.algorithms import clustering

    return clustering(_oracle_graph(spark, sf_dir)).select(
        "vid", F.round("value", 6).alias("value")
    )


def q_transitivity(spark, sf_dir):
    from linkgraph.algorithms import transitivity

    r = transitivity(_oracle_graph(spark, sf_dir))
    return spark.createDataFrame([(round(r, 6),)], "transitivity double")


def q_avg_clustering(spark, sf_dir):
    from linkgraph.algorithms import average_clustering

    r = average_clustering(_oracle_graph(spark, sf_dir))
    return spark.createDataFrame([(round(r, 6),)], "avg_clustering double")


def q_katz_r3(spark, sf_dir):
    from linkgraph.algorithms import katz_centrality

    return katz_centrality(
        _oracle_graph(spark, sf_dir),
        alpha=0.1,
        beta=1.0,
        tolerance=0.0,  # never converges early → exactly 3 rounds
        max_round=3,
        normalized=False,
    ).select("vid", F.round("value", 6).alias("value"))


def q_eigenvector_r2(spark, sf_dir):
    from linkgraph.algorithms import eigenvector_centrality

    return eigenvector_centrality(
        _oracle_graph(spark, sf_dir), tolerance=0.0, max_round=2
    ).select("vid", F.round("value", 6).alias("value"))


def q_kshell(spark, sf_dir):
    from linkgraph.algorithms import k_shell

    return k_shell(_oracle_graph(spark, sf_dir), k=10).select(
        "vid", F.col("value").cast("long").alias("in_shell")
    )


def q_kcore(spark, sf_dir):
    from linkgraph.algorithms import k_core

    return k_core(_oracle_graph(spark, sf_dir), k=20).select(
        "vid", F.col("value").cast("long").alias("in_core")
    )


def q_hits_r2(spark, sf_dir):
    from linkgraph.algorithms import hits

    # tolerance=0 → never converges early → exactly 2 rounds (SQL-unrollable)
    return hits(_oracle_graph(spark, sf_dir), tolerance=0.0, max_round=2).select(
        "vid", F.round("hub", 6).alias("hub"), F.round("auth", 6).alias("auth")
    )


def q_sssp_path_info(spark, sf_dir):
    """1-row summary of gs::SSSPPath: the found path's endpoints + total
    weight (path validity — consecutive edges exist — is asserted here;
    the oracle independently recomputes the true shortest distance)."""
    from linkgraph.algorithms import sssp_path

    g = _oracle_graph(spark, sf_dir)
    e = g.edges.select(
        "src", "dst",
        (F.pmod(F.col("src") + F.col("dst"), F.lit(7)) + 1).cast("double").alias("weight"),
    )
    g2 = LinkGraph(vertices=g.vertices, edges=e)
    lohi = g.vertices.agg(F.min("vid"), F.max("vid")).first()
    src, dst = lohi[0], lohi[1]
    path = sssp_path(g2, src=src, dst=dst)
    if not path:
        return spark.createDataFrame(
            [(src, dst, None)], "src_vid long, dst_vid long, dist long"
        )
    dist = sum(int((a + b) % 7 + 1) for a, b in zip(path, path[1:]))
    return spark.createDataFrame(
        [(src, dst, dist)], "src_vid long, dst_vid long, dist long"
    )


def q_sssp_has_path(spark, sf_dir):
    from linkgraph.algorithms import sssp_has_path

    g = _oracle_graph(spark, sf_dir)
    lohi = g.vertices.agg(F.min("vid"), F.max("vid")).first()
    src, dst = lohi[0], lohi[1]
    ok = sssp_has_path(g, src=src, dst=dst)
    return spark.createDataFrame(
        [(src, dst, bool(ok))], "src_vid long, dst_vid long, has_path boolean"
    )


def q_is_simple_path(spark, sf_dir):
    from linkgraph.algorithms import is_simple_path

    g = _oracle_graph(spark, sf_dir)
    nodes = [0, 1, 2]
    ok = is_simple_path(g, nodes)
    return spark.createDataFrame([(bool(ok),)], "is_path boolean")


def q_kcore_55(spark, sf_dir):
    from linkgraph.algorithms import k_core

    return k_core(_oracle_graph(spark, sf_dir), k=55).select(
        "vid", F.col("value").cast("long").alias("in_core")
    )


def q_kshell_55(spark, sf_dir):
    from linkgraph.algorithms import k_shell

    return k_shell(_oracle_graph(spark, sf_dir), k=55).select(
        "vid", F.col("value").cast("long").alias("in_shell")
    )


def q_dfs(spark, sf_dir):  # rows-only: DFS preorder is inherently sequential
    """gs::DFS — deterministic preorder (ascending-vid neighbor visits)
    from the min vid; no SQL oracle exists (global visited-set pruning is
    not expressible relationally) — pytest checks it against a
    plain-Python recursive-DFS oracle instead (tests/test_paths.py)."""
    from linkgraph.algorithms import dfs

    g = _oracle_graph(spark, sf_dir)
    src = g.vertices.agg(F.min("vid")).first()[0]
    return dfs(g, src=src).select("vid", "rank", "parent")


def q_all_simple_paths(spark, sf_dir):
    from linkgraph.algorithms import all_simple_paths

    g = _oracle_graph(spark, sf_dir)
    lohi = g.vertices.agg(F.min("vid"), F.max("vid")).first()
    return all_simple_paths(g, src=lohi[0], dst=lohi[1], cutoff=3).select(
        F.concat_ws(",", F.transform("path", lambda x: x.cast("string"))).alias("path_csv")
    )


def q_pregel_sssp(spark, sf_dir):
    """SSSP re-implemented on the user-facing Pregel surface
    (linkgraph.pregel) — verified against the same recursive-CTE oracle
    as the built-in sssp, proving the vertex-centric API computes the
    reference semantics."""
    from linkgraph.pregel import pregel_sssp

    g = _oracle_graph(spark, sf_dir)
    e = g.edges.select(
        "src", "dst", (F.pmod(F.col("src") + F.col("dst"), F.lit(7)) + 1).cast("double").alias("weight")
    )
    g2 = LinkGraph(vertices=g.vertices, edges=e)
    src = g.vertices.agg(F.min("vid")).first()[0]
    return (
        pregel_sssp(g2, src=src)
        .where(F.col("value") != float("inf"))
        .select("vid", F.col("value").cast("long").alias("dist"))
    )


def q_modify(spark, sf_dir):
    """MODIFY_VERTICES / MODIFY_EDGES pipeline: delete vertices (with
    incident edges), delete an edge set, add edges with implicit new
    vertices — then REPORT_GRAPH the resulting counts."""
    g = _oracle_graph(spark, sf_dir)
    g = g.remove_vertices(g.vertices.where(F.col("vid") < 5).select("vid"))
    g = g.remove_edges(g.edges.where(F.pmod(F.col("src"), F.lit(50)) == 0))
    g = g.add_edges(
        spark.createDataFrame([(1000, 1001), (1001, 1002)], "src long, dst long")
    )
    return (
        g.edges.agg(F.count("*").alias("n_edges"))
        .crossJoin(g.vertices.agg(F.count("*").alias("n_vertices")))
        .select("n_vertices", "n_edges")
    )


def _prop_graph(spark, sf_dir):
    """Two-label property graph over real tables: customer/order vertices,
    'placed' edges (customer → order) carrying o_totalprice."""
    from linkgraph.property import PropertyGraph

    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c_oid = F.concat(F.lit("c"), F.col("c_custkey").cast("string"))
    o_oid = F.concat(F.lit("o"), F.col("o_orderkey").cast("string"))
    return (
        PropertyGraph()
        .add_vertices(
            customer.select(c_oid.alias("oid"), "c_nationkey", "c_acctbal", "c_mktsegment"),
            label="customer",
        )
        .add_vertices(
            orders.select(o_oid.alias("oid"), "o_totalprice", "o_orderstatus"),
            label="order",
        )
        .add_edges(
            orders.select(
                F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src_oid"),
                o_oid.alias("dst_oid"),
                "o_totalprice",
            ),
            label="placed",
            src_label="customer",
            dst_label="order",
        )
    )


def q_prop_label_counts(spark, sf_dir):
    """REPORT_GRAPH over the property graph: per-label row counts."""
    return _prop_graph(spark, sf_dir).label_counts()


def q_prop_degree(spark, sf_dir):
    """project(labels, no props) → simple graph → out-degrees.

    Isolated vertices (orders, customers with no orders) stay at 0 —
    ArrowProjectedFragment keeps the full projected vertex set."""
    pg = _prop_graph(spark, sf_dir).project(
        {"customer": [], "order": []}, {"placed": []}
    )
    g = pg.to_simple()
    return g.degrees("out").join(g.vertices, "vid").select(
        "oid", F.col("degree").cast("long").alias("degree")
    )


def q_prop_wdegree_building(spark, sf_dir):
    """Property predicate (c_mktsegment = 'BUILDING') + e_prop → weight:
    edges of filtered-out customers are dropped at projection."""
    pg = _prop_graph(spark, sf_dir).select_vertices(
        "customer", F.col("c_mktsegment") == "BUILDING"
    )
    g = pg.to_simple(e_prop="o_totalprice")
    wdeg = g.edges.groupBy("src").agg(F.sum("weight").alias("wdeg"))
    return (
        g.vertices.join(wdeg, g.vertices.vid == wdeg.src, "left")
        .select("oid", F.round(F.coalesce("wdeg", F.lit(0.0)), 2).alias("wdeg"))
    )


def _gie_graph(spark, sf_dir):
    """Three-label graph for Gremlin traversals: customer → order → part."""
    pg = _prop_graph(spark, sf_dir)
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return pg.add_vertices(
        part.select(
            F.concat(F.lit("p"), F.col("p_partkey").cast("string")).alias("oid"),
            "p_brand",
            "p_retailprice",
        ),
        label="part",
    ).add_edges(
        lineitem.select(
            F.concat(F.lit("o"), F.col("l_orderkey").cast("string")).alias("src_oid"),
            F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("dst_oid"),
            "l_quantity",
        ),
        label="contains",
        src_label="order",
        dst_label="part",
    )


def q_gie_status_groupcount(spark, sf_dir):
    """g.V('customer').out('placed').groupCount().by('o_orderstatus')."""
    from linkgraph.gie import traversal

    g = traversal(_gie_graph(spark, sf_dir))
    return g.V("customer").out("placed").groupCount(by="o_orderstatus")


def q_gie_building_values(spark, sf_dir):
    """g.V('customer').has('c_mktsegment','BUILDING').out('placed')
    .values('o_totalprice') — bag semantics (duplicate values kept)."""
    from linkgraph.gie import traversal

    g = traversal(_gie_graph(spark, sf_dir))
    vals = (
        g.V("customer").has("c_mktsegment", "BUILDING").out("placed")
        .values("o_totalprice")
    )
    return vals.select(F.round("value", 2).alias("value"))


def q_gie_twohop_parts(spark, sf_dir):
    """repeat(out()).times(2).dedup().count() from BUILDING customers —
    distinct parts reachable through their orders."""
    from linkgraph.gie import traversal

    g = traversal(_gie_graph(spark, sf_dir))
    return (
        g.V("customer").has("c_mktsegment", "BUILDING")
        .repeat(lambda t: t.out(), times=2)
        .dedup()
        .count()
    )


def q_gie_top_edges(spark, sf_dir):
    """g.E('placed').order().by('o_totalprice', desc).limit(10) — ORDER +
    RANGE over an edge frontier (ties share a value, so the limit-10 value
    multiset is engine-independent)."""
    from linkgraph.gie import traversal

    g = traversal(_gie_graph(spark, sf_dir))
    top = g.E("placed").order("o_totalprice", ascending=False).limit(10)
    return top.values("o_totalprice").select(F.round("value", 2).alias("value"))


def q_gie_paths(spark, sf_dir):
    """withPath().out().out().simplePath().path() — PATH_OUT/SIMPLE_PATH
    (query_flow.proto:95,98); paths flattened to strings for the oracle."""
    from linkgraph.gie import traversal

    g = traversal(_gie_graph(spark, sf_dir))
    t = (
        g.V("customer")
        .has("c_mktsegment", "BUILDING")
        .has("c_nationkey", lambda c: c == 1)
        .withPath()
        .out("placed")
        .out("contains")
        .simplePath()
    )
    return t.path().select(F.concat_ws("/", "path").alias("path"))


def q_gie_select_one(spark, sf_dir):
    """as_('c').out('placed').has('o_orderstatus','F').select_('c').dedup()
    .count() — SELECT_ONE (query_flow.proto:89): customers with ≥1 'F'
    order, found by jumping back to the tagged step."""
    from linkgraph.gie import traversal

    g = traversal(_gie_graph(spark, sf_dir))
    return (
        g.V("customer").as_("c").out("placed").has("o_orderstatus", "F")
        .select_("c").dedup().count()
    )


def q_gie_union(spark, sf_dir):
    """union(out('placed'), out('placed').out('contains')).count() — UNION
    (:83) with bag semantics: BUILDING customers' orders plus those
    orders' lineitem fan-out, counted together."""
    from linkgraph.gie import traversal

    g = traversal(_gie_graph(spark, sf_dir))
    return (
        g.V("customer").has("c_mktsegment", "BUILDING")
        .union(
            lambda t: t.out("placed"),
            lambda t: t.out("placed").out("contains"),
        )
        .count()
    )


def q_gie_group_sum(spark, sf_dir):
    """group().by('o_orderstatus').by(sum('o_totalprice')) — keyed
    aggregation (:107,:115-123) over a vertex frontier."""
    from linkgraph.gie import traversal

    g = traversal(_gie_graph(spark, sf_dir))
    grp = g.V("customer").out("placed").group_by("o_orderstatus", "sum", "o_totalprice")
    return grp.select("key", F.round("value", 2).alias("value"))


def q_gie_sample(spark, sf_dir):
    """sample(20) — SAMPLE (:141) as a deterministic md5 hash-rank top-n,
    so the DuckDB oracle replays the identical sample."""
    from linkgraph.gie import traversal

    g = traversal(_gie_graph(spark, sf_dir))
    return g.V("customer").sample(20, seed=7).df.select("oid")


def q_gie_otherv(spark, sf_dir):
    """bothE('contains').otherV() — OTHER_V (:114): orders reached from
    Brand#13 parts through their incident edges, whichever direction."""
    from linkgraph.gie import traversal

    g = traversal(_gie_graph(spark, sf_dir))
    return (
        g.V("part").has("p_brand", "Brand#13")
        .bothE("contains").otherV().dedup().count()
    )


def q_gie_choose_sack(spark, sf_dir):
    """choose() (BRANCH/BRANCH_OPTION, query_flow.proto:82,:143) +
    withSack/sackBy/sack (SACK_OUT :106): per-traverser cost accumulation
    routed by a predicate. High-value orders (> 150k) add their price to
    the sack; every contains-hop adds its quantity; emission is the
    Gremlin group().by(part).by(sack().sum()) form."""
    from linkgraph.gie import traversal

    g = traversal(_gie_graph(spark, sf_dir))
    t = (
        g.V("customer")
        .withSack(0.0)
        .outE("placed")
        .choose(
            F.col("o_totalprice") > 150000.0,
            lambda e: e.sackBy("o_totalprice", "sum"),
        )
        .inV()
        .outE("contains")
        .sackBy("l_quantity", "sum")
        .inV()
    )
    return t.sack(by="oid").select(
        "key", F.round("value", 2).alias("value")
    )


def _gie_subgraph(spark, sf_dir):
    """BUILDING customers' 'placed' edges materialized as a LinkGraph —
    the GIE→GAE pipeline sink (query_flow.proto:146-147)."""
    from linkgraph.gie import traversal

    g = traversal(_gie_graph(spark, sf_dir))
    return (
        g.V("customer").has("c_mktsegment", "BUILDING").outE("placed").subgraph()
    )


def q_gie_subgraph_degree(spark, sf_dir):
    """subgraph() sink: traversal result → LinkGraph → out-degrees (checks
    the materialized vertex set, edge set and dense-id mapping)."""
    sub = _gie_subgraph(spark, sf_dir)
    return sub.degrees("out").join(sub.vertices, "vid").select(
        "oid", F.col("degree").cast("long").alias("degree")
    )


def q_gie_subgraph_wcc(spark, sf_dir):
    """GIE→GAE end-to-end: traversal → subgraph() → wcc. Component ids are
    translated back to oids (dense vids are rank-in-sorted-oid-order, so
    min-vid == lexicographically-min oid, which DuckDB replays)."""
    from linkgraph.algorithms import wcc

    sub = _gie_subgraph(spark, sf_dir)
    comp = wcc(sub)
    rep = sub.vertices.select(F.col("vid").alias("value"), F.col("oid").alias("comp_oid"))
    return comp.join(sub.vertices, "vid").join(rep, "value").select("oid", "comp_oid")


def q_gie_not_props(spark, sf_dir):
    """not_() (NOT, query_flow.proto:113) + properties() (PROPERTIES :126):
    customers with no 'F'-status order, flattened to (oid, key, value)
    property rows. The NOT branch runs over the deduped element set and
    anti-joins — never a per-traverser subquery."""
    from linkgraph.gie import traversal

    g = traversal(_gie_graph(spark, sf_dir))
    return (
        g.V("customer")
        .not_(lambda t: t.out("placed").has("o_orderstatus", "F"))
        .properties("c_mktsegment")
    )


def q_gie_range(spark, sf_dir):
    """order().range_(low, high) (RANGE :81): rows [5, 15) of the
    oid-ordered customer stream — Catalyst offset+limit, one plan."""
    from linkgraph.gie import traversal

    g = traversal(_gie_graph(spark, sf_dir))
    return g.V("customer").order("oid").range_(5, 15).df.select("oid")


def q_gie_mean(spark, sf_dir):
    """Global aggregate (SUM-family :115-123 degenerate keyless form):
    mean o_totalprice over the order frontier reached from BUILDING
    customers — bag semantics (each traverser counts once)."""
    from linkgraph.gie import traversal

    g = traversal(_gie_graph(spark, sf_dir))
    t = g.V("customer").has("c_mktsegment", "BUILDING").out("placed")
    return t.mean("o_totalprice").select(F.round("value", 4).alias("value"))


def q_gie_match(spark, sf_dir):
    """match() conjunctive pattern join: BUILDING customers, their 'F'
    orders, and the parts those orders contain — three bindings read out
    with select('c','o','p'). One Catalyst plan of equi joins; AQE picks
    the join order/strategy as for hand-written SQL."""
    from linkgraph.gie import traversal

    g = traversal(_gie_graph(spark, sf_dir))
    return (
        g.V("customer").has("c_mktsegment", "BUILDING")
        .match(
            ("c", lambda t: t.out("placed").has("o_orderstatus", "F"), "o"),
            ("o", lambda t: t.out("contains"), "p"),
        )
        .select("c", "o", "p")
    )


def q_gie_repeat_until(spark, sf_dir):
    """repeat(out()).until(hasLabel('part')) — REPEAT with the until()
    convergence modulation (query_flow.proto:87-88): BUILDING customers'
    traversers iterate hops until they land on a part, then exit the loop
    and groupCount by brand. Traversers exit at different depths (orders
    have no 'part' label; parts do) and dead-ends die silently — the
    loop's driver-side emptiness check terminates it."""
    from linkgraph.gie import traversal

    g = traversal(_gie_graph(spark, sf_dir))
    return (
        g.V("customer").has("c_mktsegment", "BUILDING")
        .repeat(lambda t: t.out(), until=lambda t: t.hasLabel("part"))
        .groupCount(by="p_brand")
    )


def q_gie_text_until(spark, sf_dir):
    """TEXT twin of gie_repeat_until — same query as a Gremlin string
    through linkgraph/gremlin.py (the reference compiles textual Gremlin:
    interactive_engine/compiler/.../TraversalTranslator.java; SURVEY
    §3.3). Shares gie_repeat_until's oracle, so a green row here proves
    parser → fluent lowering end-to-end."""
    from linkgraph.gremlin import gremlin

    q = gremlin(_gie_graph(spark, sf_dir))
    return q.execute(
        "g.V('customer').has('c_mktsegment', 'BUILDING')"
        ".repeat(__.out()).until(__.hasLabel('part'))"
        ".groupCount().by('p_brand')"
    )


def q_gie_text_twohop(spark, sf_dir):
    """TEXT twin of gie_twohop_parts (r2-green): parsed string with
    repeat().times(2), anonymous-traversal body, dedup + count — shares
    gie_twohop_parts' oracle SQL."""
    from linkgraph.gremlin import gremlin

    q = gremlin(_gie_graph(spark, sf_dir))
    return q.execute(
        "g.V('customer').has('c_mktsegment', 'BUILDING')"
        ".repeat(__.out()).times(2).dedup().count()"
    )


def q_gie_text_match(spark, sf_dir):
    """TEXT match(): conjunctive patterns with as-bindings, parsed from a
    string into the fluent match() triples — customers (BUILDING) with
    their orders and the parts those orders contain, all three bindings
    read out with a terminal select."""
    from linkgraph.gremlin import gremlin

    q = gremlin(_gie_graph(spark, sf_dir))
    return q.execute(
        "g.V('customer').has('c_mktsegment', 'BUILDING')"
        ".match(__.as('c').out('placed').as('o'), __.as('o').out('contains').as('p'))"
        ".select('c', 'o', 'p')"
    )


def q_gie_text_choose(spark, sf_dir):
    """TEXT choose(traversal, t, f): existential predicate routes each
    customer either to its orders or (no orders) passes it through —
    the bag union is counted. filter_/not_ routing over one shared
    deduped predicate scan."""
    from linkgraph.gremlin import gremlin

    q = gremlin(_gie_graph(spark, sf_dir))
    return q.execute(
        "g.V('customer').choose(__.out('placed'), __.out('placed'), __.identity()).count()"
    )


def q_gie_math(spark, sf_dir):
    """math() step (MATH, query_flow.proto:150): per-traverser arithmetic
    over tagged-element properties, lowered to one Catalyst expression —
    customer balance + order price along each 'placed' edge."""
    from linkgraph.gie import traversal

    g = traversal(_gie_graph(spark, sf_dir))
    vals = (
        g.V("customer").as_("c").out("placed")
        .math_("(c + _) / 2", by={"c": "c_acctbal", "_": "o_totalprice"})
    )
    return vals.select(F.round("value", 4).alias("value"))


def q_corpus_edges(spark, sf_dir):
    """End-to-end corpus derivation: synth (repo,path,commit,lang,content)
    table → regex import extraction → resolved (src_oid, dst_oid) edges.

    The DuckDB oracle replays the md5-portable generator's *target
    selection* directly (it never sees the content strings), so the two
    engines reach the same edge set by independent routes — Spark via
    regexp_extract_all over content, DuckDB via the generator arithmetic.
    """
    corpus = synth_corpus(spark, 2000, seed=42, hash_mode="md5")
    return derive_edges(corpus)


def q_corpus_repo_graph(spark, sf_dir):
    """Repo-level rollup of the file-level dependency graph via
    quotient_graph: group = the repo prefix of the vertex oid, edge
    weight = number of underlying file→file imports. The DuckDB oracle
    replays the generator arithmetic (as corpus_edges does) and groups
    by split_part(oid, ':', 1) — fully independent derivation."""
    from linkgraph.graph import quotient_graph

    # NOTE: no unpersist here — the returned DataFrame still reads both
    # graphs' dense-vid maps, and releasing them before the driver
    # collects lets the maps recompute inconsistently between the two
    # oid-join branches (observed as duplicate repo-pair rows). Queries
    # follow the _corpus_graph pattern: residency lives until session end.
    g = _corpus_graph(spark)
    labels = g.vertices.select(
        "vid", F.split(F.col("oid"), ":").getItem(0).alias("grp")
    )
    q = quotient_graph(g, labels)
    vs = q.vertices
    return (
        q.edges.join(
            vs.select(F.col("vid").alias("src"), F.col("oid").alias("src_repo")), "src"
        )
        .join(vs.select(F.col("vid").alias("dst"), F.col("oid").alias("dst_repo")), "dst")
        .select("src_repo", "dst_repo", F.col("weight").cast("long").alias("weight"))
    )


def q_condensation(spark, sf_dir):
    """SCC condensation DAG: (src_comp, dst_comp, weight) with comp =
    canonical SCC id (max member vid) and weight = underlying edge count.

    The full oracle graph is one giant SCC (empty DAG — trivially
    hash-equal), so the query restricts the edge set deterministically
    (forward edges + back edges from src % 7 == 0) to 21 components /
    35 DAG edges at sf0.01 — real structure for the comparison."""
    from linkgraph.algorithms import condensation
    from linkgraph.graph import LinkGraph

    g0 = _oracle_graph(spark, sf_dir)
    g = LinkGraph(
        vertices=g0.vertices,
        edges=g0.edges.where((F.col("src") < F.col("dst")) | (F.col("src") % 7 == 0)),
    )
    q = condensation(g)
    vs = q.vertices
    out = (
        q.edges.join(
            vs.select(F.col("vid").alias("src"), F.col("oid").alias("s")), "src"
        )
        .join(vs.select(F.col("vid").alias("dst"), F.col("oid").alias("d")), "dst")
        .select(
            F.col("s").cast("long").alias("src_comp"),
            F.col("d").cast("long").alias("dst_comp"),
            F.col("weight").cast("long").alias("weight"),
        )
    )
    return out


def q_corpus_pagerank(spark, sf_dir):
    """rows-only BY COMPOSITION: converged PageRank (unknown round count →
    not SQL-unrollable), but its input edge table is oracle-green via
    ``corpus_edges`` and the kernel is oracle-green via ``g_pagerank_r3``/
    the convergence pytest oracle."""
    from linkgraph.algorithms import pagerank_nx

    g = _corpus_graph(spark)
    return (
        pagerank_nx(g, alpha=ALPHA, max_iter=100, tol=1e-6)
        .join(g.vertices, "vid")
        .select("oid", F.round("value", 6).alias("value"))
    )


def q_corpus_pagerank_r3(spark, sf_dir):
    """Fixed-round PageRank on the derived corpus graph, fully
    hash-checked: the DuckDB oracle replays the md5 generator's edge
    derivation AND the unrolled rounds keyed directly by oid."""
    from linkgraph.algorithms import pagerank

    g = _corpus_graph(spark)
    pr = pagerank(g, delta=ALPHA, max_round=PR_ROUNDS)
    return pr.join(g.vertices, "vid").select("oid", F.round("value", 6).alias("value"))


def q_corpus_pagerank_dense(spark, sf_dir):
    """The SAME fixed-round PageRank, but on the dense-chunk scale tier
    (csr.py pagerank_csr_dense — array-packed partials, the 100-TB path),
    against the SAME unrolled DuckDB oracle: a driver-green row proving
    the scale tier computes the reference kernel bit-for-bit (join-tier
    parity is separately test-asserted to atol 1e-12)."""
    from linkgraph.csr import pagerank_csr_dense

    g = _corpus_graph(spark)
    pr = pagerank_csr_dense(g, alpha=ALPHA, tol=None, max_iter=PR_ROUNDS)
    return pr.join(g.vertices, "vid").select("oid", F.round("value", 6).alias("value"))


def q_corpus_wcc(spark, sf_dir):
    """Converged WCC on the derived corpus graph — exactly expressible as
    a recursive-CTE min-reachable oracle (component id = min dense vid =
    row_number of the lexicographically-min oid)."""
    from linkgraph.algorithms import wcc

    g = _corpus_graph(spark)
    return wcc(g).join(g.vertices, "vid").select("oid", F.col("value").alias("comp"))


# ---- documents / embeddings ----


def q_doc_tokens(spark, sf_dir):
    from linkgraph.pipeline import token_counts

    return token_counts(_docs(spark, sf_dir))


def q_doc_quality(spark, sf_dir):
    from linkgraph.pipeline import quality_scores

    return quality_scores(_docs(spark, sf_dir)).select(
        "doc_id",
        "n_chars",
        "n_words",
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
    )


def q_doc_langid(spark, sf_dir):
    from linkgraph.pipeline import language_id

    return language_id(_docs(spark, sf_dir))


def q_doc_fingerprint(spark, sf_dir):
    from linkgraph.pipeline import fingerprints

    return fingerprints(_docs(spark, sf_dir)).select("doc_id", "norm_md5")


def q_doc_exact_dedup_count(spark, sf_dir):
    from linkgraph.pipeline import exact_dedup

    return exact_dedup(_docs(spark, sf_dir)).agg(F.count("*").alias("n_unique"))


def q_doc_minhash_dups(spark, sf_dir):
    """md5 hash mode → signatures, band hashes and the bucket cap replay
    bit-identically in the DuckDB oracle (full LSH pipeline checked)."""
    from linkgraph.pipeline import minhash_lsh_duplicates

    return minhash_lsh_duplicates(
        _docs(spark, sf_dir), threshold=0.5, hash_mode="md5", max_bucket_size=100
    ).select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def q_doc_simhash_dups(spark, sf_dir):
    """Wide-chunk multi-probe banding has 100% recall within the radius,
    so the oracle is the exact all-pairs Hamming join over DuckDB-
    recomputed signatures (md5 mode → identical 60-bit signatures)."""
    from linkgraph.pipeline import simhash_duplicates

    return simhash_duplicates(
        _docs(spark, sf_dir), max_hamming=6, hash_mode="md5"
    ).select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))


def q_emb_knn(spark, sf_dir):
    from linkgraph.pipeline import cosine_topk

    embs = _embs(spark, sf_dir)
    queries = embs.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return cosine_topk(embs, queries, k=10).select(
        "query_id",
        "vec_id",
        F.round("cosine", 6).alias("cosine"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_doc_ngram_jaccard(spark, sf_dir):
    from linkgraph.pipeline import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _docs(spark, sf_dir), k=3, threshold=0.4, max_shingle_freq=100
    ).select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def q_doc_repetition(spark, sf_dir):
    from linkgraph.pipeline import repetition_scores

    return repetition_scores(_docs(spark, sf_dir)).select(
        "doc_id",
        "n_lines",
        F.round("dup_line_ratio", 6).alias("dup_line_ratio"),
        F.round("dup_line_char_ratio", 6).alias("dup_line_char_ratio"),
        F.round("top_bigram_ratio", 6).alias("top_bigram_ratio"),
    )


def q_doc_split_counts(spark, sf_dir):
    """md5 hash mode → the split decision replays in DuckDB exactly."""
    from linkgraph.pipeline import hash_split

    return (
        hash_split(_docs(spark, sf_dir), seed=42, hash_mode="md5")
        .groupBy("split")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("chars"))
    )


def q_doc_sample(spark, sf_dir):
    """Deterministic per-lang stratified 25% sample (md5 hash mode)."""
    from linkgraph.pipeline import stratified_sample

    return stratified_sample(
        _docs(spark, sf_dir), 0.25, strata_col="lang", seed=7, hash_mode="md5"
    ).select("doc_id", "lang")


def q_doc_contamination(spark, sf_dir):
    """Benchmark-overlap screening: eval set = every 50th doc."""
    from linkgraph.pipeline import contamination_check

    docs = _docs(spark, sf_dir)
    bench = docs.where(F.pmod(F.col("doc_id"), F.lit(50)) == 0)
    return contamination_check(docs, bench, n=3, threshold=0.1).select(
        "doc_id",
        "n_grams",
        "n_contaminated",
        F.round("contamination_ratio", 6).alias("contamination_ratio"),
        "contaminated",
    )


def q_doc_dedup_clusters(spark, sf_dir):
    """MinHash near-dup pairs (md5 mode, oracle-green via doc_minhash_dups)
    → WCC over the pair graph → (doc_id, canonical): the full
    measure→cluster→keep dedup decision, checked end-to-end against a
    recursive-CTE min-reachable-id oracle."""
    from linkgraph.pipeline import dedup_clusters, minhash_lsh_duplicates

    pairs = minhash_lsh_duplicates(
        _docs(spark, sf_dir), threshold=0.5, hash_mode="md5", max_bucket_size=100
    ).select("id_a", "id_b")
    return dedup_clusters(pairs)


def q_doc_pii(spark, sf_dir):
    from linkgraph.pipeline import pii_scrub

    return pii_scrub(_docs(spark, sf_dir)).select(
        "doc_id",
        "n_email",
        "n_phone",
        "n_ipv4",
        F.md5("redacted").alias("redacted_md5"),
    )


def q_ppr_rounds(spark, sf_dir):
    """Personalized PageRank (nx pagerank(personalization=...) semantics),
    fixed rounds; seeds = vids ≡ 0 (mod 20), uniform weight."""
    from linkgraph.algorithms import pagerank

    g = _oracle_graph(spark, sf_dir)
    pers = g.vertices.where(F.pmod(F.col("vid"), F.lit(20)) == 0).select(
        "vid", F.lit(1.0).alias("weight")
    )
    return pagerank(
        g, delta=ALPHA, max_round=PR_ROUNDS, personalization=pers
    ).select("vid", F.round("value", 6).alias("value"))


def q_emb_lsh_ann(spark, sf_dir):
    from linkgraph.pipeline import lsh_ann_topk

    embs = _embs(spark, sf_dir)
    queries = embs.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return lsh_ann_topk(embs, queries, k=10).select(
        "query_id", "vec_id", F.round("cosine", 6).alias("cosine"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_media_features(spark, sf_dir):
    """synth_media is md5-portable, so the DuckDB oracle regenerates the
    table and replays the sha256-keyed fake decode exactly (the real-codec
    call is the documented stub; the Arrow plumbing is what's verified)."""
    from linkgraph.pipeline.multimodal import extract_features, synth_media

    return extract_features(synth_media(spark, 200, seed=42)).select(
        "media_id",
        "modality",
        F.round(F.element_at("feature", 1).cast("double"), 6).alias("f0"),
        F.size("feature").cast("long").alias("dim"),
    )


def q_media_frames(spark, sf_dir):
    """Frame-sampling fan-out; oracle replays the md5-portable generator."""
    from linkgraph.pipeline.multimodal import sample_frames, synth_media

    return sample_frames(synth_media(spark, 200, seed=42), every_n=30).select(
        "media_id", F.col("frame_idx").cast("long").alias("frame_idx")
    )


def q_emb_ivf_ann(spark, sf_dir):
    """IVF ANN: seed-sampled coarse quantizer (deterministic ids, so the
    oracle recomputes the identical quantizer from the table itself),
    nprobe=2 probed lists, exact re-rank within lists."""
    from linkgraph.pipeline import ivf_ann_topk

    embs = _embs(spark, sf_dir)
    queries = embs.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_ann_topk(embs, queries, k=10, n_centroids=8, nprobe=2, stride=17).select(
        "query_id", "vec_id", F.round("cosine", 6).alias("cosine"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_stream_event_counts(spark, sf_dir):
    """Watermarked tumbling-window aggregation over the events table run
    as a real Structured Streaming query (file source, availableNow
    trigger, memory sink) — the drained result equals the batch
    computation, which is what the DuckDB time_bucket oracle checks."""
    from linkgraph.streaming import (
        run_available_now,
        stream_parquet,
        windowed_event_counts,
    )

    import tempfile

    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    tmp = tempfile.mkdtemp(prefix="lg_stream_events_")
    batch.repartition(2).write.mode("overwrite").parquet(tmp)  # file source needs a dir
    sdf = stream_parquet(spark, tmp, batch.schema)
    res = run_available_now(windowed_event_counts(sdf, "1 hour", "2 hours"))
    return res.select(
        F.col("window_start").cast("string").alias("window_start"),
        "event_type",
        F.col("n").cast("long").alias("n"),
        "sum_value",
    )


def q_stream_wcc(spark, sf_dir):
    """The oracle graph's edges ingested as a 4-micro-batch edge STREAM:
    each batch extends the graph append-only (stable vids) and
    re-converges WCC warm-started from the previous labels. The final
    canonical components must equal the static g_wcc oracle — streaming
    arrival order must not matter."""
    import tempfile

    from linkgraph.streaming import canonical_components, stream_parquet, streaming_wcc

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    edges = (
        orders.select(
            F.pmod(F.col("o_custkey"), F.lit(V_MOD)).alias("s"),
            F.pmod(F.col("o_orderkey"), F.lit(V_MOD)).alias("d"),
        )
        .where(F.col("s") != F.col("d"))
        .select(
            F.col("s").cast("string").alias("src_oid"),
            F.col("d").cast("string").alias("dst_oid"),
        )
    )
    tmp = tempfile.mkdtemp(prefix="lg_stream_edges_")
    edges.repartition(4).write.mode("overwrite").parquet(tmp)
    sdf = stream_parquet(spark, tmp, "src_oid string, dst_oid string")
    g, labels = streaming_wcc(sdf)
    return canonical_components(g, labels).select(
        F.col("oid_num").alias("vid"), F.col("comp").cast("long").alias("comp")
    )


def q_evt_sessions(spark, sf_dir):
    """session_window sessionization (batch plan — the identical
    aggregation runs streaming with a watermark; test_streaming.py
    exercises that path). Oracle: gaps-and-islands in SQL; timestamps
    compared as exact epoch microseconds."""
    from linkgraph.streaming import sessionize

    return sessionize(
        spark.read.parquet(f"{sf_dir}/events.parquet"), gap="30 minutes"
    ).select(
        "user_id",
        "session_start_us",
        "session_end_us",
        F.col("n").cast("long").alias("n"),
        "sum_value",
    )


def q_evt_user_totals(spark, sf_dir):
    """Custom stateful streaming op (applyInPandasWithState): per-user
    running totals drained with availableNow must equal the batch
    groupBy — a hard SQL oracle over arbitrary user state."""
    import tempfile

    from linkgraph.streaming import running_user_totals, stream_parquet

    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    tmp = tempfile.mkdtemp(prefix="lg_stream_events_")
    batch.repartition(2).write.mode("overwrite").parquet(tmp)
    sdf = stream_parquet(spark, tmp, batch.schema)
    return running_user_totals(sdf).select(
        "user_id", F.col("n").cast("long").alias("n"), "sum_value"
    )


def q_emb_neardup(spark, sf_dir):
    from linkgraph.pipeline import embedding_near_duplicates

    return embedding_near_duplicates(_embs(spark, sf_dir), threshold=0.5, exact=True).select(
        "id_a", "id_b", F.round("cosine", 6).alias("cosine")
    )


# Registry order is load-bearing: the external driver hard-checks only the
# FIRST 50 entries (r2 lesson — see SURVEY.md §8).  Order therefore is:
#   1. entries that have never had a driver verdict (r2's 19 escapees),
#   2. entries new this round,
#   3. the core-algorithm set that anchors reference parity,
#   4. tail: entries already driver-green in r1+r2 (re-verified by pytest).
QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # --- r4 window head: entries needing a fresh driver verdict.
    # g_sssp_csr/g_cdlp_csr have exact oracles (aliased to their join-tier
    # twins) but sat at positions 102-103 in r3 — never driver-checked.
    # doc_repetition/doc_split_counts were red in r3 from DuckDB HUGEINT
    # oracle typing (sum() uncast); both oracles now cast ::BIGINT.
    "g_sssp_csr": q_sssp_csr,
    "g_cdlp_csr": q_cdlp_csr,
    "doc_repetition": q_doc_repetition,
    "doc_split_counts": q_doc_split_counts,
    # --- new in r4 (slots inserted as operators land)
    "gie_repeat_until": q_gie_repeat_until,
    "gie_text_until": q_gie_text_until,
    "gie_text_twohop": q_gie_text_twohop,
    "g_louvain_p1": q_louvain_p1,
    "g_node2vec": q_node2vec,
    "g_pagerank_delta": q_pagerank_delta,
    "g_pagerank_incr": q_pagerank_incr,
    "g_density": q_density,
    "g_reciprocity": q_reciprocity,
    "g_avg_neighbor_degree": q_avg_neighbor_degree,
    "stream_pagerank": q_stream_pagerank,
    "g_sssp_incr": q_sssp_incr,
    "g_wcc_incr": q_wcc_incr,
    "g_triangles_incr": q_triangles_incr,
    "g_mis": q_mis,
    "g_coloring": q_coloring,
    "g_ktruss": q_ktruss,
    "g_core_number": q_core_number,
    "g_onion": q_onion,
    "g_rich_club": q_rich_club,
    "g_s_metric": q_s_metric,
    "g_global_efficiency": q_global_efficiency,
    "gie_math": q_gie_math,
    "gie_text_match": q_gie_text_match,
    "gie_text_choose": q_gie_text_choose,
    "g_wcc_csr": q_wcc_csr,
    "g_bfs_csr": q_bfs_csr,
    "g_linkpred": q_linkpred,
    "g_voterank": q_voterank,
    "g_sample_neighbors": q_sample_neighbors,
    "g_khop_sample": q_khop_sample,
    "g_negative_sample": q_negative_sample,
    "g_saveload": q_saveload,
    "g_eccentricity": q_eccentricity,
    "g_diameter_radius": q_diameter_radius,
    "g_harmonic": q_harmonic,
    "corpus_repo_graph": q_corpus_repo_graph,
    "g_condensation": q_condensation,
    "g_wiener": q_wiener,
    "g_effective_size": q_effective_size,
    "g_constraint": q_constraint,
    "g_local_bridges": q_local_bridges,
    "g_is_bipartite": q_is_bipartite,
    "g_degree_histogram": q_degree_histogram,
    "g_triadic_census": q_triadic_census,
    "g_square_clustering": q_square_clustering,
    # --- r3-green entries kept in-window (property graph / corpus / pipeline)
    "g_prop_label_counts": q_prop_label_counts,
    "g_prop_degree": q_prop_degree,
    "g_prop_wdegree_building": q_prop_wdegree_building,
    "corpus_edges": q_corpus_edges,
    "corpus_pagerank_r3": q_corpus_pagerank_r3,
    "corpus_pagerank_dense": q_corpus_pagerank_dense,
    "corpus_wcc": q_corpus_wcc,
    "doc_tokens": q_doc_tokens,
    "doc_quality": q_doc_quality,
    "doc_langid": q_doc_langid,
    "doc_fingerprint": q_doc_fingerprint,
    "doc_exact_dedup_count": q_doc_exact_dedup_count,
    "doc_minhash_dups": q_doc_minhash_dups,
    "doc_simhash_dups": q_doc_simhash_dups,
    "doc_ngram_jaccard": q_doc_ngram_jaccard,
    "emb_knn": q_emb_knn,
    "emb_neardup": q_emb_neardup,
    "emb_lsh_ann": q_emb_lsh_ann,
    "emb_ivf_ann": q_emb_ivf_ann,
    "media_features": q_media_features,
    "media_frames": q_media_frames,
    # --- new in r3 (slots inserted as operators land)
    "gie_select_one": q_gie_select_one,
    "gie_union": q_gie_union,
    "gie_group_sum": q_gie_group_sum,
    "gie_sample": q_gie_sample,
    "gie_otherv": q_gie_otherv,
    "gie_choose_sack": q_gie_choose_sack,
    "gie_subgraph_degree": q_gie_subgraph_degree,
    "gie_subgraph_wcc": q_gie_subgraph_wcc,
    "g_closeness_sampled": q_closeness_sampled,
    "g_csv_load": q_csv_load,
    "g_append_pagerank": q_append_pagerank,
    "nx_degree_centrality": q_nx_degree_centrality,
    "stream_event_counts": q_stream_event_counts,
    "stream_wcc": q_stream_wcc,
    "evt_sessions": q_evt_sessions,
    "evt_user_totals": q_evt_user_totals,
    "doc_sample": q_doc_sample,
    "doc_contamination": q_doc_contamination,
    "doc_dedup_clusters": q_doc_dedup_clusters,
    "doc_pii": q_doc_pii,
    "g_ppr_r3": q_ppr_rounds,
    "g_betweenness_ep": q_betweenness_ep,
    "g_betweenness_w": q_betweenness_w,
    # --- core algorithm parity set
    "gie_not_props": q_gie_not_props,
    "gie_match": q_gie_match,
    "gie_range": q_gie_range,
    "gie_mean": q_gie_mean,
    "g_edges": q_edges,
    "g_summary": q_graph_summary,
    "g_pagerank_r3": q_pagerank_rounds,
    "g_wcc": q_wcc,
    "g_scc": q_scc,
    "g_cdlp_r2": q_cdlp,
    "g_triangles": q_triangles,
    "g_triangle_total": q_triangle_total,
    "g_bfs": q_bfs,
    "g_sssp": q_sssp,
    "g_hits_r2": q_hits_r2,
    "g_kcore_20": q_kcore,
    "g_kshell_10": q_kshell,
    "g_betweenness": q_betweenness,
    "g_closeness": q_closeness,
    "g_clustering": q_clustering,
    "g_katz_r3": q_katz_r3,
    "g_lpa_u2i_r2": q_lpa_u2i_r2,
    "g_lpa_u2i_vec_r2": q_lpa_u2i_vector_r2,
    "g_pregel_sssp": q_pregel_sssp,
    # --- tail: driver-green in r1/r2 (pytest keeps them verified)
    "g_modify": q_modify,
    "g_apsp": q_apsp,
    "g_eigenvector_r2": q_eigenvector_r2,
    "g_out_degree": q_out_degree,
    "g_in_degree": q_in_degree,
    "g_degree_centrality": q_degree_centrality,
    "g_avg_path_length": q_avg_path_length,
    "g_bfs_tree": q_bfs_tree,
    "g_numeric_assortativity": q_numeric_assortativity,
    "g_attr_assortativity": q_attr_assortativity,
    "g_degree_assortativity": q_degree_assortativity,
    "g_avg_degree_connectivity": q_avg_degree_connectivity,
    "g_node_boundary": q_node_boundary,
    "g_edge_boundary": q_edge_boundary,
    "g_transitivity": q_transitivity,
    "g_avg_clustering": q_avg_clustering,
    "g_louvain": q_louvain,
    "g_sampling_paths": q_sampling_paths,
    "g_kcore_55": q_kcore_55,
    "g_kshell_55": q_kshell_55,
    "g_sssp_path": q_sssp_path_info,
    "g_sssp_has_path": q_sssp_has_path,
    "g_is_simple_path": q_is_simple_path,
    "g_dfs": q_dfs,
    "g_all_simple_paths_c3": q_all_simple_paths,
    "gie_status_groupcount": q_gie_status_groupcount,
    "gie_building_values": q_gie_building_values,
    "gie_twohop_parts": q_gie_twohop_parts,
    "gie_top_edges": q_gie_top_edges,
    "gie_paths": q_gie_paths,
    # rows-only (converged, no closed-form SQL oracle); hash evidence comes
    # from its fixed-round siblings corpus_pagerank_r3/corpus_pagerank_dense
    "corpus_pagerank": q_corpus_pagerank,
}


# ---------------------------------------------------------------- oracles


def _louvain_p1_sql(rounds: int = 4) -> str:
    """Unrolled SQL twin of louvain_phase1: ``rounds`` synchronous
    local-move rounds (parity-damped, ties → smallest community id),
    then canonical community = min member vid. Every quantity is an
    integer-valued double (w = 1 sums), so ΔQ is bit-identical between
    DuckDB and Spark — the multiplication/division association order in
    the gain expression deliberately mirrors louvain._round_moves."""
    ctes = [
        f"e AS MATERIALIZED ({_EDGES_SQL})",
        "su AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi"
        " FROM e WHERE src <> dst)",
        "ew AS MATERIALIZED (SELECT lo AS src, hi AS dst, 1.0 AS w FROM su"
        " UNION ALL SELECT hi AS src, lo AS dst, 1.0 AS w FROM su)",
        "deg AS MATERIALIZED (SELECT src AS vid, sum(w) AS k FROM ew GROUP BY src)",
        "mm AS MATERIALIZED (SELECT sum(w) / 2 AS m FROM ew)",
        "a0 AS MATERIALIZED (SELECT DISTINCT src AS vid, src AS comm FROM ew)",
    ]
    for r in range(rounds):
        parity = r % 2
        ctes += [
            f"""tot{r} AS MATERIALIZED (
    SELECT a.comm, sum(d.k) AS tot FROM a{r} a JOIN deg d ON d.vid = a.vid
    GROUP BY a.comm)""",
            f"""nbr{r} AS MATERIALIZED (
    SELECT e.src AS vid, a.comm AS c_nbr, sum(e.w) AS k_in
    FROM ew e JOIN a{r} a ON a.vid = e.dst GROUP BY e.src, a.comm)""",
            f"""cand{r} AS MATERIALIZED (
    SELECT n.vid, a.comm, n.c_nbr,
           n.k_in / mm.m
             - d.k * (t.tot - CASE WHEN n.c_nbr = a.comm THEN d.k ELSE 0.0 END)
               / (2.0 * mm.m * mm.m) AS gain
    FROM nbr{r} n
    JOIN deg d ON d.vid = n.vid
    JOIN a{r} a ON a.vid = n.vid
    JOIN tot{r} t ON t.comm = n.c_nbr
    CROSS JOIN mm)""",
            f"""best{r} AS MATERIALIZED (
    SELECT vid, comm, gain, c_nbr AS best_c FROM (
      SELECT *, row_number() OVER (PARTITION BY vid ORDER BY gain DESC, c_nbr ASC) AS rn
      FROM cand{r}) WHERE rn = 1)""",
            f"""stay{r} AS MATERIALIZED (
    SELECT vid, gain AS stay_gain FROM cand{r} WHERE c_nbr = comm)""",
            f"""mv{r} AS MATERIALIZED (
    SELECT b.vid, b.best_c AS new_comm
    FROM best{r} b LEFT JOIN stay{r} s ON s.vid = b.vid
    WHERE b.vid % 2 = {parity} AND b.best_c <> b.comm
      AND b.gain > coalesce(s.stay_gain, 0.0) + 1e-12)""",
            f"""a{r + 1} AS MATERIALIZED (
    SELECT a.vid, coalesce(mv.new_comm, a.comm) AS comm
    FROM a{r} a LEFT JOIN mv{r} mv ON mv.vid = a.vid)""",
        ]
    last = f"a{rounds}"
    return f"""
  WITH {', '.join(ctes)},
  canon AS (SELECT comm, min(vid) AS canon FROM {last} GROUP BY comm),
  verts AS ({_VERTS_SQL})
  SELECT v.vid, coalesce(c.canon, v.vid)::BIGINT AS comm
  FROM verts v
  LEFT JOIN {last} a ON a.vid = v.vid
  LEFT JOIN canon c ON c.comm = a.comm"""


def _pagerank_body(rounds: int, out_col: str = "vid") -> str:
    """Unrolled fixed-round PageRank CTE chain over ``e``/``v`` (works
    for int vids or string oids alike — joins/group-bys only)."""
    pre = f"""
  deg AS (SELECT src AS vid, count(*) AS d FROM e GROUP BY src),
  nv AS (SELECT count(*) AS n FROM v),
  vd AS (SELECT v.vid, coalesce(deg.d, 0) AS d FROM v LEFT JOIN deg ON v.vid = deg.vid),
  r0 AS (SELECT vid, d, 1.0 / (SELECT n FROM nv) AS rank FROM vd)"""
    steps = []
    for i in range(1, rounds + 1):
        p = i - 1
        steps.append(
            f"""
  dang{i} AS MATERIALIZED (SELECT {ALPHA} * coalesce(sum(rank), 0) AS m FROM r{p} WHERE d = 0),
  msg{i} AS MATERIALIZED (SELECT e.dst AS vid, sum(r.rank / r.d) AS s
             FROM e JOIN r{p} r ON e.src = r.vid WHERE r.d > 0 GROUP BY e.dst),
  r{i} AS MATERIALIZED (SELECT vd.vid, vd.d,
                  {ALPHA} * coalesce(m.s, 0)
                  + (1 - {ALPHA}) / (SELECT n FROM nv)
                  + (SELECT m FROM dang{i}) / (SELECT n FROM nv) AS rank
           FROM vd LEFT JOIN msg{i} m ON vd.vid = m.vid)"""
        )
    return (
        pre + "," + ",".join(steps)
        + f"\n  SELECT vid AS {out_col}, round(rank, 6) AS value FROM r{rounds}"
    )


def _pagerank_sql(rounds: int) -> str:
    """Unrolled fixed-round PageRank with dangling redistribution."""
    return _with_graph(_pagerank_body(rounds))


def _delta_push_steps(rounds: int, theta: float, edge_tbl: str = "e") -> str:
    """The per-round CTEs of the push schedule (assumes ``nv``, the edge
    table and a seeded ``s0(vid, d, rank, resid)`` are already defined):
    vertices with ``abs(resid) > theta`` push ``α·resid/deg`` (dangling
    frontier residual redistributes uniformly), absorb the pushed
    residual into rank, and keep sub-theta residual in place. abs()
    because warm-start residuals (the old solution's defect) are
    signed; cold-start residuals are nonnegative, so abs is a no-op
    there."""
    th = repr(float(theta))
    e = edge_tbl
    steps = []
    for i in range(1, rounds + 1):
        p = i - 1
        steps.append(
            f"""
  dang{i} AS MATERIALIZED (SELECT coalesce(sum(resid), 0) AS m FROM s{p} WHERE d = 0 AND abs(resid) > {th}),
  msg{i} AS MATERIALIZED (SELECT {e}.dst AS vid, sum({ALPHA} * r.resid / r.d) AS s
             FROM {e} JOIN s{p} r ON {e}.src = r.vid
             WHERE r.d > 0 AND abs(r.resid) > {th} GROUP BY {e}.dst),
  s{i} AS MATERIALIZED (SELECT r.vid, r.d,
                  r.rank + CASE WHEN abs(r.resid) > {th} THEN r.resid ELSE 0.0 END AS rank,
                  CASE WHEN abs(r.resid) > {th} THEN 0.0 ELSE r.resid END
                  + coalesce(m.s, 0)
                  + {ALPHA} * (SELECT m FROM dang{i}) / (SELECT n FROM nv) AS resid
           FROM s{p} r LEFT JOIN msg{i} m ON r.vid = m.vid)"""
        )
    return ",".join(steps)


def _pagerank_delta_body(rounds: int, theta: float) -> str:
    """Unrolled fixed-round PUSH-style PageRank over ``e``/``v`` —
    replays csr.pagerank_delta_csr's deterministic cold-start schedule
    exactly. Final value = rank + resid (the Spark tier's final
    absorb)."""
    pre = f"""
  deg AS (SELECT src AS vid, count(*) AS d FROM e GROUP BY src),
  nv AS (SELECT count(*) AS n FROM v),
  vd AS MATERIALIZED (SELECT v.vid, coalesce(deg.d, 0) AS d FROM v LEFT JOIN deg ON v.vid = deg.vid),
  s0 AS MATERIALIZED (SELECT vid, d, 0.0 AS rank, (1 - {ALPHA}) / (SELECT n FROM nv) AS resid FROM vd)"""
    return (
        pre + "," + _delta_push_steps(rounds, theta)
        + f"\n  SELECT vid, round(rank + resid, 6) AS value FROM s{rounds}"
    )


def _pagerank_incr_body(old_rounds: int, delta_rounds: int, theta: float) -> str:
    """Unrolled incremental-PageRank replay: fixed-round PageRank on the
    parity-0 half-graph (``o`` chain, old degrees), then the warm-start
    seed on the FULL graph — ``resid0 = b + αP'·r_old − r_old``, the
    defect of the old solution under the new operator — then
    ``delta_rounds`` of the push schedule. Mirrors
    csr.pagerank_delta_csr(init_ranks=...) after incremental.extend_graph.
    The full edge set is MATERIALIZED once (``em``): DuckDB inlines
    plain CTEs per reference, and this chain references the edges once
    per unrolled round — without the pin it re-opens the parquet until
    it exhausts file handles."""
    pre = f"""
  em AS MATERIALIZED (SELECT src, dst FROM e),
  e1 AS MATERIALIZED (SELECT src, dst FROM em WHERE (src + dst) % 2 = 0),
  v1 AS (SELECT src AS vid FROM e1 UNION SELECT dst AS vid FROM e1),
  deg1 AS (SELECT src AS vid, count(*) AS d FROM e1 GROUP BY src),
  nv1 AS (SELECT count(*) AS n FROM v1),
  vd1 AS (SELECT v1.vid, coalesce(deg1.d, 0) AS d FROM v1 LEFT JOIN deg1 ON v1.vid = deg1.vid),
  o0 AS (SELECT vid, d, 1.0 / (SELECT n FROM nv1) AS rank FROM vd1)"""
    old_steps = []
    for i in range(1, old_rounds + 1):
        p = i - 1
        old_steps.append(
            f"""
  dango{i} AS MATERIALIZED (SELECT {ALPHA} * coalesce(sum(rank), 0) AS m FROM o{p} WHERE d = 0),
  msgo{i} AS MATERIALIZED (SELECT e1.dst AS vid, sum(r.rank / r.d) AS s
              FROM e1 JOIN o{p} r ON e1.src = r.vid WHERE r.d > 0 GROUP BY e1.dst),
  o{i} AS MATERIALIZED (SELECT vd1.vid, vd1.d,
                  {ALPHA} * coalesce(m.s, 0)
                  + (1 - {ALPHA}) / (SELECT n FROM nv1)
                  + (SELECT m FROM dango{i}) / (SELECT n FROM nv1) AS rank
           FROM vd1 LEFT JOIN msgo{i} m ON vd1.vid = m.vid)"""
        )
    seed = f"""
  deg AS (SELECT src AS vid, count(*) AS d FROM em GROUP BY src),
  nv AS (SELECT count(*) AS n FROM v),
  vd AS (SELECT v.vid, coalesce(deg.d, 0) AS d FROM v LEFT JOIN deg ON v.vid = deg.vid),
  ri AS MATERIALIZED (SELECT vd.vid, vd.d, coalesce(o.rank, 0.0) AS rank
         FROM vd LEFT JOIN o{old_rounds} o ON vd.vid = o.vid),
  di AS (SELECT coalesce(sum(rank), 0) AS m FROM ri WHERE d = 0),
  sm AS MATERIALIZED (SELECT em.dst AS vid, sum({ALPHA} * r.rank / r.d) AS s
         FROM em JOIN ri r ON em.src = r.vid WHERE r.d > 0 GROUP BY em.dst),
  s0 AS MATERIALIZED (SELECT ri.vid, ri.d, ri.rank,
                coalesce(sm.s, 0)
                + (1 - {ALPHA}) / (SELECT n FROM nv)
                + {ALPHA} * (SELECT m FROM di) / (SELECT n FROM nv)
                - ri.rank AS resid
         FROM ri LEFT JOIN sm ON ri.vid = sm.vid)"""
    return (
        pre + "," + ",".join(old_steps) + "," + seed + ","
        + _delta_push_steps(delta_rounds, theta, edge_tbl="em")
        + f"\n  SELECT vid, round(rank + resid, 6) AS value FROM s{delta_rounds}"
    )


def _ppr_sql(rounds: int, seed_mod: int = 20) -> str:
    """Unrolled fixed-round personalized PageRank: teleport + dangling
    mass land on the normalized seed vector (vid ≡ 0 mod ``seed_mod``)."""
    pre = f"""
  deg AS (SELECT src AS vid, count(*) AS d FROM e GROUP BY src),
  nv AS (SELECT count(*) AS n FROM v),
  vd AS (SELECT v.vid, coalesce(deg.d, 0) AS d FROM v LEFT JOIN deg ON v.vid = deg.vid),
  ps AS (SELECT vid, CASE WHEN vid % {seed_mod} = 0 THEN 1.0 ELSE 0.0 END AS w FROM v),
  pv AS (SELECT vid, w / (SELECT sum(w) FROM ps) AS p FROM ps),
  r0 AS (SELECT vid, d, 1.0 / (SELECT n FROM nv) AS rank FROM vd)"""
    steps = []
    for i in range(1, rounds + 1):
        p = i - 1
        steps.append(
            f"""
  dang{i} AS MATERIALIZED (SELECT {ALPHA} * coalesce(sum(rank), 0) AS m FROM r{p} WHERE d = 0),
  msg{i} AS MATERIALIZED (SELECT e.dst AS vid, sum(r.rank / r.d) AS s
             FROM e JOIN r{p} r ON e.src = r.vid WHERE r.d > 0 GROUP BY e.dst),
  r{i} AS MATERIALIZED (SELECT vd.vid, vd.d,
                  {ALPHA} * coalesce(m.s, 0)
                  + (1 - {ALPHA}) * pv.p
                  + (SELECT m FROM dang{i}) * pv.p AS rank
           FROM vd JOIN pv ON vd.vid = pv.vid
           LEFT JOIN msg{i} m ON vd.vid = m.vid)"""
        )
    return _with_graph(
        pre + "," + ",".join(steps) + f"\n  SELECT vid, round(rank, 6) AS value FROM r{rounds}"
    )


def _cdlp_sql(rounds: int) -> str:
    pre = """
  bidir AS (SELECT src, dst FROM e WHERE src <> dst
            UNION ALL SELECT dst AS src, src AS dst FROM e WHERE src <> dst),
  l0 AS (SELECT vid, vid AS label FROM v)"""
    steps = []
    for i in range(1, rounds + 1):
        p = i - 1
        steps.append(
            f"""
  cnt{i} AS (SELECT b.dst AS vid, l.label, count(*) AS c
             FROM bidir b JOIN l{p} l ON b.src = l.vid GROUP BY b.dst, l.label),
  best{i} AS (SELECT vid, label FROM (
                SELECT vid, label,
                       row_number() OVER (PARTITION BY vid ORDER BY c DESC, label ASC) AS rn
                FROM cnt{i}) WHERE rn = 1),
  l{i} AS (SELECT l{p}.vid, coalesce(b.label, l{p}.label) AS label
           FROM l{p} LEFT JOIN best{i} b ON l{p}.vid = b.vid)"""
        )
    return _with_graph(
        pre + "," + ",".join(steps) + f"\n  SELECT vid, label FROM l{rounds}"
    )


def _hits_sql(rounds: int) -> str:
    """Unrolled fixed-round HITS matching linkgraph.algorithms.hits:
    a_raw from prev hub, h_raw from this round's a_raw, per-round
    max-normalization, final sum-normalization."""
    pre = """
  nv AS (SELECT count(*) AS n FROM v),
  h0 AS (SELECT vid, 1.0 / (SELECT n FROM nv) AS hub FROM v)"""
    steps = []
    for i in range(1, rounds + 1):
        p = i - 1
        steps.append(
            f"""
  ar{i} AS (SELECT v.vid, coalesce(s.a, 0) AS a_raw FROM v LEFT JOIN (
      SELECT e.dst AS vid, sum(h.hub) AS a FROM e JOIN h{p} h ON e.src = h.vid
      GROUP BY e.dst) s ON v.vid = s.vid),
  hr{i} AS (SELECT v.vid, coalesce(s.h, 0) AS h_raw FROM v LEFT JOIN (
      SELECT e.src AS vid, sum(a.a_raw) AS h FROM e JOIN ar{i} a ON e.dst = a.vid
      GROUP BY e.src) s ON v.vid = s.vid),
  mx{i} AS (SELECT
      CASE WHEN max(h_raw) = 0 OR max(h_raw) IS NULL THEN 1.0 ELSE max(h_raw) END AS hm
      FROM hr{i}),
  ma{i} AS (SELECT
      CASE WHEN max(a_raw) = 0 OR max(a_raw) IS NULL THEN 1.0 ELSE max(a_raw) END AS am
      FROM ar{i}),
  h{i} AS (SELECT hr.vid,
      hr.h_raw / (SELECT hm FROM mx{i}) AS hub,
      ar.a_raw / (SELECT am FROM ma{i}) AS auth
      FROM hr{i} hr JOIN ar{i} ar ON hr.vid = ar.vid)"""
        )
    fin = f"""
  sums AS (SELECT
      CASE WHEN sum(hub) = 0 THEN 1.0 ELSE sum(hub) END AS hs,
      CASE WHEN sum(auth) = 0 THEN 1.0 ELSE sum(auth) END AS "as"
      FROM h{rounds})
  SELECT vid, round(hub / (SELECT hs FROM sums), 6) AS hub,
         round(auth / (SELECT "as" FROM sums), 6) AS auth
  FROM h{rounds}"""
    return _with_graph(pre + "," + ",".join(steps) + "," + fin)


def _kcore_keep_cte(k: int, rounds: int, tag: str) -> str:
    """CTE chain for iterative k-core peeling (kcore.h:44-56 semantics);
    ``keep_{tag}{rounds}`` is the surviving vertex set. ``rounds`` must
    exceed the peeling fixpoint depth (12 ≫ the ≤7 observed at sf0.01;
    pytest cross-checks Spark vs this oracle at sf0.001 and sf0.01)."""
    # MATERIALIZED: DuckDB otherwise inlines each CTE reference, re-opening
    # the parquet source once per unrolled round and exhausting fds
    parts = [f"al_{tag}0 AS MATERIALIZED (SELECT lo, hi FROM simple_und)"]
    for i in range(1, rounds + 1):
        p = i - 1
        parts.append(
            f"""dg_{tag}{i} AS MATERIALIZED (SELECT vid, count(*) AS c FROM (
      SELECT lo AS vid FROM al_{tag}{p} UNION ALL SELECT hi FROM al_{tag}{p}) GROUP BY vid),
  keep_{tag}{i} AS MATERIALIZED (SELECT vid FROM dg_{tag}{i} WHERE c >= {k}),
  al_{tag}{i} AS MATERIALIZED (SELECT lo, hi FROM al_{tag}{p}
      WHERE lo IN (SELECT vid FROM keep_{tag}{i})
        AND hi IN (SELECT vid FROM keep_{tag}{i}))"""
        )
    return ",\n  ".join(parts)


_KCORE_ROUNDS = 12


def _kcore_sql(k: int, out_col: str) -> str:
    body = (
        _kcore_keep_cte(k, _KCORE_ROUNDS, "a")
        + f"""
  SELECT v.vid, CASE WHEN v.vid IN (SELECT vid FROM keep_a{_KCORE_ROUNDS}) THEN 1 ELSE 0 END AS {out_col}
  FROM v"""
    )
    return _with_graph(body)


def _kshell_sql(k: int) -> str:
    body = (
        _kcore_keep_cte(k, _KCORE_ROUNDS, "a")
        + ",\n  "
        + _kcore_keep_cte(k + 1, _KCORE_ROUNDS, "b")
        + f"""
  SELECT v.vid, CASE WHEN v.vid IN (SELECT vid FROM keep_a{_KCORE_ROUNDS})
                      AND v.vid NOT IN (SELECT vid FROM keep_b{_KCORE_ROUNDS})
                     THEN 1 ELSE 0 END AS in_shell
  FROM v"""
    )
    return _with_graph(body)


def _sampling_paths_sql(num_paths: int, length: int, seed: int) -> str:
    """Unrolled seeded walk matching linkgraph.algorithms.sampling_path:
    md5-based start selection and per-hop picks are engine-portable, so
    the walk replays bit-identically in DuckDB."""
    parts = [
        f"""s0 AS MATERIALIZED (
      SELECT vid AS path_id, vid AS cur, vid::VARCHAR AS path_csv
      FROM v ORDER BY md5(vid::VARCHAR || ':{seed}'), vid LIMIT {num_paths})"""
    ]
    for i in range(1, length + 1):
        p = i - 1
        parts.append(
            f"""p{i} AS MATERIALIZED (SELECT path_id, dst FROM (
      SELECT s.path_id, e.dst,
             row_number() OVER (PARTITION BY s.path_id
                                ORDER BY md5(e.dst::VARCHAR || ':{seed + i}'), e.dst) AS rn
      FROM s{p} s JOIN e ON s.cur = e.src) WHERE rn = 1)"""
        )
        parts.append(
            f"""s{i} AS MATERIALIZED (SELECT s.path_id,
      coalesce(p.dst, s.cur) AS cur,
      CASE WHEN p.dst IS NULL THEN s.path_csv
           ELSE s.path_csv || ',' || p.dst::VARCHAR END AS path_csv
      FROM s{p} s LEFT JOIN p{i} p USING (path_id))"""
        )
    parts.append(f"SELECT path_id, path_csv FROM s{length}")
    body = ",\n  ".join(parts[:-1]) + "\n  " + parts[-1]
    return _with_graph(body)


def _node2vec_sql(num_walks: int, length: int, p: float, q: float, seed: int) -> str:
    """Unrolled node2vec walk matching linkgraph.sampling.node2vec_walk:
    hop 1 is the unbiased md5 pick; hops >= 2 rank candidates by the
    Efraimidis-Spirakis key u^exponent (u from the md5 hex prefix,
    exponent = p on return / 1 at distance 1 / q at distance 2) — every
    term is engine-portable, so the walk replays bit-identically."""
    parts = [
        f"""s0 AS MATERIALIZED (
      SELECT vid AS walk_id, vid AS prev, vid AS cur, vid::VARCHAR AS walk_csv
      FROM v ORDER BY md5(vid::VARCHAR || ':{seed}'), vid LIMIT {num_walks})"""
    ]
    for i in range(1, length + 1):
        j = i - 1
        if i == 1:
            rank = f"md5(e.dst::VARCHAR || ':{seed + i}'), e.dst"
            probe = ""
        else:
            rank = (
                f"pow( (('0x' || substr(md5(e.dst::VARCHAR || ':{seed + i}'), 1, 8))::BIGINT"
                f" + 1) / 4294967296.0,\n"
                f"                 CASE WHEN e.dst = s.prev THEN {p!r}\n"
                f"                      WHEN pe.p_dst IS NOT NULL THEN 1.0\n"
                f"                      ELSE {q!r} END ) DESC, e.dst"
            )
            probe = (
                "\n      LEFT JOIN (SELECT DISTINCT src AS p_src, dst AS p_dst FROM e) pe"
                "\n        ON pe.p_src = s.prev AND pe.p_dst = e.dst"
            )
        parts.append(
            f"""p{i} AS MATERIALIZED (SELECT walk_id, dst FROM (
      SELECT s.walk_id, e.dst,
             row_number() OVER (PARTITION BY s.walk_id
               ORDER BY {rank}) AS rn
      FROM s{j} s JOIN e ON s.cur = e.src{probe}) WHERE rn = 1)"""
        )
        parts.append(
            f"""s{i} AS MATERIALIZED (SELECT s.walk_id,
      CASE WHEN p.dst IS NULL THEN s.prev ELSE s.cur END AS prev,
      coalesce(p.dst, s.cur) AS cur,
      CASE WHEN p.dst IS NULL THEN s.walk_csv
           ELSE s.walk_csv || ',' || p.dst::VARCHAR END AS walk_csv
      FROM s{j} s LEFT JOIN p{i} p USING (walk_id))"""
        )
    parts.append(f"SELECT walk_id, walk_csv FROM s{length}")
    body = ",\n  ".join(parts[:-1]) + "\n  " + parts[-1]
    return _with_graph(body)


def _lpa_u2i_vec_sql(rounds: int) -> str:
    """Unrolled gs::LPAU2I vector propagation (u2i weighted sum; i2u
    degree-normalized update with exact-0/1 seed clamping) on the same
    bipartite orders graph as g_lpa_u2i_r2."""
    pre = """
  WITH be AS (
    SELECT DISTINCT o_custkey % 200 AS src, 1000 + o_orderkey % 300 AS dst
    FROM orders),
  bew AS MATERIALIZED (SELECT src, dst, CAST((src + dst) % 5 + 1 AS DOUBLE) AS w FROM be),
  us AS (SELECT DISTINCT src AS vid FROM bew),
  dg AS MATERIALIZED (SELECT src AS vid, count(*) AS d FROM bew GROUP BY src),
  ig AS (SELECT dst, count(*) AS ind FROM bew GROUP BY dst),
  ns AS MATERIALIZED (SELECT bew.src AS vid, sum(ig.ind) AS s
                      FROM bew JOIN ig USING (dst) GROUP BY bew.src),
  u0 AS MATERIALIZED (
    SELECT vid, 0 AS pid,
           CASE WHEN vid % 7 = 0 THEN 1.0 WHEN vid % 7 = 1 THEN 0.0
                ELSE (vid % 100) / 100.0 END AS x
    FROM us
    UNION ALL
    SELECT vid, 1 AS pid,
           CASE WHEN vid % 5 = 0 THEN 1.0 ELSE ((vid * 3) % 100) / 100.0 END AS x
    FROM us)"""
    steps = []
    for r in range(1, rounds + 1):
        p = r - 1
        steps.append(
            f"""
  it{r} AS MATERIALIZED (
    SELECT bew.dst, u.pid, sum(u.x * bew.w) AS x
    FROM bew JOIN u{p} u ON bew.src = u.vid GROUP BY bew.dst, u.pid),
  tmp{r} AS MATERIALIZED (
    SELECT bew.src AS vid, i.pid, sum(i.x * bew.w) AS tmp
    FROM bew JOIN it{r} i ON bew.dst = i.dst GROUP BY bew.src, i.pid),
  u{r} AS MATERIALIZED (
    SELECT u.vid, u.pid,
           CASE WHEN u.x = 0.0 OR u.x = 1.0 OR dg.d IS NULL OR ns.s = dg.d THEN u.x
                ELSE (coalesce(t.tmp, 0) - dg.d * u.x) / (ns.s - dg.d) END AS x
    FROM u{p} u
    LEFT JOIN tmp{r} t ON t.vid = u.vid AND t.pid = u.pid
    LEFT JOIN dg ON dg.vid = u.vid
    LEFT JOIN ns ON ns.vid = u.vid)"""
        )
    return (
        pre + "," + ",".join(steps)
        + f"\n  SELECT vid, pid::BIGINT AS pid, round(x, 6) AS value FROM u{rounds}"
    )


def _emb_lsh_ann_sql(dim: int = 64, n_planes: int = 6, seed: int = 42, k: int = 10) -> str:
    """Replays lsh_ann_topk exactly: the seeded hyperplanes are plan
    literals in Spark, so the SAME doubles are embedded here (repr
    round-trips), buckets/probes/re-rank all recomputed by DuckDB."""
    from linkgraph.pipeline.similarity import _hyperplanes

    H = _hyperplanes(dim, n_planes, seed)
    bucket_terms = []
    for i in range(n_planes):
        plane = ", ".join(repr(float(x)) for x in H[i])
        bucket_terms.append(
            f"(CASE WHEN list_dot_product(embedding::DOUBLE[], [{plane}]) > 0 "
            f"THEN {1 << i} ELSE 0 END)"
        )
    bucket_expr = " + ".join(bucket_terms)
    probes = ", ".join(["bucket"] + [f"xor(bucket, {1 << i})" for i in range(n_planes)])
    return f"""
  WITH eb AS MATERIALIZED (
    SELECT vec_id, embedding::DOUBLE[] AS v, {bucket_expr} AS bucket
    FROM embeddings),
  qb AS (SELECT vec_id AS query_id, v AS qv, bucket FROM eb WHERE vec_id < 5),
  qp AS (SELECT query_id, qv, unnest([{probes}]) AS bucket FROM qb),
  cand AS (
    SELECT qp.query_id, e.vec_id, list_cosine_similarity(e.v, qp.qv) AS cosine
    FROM eb e JOIN qp ON e.bucket = qp.bucket
    WHERE e.vec_id <> qp.query_id),
  ranked AS (
    SELECT query_id, vec_id, cosine,
           row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
    FROM cand)
  SELECT query_id, vec_id, round(cosine, 6) AS cosine, rank
  FROM ranked WHERE rank <= {k}"""


def _betweenness_sql(
    levels: int = 10, endpoints: bool = False, sample_mod: int | None = None
) -> str:
    """Unrolled Brandes betweenness (forward multi-source BFS with path
    counts, backward dependency accumulation per level), matching
    linkgraph.algorithms.betweenness_centrality on the directed graph with
    normalized=True. ``levels`` must be ≥ the graph's max eccentricity
    (3 at sf0.01, 7 at sf0.001; 10 gives headroom — empty levels are
    no-ops). MATERIALIZED keeps DuckDB from re-expanding each level.
    ``sample_mod`` restricts roots to ``vid % sample_mod = 0`` and applies
    the nx k-sample estimator rescale (×n/k) — the deterministic twin of
    ``betweenness_centrality(sources=...)``."""
    root_where = f" WHERE vid % {sample_mod} = 0" if sample_mod else ""
    parts = [
        f"lvl0 AS MATERIALIZED (SELECT vid AS root, vid, 1.0 AS sigma FROM v{root_where})",
        "seen0 AS MATERIALIZED (SELECT root, vid FROM lvl0)",
    ]
    for d in range(1, levels + 1):
        p = d - 1
        parts.append(
            f"""lvl{d} AS MATERIALIZED (
      SELECT s.root, e.dst AS vid, sum(s.sigma) AS sigma
      FROM lvl{p} s JOIN e ON s.vid = e.src
      WHERE NOT EXISTS (SELECT 1 FROM seen{p} x WHERE x.root = s.root AND x.vid = e.dst)
      GROUP BY s.root, e.dst)"""
        )
        parts.append(
            f"""seen{d} AS MATERIALIZED (
      SELECT root, vid FROM seen{p} UNION ALL SELECT root, vid FROM lvl{d})"""
        )
    parts.append(
        f"wd{levels} AS MATERIALIZED (SELECT root, vid, sigma, 0.0 AS delta FROM lvl{levels})"
    )
    for d in range(levels - 1, 0, -1):
        parts.append(
            f"""wd{d} AS MATERIALIZED (
      SELECT p.root, p.vid, p.sigma, coalesce(s.dsum, 0) AS delta
      FROM lvl{d} p LEFT JOIN (
        SELECT p2.root, p2.vid, sum(p2.sigma * (1.0 + w.delta) / w.sigma) AS dsum
        FROM lvl{d} p2 JOIN e ON p2.vid = e.src
        JOIN wd{d + 1} w ON w.root = p2.root AND w.vid = e.dst
        GROUP BY p2.root, p2.vid) s ON s.root = p.root AND s.vid = p.vid)"""
        )
    unions = " UNION ALL ".join(
        f"SELECT root, vid, delta FROM wd{d}" for d in range(1, levels + 1)
    )
    if endpoints:
        # NetworkX _accumulate_endpoints: bc(w) += δ(w)+1 per source
        # reaching w, bc(s) += |reached|−1; normalization 1/(n(n−1)).
        parts.append(
            f"""acc0 AS (SELECT vid, sum(delta + 1.0) AS bc FROM ({unions}) WHERE vid <> root GROUP BY vid),
  rt AS (SELECT root AS vid, count(*) - 1.0 AS bc FROM seen{levels} GROUP BY root),
  acc AS (SELECT vid, sum(bc) AS bc
          FROM (SELECT * FROM acc0 UNION ALL SELECT * FROM rt) GROUP BY vid),
  nv AS (SELECT count(*) AS n FROM v)
  SELECT v.vid,
         round(coalesce(acc.bc, 0){_sample_rescale(sample_mod)}
               / ((SELECT n FROM nv) * ((SELECT n FROM nv) - 1.0)), 6) AS value
  FROM v LEFT JOIN acc ON v.vid = acc.vid"""
        )
    else:
        parts.append(
            f"""acc AS (SELECT vid, sum(delta) AS bc FROM ({unions}) WHERE vid <> root GROUP BY vid),
  nv AS (SELECT count(*) AS n FROM v)
  SELECT v.vid,
         round(coalesce(acc.bc, 0){_sample_rescale(sample_mod)}
               / (((SELECT n FROM nv) - 1.0) * ((SELECT n FROM nv) - 2.0)), 6) AS value
  FROM v LEFT JOIN acc ON v.vid = acc.vid"""
        )
    return _with_graph(",\n  ".join(parts))


def _sample_rescale(sample_mod: int | None) -> str:
    """nx k-sample estimator factor (×n/k) as a SQL term, '' when exact."""
    if not sample_mod:
        return ""
    return (
        f" * (SELECT n FROM nv)"
        f" / (SELECT count(*) FROM v WHERE vid % {sample_mod} = 0)"
    )


def _betweenness_w_sql(wcap: int = 45, layers: int = 16, root_mod: int = 20) -> str:
    """Weighted Brandes oracle mirroring _weighted_phases: recursive-CTE
    weight-bounded reachability → min = dist, shortest-path DAG (integer
    weights, exact equality), recursive longest-hop layering, then
    unrolled per-layer σ forward / δ backward. ``wcap`` must be ≥ the max
    shortest-path weight (measured: 8 at sf0.01, 36 at sf0.001) and
    ``layers`` ≥ the max longest-hop rank (7 / 11 measured); empty layers
    are no-ops. Sources sampled vid % root_mod = 0, n/k rescale."""
    parts = [
        "ew AS MATERIALIZED (SELECT src, dst, (src + dst) % 7 + 1 AS w FROM e)",
        f"roots AS MATERIALIZED (SELECT vid AS root FROM v WHERE vid % {root_mod} = 0)",
        f"""reach AS MATERIALIZED (
    WITH RECURSIVE r(root, vid, d) AS (
      SELECT root, root, 0 FROM roots
      UNION
      SELECT r.root, ew.dst, r.d + ew.w FROM r JOIN ew ON r.vid = ew.src
      WHERE r.d + ew.w <= {wcap})
    SELECT * FROM r)""",
        "dist AS MATERIALIZED (SELECT root, vid, min(d) AS d FROM reach GROUP BY root, vid)",
        """dag AS MATERIALIZED (
    SELECT du.root, ew.src, ew.dst
    FROM ew JOIN dist du ON du.vid = ew.src
    JOIN dist dv ON dv.root = du.root AND dv.vid = ew.dst
    WHERE du.d + ew.w = dv.d)""",
        f"""hh AS MATERIALIZED (
    WITH RECURSIVE r(root, vid, hop) AS (
      SELECT root, root, 0 FROM roots
      UNION
      SELECT r.root, g.dst, r.hop + 1 FROM r JOIN dag g
      ON g.root = r.root AND g.src = r.vid WHERE r.hop < {layers})
    SELECT root, vid, max(hop) AS h FROM r GROUP BY root, vid)""",
        "sig0 AS MATERIALIZED (SELECT root, root AS vid, 1.0 AS sigma FROM roots)",
        "kn0 AS MATERIALIZED (SELECT * FROM sig0)",
    ]
    for d in range(1, layers + 1):
        parts.append(
            f"""sig{d} AS MATERIALIZED (
      SELECT g.root, g.dst AS vid, sum(k.sigma) AS sigma
      FROM kn{d - 1} k JOIN dag g ON g.root = k.root AND g.src = k.vid
      JOIN hh ON hh.root = g.root AND hh.vid = g.dst AND hh.h = {d}
      GROUP BY g.root, g.dst)"""
        )
        parts.append(
            f"kn{d} AS MATERIALIZED (SELECT * FROM kn{d - 1} UNION ALL SELECT * FROM sig{d})"
        )
    parts.append(
        f"fin{layers} AS MATERIALIZED (SELECT root, vid, sigma, 0.0 AS delta FROM sig{layers})"
    )
    parts.append(f"fa{layers} AS MATERIALIZED (SELECT * FROM fin{layers})")
    for d in range(layers - 1, 0, -1):
        parts.append(
            f"""fin{d} AS MATERIALIZED (
      SELECT p.root, p.vid, p.sigma, p.sigma * coalesce(s.psum, 0) AS delta
      FROM sig{d} p LEFT JOIN (
        SELECT g.root, g.src AS vid, sum((1.0 + f.delta) / f.sigma) AS psum
        FROM dag g JOIN fa{d + 1} f ON f.root = g.root AND f.vid = g.dst
        GROUP BY g.root, g.src) s ON s.root = p.root AND s.vid = p.vid)"""
        )
        parts.append(
            f"fa{d} AS MATERIALIZED (SELECT * FROM fa{d + 1} UNION ALL SELECT * FROM fin{d})"
        )
    parts.append(
        """acc AS (SELECT vid, sum(delta) AS bc FROM fa1 WHERE vid <> root GROUP BY vid),
  nv AS (SELECT count(*) AS n FROM v),
  nk AS (SELECT count(*) AS k FROM roots)
  SELECT v.vid,
         round(coalesce(acc.bc, 0)
               / (((SELECT n FROM nv) - 1.0) * ((SELECT n FROM nv) - 2.0))
               * (SELECT n FROM nv) / (SELECT k FROM nk), 6) AS value
  FROM v LEFT JOIN acc ON v.vid = acc.vid"""
    )
    return _with_graph(",\n  ".join(parts))


def _corpus_edges_sql(n: int = 2000, seed: int = 42) -> str:
    """DuckDB replay of synth_corpus(hash_mode='md5') + derive_edges.

    Reproduces linkgraph.corpus constants: FILES_PER_REPO=32, N_HUBS=16,
    HUB_PCT=30, MAX_IMPORTS=3; oid = repo ':' path with lang-dependent
    extension. Target fids are recomputed from the generator arithmetic
    (not regex over content), making this an independent derivation path.
    """

    def h(k, col="fid"):
        return f"('0x' || substring(md5('corpus:{k}:' || {col}::VARCHAR), 1, 15))::BIGINT"

    def hj(base, col):
        return (
            f"('0x' || substring(md5('corpus:' || ({base} + j.j)::VARCHAR || ':' "
            f"|| {col}::VARCHAR), 1, 15))::BIGINT"
        )

    n_hubs = min(16, n)
    return f"""
  WITH f AS (SELECT t.range AS fid FROM range({n}) t),
  d AS (
    SELECT fid,
           'repo-' || lpad((fid // 32)::VARCHAR, 6, '0') || ':' ||
           'src/pkg_' || ({h(seed + 1)} % 5)::VARCHAR ||
           '/mod_' || (fid % 32)::VARCHAR || '.' ||
           (CASE {h(seed)} % 3 WHEN 0 THEN 'py' WHEN 1 THEN 'java' ELSE 'cc' END) AS oid,
           {h(seed + 2)} % 4 AS n_imports
    FROM f),
  imp AS (
    SELECT s.fid AS src_fid, s.oid AS src_oid,
           CASE WHEN {hj(seed + 10, 's.fid')} % 100 < 30
                THEN {hj(seed + 20, 's.fid')} % {n_hubs}
                ELSE {hj(seed + 30, 's.fid')} % {n} END AS tgt_fid
    FROM d s CROSS JOIN (SELECT unnest([0, 1, 2]) AS j) j
    WHERE j.j < s.n_imports)
  SELECT DISTINCT i.src_oid, t.oid AS dst_oid
  FROM imp i JOIN d t ON t.fid = i.tgt_fid
  WHERE i.tgt_fid <> i.src_fid"""


_LANG_MARKER_SQL = {
    "en": ("the", "and", "of", "is"),
    "es": ("el", "la", "los", "que"),
    "de": ("der", "die", "und", "ist"),
    "fr": ("le", "les", "des", "est"),
}


def _langid_sql() -> str:
    score_exprs = []
    for lang, markers in _LANG_MARKER_SQL.items():
        lst = ", ".join(f"'{m}'" for m in markers)
        score_exprs.append(
            f"len(list_filter(words, w -> list_contains([{lst}], w))) AS s_{lang}"
        )
    order = list(_LANG_MARKER_SQL)
    cases = []
    for i, lang in enumerate(order):
        conds = [f"s_{lang} > 0"]
        for j, other in enumerate(order):
            if i == j:
                continue
            op = ">" if j < i else ">="
            conds.append(f"s_{lang} {op} s_{other}")
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return f"""
  WITH w AS (
    SELECT doc_id,
           list_transform(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> ''),
                          x -> lower(x)) AS words
    FROM documents
  ), s AS (SELECT doc_id, {', '.join(score_exprs)} FROM w)
  SELECT doc_id, CASE {' '.join(cases)} ELSE 'unknown' END AS lang_pred FROM s
"""


ORACLE_SQL: dict[str, str] = {
    "gie_match": """
  SELECT 'c' || c.c_custkey AS c, 'o' || o.o_orderkey AS o, 'p' || l.l_partkey AS p
  FROM customer c
  JOIN orders o ON o.o_custkey = c.c_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderstatus = 'F'""",
    "gie_not_props": """
  SELECT 'c' || c_custkey AS oid, 'c_mktsegment' AS key, c_mktsegment AS value
  FROM customer c
  WHERE NOT EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')""",
    "gie_range": """
  SELECT oid FROM (SELECT 'c' || c_custkey AS oid FROM customer)
  ORDER BY oid OFFSET 5 LIMIT 10""",
    "gie_mean": """
  SELECT round(avg(o_totalprice), 4) AS value
  FROM orders o JOIN customer c
    ON c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING'""",
    "g_edges": f"WITH e AS ({_EDGES_SQL}) SELECT src, dst FROM e",
    "g_saveload": f"WITH e AS ({_EDGES_SQL}) SELECT src, dst FROM e",
    "g_summary": _with_graph(
        "x AS (SELECT 1) SELECT (SELECT count(*) FROM v) AS n_vertices, (SELECT count(*) FROM e) AS n_edges"
    ),
    "g_out_degree": _with_graph(
        """od AS (SELECT src AS vid, count(*) AS degree FROM e GROUP BY src)
  SELECT v.vid, coalesce(od.degree, 0) AS degree FROM v LEFT JOIN od ON v.vid = od.vid"""
    ),
    "g_in_degree": _with_graph(
        """idg AS (SELECT dst AS vid, count(*) AS degree FROM e GROUP BY dst)
  SELECT v.vid, coalesce(idg.degree, 0) AS degree FROM v LEFT JOIN idg ON v.vid = idg.vid"""
    ),
    "nx_degree_centrality": _with_graph(
        """alldeg AS (
    SELECT vid, count(*) AS d FROM (
      SELECT src AS vid FROM e UNION ALL SELECT dst AS vid FROM e) GROUP BY vid),
  nv AS (SELECT count(*) AS n FROM v)
  SELECT v.vid, round(coalesce(alldeg.d, 0) * 1.0 / ((SELECT n FROM nv) - 1), 6) AS value
  FROM v LEFT JOIN alldeg ON v.vid = alldeg.vid"""
    ),
    "g_degree_centrality": _with_graph(
        """alldeg AS (
    SELECT vid, count(*) AS d FROM (
      SELECT src AS vid FROM e UNION ALL SELECT dst AS vid FROM e) GROUP BY vid),
  nv AS (SELECT count(*) AS n FROM v)
  SELECT v.vid, round(coalesce(alldeg.d, 0) * 1.0 / ((SELECT n FROM nv) - 1), 6) AS value
  FROM v LEFT JOIN alldeg ON v.vid = alldeg.vid"""
    ),
    "g_triangles": _with_graph(
        """tri AS (
    SELECT a.lo AS v1, a.hi AS v2, b.hi AS v3
    FROM simple_und a
    JOIN simple_und b ON a.hi = b.lo
    JOIN simple_und c ON c.lo = a.lo AND c.hi = b.hi),
  corners AS (SELECT v1 AS vid FROM tri UNION ALL SELECT v2 FROM tri UNION ALL SELECT v3 FROM tri),
  cnt AS (SELECT vid, count(*) AS value FROM corners GROUP BY vid)
  SELECT v.vid, coalesce(cnt.value, 0) AS value FROM v LEFT JOIN cnt ON v.vid = cnt.vid"""
    ),
    "g_triangle_total": _with_graph(
        """tri AS (
    SELECT a.lo AS v1 FROM simple_und a
    JOIN simple_und b ON a.hi = b.lo
    JOIN simple_und c ON c.lo = a.lo AND c.hi = b.hi)
  SELECT count(*) AS total_triangles FROM tri"""
    ),
    "g_wcc": _with_graph(
        """reach AS (
    WITH RECURSIVE r(vid, t) AS (
      SELECT vid, vid FROM v
      UNION
      SELECT r.vid, und.dst FROM r JOIN und ON r.t = und.src)
    SELECT * FROM r)
  SELECT vid, min(t) AS comp FROM reach GROUP BY vid"""
    ),
    "g_scc": _with_graph(
        """reach AS (
    WITH RECURSIVE r(vid, t) AS (
      SELECT vid, vid FROM v
      UNION
      SELECT r.vid, e.dst FROM r JOIN e ON r.t = e.src)
    SELECT * FROM r),
  mutual AS (
    SELECT r1.vid, r1.t FROM reach r1 JOIN reach r2 ON r1.vid = r2.t AND r1.t = r2.vid)
  SELECT vid, max(t) AS comp FROM mutual GROUP BY vid"""
    ),
    "g_condensation": _with_graph(
        """e2 AS (SELECT src, dst FROM e WHERE src < dst OR src % 7 = 0),
  reach AS (
    WITH RECURSIVE r(vid, t) AS (
      SELECT vid, vid FROM v
      UNION
      SELECT r.vid, e2.dst FROM r JOIN e2 ON r.t = e2.src)
    SELECT * FROM r),
  mutual AS (
    SELECT r1.vid, r1.t FROM reach r1 JOIN reach r2 ON r1.vid = r2.t AND r1.t = r2.vid),
  scc AS (SELECT vid, max(t) AS comp FROM mutual GROUP BY vid)
  SELECT s1.comp AS src_comp, s2.comp AS dst_comp,
         CAST(count(*) AS BIGINT) AS weight
  FROM e2 JOIN scc s1 ON e2.src = s1.vid JOIN scc s2 ON e2.dst = s2.vid
  WHERE s1.comp <> s2.comp
  GROUP BY 1, 2"""
    ),
    "g_clustering": _with_graph(
        """tri AS (
    SELECT a.lo AS v1, a.hi AS v2, b.hi AS v3
    FROM simple_und a
    JOIN simple_und b ON a.hi = b.lo
    JOIN simple_und c ON c.lo = a.lo AND c.hi = b.hi),
  corners AS (SELECT v1 AS vid FROM tri UNION ALL SELECT v2 FROM tri UNION ALL SELECT v3 FROM tri),
  tcnt AS (SELECT vid, count(*) AS t FROM corners GROUP BY vid),
  bid AS (SELECT lo AS a FROM simple_und UNION ALL SELECT hi AS a FROM simple_und),
  dg AS (SELECT a AS vid, count(*) AS deg FROM bid GROUP BY a)
  SELECT v.vid,
         round(CASE WHEN coalesce(dg.deg, 0) >= 2
                    THEN 2.0 * coalesce(tcnt.t, 0) / (dg.deg * (dg.deg - 1))
                    ELSE 0.0 END, 6) AS value
  FROM v LEFT JOIN dg ON v.vid = dg.vid LEFT JOIN tcnt ON v.vid = tcnt.vid"""
    ),
    "g_transitivity": _with_graph(
        """tri AS (
    SELECT count(*) AS t FROM simple_und a
    JOIN simple_und b ON a.hi = b.lo
    JOIN simple_und c ON c.lo = a.lo AND c.hi = b.hi),
  bid AS (SELECT lo AS a FROM simple_und UNION ALL SELECT hi AS a FROM simple_und),
  dg AS (SELECT a AS vid, count(*) AS deg FROM bid GROUP BY a),
  triads AS (SELECT sum(deg * (deg - 1) / 2.0) AS p FROM dg)
  SELECT round(CASE WHEN (SELECT p FROM triads) > 0
               THEN 3.0 * (SELECT t FROM tri) / (SELECT p FROM triads)
               ELSE 0.0 END, 6) AS transitivity"""
    ),
    "g_avg_clustering": _with_graph(
        """tri AS (
    SELECT a.lo AS v1, a.hi AS v2, b.hi AS v3
    FROM simple_und a
    JOIN simple_und b ON a.hi = b.lo
    JOIN simple_und c ON c.lo = a.lo AND c.hi = b.hi),
  corners AS (SELECT v1 AS vid FROM tri UNION ALL SELECT v2 FROM tri UNION ALL SELECT v3 FROM tri),
  tcnt AS (SELECT vid, count(*) AS t FROM corners GROUP BY vid),
  bid AS (SELECT lo AS a FROM simple_und UNION ALL SELECT hi AS a FROM simple_und),
  dg AS (SELECT a AS vid, count(*) AS deg FROM bid GROUP BY a),
  lcc AS (
    SELECT v.vid, CASE WHEN coalesce(dg.deg, 0) >= 2
                       THEN 2.0 * coalesce(tcnt.t, 0) / (dg.deg * (dg.deg - 1))
                       ELSE 0.0 END AS c
    FROM v LEFT JOIN dg ON v.vid = dg.vid LEFT JOIN tcnt ON v.vid = tcnt.vid)
  SELECT round(avg(c), 6) AS avg_clustering FROM lcc"""
    ),
    "g_katz_r3": _with_graph(
        """idg AS (SELECT dst AS vid, count(*) AS ind FROM e GROUP BY dst),
  x2 AS (SELECT v.vid, CAST(0.1 AS DOUBLE) * coalesce(idg.ind, 0) + CAST(1.0 AS DOUBLE) AS x
         FROM v LEFT JOIN idg ON v.vid = idg.vid),
  m3 AS (SELECT e.dst AS vid, sum(x2.x) AS s FROM e JOIN x2 ON e.src = x2.vid GROUP BY e.dst),
  x3 AS (SELECT v.vid, CAST(0.1 AS DOUBLE) * coalesce(m3.s, 0) + CAST(1.0 AS DOUBLE) AS x
         FROM v LEFT JOIN m3 ON v.vid = m3.vid)
  SELECT vid, CAST(round(x, 6) AS DOUBLE) AS value FROM x3"""
    ),
    "g_eigenvector_r2": _with_graph(
        """nv AS (SELECT count(*) AS n FROM v),
  idg AS (SELECT dst AS vid, count(*) AS ind FROM e GROUP BY dst),
  r1 AS (SELECT v.vid, (1.0 + coalesce(idg.ind, 0)) / (SELECT n FROM nv) AS raw
         FROM v LEFT JOIN idg ON v.vid = idg.vid),
  n1 AS (SELECT sqrt(sum(raw * raw)) AS l2 FROM r1),
  x1 AS (SELECT vid, raw / (SELECT l2 FROM n1) AS x FROM r1),
  m2 AS (SELECT e.dst AS vid, sum(x1.x) AS s FROM e JOIN x1 ON e.src = x1.vid GROUP BY e.dst),
  r2 AS (SELECT x1.vid, x1.x + coalesce(m2.s, 0) AS raw FROM x1 LEFT JOIN m2 ON x1.vid = m2.vid),
  n2 AS (SELECT sqrt(sum(raw * raw)) AS l2 FROM r2),
  x2 AS (SELECT vid, raw / (SELECT l2 FROM n2) AS x FROM r2)
  SELECT vid, round(x, 6) AS value FROM x2"""
    ),
    "g_cdlp_r2": _cdlp_sql(CDLP_ROUNDS),
    "g_hits_r2": _hits_sql(2),
    "g_betweenness": _betweenness_sql(10),
    "g_sampling_paths": _sampling_paths_sql(10, 4, 42),
    "g_node2vec": _node2vec_sql(10, 4, 0.25, 4.0, 42),
    "g_modify": _with_graph(
        """e1 AS (SELECT src, dst FROM e WHERE src >= 5 AND dst >= 5),
  e2 AS (SELECT src, dst FROM e1 WHERE src % 50 <> 0),
  e3 AS (SELECT src, dst FROM e2
         UNION ALL SELECT 1000, 1001 UNION ALL SELECT 1001, 1002)
  SELECT (SELECT count(*) FROM v WHERE vid >= 5) + 3 AS n_vertices,
         (SELECT count(*) FROM e3) AS n_edges"""
    ),
    "g_all_simple_paths_c3": _with_graph(
        """paths AS (
    WITH RECURSIVE p(cur, path) AS (
      SELECT (SELECT min(vid) FROM v), [(SELECT min(vid) FROM v)]
      UNION ALL
      SELECT e.dst, list_append(p.path, e.dst)
      FROM p JOIN e ON p.cur = e.src
      WHERE p.cur <> (SELECT max(vid) FROM v)
        AND NOT list_contains(p.path, e.dst)
        AND len(p.path) <= 3)
    SELECT * FROM p)
  SELECT array_to_string(path, ',') AS path_csv
  FROM paths WHERE cur = (SELECT max(vid) FROM v)"""
    ),
    "g_kcore_20": _kcore_sql(20, "in_core"),
    "g_kcore_55": _kcore_sql(55, "in_core"),
    "g_kshell_10": _kshell_sql(10),
    "g_kshell_55": _kshell_sql(55),
    "g_sssp_path": _with_graph(
        """we AS (SELECT src, dst, (src + dst) % 7 + 1 AS w FROM e),
  walk AS (
    WITH RECURSIVE x(vid, c) AS (
      SELECT (SELECT min(vid) FROM v), 0
      UNION
      SELECT we.dst, x.c + we.w FROM x JOIN we ON x.vid = we.src WHERE x.c < 60)
    SELECT * FROM x)
  SELECT (SELECT min(vid) FROM v) AS src_vid, (SELECT max(vid) FROM v) AS dst_vid,
         (SELECT min(c) FROM walk WHERE vid = (SELECT max(vid) FROM v)) AS dist"""
    ),
    "g_sssp_has_path": _with_graph(
        """walk AS (
    WITH RECURSIVE w(vid, d) AS (
      SELECT (SELECT min(vid) FROM v), 0
      UNION
      SELECT e.dst, w.d + 1 FROM w JOIN e ON w.vid = e.src WHERE w.d < 50)
    SELECT * FROM w)
  SELECT (SELECT min(vid) FROM v) AS src_vid, (SELECT max(vid) FROM v) AS dst_vid,
         EXISTS (SELECT 1 FROM walk WHERE vid = (SELECT max(vid) FROM v)) AS has_path"""
    ),
    "g_is_simple_path": _with_graph(
        """x AS (SELECT 1)
  SELECT (SELECT count(*) FROM v WHERE vid IN (0, 1, 2)) = 3
         AND EXISTS (SELECT 1 FROM e WHERE src = 0 AND dst = 1)
         AND EXISTS (SELECT 1 FROM e WHERE src = 1 AND dst = 2) AS is_path"""
    ),
    "g_lpa_u2i_r2": """
  WITH be AS (
    SELECT DISTINCT o_custkey % 200 AS src, 1000 + o_orderkey % 300 AS dst
    FROM orders),
  bew AS (SELECT src, dst, CAST((src + dst) % 5 + 1 AS DOUBLE) AS w FROM be),
  bv AS (SELECT src AS vid FROM bew UNION SELECT dst AS vid FROM bew),
  l0 AS (SELECT vid, vid AS label FROM bv),
  -- round 1, stage u2i: items adopt weight-dominant user label (min-label ties)
  c1 AS (SELECT bew.dst AS vid, l.label, sum(bew.w) AS tw
         FROM bew JOIN l0 l ON bew.src = l.vid GROUP BY bew.dst, l.label),
  b1 AS (SELECT vid, label FROM (
           SELECT vid, label, row_number() OVER (PARTITION BY vid ORDER BY tw DESC, label ASC) AS rn
           FROM c1) WHERE rn = 1),
  l1 AS (SELECT l0.vid, coalesce(b1.label, l0.label) AS label
         FROM l0 LEFT JOIN b1 ON l0.vid = b1.vid),
  -- round 1, stage i2u
  c2 AS (SELECT bew.src AS vid, l.label, sum(bew.w) AS tw
         FROM bew JOIN l1 l ON bew.dst = l.vid GROUP BY bew.src, l.label),
  b2 AS (SELECT vid, label FROM (
           SELECT vid, label, row_number() OVER (PARTITION BY vid ORDER BY tw DESC, label ASC) AS rn
           FROM c2) WHERE rn = 1),
  l2 AS (SELECT l1.vid, coalesce(b2.label, l1.label) AS label
         FROM l1 LEFT JOIN b2 ON l1.vid = b2.vid),
  -- round 2, stage u2i
  c3 AS (SELECT bew.dst AS vid, l.label, sum(bew.w) AS tw
         FROM bew JOIN l2 l ON bew.src = l.vid GROUP BY bew.dst, l.label),
  b3 AS (SELECT vid, label FROM (
           SELECT vid, label, row_number() OVER (PARTITION BY vid ORDER BY tw DESC, label ASC) AS rn
           FROM c3) WHERE rn = 1),
  l3 AS (SELECT l2.vid, coalesce(b3.label, l2.label) AS label
         FROM l2 LEFT JOIN b3 ON l2.vid = b3.vid),
  -- round 2, stage i2u
  c4 AS (SELECT bew.src AS vid, l.label, sum(bew.w) AS tw
         FROM bew JOIN l3 l ON bew.dst = l.vid GROUP BY bew.src, l.label),
  b4 AS (SELECT vid, label FROM (
           SELECT vid, label, row_number() OVER (PARTITION BY vid ORDER BY tw DESC, label ASC) AS rn
           FROM c4) WHERE rn = 1),
  l4 AS (SELECT l3.vid, coalesce(b4.label, l3.label) AS label
         FROM l3 LEFT JOIN b4 ON l3.vid = b4.vid)
  SELECT vid, label FROM l4""",
    "g_lpa_u2i_vec_r2": _lpa_u2i_vec_sql(2),
    "g_pagerank_r3": _pagerank_sql(PR_ROUNDS),
    "g_append_pagerank": _pagerank_sql(PR_ROUNDS),
    "g_bfs": _with_graph(
        """walk AS (
    WITH RECURSIVE w(vid, d) AS (
      SELECT (SELECT min(vid) FROM v), 0
      UNION
      SELECT e.dst, w.d + 1 FROM w JOIN e ON w.vid = e.src WHERE w.d < 50)
    SELECT * FROM w)
  SELECT vid, min(d) AS depth FROM walk GROUP BY vid"""
    ),
    "g_sssp": _with_graph(
        """we AS (SELECT src, dst, (src + dst) % 7 + 1 AS w FROM e),
  walk AS (
    WITH RECURSIVE x(vid, c) AS (
      SELECT (SELECT min(vid) FROM v), 0
      UNION
      SELECT we.dst, x.c + we.w FROM x JOIN we ON x.vid = we.src WHERE x.c < 60)
    SELECT * FROM x)
  SELECT vid, min(c) AS dist FROM walk GROUP BY vid"""
    ),
    "g_closeness": _with_graph(
        """walk AS (
    WITH RECURSIVE w(root, vid, d) AS (
      SELECT vid, vid, 0 FROM v
      UNION
      SELECT w.root, e.src, w.d + 1 FROM w JOIN e ON w.vid = e.dst WHERE w.d < 20)
    SELECT * FROM w),
  sp AS (SELECT root, vid, min(d) AS dist FROM walk GROUP BY root, vid),
  agg AS (SELECT root, count(*) - 1 AS rm1, sum(dist) AS s FROM sp GROUP BY root),
  nv AS (SELECT count(*) AS n FROM v)
  SELECT v.vid,
         round(CASE WHEN coalesce(agg.s, 0) > 0
               THEN (agg.rm1 * 1.0 / agg.s) * (agg.rm1 * 1.0 / ((SELECT n FROM nv) - 1))
               ELSE 0.0 END, 6) AS value
  FROM v LEFT JOIN agg ON v.vid = agg.root"""
    ),
    "g_closeness_sampled": _with_graph(
        """samp AS (SELECT vid FROM v WHERE vid % 5 = 0),
  walk AS (
    WITH RECURSIVE w(root, vid, d) AS (
      SELECT vid, vid, 0 FROM samp
      UNION
      SELECT w.root, e.src, w.d + 1 FROM w JOIN e ON w.vid = e.dst WHERE w.d < 20)
    SELECT * FROM w),
  sp AS (SELECT root, vid, min(d) AS dist FROM walk GROUP BY root, vid),
  agg AS (SELECT root, count(*) - 1 AS rm1, sum(dist) AS s FROM sp GROUP BY root),
  nv AS (SELECT count(*) AS n FROM v)
  SELECT samp.vid,
         round(CASE WHEN coalesce(agg.s, 0) > 0
               THEN (agg.rm1 * 1.0 / agg.s) * (agg.rm1 * 1.0 / ((SELECT n FROM nv) - 1))
               ELSE 0.0 END, 6) AS value
  FROM samp LEFT JOIN agg ON samp.vid = agg.root"""
    ),
    "g_apsp": _with_graph(
        """walk AS (
    WITH RECURSIVE w(root, vid, d) AS (
      SELECT vid, vid, 0 FROM v
      UNION
      SELECT w.root, e.dst, w.d + 1 FROM w JOIN e ON w.vid = e.src WHERE w.d < 20)
    SELECT * FROM w)
  SELECT root, vid, min(d) AS dist FROM walk GROUP BY root, vid"""
    ),
    "g_avg_path_length": _with_graph(
        """walk AS (
    WITH RECURSIVE w(root, vid, d) AS (
      SELECT vid, vid, 0 FROM v
      UNION
      SELECT w.root, e.dst, w.d + 1 FROM w JOIN e ON w.vid = e.src WHERE w.d < 20)
    SELECT * FROM w),
  sp AS (SELECT root, vid, min(d) AS dist FROM walk GROUP BY root, vid)
  SELECT round(avg(dist * 1.0), 6) AS avg_path_length FROM sp WHERE dist > 0"""
    ),
    "g_eccentricity": _with_graph(
        """walk AS (
    WITH RECURSIVE w(root, vid, d) AS (
      SELECT vid, vid, 0 FROM v
      UNION
      SELECT w.root, e.dst, w.d + 1 FROM w JOIN e ON w.vid = e.src WHERE w.d < 20)
    SELECT * FROM w),
  sp AS (SELECT root, vid, min(d) AS dist FROM walk GROUP BY root, vid)
  SELECT root AS vid, CAST(max(dist) AS BIGINT) AS ecc FROM sp GROUP BY root"""
    ),
    "g_diameter_radius": _with_graph(
        """walk AS (
    WITH RECURSIVE w(root, vid, d) AS (
      SELECT vid, vid, 0 FROM v
      UNION
      SELECT w.root, e.dst, w.d + 1 FROM w JOIN e ON w.vid = e.src WHERE w.d < 20)
    SELECT * FROM w),
  sp AS (SELECT root, vid, min(d) AS dist FROM walk GROUP BY root, vid),
  ecc AS (SELECT root, max(dist) AS ecc FROM sp GROUP BY root)
  SELECT CAST(max(ecc) AS BIGINT) AS diameter, CAST(min(ecc) AS BIGINT) AS radius
  FROM ecc"""
    ),
    "g_harmonic": _with_graph(
        """walk AS (
    WITH RECURSIVE w(root, vid, d) AS (
      SELECT vid, vid, 0 FROM v
      UNION
      SELECT w.root, e.src, w.d + 1 FROM w JOIN e ON w.vid = e.dst WHERE w.d < 20)
    SELECT * FROM w),
  sp AS (SELECT root, vid, min(d) AS dist FROM walk GROUP BY root, vid),
  agg AS (SELECT root, round(sum(1.0 / dist), 6) AS value
          FROM sp WHERE dist > 0 GROUP BY root)
  SELECT v.vid, coalesce(agg.value, 0.0) AS value
  FROM v LEFT JOIN agg ON v.vid = agg.root"""
    ),
    "g_bfs_tree": _with_graph(
        """walk AS (
    WITH RECURSIVE w(vid, d) AS (
      SELECT (SELECT min(vid) FROM v), 0
      UNION
      SELECT e.dst, w.d + 1 FROM w JOIN e ON w.vid = e.src WHERE w.d < 50)
    SELECT * FROM w),
  depth AS (SELECT vid, min(d) AS d FROM walk GROUP BY vid),
  tree AS (
    SELECT c.vid AS dst, min(e.src) AS src
    FROM depth c JOIN e ON e.dst = c.vid JOIN depth p ON p.vid = e.src
    WHERE p.d = c.d - 1 AND c.d > 0
    GROUP BY c.vid)
  SELECT src, dst FROM tree"""
    ),
    "g_numeric_assortativity": _with_graph(
        """x AS (SELECT 1)
  SELECT round(corr(CAST(src % 5 AS DOUBLE), CAST(dst % 5 AS DOUBLE)), 6)
         AS numeric_assortativity FROM e"""
    ),
    "g_attr_assortativity": _with_graph(
        """tot AS (SELECT count(*) AS t FROM e),
  m AS (SELECT src % 5 AS i, dst % 5 AS j, count(*) * 1.0 / (SELECT t FROM tot) AS p
        FROM e GROUP BY src % 5, dst % 5),
  ar AS (SELECT i, sum(p) AS a FROM m GROUP BY i),
  br AS (SELECT j, sum(p) AS b FROM m GROUP BY j),
  tr AS (SELECT coalesce(sum(p), 0) AS tr FROM m WHERE i = j),
  sab AS (SELECT sum(ar.a * br.b) AS sab FROM ar JOIN br ON ar.i = br.j)
  SELECT round(((SELECT tr FROM tr) - (SELECT sab FROM sab))
               / (1 - (SELECT sab FROM sab)), 6) AS attr_assortativity"""
    ),
    "g_degree_assortativity": _with_graph(
        """od AS (SELECT src AS vid, count(*) AS d FROM e GROUP BY src),
  idg AS (SELECT dst AS vid, count(*) AS d FROM e GROUP BY dst)
  SELECT round(corr(coalesce(od.d, 0), coalesce(idg.d, 0)), 6) AS assortativity
  FROM e LEFT JOIN od ON e.src = od.vid LEFT JOIN idg ON e.dst = idg.vid"""
    ),
    "g_avg_degree_connectivity": _with_graph(
        """bid AS (SELECT lo AS a, hi AS b FROM simple_und UNION ALL SELECT hi AS a, lo AS b FROM simple_und),
  dg AS (SELECT a, count(*) AS deg FROM bid GROUP BY a)
  SELECT d1.deg AS degree, round(avg(d2.deg), 6) AS avg_nbr_degree
  FROM bid JOIN dg d1 ON bid.a = d1.a JOIN dg d2 ON bid.b = d2.a
  GROUP BY d1.deg"""
    ),
    "g_node_boundary": _with_graph(
        """s AS (SELECT vid FROM v WHERE vid < 50)
  SELECT DISTINCT e.dst AS vid FROM e
  WHERE e.src IN (SELECT vid FROM s) AND e.dst NOT IN (SELECT vid FROM s)"""
    ),
    "g_edge_boundary": _with_graph(
        """s AS (SELECT vid FROM v WHERE vid < 50)
  SELECT e.src, e.dst FROM e
  WHERE e.src IN (SELECT vid FROM s) AND e.dst NOT IN (SELECT vid FROM s)"""
    ),
    # -- documents --
    "doc_tokens": """
  SELECT doc_id,
         len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS ws_tokens,
         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS bpe_tokens
  FROM documents""",
    "doc_quality": """
  WITH q AS (
    SELECT doc_id,
           length(text) AS n_chars,
           len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS n_words,
           length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS n_punct,
           len(list_filter(list_transform(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> ''), x -> lower(x)),
               w -> list_contains(['the','a','an','of','to','and','in','is','it','that'], w))) AS n_stop
    FROM documents)
  SELECT doc_id, n_chars, n_words,
         round(CASE WHEN n_chars > 0 THEN n_punct * 1.0 / n_chars ELSE 0 END, 6) AS punct_ratio,
         round(CASE WHEN n_words > 0 THEN n_stop * 1.0 / n_words ELSE 0 END, 6) AS stopword_ratio
  FROM q""",
    "doc_langid": _langid_sql(),
    "doc_fingerprint": """
  SELECT doc_id,
         md5(trim(regexp_replace(regexp_replace(lower(text), '[^\\w\\s]', '', 'g'), '\\s+', ' ', 'g'))) AS norm_md5
  FROM documents""",
    "doc_exact_dedup_count": """
  SELECT count(*) AS n_unique FROM (
    SELECT min(doc_id) FROM documents GROUP BY md5(text))""",
    "doc_ngram_jaccard": """
  WITH w AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS words
    FROM documents),
  sh AS (
    SELECT doc_id,
           list_distinct(CASE WHEN len(words) >= 3
             THEN list_transform(range(1, len(words) - 1),
                                 i -> array_to_string(list_slice(words, i, i + 2), ' '))
             ELSE [array_to_string(words, ' ')] END) AS shingles
    FROM w),
  ex AS (SELECT doc_id, len(shingles) AS n, unnest(shingles) AS s FROM sh),
  rare AS (SELECT s FROM ex GROUP BY s HAVING count(*) <= 100),
  exr AS (SELECT ex.doc_id, ex.n, ex.s FROM ex JOIN rare USING (s)),
  cand AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb
    FROM exr a JOIN exr b USING (s) WHERE a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id, a.n, b.n),
  inter AS (
    SELECT c.id_a, c.id_b, c.na, c.nb, count(*) AS i
    FROM cand c
    JOIN ex ea ON ea.doc_id = c.id_a
    JOIN ex eb ON eb.doc_id = c.id_b AND eb.s = ea.s
    GROUP BY c.id_a, c.id_b, c.na, c.nb)
  SELECT id_a, id_b, round(i * 1.0 / (na + nb - i), 6) AS jaccard
  FROM inter WHERE i * 1.0 / (na + nb - i) >= 0.4""",
    "doc_minhash_dups": """
  WITH w AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS words
    FROM documents),
  sh AS MATERIALIZED (
    SELECT doc_id,
           list_distinct(CASE WHEN len(words) >= 3
             THEN list_transform(range(1, len(words) - 1),
                                 i -> array_to_string(list_slice(words, i, i + 2), ' '))
             ELSE [array_to_string(words, ' ')] END) AS shingles
    FROM w),
  ex AS MATERIALIZED (SELECT doc_id, len(shingles) AS n, unnest(shingles) AS s FROM sh),
  sigs AS MATERIALIZED (
    SELECT doc_id, t.i, min(md5(t.i::VARCHAR || ':' || s)) AS mh
    FROM ex CROSS JOIN (SELECT unnest(range(0, 64)) AS i) t
    GROUP BY doc_id, t.i),
  bnd AS MATERIALIZED (
    SELECT doc_id, (i // 4) AS band,
           md5((i // 4)::VARCHAR || '|' || string_agg(mh, ',' ORDER BY i)) AS bh
    FROM sigs GROUP BY doc_id, (i // 4)),
  ok AS (SELECT band, bh FROM bnd GROUP BY band, bh HAVING count(*) <= 100),
  bndc AS MATERIALIZED (SELECT bnd.* FROM bnd JOIN ok USING (band, bh)),
  cand AS MATERIALIZED (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bndc a JOIN bndc b USING (band, bh)
    WHERE a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id),
  inter AS (
    SELECT c.id_a, c.id_b, ea.n AS na, eb.n AS nb, count(*) AS i
    FROM cand c
    JOIN ex ea ON ea.doc_id = c.id_a
    JOIN ex eb ON eb.doc_id = c.id_b AND eb.s = ea.s
    GROUP BY c.id_a, c.id_b, ea.n, eb.n)
  SELECT id_a, id_b, round(i * 1.0 / (na + nb - i), 6) AS jaccard
  FROM inter WHERE i * 1.0 / (na + nb - i) >= 0.5""",
    "doc_simhash_dups": """
  WITH w AS (
    SELECT doc_id,
           list_distinct(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                     x -> x <> '')) AS words
    FROM documents),
  wu AS (SELECT doc_id, unnest(words) AS word FROM w),
  wh AS MATERIALIZED (
    SELECT doc_id, ('0x' || substring(md5(word), 1, 15))::BIGINT AS h FROM wu),
  votes AS MATERIALIZED (
    SELECT doc_id, t.b, sum((h >> t.b) & 1) AS ones, count(*) AS nw
    FROM wh CROSS JOIN (SELECT unnest(range(0, 60)) AS b) t
    GROUP BY doc_id, t.b),
  sigs AS (
    SELECT doc_id,
           CAST(sum(CASE WHEN 2 * ones > nw THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT)
             AS simhash
    FROM votes GROUP BY doc_id),
  sigall AS MATERIALIZED (
    SELECT d.doc_id, coalesce(s.simhash, 0) AS simhash
    FROM documents d LEFT JOIN sigs s USING (doc_id))
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
  FROM sigall a JOIN sigall b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 6""",
    # -- embeddings --
    "emb_knn": """
  WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5),
  scored AS (
    SELECT q.query_id, e.vec_id,
           list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS cosine
    FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
  ranked AS (
    SELECT query_id, vec_id, cosine,
           row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
    FROM scored)
  SELECT query_id, vec_id, round(cosine, 6) AS cosine, rank FROM ranked WHERE rank <= 10""",
    "emb_neardup": """
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.5""",
    "emb_lsh_ann": _emb_lsh_ann_sql(),
    # IVF: the coarse quantizer is the seed-id vectors themselves
    # (vec_id = cid*17, cid < 8), so DuckDB rebuilds the identical
    # quantizer from the table — assignment argmax, nprobe=2 probe set
    # and the within-list exact re-rank all replayed relationally.
    "emb_ivf_ann": """
  WITH c AS MATERIALIZED (
    SELECT (vec_id // 17)::INT AS cid, embedding::DOUBLE[] AS cv
    FROM embeddings WHERE vec_id % 17 = 0 AND vec_id < 8 * 17),
  e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
  eassign AS (
    SELECT vec_id, cid AS list_id FROM (
      SELECT e.vec_id, c.cid,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid ASC) AS rn
      FROM e CROSS JOIN c) WHERE rn = 1),
  ea AS MATERIALIZED (
    SELECT e.vec_id, e.v, a.list_id FROM e JOIN eassign a USING (vec_id)),
  q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
  qprobe AS (
    SELECT query_id, cid AS list_id FROM (
      SELECT q.query_id, c.cid,
             row_number() OVER (PARTITION BY q.query_id
               ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.cid ASC) AS rn
      FROM q CROSS JOIN c) WHERE rn <= 2),
  cand AS (
    SELECT p.query_id, ea.vec_id, list_cosine_similarity(ea.v, q.qv) AS cosine
    FROM qprobe p JOIN ea ON ea.list_id = p.list_id
    JOIN q ON q.query_id = p.query_id
    WHERE ea.vec_id <> p.query_id),
  ranked AS (
    SELECT query_id, vec_id, cosine,
           row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
    FROM cand)
  SELECT query_id, vec_id, round(cosine, 6) AS cosine, rank
  FROM ranked WHERE rank <= 10""",
    # -- GIE traversals (customer -placed-> order -contains-> part) --
    "gie_status_groupcount": """
  SELECT o_orderstatus AS key, count(*)::BIGINT AS n
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY o_orderstatus""",
    "gie_building_values": """
  SELECT round(o_totalprice, 2) AS value
  FROM orders o JOIN customer c
    ON c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING'""",
    "gie_twohop_parts": """
  SELECT count(DISTINCT l_partkey)::BIGINT AS n
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING'""",
    "gie_math": """
  SELECT round((c.c_acctbal + o.o_totalprice) / 2, 4) AS value
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey""",
    "gie_repeat_until": """
  SELECT p.p_brand AS key, count(*)::BIGINT AS n
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING'
  JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY p.p_brand""",
    "gie_text_until": """
  SELECT p.p_brand AS key, count(*)::BIGINT AS n
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING'
  JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY p.p_brand""",
    "gie_text_twohop": """
  SELECT count(DISTINCT l_partkey)::BIGINT AS n
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING'""",
    "gie_text_match": """
  SELECT 'c' || c.c_custkey AS c, 'o' || o.o_orderkey AS o, 'p' || l.l_partkey AS p
  FROM customer c
  JOIN orders o ON o.o_custkey = c.c_custkey AND c.c_mktsegment = 'BUILDING'
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey""",
    "gie_text_choose": """
  SELECT ((SELECT count(*) FROM orders)
        + (SELECT count(*) FROM customer c
           WHERE NOT EXISTS (SELECT 1 FROM orders o
                             WHERE o.o_custkey = c.c_custkey)))::BIGINT AS n""",
    "gie_top_edges": """
  SELECT round(o_totalprice, 2) AS value
  FROM orders ORDER BY o_totalprice DESC LIMIT 10""",
    "gie_paths": """
  SELECT 'c' || c.c_custkey || '/o' || o.o_orderkey || '/p' || l.l_partkey AS path
  FROM customer c
  JOIN orders o ON o.o_custkey = c.c_custkey
    AND c.c_mktsegment = 'BUILDING' AND c.c_nationkey = 1
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey""",
    "g_csv_load": f"WITH e AS ({_EDGES_SQL}) SELECT src, dst FROM e",
    "gie_select_one": """
  SELECT count(DISTINCT o_custkey)::BIGINT AS n
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE o.o_orderstatus = 'F'""",
    "gie_union": """
  SELECT (
    (SELECT count(*) FROM orders o
     JOIN customer c ON c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING')
    + (SELECT count(*) FROM lineitem l
       JOIN orders o ON o.o_orderkey = l.l_orderkey
       JOIN customer c ON c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING')
  )::BIGINT AS n""",
    "gie_group_sum": """
  SELECT o_orderstatus AS key, round(sum(o_totalprice), 2) AS value
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY o_orderstatus""",
    "gie_sample": """
  SELECT oid FROM (SELECT 'c' || c_custkey AS oid FROM customer)
  ORDER BY md5('7|' || oid) LIMIT 20""",
    "gie_otherv": """
  SELECT count(DISTINCT l_orderkey)::BIGINT AS n
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_brand = 'Brand#13'""",
    "gie_choose_sack": """
  SELECT 'p' || l.l_partkey AS key,
         round(sum(CASE WHEN o.o_totalprice > 150000.0 THEN o.o_totalprice ELSE 0.0 END
                   + l.l_quantity), 2) AS value
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY l.l_partkey""",
    "gie_subgraph_degree": """
  WITH ce AS (
    SELECT DISTINCT 'c' || o_custkey AS src_oid, 'o' || o_orderkey AS dst_oid
    FROM orders o JOIN customer c
      ON c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING'),
  sv AS (SELECT src_oid AS oid FROM ce UNION SELECT dst_oid FROM ce),
  deg AS (SELECT src_oid AS oid, count(*) AS degree FROM ce GROUP BY 1)
  SELECT sv.oid, coalesce(deg.degree, 0)::BIGINT AS degree
  FROM sv LEFT JOIN deg USING (oid)""",
    "gie_subgraph_wcc": """
  WITH ce AS (
    SELECT DISTINCT 'c' || o_custkey AS src_oid, 'o' || o_orderkey AS dst_oid
    FROM orders o JOIN customer c
      ON c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING'),
  sv AS (SELECT src_oid AS oid FROM ce UNION SELECT dst_oid FROM ce),
  su AS (SELECT src_oid AS a, dst_oid AS b FROM ce
         UNION SELECT dst_oid, src_oid FROM ce),
  reach AS (
    WITH RECURSIVE r(oid, t) AS (
      SELECT oid, oid FROM sv
      UNION
      SELECT r.oid, su.b FROM r JOIN su ON r.t = su.a)
    SELECT * FROM r)
  SELECT oid, min(t) AS comp_oid FROM reach GROUP BY oid""",
    # -- property graph (customer/order labels, 'placed' edges) --
    "g_prop_label_counts": """
  SELECT 'vertex' AS kind, 'customer' AS label, count(*)::BIGINT AS n FROM customer
  UNION ALL
  SELECT 'vertex', 'order', count(*)::BIGINT FROM orders
  UNION ALL
  SELECT 'edge', 'placed', count(*)::BIGINT FROM orders""",
    "g_prop_degree": """
  WITH v AS (
    SELECT 'c' || c_custkey AS oid FROM customer
    UNION SELECT 'o' || o_orderkey FROM orders),
  deg AS (SELECT 'c' || o_custkey AS oid, count(*) AS degree FROM orders GROUP BY 1)
  SELECT v.oid, coalesce(deg.degree, 0)::BIGINT AS degree
  FROM v LEFT JOIN deg USING (oid)""",
    "g_prop_wdegree_building": """
  WITH cf AS (SELECT 'c' || c_custkey AS oid FROM customer WHERE c_mktsegment = 'BUILDING'),
  v AS (SELECT oid FROM cf UNION SELECT 'o' || o_orderkey FROM orders),
  w AS (
    SELECT 'c' || o_custkey AS oid, sum(o_totalprice) AS wdeg
    FROM orders JOIN cf ON cf.oid = 'c' || o_custkey GROUP BY 1)
  SELECT v.oid, round(coalesce(w.wdeg, 0), 2) AS wdeg
  FROM v LEFT JOIN w USING (oid)""",
    # -- corpus derivation (generator replay, independent of regex path) --
    "corpus_edges": _corpus_edges_sql(),
    "corpus_repo_graph": f"""
  WITH base AS ({_corpus_edges_sql()})
  SELECT split_part(src_oid, ':', 1) AS src_repo,
         split_part(dst_oid, ':', 1) AS dst_repo,
         CAST(count(*) AS BIGINT) AS weight
  FROM base
  WHERE split_part(src_oid, ':', 1) <> split_part(dst_oid, ':', 1)
  GROUP BY 1, 2""",
    # -- multimodal (synth_media replay: md5-portable generator, n=200, seed=42) --
    "media_features": """
  WITH m AS (
    SELECT t.range AS media_id,
           list_extract(['image', 'audio', 'video'],
             (('0x' || substring(md5('modality:42:' || t.range::VARCHAR), 1, 15))::BIGINT % 3 + 1)::INT
           ) AS modality,
           sha256('payload' || t.range::VARCHAR) AS payload_hex
    FROM range(200) t),
  -- _fake_feature: h = sha256(utf8 bytes of the payload hex string);
  -- f0 = first 4 digest bytes as uint32 little-endian / (2^32 - 1), as float32
  h AS (SELECT media_id, modality, sha256(payload_hex) AS hh FROM m),
  u AS (
    SELECT media_id, modality,
           ('0x' || substring(hh, 7, 2) || substring(hh, 5, 2)
                 || substring(hh, 3, 2) || substring(hh, 1, 2))::BIGINT AS u32
    FROM h)
  SELECT media_id, modality,
         round((CAST(u32 / 4294967295.0 AS REAL))::DOUBLE, 6) AS f0,
         16::BIGINT AS dim
  FROM u""",
    "media_frames": """
  WITH m AS (
    SELECT t.range AS media_id,
           ('0x' || substring(md5('modality:42:' || t.range::VARCHAR), 1, 15))::BIGINT % 3 AS mod_i,
           (('0x' || substring(md5('frames:42:' || t.range::VARCHAR), 1, 15))::BIGINT % 240 + 1)
             AS n_frames
    FROM range(200) t)
  SELECT media_id, unnest(range(0, n_frames, 30)) AS frame_idx
  FROM m WHERE mod_i = 2""",
}

# the Pregel-surface SSSP must produce exactly what the built-in does
ORACLE_SQL["g_pregel_sssp"] = ORACLE_SQL["g_sssp"]

# streaming ingest must converge to exactly the static computation:
# stream_wcc (4-micro-batch incremental ingest + warm-start resume)
# shares the batch recursive-CTE components oracle verbatim
ORACLE_SQL["stream_wcc"] = ORACLE_SQL["g_wcc"]
ORACLE_SQL["evt_sessions"] = """
  WITH x AS (
    SELECT user_id, ts, value,
           CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, value) IS NULL
                  OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, value)
                       > INTERVAL '30 minutes'
                THEN 1 ELSE 0 END AS new_s
    FROM events),
  y AS (
    SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, value
                               ROWS UNBOUNDED PRECEDING) AS sid
    FROM x)
  SELECT user_id, epoch_us(min(ts)) AS session_start_us,
         epoch_us(max(ts) + INTERVAL '30 minutes') AS session_end_us,
         count(*)::BIGINT AS n, round(sum(value), 6) AS sum_value
  FROM y GROUP BY user_id, sid"""
ORACLE_SQL["evt_user_totals"] = """
  SELECT user_id, count(*)::BIGINT AS n, round(sum(value), 6) AS sum_value
  FROM events GROUP BY user_id"""
ORACLE_SQL["stream_event_counts"] = """
  SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS VARCHAR) AS window_start,
         event_type, count(*)::BIGINT AS n, round(sum(value), 6) AS sum_value
  FROM events GROUP BY 1, 2"""

ORACLE_SQL["g_ppr_r3"] = _ppr_sql(PR_ROUNDS)
ORACLE_SQL["g_louvain_p1"] = _louvain_p1_sql(4)

ORACLE_SQL["g_linkpred"] = _with_graph(
    """deg AS (SELECT src AS vid, count(*) AS d FROM und GROUP BY src),
  byw AS (
    SELECT u.src AS w, u.dst AS n,
           CASE WHEN dg.d > 1 THEN 1.0 / ln(dg.d) ELSE 0.0 END AS aa,
           1.0 / dg.d AS ra
    FROM und u JOIN deg dg ON dg.vid = u.src),
  cand AS (
    SELECT a.n AS u, b.n AS v, count(*) AS cn, sum(a.aa) AS aa, sum(a.ra) AS ra
    FROM byw a JOIN byw b ON a.w = b.w AND a.n < b.n
    GROUP BY a.n, b.n),
  nonadj AS (
    SELECT c.* FROM cand c
    LEFT JOIN simple_und s ON s.lo = c.u AND s.hi = c.v
    WHERE s.lo IS NULL)
  SELECT n.u, n.v, n.cn::BIGINT AS cn,
         round(n.cn * 1.0 / (du.d + dv.d - n.cn), 6) AS jaccard,
         round(n.aa, 6) AS adamic_adar,
         round(n.ra, 6) AS resource_allocation,
         (du.d * dv.d)::BIGINT AS preferential_attachment
  FROM nonadj n JOIN deg du ON du.vid = n.u JOIN deg dv ON dv.vid = n.v"""
)


ORACLE_SQL["g_sample_neighbors"] = _with_graph(
    """ranked AS (
    SELECT src, dst, row_number() OVER (
      PARTITION BY src
      ORDER BY md5(src::VARCHAR || ':' || dst::VARCHAR || ':42'), dst
    ) AS rn
    FROM e)
  SELECT src, dst, rn::INTEGER AS sample_rank FROM ranked WHERE rn <= 5"""
)

ORACLE_SQL["g_khop_sample"] = _with_graph(
    """seeds AS (SELECT vid AS src FROM v WHERE vid % 50 = 0),
  l1 AS (
    SELECT src, dst, row_number() OVER (
      PARTITION BY src
      ORDER BY md5(src::VARCHAR || ':' || dst::VARCHAR || ':43'), dst) AS rn
    FROM e WHERE src IN (SELECT src FROM seeds)),
  f2 AS (SELECT DISTINCT dst AS src FROM l1 WHERE rn <= 3),
  l2 AS (
    SELECT src, dst, row_number() OVER (
      PARTITION BY src
      ORDER BY md5(src::VARCHAR || ':' || dst::VARCHAR || ':44'), dst) AS rn
    FROM e WHERE src IN (SELECT src FROM f2))
  SELECT 1 AS layer, src, dst FROM l1 WHERE rn <= 3
  UNION ALL
  SELECT 2 AS layer, src, dst FROM l2 WHERE rn <= 2"""
)

ORACLE_SQL["g_negative_sample"] = _with_graph(
    """idx AS (SELECT vid, row_number() OVER (ORDER BY CAST(vid AS VARCHAR)) - 1 AS idx FROM v),
  nv AS (SELECT count(*) AS n FROM v),
  att AS (SELECT i AS j FROM range(0, 20) t(i)),
  cand AS (
    SELECT s.vid AS src, att.j,
           (('0x' || substr(md5(s.vid::VARCHAR || ':' || att.j::VARCHAR || ':11'), 1, 8))::BIGINT)
             % (SELECT n FROM nv) AS cidx
    FROM v s, att),
  withneg AS (
    SELECT c.src, c.j, i.vid AS neg
    FROM cand c JOIN idx i ON i.idx = c.cidx
    WHERE i.vid <> c.src),
  valid AS (
    SELECT w.* FROM withneg w
    LEFT JOIN und a ON a.src = w.src AND a.dst = w.neg
    WHERE a.src IS NULL),
  dedup AS (
    SELECT *, row_number() OVER (PARTITION BY src, neg ORDER BY j) AS dup_rn FROM valid),
  ranked AS (
    SELECT src, neg, row_number() OVER (PARTITION BY src ORDER BY j) AS neg_rank
    FROM dedup WHERE dup_rn = 1)
  SELECT src, neg, neg_rank::INTEGER AS neg_rank FROM ranked WHERE neg_rank <= 3"""
)


def _voterank_sql(k: int = 5) -> str:
    """Unrolled SQL twin of voterank(k): per round — score = Σ neighbor
    ability rounded to 9 (summation-order invariance, as the engine),
    argmax with min-vid tie-break, winner ability → 0, winner's
    neighbors' ability −= 1/⟨deg⟩ floored at 0."""
    ctes = [
        f"e AS MATERIALIZED ({_EDGES_SQL})",
        "v AS MATERIALIZED (SELECT src AS vid FROM e UNION SELECT dst AS vid FROM e)",
        "und AS MATERIALIZED (SELECT src, dst FROM e"
        " UNION SELECT dst AS src, src AS dst FROM e)",
        "params AS MATERIALIZED (SELECT (SELECT count(*) FROM und) * 1.0"
        " / (SELECT count(*) FROM v) AS ad)",
        "ab0 AS MATERIALIZED (SELECT vid, 1.0 AS ab FROM v)",
    ]
    for r in range(k):
        excl = ""
        if r:
            uni = " UNION ALL ".join(f"SELECT vid FROM w{j}" for j in range(r))
            excl = f" WHERE und.src NOT IN ({uni})"
        ctes += [
            f"s{r} AS MATERIALIZED (SELECT und.src AS vid, round(sum(a.ab), 9) AS sc"
            f" FROM und JOIN ab{r} a ON a.vid = und.dst{excl} GROUP BY und.src)",
            f"w{r} AS MATERIALIZED (SELECT vid FROM s{r} WHERE sc > 0"
            " ORDER BY sc DESC, vid LIMIT 1)",
            f"""ab{r + 1} AS MATERIALIZED (SELECT a.vid,
    CASE WHEN a.vid = (SELECT vid FROM w{r}) THEN 0.0
         WHEN EXISTS (SELECT 1 FROM und u WHERE u.src = (SELECT vid FROM w{r})
                      AND u.dst = a.vid)
           THEN greatest(0.0, a.ab - 1.0 / (SELECT ad FROM params))
         ELSE a.ab END AS ab FROM ab{r} a)""",
        ]
    final = " UNION ALL ".join(
        f'SELECT CAST({i} AS BIGINT) AS "rank", vid FROM w{i}' for i in range(k)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + final


ORACLE_SQL["g_voterank"] = _voterank_sql(5)
ORACLE_SQL["g_betweenness_ep"] = _betweenness_sql(10, endpoints=True)
ORACLE_SQL["g_betweenness_w"] = _betweenness_w_sql()

ORACLE_SQL["doc_repetition"] = """
  WITH lines AS (
    SELECT doc_id,
           unnest(list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)),
                              l -> l <> '')) AS line
    FROM documents),
  lc AS (SELECT doc_id, line, count(*) AS cnt FROM lines GROUP BY doc_id, line),
  ls AS (SELECT doc_id, sum(cnt) AS n_lines, sum(cnt) - count(*) AS n_dup,
                sum(length(line) * cnt) AS line_chars,
                sum(CASE WHEN cnt > 1 THEN length(line) * cnt ELSE 0 END) AS dup_chars
         FROM lc GROUP BY doc_id),
  w AS (SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS words
        FROM documents),
  grams AS (SELECT doc_id,
                   unnest(CASE WHEN len(words) >= 2
                     THEN list_transform(range(1, len(words)), i -> words[i] || ' ' || words[i + 1])
                     ELSE CAST([] AS VARCHAR[]) END) AS g
            FROM w),
  gc AS (SELECT doc_id, g, count(*) AS cnt FROM grams GROUP BY doc_id, g),
  gs AS (SELECT doc_id, max(cnt) AS top_cnt, sum(cnt) AS n_grams FROM gc GROUP BY doc_id)
  SELECT d.doc_id,
         coalesce(ls.n_lines, 0)::BIGINT AS n_lines,
         round(CASE WHEN coalesce(ls.n_lines, 0) > 0 THEN ls.n_dup * 1.0 / ls.n_lines ELSE 0 END, 6) AS dup_line_ratio,
         round(CASE WHEN coalesce(ls.line_chars, 0) > 0 THEN ls.dup_chars * 1.0 / ls.line_chars ELSE 0 END, 6) AS dup_line_char_ratio,
         round(CASE WHEN coalesce(gs.n_grams, 0) > 0 THEN gs.top_cnt * 1.0 / gs.n_grams ELSE 0 END, 6) AS top_bigram_ratio
  FROM documents d
  LEFT JOIN ls ON d.doc_id = ls.doc_id
  LEFT JOIN gs ON d.doc_id = gs.doc_id"""

ORACLE_SQL["doc_split_counts"] = """
  SELECT split, count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS chars FROM (
    SELECT CASE WHEN b < 800000 THEN 'train' WHEN b < 900000 THEN 'val' ELSE 'test' END AS split,
           n_chars
    FROM (SELECT ('0x' || substring(md5('42:' || doc_id::VARCHAR), 1, 15))::BIGINT % 1000000 AS b,
                 n_chars
          FROM documents))
  GROUP BY split"""

ORACLE_SQL["doc_sample"] = """
  SELECT doc_id, lang FROM documents
  WHERE ('0x' || substring(md5('7:' || lang || '|' || doc_id::VARCHAR), 1, 15))::BIGINT % 1000000
        < 250000"""

ORACLE_SQL["doc_contamination"] = """
  WITH w AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS words
    FROM documents),
  g AS (
    SELECT doc_id,
           unnest(list_distinct(CASE WHEN len(words) >= 3
             THEN list_transform(range(1, len(words) - 1),
                                 i -> array_to_string(list_slice(words, i, i + 2), ' '))
             ELSE [array_to_string(words, ' ')] END)) AS g
    FROM w),
  bg AS (SELECT DISTINCT g FROM g WHERE doc_id % 50 = 0),
  tot AS (SELECT doc_id, count(*) AS n_grams FROM g GROUP BY doc_id),
  hit AS (SELECT g.doc_id, count(*) AS n_cont FROM g JOIN bg USING (g) GROUP BY g.doc_id)
  SELECT t.doc_id, t.n_grams,
         coalesce(h.n_cont, 0) AS n_contaminated,
         round(coalesce(h.n_cont, 0) * 1.0 / t.n_grams, 6) AS contamination_ratio,
         coalesce(h.n_cont, 0) * 1.0 / t.n_grams >= 0.1 AS contaminated
  FROM tot t LEFT JOIN hit h ON t.doc_id = h.doc_id"""

# near-dup pairs (bit-identical md5 LSH replay) -> undirected reachability
# -> min reachable id per member == the WCC canonical the engine computes.
ORACLE_SQL["doc_dedup_clusters"] = f"""
  WITH RECURSIVE pairs AS (
    SELECT id_a, id_b FROM ({ORACLE_SQL["doc_minhash_dups"]})
  ),
  und AS (SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
  ids AS (SELECT DISTINCT a AS id FROM und),
  reach AS (
    SELECT id, id AS m FROM ids
    UNION
    SELECT u.a, r.m FROM und u JOIN reach r ON r.id = u.b
  )
  SELECT id AS doc_id, min(m) AS canonical FROM reach GROUP BY id"""

from linkgraph.pipeline.curation import PII_PATTERNS as _PII  # noqa: E402

_pii_red = "text"
for _name, _pat in _PII.items():
    _pii_red = f"regexp_replace({_pii_red}, '{_pat}', '[{_name.upper()}]', 'g')"
ORACLE_SQL["doc_pii"] = f"""
  SELECT doc_id,
         len(regexp_extract_all(text, '{_PII["email"]}')) AS n_email,
         len(regexp_extract_all(text, '{_PII["phone"]}')) AS n_phone,
         len(regexp_extract_all(text, '{_PII["ipv4"]}')) AS n_ipv4,
         md5({_pii_red}) AS redacted_md5
  FROM documents"""

# corpus family: md5 generator arithmetic replays in DuckDB, so the
# fixed-round kernel and the converged WCC are both fully hash-checked
# on the DERIVED graph (not just on the parquet oracle graph).
ORACLE_SQL["corpus_pagerank_r3"] = f"""
  WITH ce AS ({_corpus_edges_sql()}),
  e AS (SELECT src_oid AS src, dst_oid AS dst FROM ce),
  v AS (SELECT src AS vid FROM e UNION SELECT dst FROM e),{_pagerank_body(PR_ROUNDS, out_col="oid")}"""

ORACLE_SQL["corpus_pagerank_dense"] = ORACLE_SQL["corpus_pagerank_r3"]
ORACLE_SQL["g_sssp_csr"] = ORACLE_SQL["g_sssp"]
ORACLE_SQL["g_cdlp_csr"] = ORACLE_SQL["g_cdlp_r2"]
ORACLE_SQL["g_wcc_csr"] = ORACLE_SQL["g_wcc"]
# delta-push tier: the oracle unrolls the SAME fixed-round push schedule
ORACLE_SQL["g_pagerank_delta"] = _with_graph(
    _pagerank_delta_body(DELTA_ROUNDS, DELTA_THETA)
)
ORACLE_SQL["g_pagerank_incr"] = _with_graph(
    _pagerank_incr_body(PR_ROUNDS, DELTA_ROUNDS, DELTA_THETA)
)
# streaming-maintained PageRank vs 100 static unrolled rounds: both
# sides sit ~1e-10/L1-1e-8 from the true fixpoint, far inside round(6)
ORACLE_SQL["stream_pagerank"] = _pagerank_sql(100)
# incremental SSSP lands on the exact full-graph fixpoint
ORACLE_SQL["g_sssp_incr"] = ORACLE_SQL["g_sssp"]
ORACLE_SQL["g_wcc_incr"] = ORACLE_SQL["g_wcc"]
ORACLE_SQL["g_triangles_incr"] = ORACLE_SQL["g_triangle_total"]


def _mis_oracle_sql(rounds: int = 25, seed: int = 42) -> str:
    """Unrolled Luby rounds (same shape as the unrolled PageRank oracles):
    w{k} = undecided strict (p, vid)-minima among undecided neighbors;
    u{k} = u{k-1} minus winners minus their neighborhoods. Extra rounds
    past convergence are empty — the unroll count only needs to be an
    upper bound (the Spark side raises if it ever exceeds its own cap)."""
    # MATERIALIZED: DuckDB inlines plain CTEs, and u{k} references
    # u{k-1} three times — unmaterialized the expansion is 3^rounds and
    # the replicated parquet scans exhaust the fd limit.
    ctes = [
        "und_m AS MATERIALIZED (SELECT src, dst FROM und WHERE src <> dst)",
        f"u0 AS MATERIALIZED (SELECT vid, md5(vid::VARCHAR || ':{seed}') AS p FROM v)",
    ]
    for k in range(1, rounds + 1):
        ctes.append(
            f"""w{k} AS MATERIALIZED (
    SELECT x.vid, {k}::BIGINT AS value FROM u{k - 1} x
    WHERE NOT EXISTS (
      SELECT 1 FROM und_m e JOIN u{k - 1} y ON y.vid = e.dst
      WHERE e.src = x.vid
        AND (y.p < x.p OR (y.p = x.p AND y.vid < x.vid))))"""
        )
        ctes.append(
            f"""u{k} AS MATERIALIZED (
    SELECT x.vid, x.p FROM u{k - 1} x
    WHERE NOT EXISTS (SELECT 1 FROM w{k} w WHERE w.vid = x.vid)
      AND NOT EXISTS (
        SELECT 1 FROM und_m e JOIN w{k} w ON w.vid = e.src
        WHERE e.dst = x.vid))"""
        )
    union = " UNION ALL ".join(f"SELECT vid, value FROM w{k}" for k in range(1, rounds + 1))
    return _with_graph(
        ",\n  ".join(ctes) + f"\n  SELECT vid, value FROM ({union}) AS mis"
    )


ORACLE_SQL["g_mis"] = _mis_oracle_sql()


def _coloring_oracle_sql(rounds: int = 110, seed: int = 42) -> str:
    """Unrolled Jones–Plassmann rounds: r{k} = Luby-ready vertices of
    u{k-1}; n{k} assigns each the mex of its already-colored neighbors'
    colors; colored and undecided sets roll forward. MATERIALIZED for
    the same fan-out reason as the MIS oracle."""
    ctes = [
        "und_m AS MATERIALIZED (SELECT src, dst FROM und WHERE src <> dst)",
        f"u0 AS MATERIALIZED (SELECT vid, md5(vid::VARCHAR || ':{seed}') AS p FROM v)",
        "c0 AS MATERIALIZED (SELECT vid, 0::BIGINT AS value FROM v WHERE 1 = 0)",
    ]
    for k in range(1, rounds + 1):
        ctes.append(
            f"""r{k} AS MATERIALIZED (
    SELECT x.vid FROM u{k - 1} x
    WHERE NOT EXISTS (
      SELECT 1 FROM und_m e JOIN u{k - 1} y ON y.vid = e.dst
      WHERE e.src = x.vid
        AND (y.p < x.p OR (y.p = x.p AND y.vid < x.vid))))"""
        )
        ctes.append(
            f"""n{k} AS MATERIALIZED (
    SELECT r.vid, coalesce((
      SELECT min(cand.c) FROM (
        SELECT 0 AS c
        UNION ALL
        SELECT c2.value + 1 FROM und_m e2 JOIN c{k - 1} c2 ON c2.vid = e2.dst
        WHERE e2.src = r.vid) cand
      WHERE cand.c NOT IN (
        SELECT c3.value FROM und_m e3 JOIN c{k - 1} c3 ON c3.vid = e3.dst
        WHERE e3.src = r.vid)), 0)::BIGINT AS value
    FROM r{k} r)"""
        )
        ctes.append(
            f"c{k} AS MATERIALIZED (SELECT * FROM c{k - 1} UNION ALL SELECT * FROM n{k})"
        )
        ctes.append(
            f"""u{k} AS MATERIALIZED (
    SELECT x.vid, x.p FROM u{k - 1} x
    WHERE NOT EXISTS (SELECT 1 FROM r{k} r WHERE r.vid = x.vid))"""
        )
    return _with_graph(
        ",\n  ".join(ctes) + f"\n  SELECT vid, value FROM c{rounds}"
    )


ORACLE_SQL["g_coloring"] = _coloring_oracle_sql()


def _ktruss_oracle_sql(k: int = 4, rounds: int = 12) -> str:
    """Unrolled synchronous truss peeling on the sparsified edge set:
    a{i} = symmetric adjacency of the surviving edges, s{i} = per-edge
    triangle support, e{i} = edges with support ≥ k-2 (edges closing no
    triangle have no s-row and drop via the inner join). Extra rounds
    past the fixpoint are no-ops."""
    ctes = [
        """e0 AS MATERIALIZED (
    SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi
    FROM e WHERE (src * 31 + dst) % 10 < 2 AND src <> dst)"""
    ]
    for i in range(1, rounds + 1):
        ctes.append(
            f"""a{i} AS MATERIALIZED (
    SELECT lo AS u, hi AS w FROM e{i - 1}
    UNION ALL SELECT hi AS u, lo AS w FROM e{i - 1})"""
        )
        ctes.append(
            f"""s{i} AS MATERIALIZED (
    SELECT c.lo, c.hi, count(*) AS sup FROM (
      SELECT ed.lo, ed.hi, x.w FROM e{i - 1} ed JOIN a{i} x ON x.u = ed.lo
      WHERE EXISTS (SELECT 1 FROM a{i} y WHERE y.u = ed.hi AND y.w = x.w)) c
    GROUP BY c.lo, c.hi)"""
        )
        ctes.append(
            f"""e{i} AS MATERIALIZED (
    SELECT ed.lo, ed.hi FROM e{i - 1} ed
    JOIN s{i} s ON s.lo = ed.lo AND s.hi = ed.hi WHERE s.sup >= {k - 2})"""
        )
    return _with_graph(",\n  ".join(ctes) + f"\n  SELECT lo, hi FROM e{rounds}")


ORACLE_SQL["g_ktruss"] = _ktruss_oracle_sql()


def _core_number_oracle_sql(levels: int = 12, rounds: int = 20) -> str:
    """Unrolled iterate-k core peel on the sparsified edge set: level k
    starts from level k-1's fixpoint edge set; each inner round keeps
    edges whose both endpoints have degree ≥ k. Vertices present in the
    final edge set of level k are in the k-core; core_number = max such
    k (0 for vertices peeled before level 1)."""
    ctes = [
        """a0_0 AS MATERIALIZED (
    SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi
    FROM e WHERE (src * 31 + dst) % 10 < 2 AND src <> dst)"""
    ]
    prev = "a0_0"
    member_sel = []
    for k in range(1, levels + 1):
        for r in range(1, rounds + 1):
            ctes.append(
                f"""d{k}_{r} AS MATERIALIZED (
    SELECT vid, count(*) AS deg FROM (
      SELECT lo AS vid FROM {prev} UNION ALL SELECT hi AS vid FROM {prev}) t
    GROUP BY vid)"""
            )
            ctes.append(
                f"""a{k}_{r} AS MATERIALIZED (
    SELECT e2.lo, e2.hi FROM {prev} e2
    JOIN d{k}_{r} dl ON dl.vid = e2.lo AND dl.deg >= {k}
    JOIN d{k}_{r} dh ON dh.vid = e2.hi AND dh.deg >= {k})"""
            )
            prev = f"a{k}_{r}"
        member_sel.append(
            f"SELECT lo AS vid, {k}::BIGINT AS value FROM {prev} "
            f"UNION ALL SELECT hi AS vid, {k}::BIGINT AS value FROM {prev}"
        )
    union = " UNION ALL ".join(member_sel)
    return _with_graph(
        ",\n  ".join(ctes)
        + f""",
  lvl AS MATERIALIZED (SELECT vid, max(value) AS value FROM ({union}) u GROUP BY vid)
  SELECT v.vid, coalesce(l.value, 0)::BIGINT AS value
  FROM v LEFT JOIN lvl l ON l.vid = v.vid"""
    )


ORACLE_SQL["g_core_number"] = _core_number_oracle_sql()


def _onion_oracle_sql(layers: int = 30) -> str:
    """Unrolled onion layers: per layer, raise the scalar threshold k to
    the minimum remaining degree, peel every vertex with degree ≤ k,
    drop their edges. Empty layers past convergence are no-ops."""
    ctes = [
        """a0 AS MATERIALIZED (
    SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi
    FROM e WHERE (src * 31 + dst) % 10 < 2 AND src <> dst)""",
        "r0 AS MATERIALIZED (SELECT vid FROM v)",
        "k0 AS MATERIALIZED (SELECT 1 AS k)",
    ]
    for i in range(1, layers + 1):
        ctes.append(
            f"""d{i} AS MATERIALIZED (
    SELECT r.vid, coalesce(c.d, 0) AS d FROM r{i - 1} r
    LEFT JOIN (SELECT vid, count(*) AS d FROM (
      SELECT lo AS vid FROM a{i - 1} UNION ALL SELECT hi AS vid FROM a{i - 1}) t
      GROUP BY vid) c ON c.vid = r.vid)"""
        )
        ctes.append(
            f"""k{i} AS MATERIALIZED (
    SELECT greatest((SELECT k FROM k{i - 1}),
                    coalesce((SELECT min(d) FROM d{i}), 0)) AS k)"""
        )
        ctes.append(
            f"""l{i} AS MATERIALIZED (
    SELECT vid, {i}::BIGINT AS value FROM d{i}
    WHERE d <= (SELECT k FROM k{i}))"""
        )
        ctes.append(
            f"""r{i} AS MATERIALIZED (
    SELECT r.vid FROM r{i - 1} r
    WHERE NOT EXISTS (SELECT 1 FROM l{i} l WHERE l.vid = r.vid))"""
        )
        ctes.append(
            f"""a{i} AS MATERIALIZED (
    SELECT e2.lo, e2.hi FROM a{i - 1} e2
    JOIN r{i} x ON x.vid = e2.lo JOIN r{i} y ON y.vid = e2.hi)"""
        )
    union = " UNION ALL ".join(f"SELECT vid, value FROM l{i}" for i in range(1, layers + 1))
    return _with_graph(
        ",\n  ".join(ctes) + f"\n  SELECT vid, value FROM ({union}) AS onion"
    )


ORACLE_SQL["g_onion"] = _onion_oracle_sql()

ORACLE_SQL["g_s_metric"] = _with_graph(
    """degs AS (
    SELECT vid, count(*) AS deg FROM (
      SELECT lo AS vid FROM simple_und UNION ALL SELECT hi AS vid FROM simple_und) t
    GROUP BY vid)
  SELECT sum(a.deg * b.deg)::BIGINT AS value
  FROM simple_und e JOIN degs a ON a.vid = e.lo JOIN degs b ON b.vid = e.hi"""
)

ORACLE_SQL["g_global_efficiency"] = _with_graph(
    """walk AS (
    WITH RECURSIVE w(root, vid, d) AS (
      SELECT vid, vid, 0 FROM v
      UNION
      SELECT w.root, u.dst, w.d + 1 FROM w JOIN und u ON w.vid = u.src WHERE w.d < 20)
    SELECT * FROM w),
  sp AS (SELECT root, vid, min(d) AS dist FROM walk GROUP BY root, vid)
  SELECT round(sum(1.0 / dist) / ((SELECT count(*) FROM v) * ((SELECT count(*) FROM v) - 1)), 8)::DOUBLE AS value
  FROM sp WHERE dist > 0"""
)

ORACLE_SQL["g_rich_club"] = _with_graph(
    """degs AS MATERIALIZED (
    SELECT vid, count(*) AS deg FROM (
      SELECT lo AS vid FROM simple_und UNION ALL SELECT hi AS vid FROM simple_und) t
    GROUP BY vid),
  ks AS MATERIALIZED (
    WITH RECURSIVE s(k) AS (
      SELECT 0
      UNION ALL
      SELECT k + 1 FROM s WHERE k + 1 < (SELECT max(deg) FROM degs))
    SELECT k FROM s),
  nk AS MATERIALIZED (
    SELECT k.k, (SELECT count(*) FROM degs d WHERE d.deg > k.k) AS n FROM ks k),
  ek AS MATERIALIZED (
    SELECT k.k, (SELECT count(*) FROM simple_und e
                 JOIN degs a ON a.vid = e.lo JOIN degs b ON b.vid = e.hi
                 WHERE least(a.deg, b.deg) > k.k) AS ne FROM ks k)
  SELECT n.k::BIGINT AS k,
         round(2.0 * e.ne / (n.n * (n.n - 1)), 8)::DOUBLE AS value
  FROM nk n JOIN ek e ON e.k = n.k WHERE n.n >= 2"""
)
ORACLE_SQL["g_wiener"] = _with_graph(
    """walk AS (
    WITH RECURSIVE w(root, vid, d) AS (
      SELECT vid, vid, 0 FROM v
      UNION
      SELECT w.root, u.dst, w.d + 1 FROM w JOIN und u ON w.vid = u.src WHERE w.d < 20)
    SELECT * FROM w),
  sp AS (SELECT root, vid, min(d) AS dist FROM walk GROUP BY root, vid)
  SELECT (sum(dist) / 2)::DOUBLE AS value FROM sp"""
)

ORACLE_SQL["g_effective_size"] = _with_graph(
    """degs AS (
    SELECT vid, count(*) AS deg FROM (
      SELECT lo AS vid FROM simple_und UNION ALL SELECT hi AS vid FROM simple_und) t
    GROUP BY vid),
  tr AS (
    SELECT n1.src AS vid, count(*) AS t
    FROM und n1 JOIN und n2 ON n1.src = n2.src AND n1.dst < n2.dst
    JOIN simple_und s ON s.lo = n1.dst AND s.hi = n2.dst
    GROUP BY n1.src)
  SELECT d.vid, round(d.deg - 2.0 * coalesce(t.t, 0) / d.deg, 8)::DOUBLE AS value
  FROM degs d LEFT JOIN tr t ON t.vid = d.vid"""
)

ORACLE_SQL["g_constraint"] = _with_graph(
    """es AS (SELECT * FROM e WHERE (src * 31 + dst) % 10 < 2),
  ssu AS (SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi FROM es),
  sund AS (SELECT lo AS src, hi AS dst FROM ssu UNION ALL SELECT hi, lo FROM ssu),
  degs AS (SELECT src AS vid, count(*) AS deg FROM sund GROUP BY src),
  ind AS (
    SELECT w1.src AS u, w2.dst AS v, sum(1.0 / dw.deg) AS s
    FROM sund w1 JOIN sund w2 ON w1.dst = w2.src AND w2.dst <> w1.src
    JOIN sund ev ON ev.src = w1.src AND ev.dst = w2.dst
    JOIN degs dw ON dw.vid = w1.dst
    GROUP BY w1.src, w2.dst),
  terms AS (
    SELECT e2.src AS u, power((1.0 + coalesce(i.s, 0)) / du.deg, 2) AS sq
    FROM sund e2 JOIN degs du ON du.vid = e2.src
    LEFT JOIN ind i ON i.u = e2.src AND i.v = e2.dst)
  SELECT u AS vid, round(sum(sq), 8)::DOUBLE AS value FROM terms GROUP BY u"""
)

ORACLE_SQL["g_local_bridges"] = _with_graph(
    """es AS (SELECT * FROM e WHERE (src * 31 + dst) % 10 < 2),
  ssu AS (SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi FROM es),
  sund AS (SELECT lo AS a, hi AS b FROM ssu UNION ALL SELECT hi, lo FROM ssu),
  cn AS (
    SELECT DISTINCT u1.a AS x, u2.a AS y
    FROM sund u1 JOIN sund u2 ON u1.b = u2.b AND u1.a < u2.a)
  SELECT s.lo, s.hi FROM ssu s
  LEFT JOIN cn ON cn.x = s.lo AND cn.y = s.hi WHERE cn.x IS NULL"""
)

ORACLE_SQL["g_is_bipartite"] = _with_graph(
    """comp AS (
    WITH RECURSIVE r(id, m) AS (
      SELECT vid, vid FROM v
      UNION
      SELECT u.dst, r.m FROM r JOIN und u ON u.src = r.id)
    SELECT id, min(m) AS root FROM r GROUP BY id),
  dwalk AS (
    WITH RECURSIVE d(vid, dist) AS (
      SELECT id, 0 FROM comp WHERE id = root
      UNION
      SELECT u.dst, d.dist + 1 FROM d JOIN und u ON u.src = d.vid WHERE d.dist < 20)
    SELECT vid, min(dist) AS dist FROM d GROUP BY vid),
  odd AS (
    SELECT count(*) AS c FROM simple_und s
    JOIN dwalk a ON a.vid = s.lo JOIN dwalk b ON b.vid = s.hi
    WHERE a.dist = b.dist)
  SELECT (c = 0) AS value, c::BIGINT AS odd_edges FROM odd"""
)

ORACLE_SQL["g_degree_histogram"] = _with_graph(
    """degs AS (
    SELECT vid, count(*) AS deg FROM (
      SELECT lo AS vid FROM simple_und UNION ALL SELECT hi AS vid FROM simple_und) t
    GROUP BY vid),
  pv AS (SELECT v.vid, coalesce(d.deg, 0) AS deg FROM v LEFT JOIN degs d USING (vid)),
  axis AS (
    WITH RECURSIVE s(k) AS (
      SELECT 0 UNION ALL SELECT k + 1 FROM s WHERE k + 1 <= (SELECT max(deg) FROM pv))
    SELECT k FROM s)
  SELECT a.k::BIGINT AS deg, count(p.vid)::BIGINT AS "count"
  FROM axis a LEFT JOIN pv p ON p.deg = a.k GROUP BY a.k"""
)

def _triad_oracle_sql() -> str:
    """Mirrors triads.triadic_census: the 64→16 lookup is BUILT FROM THE
    SAME generated-and-verified TRIAD_CLASS table (no duplicated magic
    values), the joins replay the dyad/wedge enumeration, and the
    single-dyad/empty classes use the identical counting corrections."""
    from linkgraph.algorithms.triads import TRIAD_CLASS, TRIAD_NAMES

    lut = ", ".join(f"({c}, '{name}')" for c, name in enumerate(TRIAD_CLASS))
    base = ", ".join(f"('{n}')" for n in TRIAD_NAMES)
    return _with_graph(
        f"""dy AS (
    SELECT least(src, dst) AS lo, greatest(src, dst) AS hi,
           max(CASE WHEN src < dst THEN 1 ELSE 0 END) AS f,
           max(CASE WHEN src > dst THEN 1 ELSE 0 END) AS b
    FROM e GROUP BY 1, 2),
  adjd AS (SELECT lo AS x, hi AS y FROM dy UNION ALL SELECT hi, lo FROM dy),
  tr AS (
    SELECT DISTINCT l[1] AS u, l[2] AS v, l[3] AS w FROM (
      SELECT list_sort([a1.x, a1.y, a2.y]) AS l
      FROM adjd a1 JOIN adjd a2 ON a1.x = a2.x AND a1.y < a2.y)),
  coded AS (
    SELECT coalesce(d1.f, 0) + 2 * coalesce(d1.b, 0)
         + 4 * coalesce(d2.f, 0) + 8 * coalesce(d2.b, 0)
         + 16 * coalesce(d3.f, 0) + 32 * coalesce(d3.b, 0) AS code,
         (coalesce(d1.f, 0) + coalesce(d1.b, 0) = 1)::INT
         + (coalesce(d2.f, 0) + coalesce(d2.b, 0) = 1)::INT
         + (coalesce(d3.f, 0) + coalesce(d3.b, 0) = 1)::INT AS a_t,
         (coalesce(d1.f, 0) + coalesce(d1.b, 0) = 2)::INT
         + (coalesce(d2.f, 0) + coalesce(d2.b, 0) = 2)::INT
         + (coalesce(d3.f, 0) + coalesce(d3.b, 0) = 2)::INT AS m_t
    FROM tr
    LEFT JOIN dy d1 ON d1.lo = tr.u AND d1.hi = tr.v
    LEFT JOIN dy d2 ON d2.lo = tr.u AND d2.hi = tr.w
    LEFT JOIN dy d3 ON d3.lo = tr.v AND d3.hi = tr.w),
  lut(code, name) AS (VALUES {lut}),
  conn AS (
    SELECT l.name, count(*) AS cnt, sum(a_t) AS sa, sum(m_t) AS sm
    FROM coded JOIN lut l ON l.code = coded.code GROUP BY 1),
  tot AS (SELECT coalesce(sum((f + b = 1)::INT), 0) AS a_tot,
                 coalesce(sum((f + b = 2)::INT), 0) AS m_tot FROM dy),
  nv AS (SELECT count(*) AS nn FROM v),
  sums AS (SELECT coalesce(sum(a_t), 0) AS sa, coalesce(sum(m_t), 0) AS sm FROM coded),
  c012 AS (SELECT a_tot * (nn - 2) - sa AS x FROM tot, nv, sums),
  c102 AS (SELECT m_tot * (nn - 2) - sm AS x FROM tot, nv, sums),
  c003 AS (
    SELECT (nn * (nn - 1) * (nn - 2)) // 6
           - (SELECT coalesce(sum(cnt), 0) FROM conn)
           - (SELECT x FROM c012) - (SELECT x FROM c102) AS x FROM nv),
  base(name) AS (VALUES {base})
  SELECT b.name AS triad_type,
         (CASE b.name WHEN '003' THEN (SELECT x FROM c003)
                      WHEN '012' THEN (SELECT x FROM c012)
                      WHEN '102' THEN (SELECT x FROM c102)
                      ELSE coalesce(conn.cnt, 0) END)::BIGINT AS "count"
  FROM base b LEFT JOIN conn ON conn.name = b.name"""
    )


ORACLE_SQL["g_triadic_census"] = _triad_oracle_sql()

ORACLE_SQL["g_square_clustering"] = _with_graph(
    """degs AS (
    SELECT vid, count(*) AS deg FROM (
      SELECT lo AS vid FROM simple_und UNION ALL SELECT hi AS vid FROM simple_und) t
    GROUP BY vid),
  wedg AS (
    SELECT n1.src AS v, n1.dst AS u, n2.dst AS w
    FROM und n1 JOIN und n2 ON n1.src = n2.src AND n1.dst < n2.dst),
  cn AS (SELECT u, w, count(*) AS cn FROM wedg GROUP BY u, w),
  perw AS (
    SELECT wedg.v, cn.cn - 1 AS q,
           (cn.cn - 1) + (du.deg - cn.cn - coalesce(th, 0))
                       + (dw.deg - cn.cn - coalesce(th, 0)) AS d
    FROM wedg JOIN cn USING (u, w)
    JOIN degs du ON du.vid = wedg.u JOIN degs dw ON dw.vid = wedg.w
    LEFT JOIN (SELECT lo AS u, hi AS w, 1 AS th FROM simple_und) t USING (u, w)),
  sums AS (SELECT v AS vid, sum(q) AS nq, sum(d) AS nd FROM perw GROUP BY v)
  SELECT v.vid,
         round(CASE WHEN coalesce(nd, 0) > 0 THEN nq / nd ELSE 0.0 END, 8)::DOUBLE AS value
  FROM v LEFT JOIN sums USING (vid)"""
)

# whole-graph scalars (algorithms/globals.py) — integer-count arithmetic,
# so the doubles are bit-identical between engines
ORACLE_SQL["g_density"] = _with_graph(
    """nv AS (SELECT count(*) AS n FROM v), ne AS (SELECT count(*) AS m FROM e)
  SELECT CASE WHEN n > 1 THEN m / (n::DOUBLE * (n - 1)) ELSE 0.0 END AS value
  FROM ne, nv"""
)
ORACLE_SQL["g_reciprocity"] = _with_graph(
    """rc AS (SELECT count(*) AS r FROM (SELECT src, dst FROM e
                                         INTERSECT SELECT dst, src FROM e)),
  tot AS (SELECT count(*) AS m FROM e)
  SELECT CASE WHEN m > 0 THEN r / m::DOUBLE ELSE 0.0 END AS value FROM rc, tot"""
)
ORACLE_SQL["g_avg_neighbor_degree"] = _with_graph(
    """deg AS (SELECT src AS nbr, count(*) AS tdeg FROM e GROUP BY src),
  pairs AS (SELECT src AS vid, dst AS nbr FROM e),
  a AS (SELECT vid, avg(coalesce(tdeg, 0)) AS value
        FROM pairs LEFT JOIN deg USING (nbr) GROUP BY vid)
  SELECT v.vid, coalesce(a.value, 0.0) AS value FROM v LEFT JOIN a ON v.vid = a.vid"""
)
ORACLE_SQL["g_bfs_csr"] = ORACLE_SQL["g_bfs"]

ORACLE_SQL["corpus_wcc"] = f"""
  WITH RECURSIVE ce AS ({_corpus_edges_sql()}),
  vo AS (SELECT DISTINCT oid FROM (SELECT src_oid AS oid FROM ce
                                   UNION SELECT dst_oid FROM ce)),
  vm AS (SELECT oid, row_number() OVER (ORDER BY oid) - 1 AS vid FROM vo),
  und AS (SELECT src_oid AS a, dst_oid AS b FROM ce
          UNION SELECT dst_oid, src_oid FROM ce),
  reach AS (
    SELECT oid AS id, oid AS m FROM vo
    UNION
    SELECT u.a, r.m FROM und u JOIN reach r ON r.id = u.b
  ),
  comp AS (SELECT id, min(m) AS c FROM reach GROUP BY id)
  SELECT comp.id AS oid, vm.vid AS comp FROM comp JOIN vm ON vm.oid = comp.c"""


# ------------------------------------------------------------------ r5 queue
# Fully implemented + locally oracle-checked entries staged for the ROUND-5
# driver window.  They are intentionally NOT in QUERIES yet: the r4 window is
# exactly full with this round's 50 first-verdict entries, and the registry
# rule above forbids an unverified oracle-backed entry past position 50.
# At round-5 start: splice R5_QUEUE_QUERIES into the head of QUERIES (and
# R5_QUEUE_ORACLE_SQL into ORACLE_SQL), demoting r4-green entries to the tail.
# Until then tests/test_oracle_parity.py::test_r5_queue_matches_oracle_sf0001
# runs the identical spark-vs-DuckDB comparison on every queued pair.


def _ppr_batch_sql(rounds: int, k: int, seed_mod: int = 20) -> str:
    """Unrolled fixed-round batched PPR oracle: k independent single-seed
    chains (seed j = vids ≡ j mod ``seed_mod``), one UNION ALL readout.
    Column-for-column the same recurrence as ``_ppr_sql``."""
    pre = f"""
  deg AS (SELECT src AS vid, count(*) AS d FROM e GROUP BY src),
  nv AS (SELECT count(*) AS n FROM v),
  vd AS (SELECT v.vid, coalesce(deg.d, 0) AS d FROM v LEFT JOIN deg ON v.vid = deg.vid)"""
    parts, reads = [], []
    for j in range(k):
        parts.append(
            f"""
  pv_{j} AS (SELECT vid, CASE WHEN vid % {seed_mod} = {j} THEN 1.0 ELSE 0.0 END
             / (SELECT count(*) FROM v WHERE vid % {seed_mod} = {j}) AS p FROM v),
  r0_{j} AS (SELECT vid, d, 1.0 / (SELECT n FROM nv) AS rank FROM vd)"""
        )
        for i in range(1, rounds + 1):
            p = i - 1
            parts.append(
                f"""
  dang{i}_{j} AS MATERIALIZED (SELECT {ALPHA} * coalesce(sum(rank), 0) AS m
                               FROM r{p}_{j} WHERE d = 0),
  msg{i}_{j} AS MATERIALIZED (SELECT e.dst AS vid, sum(r.rank / r.d) AS s
             FROM e JOIN r{p}_{j} r ON e.src = r.vid WHERE r.d > 0 GROUP BY e.dst),
  r{i}_{j} AS MATERIALIZED (SELECT vd.vid, vd.d,
                  {ALPHA} * coalesce(m.s, 0)
                  + (1 - {ALPHA}) * pv.p
                  + (SELECT m FROM dang{i}_{j}) * pv.p AS rank
           FROM vd JOIN pv_{j} pv ON vd.vid = pv.vid
           LEFT JOIN msg{i}_{j} m ON vd.vid = m.vid)"""
            )
        reads.append(
            f"SELECT vid, {j} AS seed, round(rank, 6) AS value FROM r{rounds}_{j}"
        )
    return _with_graph(
        pre + "," + ",".join(parts) + "\n  " + " UNION ALL ".join(reads)
    )


def q_ppr_batch(spark, sf_dir):
    """Batched multi-seed personalized PageRank (CSR tier, k=4 seed vectors
    as one array<k> state — the PPRGo/GNN-sampler shape: the edge topology
    is gathered once per round for ALL seeds).  Seeds: vector j = vids ≡ j
    (mod 20), uniform weight; fixed PR_ROUNDS rounds (oracle mode).  Each
    column follows nx pagerank(personalization=...) exactly — the same
    contract the reference wraps (python/graphscope/analytical/app/
    pagerank.py:61-99); per-column equality with the single-seed engine
    runs is pytest-asserted (tests/test_ppr_batch.py)."""
    from linkgraph.csr import ppr_batch_csr

    g = _oracle_graph(spark, sf_dir)
    kk = 4
    seeds = g.vertices.where(F.pmod(F.col("vid"), F.lit(20)) < kk).select(
        F.pmod(F.col("vid"), F.lit(20)).cast("int").alias("seed"),
        "vid",
        F.lit(1.0).alias("weight"),
    )
    return ppr_batch_csr(g, seeds, alpha=ALPHA, max_iter=PR_ROUNDS, tol=None).select(
        "vid", "seed", F.round("value", 6).alias("value")
    )




def q_betweenness_sampled(spark, sf_dir):
    """Sampled-source approximate betweenness (Brandes over k sampled
    roots, nx k-sample estimator rescale xn/k) -- the standard scale knob
    for the most expensive centrality: O(k*V) state instead of O(V^2),
    exact same batched multi-source phases as g_betweenness.  Roots =
    vids = 0 (mod 5), deterministic so the unrolled SQL twin replays the
    sample choice exactly."""
    from linkgraph.algorithms import betweenness_centrality

    g = _oracle_graph(spark, sf_dir)
    sample = g.vertices.where(F.pmod(F.col("vid"), F.lit(5)) == 0).select("vid")
    return betweenness_centrality(g, sources=sample).select(
        "vid", F.round("value", 6).alias("value")
    )




def _dag_layers_sql(rounds: int = 60) -> str:
    """Unrolled longest-path DP over the forward (src < dst) subgraph:
    d_i(v) = max(d_{i-1}(v), max over in-edges (d_{i-1}(u) + 1)).  At the
    fixpoint d(v) is the longest path ending at v — which IS the Kahn
    generation index (standard equivalence; the engine peels, the oracle
    runs the DP, both land on the same layers).  Depth at sf0.01 is 55;
    60 rounds give headroom (converged rounds are no-ops)."""
    parts = [
        "fwd AS (SELECT src, dst FROM e WHERE src < dst)",
        """vf AS (SELECT DISTINCT vid FROM
       (SELECT src AS vid FROM fwd UNION ALL SELECT dst FROM fwd))""",
        "d0 AS (SELECT vid, 0 AS d FROM vf)",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        parts.append(
            f"""d{i} AS MATERIALIZED (
      SELECT t.vid, greatest(t.d, coalesce(m.md, -1)) AS d
      FROM d{p} t LEFT JOIN (
        SELECT f.dst AS vid, max(p2.d) + 1 AS md
        FROM fwd f JOIN d{p} p2 ON p2.vid = f.src GROUP BY f.dst) m
      ON m.vid = t.vid)"""
        )
    return _with_graph(
        ",\n  ".join(parts)
        + f"\n  SELECT vid, d::BIGINT AS layer FROM d{rounds}"
    )


def _fwd_graph(spark, sf_dir):
    """Forward (src < dst) subgraph of the oracle graph — a DAG by
    construction (edges only increase vid, so no cycles)."""
    g = _oracle_graph(spark, sf_dir)
    fwd = g.edges.where(F.col("src") < F.col("dst"))
    verts = (
        fwd.select(F.col("src").alias("vid"))
        .union(fwd.select(F.col("dst").alias("vid")))
        .distinct()
        .select("vid", F.col("vid").cast("string").alias("oid"))
    )
    return LinkGraph(vertices=verts, edges=fwd)


def q_topo_layers(spark, sf_dir):
    """Topological generations (nx.topological_generations parity) via a
    Kahn superstep peel on the forward-edge DAG; layer(v) = longest path
    ending at v.  Oracle replays the equivalent unrolled longest-path DP."""
    from linkgraph.algorithms.dag import topological_generations

    return topological_generations(_fwd_graph(spark, sf_dir)).select("vid", "layer")


def q_is_dag(spark, sf_dir):
    """is_directed_acyclic_graph on the FULL directed oracle graph (which
    has cycles) unioned with the forward subgraph (a DAG): two labeled
    rows prove both verdicts of the Kahn-peel remainder test."""
    from linkgraph.algorithms.dag import is_directed_acyclic_graph

    full = is_directed_acyclic_graph(_oracle_graph(spark, sf_dir)).select(
        F.lit("full").alias("which"), "value"
    )
    fwd = is_directed_acyclic_graph(_fwd_graph(spark, sf_dir)).select(
        F.lit("fwd").alias("which"), "value"
    )
    return full.union(fwd)




def q_clustering_w(spark, sf_dir):
    """Weighted (Onnela) local clustering over a deterministic symmetric
    weight w = (src+dst) % 7 + 1 -- nx clustering(G, weight='weight')
    semantics, one corner-centered wedge join (Sigma deg^2, same kernel
    cost/caveats as the unweighted triangle count)."""
    from linkgraph.algorithms.clustering import clustering_weighted

    g = _oracle_graph(spark, sf_dir)
    e = g.edges.select(
        "src", "dst",
        (F.pmod(F.col("src") + F.col("dst"), F.lit(7)) + 1).cast("double").alias("weight"),
    )
    g2 = LinkGraph(vertices=g.vertices, edges=e)
    out = clustering_weighted(g2).select(
        "vid", F.round("value", 6).alias("value")
    ).localCheckpoint(eager=True)
    g2.unpersist()
    return out


_CLUSTERING_W_SQL = _with_graph(
    """base AS (SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi,
                       ((src + dst) % 7 + 1)::DOUBLE AS w
         FROM e WHERE src <> dst),
  uw AS (SELECT lo, hi, w / (SELECT max(w) FROM base) AS w FROM base),
  adj AS (SELECT lo AS v, hi AS nbr, w FROM uw
          UNION ALL SELECT hi, lo, w FROM uw),
  wed AS (SELECT a1.v, a1.nbr AS b, a2.nbr AS c, a1.w AS w1, a2.w AS w2
          FROM adj a1 JOIN adj a2 ON a1.v = a2.v WHERE a1.nbr < a2.nbr),
  tri AS (SELECT wed.v, pow(wed.w1 * wed.w2 * uw.w, 1.0/3.0) AS t
          FROM wed JOIN uw ON uw.lo = wed.b AND uw.hi = wed.c),
  tw AS (SELECT v AS vid, sum(t) AS tw FROM tri GROUP BY v),
  dg AS (SELECT v AS vid, count(*) AS deg FROM adj GROUP BY v)
  SELECT v.vid,
         round(CASE WHEN coalesce(dg.deg, 0) >= 2
                    THEN 2.0 * coalesce(tw.tw, 0) / (dg.deg * (dg.deg - 1.0))
                    ELSE 0.0 END, 6) AS value
  FROM v LEFT JOIN dg ON v.vid = dg.vid LEFT JOIN tw ON v.vid = tw.vid"""
)




def q_kclique3(spark, sf_dir):
    """k-clique percolation communities (k=3, nx.community parity):
    triangle-edge star links + the engine's own WCC over packed edge-key
    nodes; (community, vid) membership rows, community = the component's
    min packed edge key (unique per community — min member vid is NOT,
    two communities can share their minimum vertex)."""
    from linkgraph.algorithms.cliques import k_clique_communities

    g = _oracle_graph(spark, sf_dir)
    return k_clique_communities(g, k=3).select("community", "vid")


def _kclique3_sql(rounds: int = 12) -> str:
    """Triangle percolation replay: the SAME packed-edge star links the
    engine builds, components via UNROLLED min-label propagation (the
    naive recursive reachability closure is O(|edge-nodes|²) pairs —
    200M at sf0.01's 52k triangles — and times out; min-prop converges
    in ≤7 rounds at both test scales, 12 gives headroom)."""
    parts = [
        f"e AS ({_EDGES_SQL})",
        """und AS (SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi
          FROM e WHERE src <> dst)""",
        """tri AS (SELECT u1.lo AS a, u1.hi AS b, u2.hi AS c
          FROM und u1
          JOIN und u2 ON u2.lo = u1.lo AND u2.hi > u1.hi
          JOIN und u3 ON u3.lo = u1.hi AND u3.hi = u2.hi)""",
        """lnk0 AS (SELECT a * 4294967296 + b AS s, a * 4294967296 + c AS d FROM tri
           UNION ALL SELECT a * 4294967296 + b, b * 4294967296 + c FROM tri)""",
        "lnk AS (SELECT DISTINCT s, d FROM (SELECT s, d FROM lnk0 UNION ALL SELECT d, s FROM lnk0))",
        "l0 AS (SELECT DISTINCT s AS id, s AS m FROM lnk)",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        parts.append(
            f"""l{i} AS MATERIALIZED (
      SELECT t.id, least(t.m, coalesce(n.nm, t.m)) AS m
      FROM l{p} t LEFT JOIN (
        SELECT lnk.d AS id, min(x.m) AS nm
        FROM lnk JOIN l{p} x ON x.id = lnk.s GROUP BY lnk.d) n
      ON n.id = t.id)"""
        )
    return (
        "WITH "
        + ",\n  ".join(parts)
        + f""",
  comp AS (SELECT id, m AS cm FROM l{rounds}),
  members AS (
    SELECT DISTINCT cm, id // 4294967296 AS vid FROM comp
    UNION SELECT cm, id % 4294967296 FROM comp)
  SELECT cm AS community, vid FROM members"""
    )




def q_stream_triangles(spark, sf_dir):
    """Streaming triangle maintenance: the oracle edges ingested as a
    4-micro-batch stream; batch 1 counts cold, every later batch updates
    the exact total via the delta-driven inclusion-exclusion
    (streaming.streaming_triangles -> triangle_total_incr).  Oracle is
    the plain full-graph ordered-wedge count, so a hash match proves the
    maintained total equals the cold total regardless of arrival order
    or batch boundaries."""
    import tempfile

    from linkgraph.streaming import stream_parquet, streaming_triangles

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    edges = (
        orders.select(
            F.pmod(F.col("o_custkey"), F.lit(V_MOD)).alias("s"),
            F.pmod(F.col("o_orderkey"), F.lit(V_MOD)).alias("d"),
        )
        .where(F.col("s") != F.col("d"))
        .select(
            F.col("s").cast("string").alias("src_oid"),
            F.col("d").cast("string").alias("dst_oid"),
        )
    )
    tmp = tempfile.mkdtemp(prefix="lg_stream_tri_")
    edges.repartition(4).write.mode("overwrite").parquet(tmp)
    sdf = stream_parquet(spark, tmp, "src_oid string, dst_oid string")
    _, total = streaming_triangles(sdf)
    return spark.createDataFrame([(total,)], "total_triangles long")




def q_dag_longest(spark, sf_dir):
    """dag_longest_path_length on the forward-edge DAG — max Kahn layer
    (= longest path edge count); exercises the third DAG-family function
    end-to-end on the same peel."""
    from linkgraph.algorithms.dag import dag_longest_path_length

    return dag_longest_path_length(_fwd_graph(spark, sf_dir)).select(
        F.col("value").cast("long").alias("value")
    )




def q_harmonic_sampled(spark, sf_dir):
    """Sampled-target harmonic centrality — the O(k*V) scale knob with
    the closeness_sampled contract: exact values for the deterministic
    mod-5 target sample, no estimator rescale (harmonic(v) depends only
    on distances TO v)."""
    from linkgraph.algorithms import harmonic_centrality

    g = _oracle_graph(spark, sf_dir)
    sample = g.vertices.where(F.pmod(F.col("vid"), F.lit(5)) == 0).select("vid")
    return harmonic_centrality(g, sources=sample).select(
        "vid", F.round("value", 6).alias("value")
    )


_HARMONIC_SAMPLED_SQL = _with_graph(
    """walk AS (
    WITH RECURSIVE w(root, vid, d) AS (
      SELECT vid, vid, 0 FROM v WHERE vid % 5 = 0
      UNION
      SELECT w.root, e.src, w.d + 1 FROM w JOIN e ON w.vid = e.dst WHERE w.d < 20)
    SELECT * FROM w),
  sp AS (SELECT root, vid, min(d) AS dist FROM walk GROUP BY root, vid),
  agg AS (SELECT root, round(sum(1.0 / dist), 6) AS value
          FROM sp WHERE dist > 0 GROUP BY root)
  SELECT v.vid, coalesce(agg.value, 0.0) AS value
  FROM v LEFT JOIN agg ON v.vid = agg.root
  WHERE v.vid % 5 = 0"""
)


R5_QUEUE_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "g_ppr_batch": q_ppr_batch,
    "g_betweenness_sampled": q_betweenness_sampled,
    "g_topo_layers": q_topo_layers,
    "g_is_dag": q_is_dag,
    "g_clustering_w": q_clustering_w,
    "g_kclique3": q_kclique3,
    "stream_triangles": q_stream_triangles,
    "g_dag_longest": q_dag_longest,
    "g_harmonic_sampled": q_harmonic_sampled,
}

R5_QUEUE_ORACLE_SQL: dict[str, str] = {
    "g_ppr_batch": _ppr_batch_sql(PR_ROUNDS, 4),
    "g_betweenness_sampled": _betweenness_sql(10, sample_mod=5),
    "g_topo_layers": _dag_layers_sql(60),
    "g_is_dag": """WITH RECURSIVE e AS (%s),
  reach AS (
    SELECT src AS a, dst AS b FROM e
    UNION
    SELECT r.a, e.dst FROM reach r JOIN e ON e.src = r.b
  ),
  cyc AS (SELECT count(*) AS c FROM reach WHERE a = b)
  SELECT 'full' AS which, (SELECT c FROM cyc) = 0 AS value
  UNION ALL
  SELECT 'fwd' AS which, true AS value""" % _EDGES_SQL,
    "g_clustering_w": _CLUSTERING_W_SQL,
    "g_kclique3": _kclique3_sql(12),
    "stream_triangles": None,  # filled below (same oracle as g_triangle_total)
}

R5_QUEUE_ORACLE_SQL["stream_triangles"] = ORACLE_SQL["g_triangle_total"]
R5_QUEUE_ORACLE_SQL["g_dag_longest"] = (
    "SELECT max(layer)::BIGINT AS value FROM (" + _dag_layers_sql(60) + ")"
)
R5_QUEUE_ORACLE_SQL["g_harmonic_sampled"] = _HARMONIC_SAMPLED_SQL


# ------------------------------------------------------------- r5 splice
# Round-5 window splice (VERDICT r4 "Next round" #1): the nine staged,
# locally-parity-checked queue entries move to the HEAD of the registry so
# the driver's 50-slot window hash-verifies them this round; r4-green
# entries demote to the tail (every one re-verified by the pytest gate,
# SURVEY.md §8).  R5_NEW_QUERIES / R5_NEW_ORACLE_SQL collect operators
# implemented DURING round 5 — also never driver-verified, so they ride in
# the window immediately behind the queue.  tests/test_registry.py asserts
# no never-verified entry sits past position 50.
R5_NEW_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
R5_NEW_ORACLE_SQL: dict[str, str] = {}

from linkgraph import queries_r5  # noqa: E402  (populates R5_NEW_*)
from linkgraph import queries_r5b  # noqa: E402  (second-wave r5 entries)

queries_r5.register(R5_NEW_QUERIES, R5_NEW_ORACLE_SQL)
queries_r5b.register(R5_NEW_QUERIES, R5_NEW_ORACLE_SQL)

from linkgraph import queries_r5c  # noqa: E402  (third-wave r5 entries)

queries_r5c.register(R5_NEW_QUERIES, R5_NEW_ORACLE_SQL)

QUERIES = {**R5_QUEUE_QUERIES, **R5_NEW_QUERIES, **QUERIES}
ORACLE_SQL = {**R5_QUEUE_ORACLE_SQL, **R5_NEW_ORACLE_SQL, **ORACLE_SQL}
