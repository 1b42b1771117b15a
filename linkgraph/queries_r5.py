"""Round-5 registry additions (kept separate so queries.py's r4-frozen
ordering stays byte-stable above the splice point).

Every entry registered here is new in round 5 and therefore never
driver-verified — ``queries.py`` splices them into the head of the
50-slot driver window, right behind the staged r4 queue.

Covered here (VERDICT r4 asks #4 and #5):

- Gremlin steps optional()/coalesce()/and()/or()/project().by() —
  reference tree nodes OptionalTreeNode.java, CaseWhenTreeNode.java,
  AndTreeNode/OrTreeNode.java, ProjectTreeNode-family under
  interactive_engine/compiler/src/main/java/com/alibaba/maxgraph/
  compiler/tree/ — each as a fluent step (gie.py) AND through the text
  front-end (gremlin.py); entries alternate surface so both lowerings
  get driver hashes.
- Traversal-embedded vertex programs page_rank()/connected_component()/
  label_propagation() (PageRankVertexProgramTreeNode.java etc.) — sugar
  over the subgraph()→GAE pipeline, verified against the SAME oracle SQL
  as the explicit g_pagerank_r3/g_wcc/g_cdlp_r2 compositions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _gie_algo_graph(spark, sf_dir):
    """The vid oracle graph wrapped as a single-label PropertyGraph.

    Oids are zero-padded decimal vids so lexicographic oid order equals
    numeric vid order: subgraph()'s dense ids (rank in sorted-oid order)
    are then order-isomorphic to the vids, which keeps order-sensitive
    label dynamics (CDLP min-tie-break, WCC min labels) remap-invariant.
    """
    from linkgraph import queries as Q
    from linkgraph.property import PropertyGraph

    g = Q._oracle_graph(spark, sf_dir)
    pad = lambda c: F.lpad(F.col(c).cast("string"), 6, "0")  # noqa: E731
    v = g.vertices.select(pad("vid").alias("oid"))
    e = g.edges.select(pad("src").alias("src_oid"), pad("dst").alias("dst_oid"))
    return (
        PropertyGraph()
        .add_vertices(v, label="node")
        .add_edges(e, label="link", src_label="node", dst_label="node")
    )


def _louvain_canonical_sql(rounds: int, phases: int) -> str:
    """Unrolled SQL twin of louvain_canonical: ``phases`` ×
    ``rounds``-round parity-damped local moving, min-member-vid
    canonicalization, contraction between phases. The per-round CTE
    chain mirrors _louvain_p1_sql (gain expression textually identical —
    ΔQ must associate the same way in both engines); phase ≥1 adds the
    self-loop exclusion the Spark kernel applies in _round_moves and
    carries the contracted weighted edge table. Σw is contraction-
    invariant so one mm CTE serves every phase."""
    from linkgraph import queries as Q

    ctes = [
        f"e AS MATERIALIZED ({Q._EDGES_SQL})",
        "su AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi"
        " FROM e WHERE src <> dst)",
        "ew_0 AS MATERIALIZED (SELECT lo AS src, hi AS dst, 1.0 AS w FROM su"
        " UNION ALL SELECT hi AS src, lo AS dst, 1.0 AS w FROM su)",
        "mm AS MATERIALIZED (SELECT sum(w) / 2 AS m FROM ew_0)",
    ]
    for ph in range(phases):
        ew = f"ew_{ph}"
        if ph > 0:
            prev = ph - 1
            ctes.append(
                f"""{ew} AS MATERIALIZED (
    SELECT pa.comm AS src, pb.comm AS dst, sum(e.w) AS w
    FROM ew_{prev} e
    JOIN pc_{prev} pa ON pa.vid = e.src
    JOIN pc_{prev} pb ON pb.vid = e.dst
    GROUP BY 1, 2)"""
            )
        ctes += [
            f"deg_{ph} AS MATERIALIZED (SELECT src AS vid, sum(w) AS k FROM {ew} GROUP BY src)",
            f"a_{ph}_0 AS MATERIALIZED (SELECT DISTINCT src AS vid, src AS comm FROM {ew})",
        ]
        noself = " WHERE e.src <> e.dst" if ph > 0 else ""
        for r in range(rounds):
            parity = r % 2
            ctes += [
                f"""tot_{ph}_{r} AS MATERIALIZED (
    SELECT a.comm, sum(d.k) AS tot FROM a_{ph}_{r} a JOIN deg_{ph} d ON d.vid = a.vid
    GROUP BY a.comm)""",
                f"""nbr_{ph}_{r} AS MATERIALIZED (
    SELECT e.src AS vid, a.comm AS c_nbr, sum(e.w) AS k_in
    FROM {ew} e JOIN a_{ph}_{r} a ON a.vid = e.dst{noself} GROUP BY e.src, a.comm)""",
                f"""cand_{ph}_{r} AS MATERIALIZED (
    SELECT n.vid, a.comm, n.c_nbr,
           n.k_in / mm.m
             - d.k * (t.tot - CASE WHEN n.c_nbr = a.comm THEN d.k ELSE 0.0 END)
               / (2.0 * mm.m * mm.m) AS gain
    FROM nbr_{ph}_{r} n
    JOIN deg_{ph} d ON d.vid = n.vid
    JOIN a_{ph}_{r} a ON a.vid = n.vid
    JOIN tot_{ph}_{r} t ON t.comm = n.c_nbr
    CROSS JOIN mm)""",
                f"""best_{ph}_{r} AS MATERIALIZED (
    SELECT vid, comm, gain, c_nbr AS best_c FROM (
      SELECT *, row_number() OVER (PARTITION BY vid ORDER BY gain DESC, c_nbr ASC) AS rn
      FROM cand_{ph}_{r}) WHERE rn = 1)""",
                f"""stay_{ph}_{r} AS MATERIALIZED (
    SELECT vid, gain AS stay_gain FROM cand_{ph}_{r} WHERE c_nbr = comm)""",
                f"""mv_{ph}_{r} AS MATERIALIZED (
    SELECT b.vid, b.best_c AS new_comm
    FROM best_{ph}_{r} b LEFT JOIN stay_{ph}_{r} s ON s.vid = b.vid
    WHERE b.vid % 2 = {parity} AND b.best_c <> b.comm
      AND b.gain > coalesce(s.stay_gain, 0.0) + 1e-12)""",
                f"""a_{ph}_{r + 1} AS MATERIALIZED (
    SELECT a.vid, coalesce(mv.new_comm, a.comm) AS comm
    FROM a_{ph}_{r} a LEFT JOIN mv_{ph}_{r} mv ON mv.vid = a.vid)""",
            ]
        ctes.append(
            f"""pc_{ph} AS MATERIALIZED (
    SELECT a.vid, c.canon AS comm
    FROM a_{ph}_{rounds} a
    JOIN (SELECT comm, min(vid) AS canon FROM a_{ph}_{rounds} GROUP BY comm) c
      ON c.comm = a.comm)"""
        )
    joins, final = [], "v.vid"
    prev_key = "v.vid"
    for ph in range(phases):
        joins.append(f"LEFT JOIN pc_{ph} x{ph} ON x{ph}.vid = {prev_key}")
        prev_key = f"x{ph}.comm"
        final = f"coalesce(x{ph}.comm, {final})"
    return f"""
  WITH {', '.join(ctes)},
  verts AS ({Q._VERTS_SQL})
  SELECT v.vid, {final}::BIGINT AS comm
  FROM verts v
  {' '.join(joins)}"""


def _peer_pressure_sql(rounds: int) -> str:
    """Unrolled SQL twin of algorithms.peer_pressure: CDLP's per-round
    count-majority (min-label tie-break) with the TinkerPop self vote —
    each round's tally unions one (vid, own-label) row per vertex into
    the neighbor-label multiset."""
    from linkgraph import queries as Q

    pre = """
  bidir AS (SELECT src, dst FROM e WHERE src <> dst
            UNION ALL SELECT dst AS src, src AS dst FROM e WHERE src <> dst),
  l0 AS (SELECT vid, vid AS label FROM v)"""
    steps = []
    for i in range(1, rounds + 1):
        p = i - 1
        steps.append(
            f"""
  cnt{i} AS (SELECT vid, label, count(*) AS c FROM (
               SELECT b.dst AS vid, l.label
               FROM bidir b JOIN l{p} l ON b.src = l.vid
               UNION ALL SELECT vid, label FROM l{p}) GROUP BY vid, label),
  best{i} AS (SELECT vid, label FROM (
                SELECT vid, label,
                       row_number() OVER (PARTITION BY vid ORDER BY c DESC, label ASC) AS rn
                FROM cnt{i}) WHERE rn = 1),
  l{i} AS (SELECT l{p}.vid, coalesce(b.label, l{p}.label) AS label
           FROM l{p} LEFT JOIN best{i} b ON l{p}.vid = b.vid)"""
        )
    return Q._with_graph(
        pre + "," + ",".join(steps) + f"\n  SELECT vid, label AS cluster FROM l{rounds}"
    )


# ---------------------------------------------------------------- queries


def q_louvain_full(spark, sf_dir):
    """Canonical multi-phase Louvain (2 phases × 4 fixed parity-damped
    rounds, min-member-vid contraction ids) — the deterministic,
    hash-oracled face of the contraction pipeline; the convergence-
    driven ``louvain`` fast variant stays rows-only."""
    from linkgraph import queries as Q
    from linkgraph.algorithms import louvain_canonical

    g = Q._oracle_graph(spark, sf_dir)
    return louvain_canonical(g, rounds_per_phase=4, phases=2).select(
        "vid", F.col("value").cast("long").alias("comm")
    )


def q_gie_optional(spark, sf_dir):
    """optional() (OptionalTreeNode.java): BUILDING customers flow to
    their placed orders when any exist, else pass through unchanged —
    choose(t, t, identity) lowered to one semi- plus one anti-join over
    the shared deduped element set."""
    from linkgraph import queries as Q
    from linkgraph.gie import traversal

    g = traversal(Q._gie_graph(spark, sf_dir))
    t = (
        g.V("customer")
        .has("c_mktsegment", "BUILDING")
        .optional(lambda t: t.out("placed"))
    )
    return t.df.select("oid")


def q_gie_coalesce(spark, sf_dir):
    """coalesce() through the TEXT front-end: each customer becomes its
    F-status orders if any, else itself — first-match branch routing as
    a cascade of existential semi/anti joins."""
    from linkgraph import queries as Q
    from linkgraph.gremlin import gremlin

    q = gremlin(Q._gie_graph(spark, sf_dir))
    return q.execute(
        "g.V('customer')"
        ".coalesce(__.out('placed').has('o_orderstatus', 'F'), __.identity())"
        ".groupCount()"
    )


def q_gie_and(spark, sf_dir):
    """and() (AndTreeNode.java): customers with BOTH an 'F' and an 'O'
    order — chained existential semi-joins."""
    from linkgraph import queries as Q
    from linkgraph.gie import traversal

    g = traversal(Q._gie_graph(spark, sf_dir))
    t = g.V("customer").and_(
        lambda t: t.out("placed").has("o_orderstatus", "F"),
        lambda t: t.out("placed").has("o_orderstatus", "O"),
    )
    return t.df.select("oid")


def q_gie_or(spark, sf_dir):
    """or() through the TEXT front-end: customers in the BUILDING
    segment OR with an 'F' order — branches share one deduped element
    scan; survivor keys union into a single semi-join."""
    from linkgraph import queries as Q
    from linkgraph.gremlin import gremlin

    q = gremlin(Q._gie_graph(spark, sf_dir))
    return q.execute(
        "g.V('customer')"
        ".or(__.out('placed').has('o_orderstatus', 'F'),"
        " __.has('c_mktsegment', 'BUILDING'))"
        ".groupCount()"
    )


def q_gie_project(spark, sf_dir):
    """project().by() through the TEXT front-end: per-customer struct of
    (oid, segment, local out('placed') count) — property joins plus one
    identity-keyed count branch; project is not a filter (customers with
    zero orders keep a row, n_orders = 0)."""
    from linkgraph import queries as Q
    from linkgraph.gremlin import gremlin

    q = gremlin(Q._gie_graph(spark, sf_dir))
    return q.execute(
        "g.V('customer').has('c_mktsegment', 'BUILDING')"
        ".project('cust', 'seg', 'n_orders')"
        ".by('oid').by('c_mktsegment').by(__.out('placed').count())"
    )


def q_gie_pagerank_step(spark, sf_dir):
    """Traversal-embedded pageRank() step
    (PageRankVertexProgramTreeNode.java): traverse the whole 'link' edge
    set, subgraph() it, run the fixed-round LDBC kernel — hash-matching
    the SAME oracle SQL as the explicit g_pagerank_r3 composition."""
    from linkgraph import queries as Q
    from linkgraph.gie import traversal

    g = traversal(_gie_algo_graph(spark, sf_dir))
    pr = g.V("node").outE("link").page_rank(times=Q.PR_ROUNDS)
    return pr.select(
        F.col("oid").cast("long").alias("vid"), F.round("value", 6).alias("value")
    )


def q_gie_wcc_step(spark, sf_dir):
    """connectedComponent() step: subgraph()→WCC, component labels
    translated back through the zero-padded oids (dense-min == numeric
    min) — same oracle as g_wcc."""
    from linkgraph.gie import traversal

    g = traversal(_gie_algo_graph(spark, sf_dir))
    cc = g.V("node").outE("link").connected_component()
    return cc.select(
        F.col("oid").cast("long").alias("vid"),
        F.col("component_oid").cast("long").alias("comp"),
    )


def q_gie_lpa_step(spark, sf_dir):
    """peerPressure()/label-propagation step: subgraph()→fixed-round
    CDLP; label dynamics depend only on label equality+order, which the
    order-isomorphic dense remap preserves — same oracle as g_cdlp_r2."""
    from linkgraph import queries as Q
    from linkgraph.gie import traversal

    g = traversal(_gie_algo_graph(spark, sf_dir))
    lp = g.V("node").outE("link").label_propagation(times=Q.CDLP_ROUNDS)
    return lp.select(
        F.col("oid").cast("long").alias("vid"),
        F.col("label_oid").cast("long").alias("label"),
    )


def q_gie_peer_pressure(spark, sf_dir):
    """peerPressure() step (PeerPressureVertexProgramTreeNode.java):
    TinkerPop cluster-vote propagation over the traversed edges —
    CDLP-with-self-vote, min-label tie-break, fixed rounds. Label
    dynamics depend only on label equality+order, which the
    order-isomorphic dense remap preserves; oracle is the unrolled
    self-vote twin of the CDLP SQL."""
    from linkgraph import queries as Q
    from linkgraph.gie import traversal

    g = traversal(_gie_algo_graph(spark, sf_dir))
    pp = g.V("node").outE("link").peer_pressure(times=Q.CDLP_ROUNDS)
    return pp.select(
        F.col("oid").cast("long").alias("vid"),
        F.col("cluster_oid").cast("long").alias("cluster"),
    )


def q_ktruss_fast(spark, sf_dir):
    """4-truss via the h-index fast tier (truss_decomposition filtered at
    trussness ≥ 4) on the same sparsified edge set as g_ktruss — same
    canonical fixpoint, so the SAME unrolled peel oracle must hash-match;
    no per-round wedge re-enumeration (triangles materialize once)."""
    from linkgraph import queries as Q
    from linkgraph.algorithms import k_truss
    from linkgraph.graph import LinkGraph

    g = Q._oracle_graph(spark, sf_dir)
    keep = (F.col("src") * 31 + F.col("dst")) % 10 < 2
    sparse = LinkGraph(vertices=g.vertices, edges=g.edges.where(keep))
    return k_truss(sparse, k=4, method="hindex")


def q_gie_aggregate_cap(spark, sf_dir):
    """aggregate('x')…cap('x') through the TEXT front-end
    (AggregationListTreeNode.java): collect the BUILDING customers'
    order stream into the named side-effect collection, emit it with
    cap(), then unfold back to rows (the driver gate compares scalar
    columns; tests/test_gie.py asserts the folded array itself)."""
    from linkgraph import queries as Q
    from linkgraph.gie import unfold
    from linkgraph.gremlin import gremlin

    q = gremlin(Q._gie_graph(spark, sf_dir))
    capped = q.execute(
        "g.V('customer').has('c_mktsegment', 'BUILDING')"
        ".out('placed').aggregate('x').cap('x')"
    )
    return unfold(capped).select(F.col("value").alias("oid"))


def q_gie_barrier(spark, sf_dir):
    """barrier() (BarrierTreeNode.java) mid-chain through the TEXT
    front-end: a synchronization/materialization point that must be
    semantics-neutral — the oracle is the barrier-free equivalent."""
    from linkgraph import queries as Q
    from linkgraph.gremlin import gremlin

    q = gremlin(Q._gie_graph(spark, sf_dir))
    t = q.execute(
        "g.V('customer').has('c_mktsegment', 'BUILDING').barrier()"
        ".out('placed').has('o_orderstatus', 'F')"
    )
    return t.select("oid")


def q_gie_tokens(spark, sf_dir):
    """T.id on an edge frontier through the TEXT front-end
    (TokenTreeNode.java): every placed edge's identity as
    ``src->dst``."""
    from linkgraph import queries as Q
    from linkgraph.gremlin import gremlin

    q = gremlin(Q._gie_graph(spark, sf_dir))
    return q.execute("g.V('customer').outE('placed').id()")


def q_gie_count_local(spark, sf_dir):
    """count(Scope.local) (CountLocalTreeNode.java): fold the BUILDING
    customers' orders into one collection, then size it per-row — no
    shuffle past the fold."""
    from linkgraph import queries as Q
    from linkgraph.gie import count_local, traversal

    g = traversal(Q._gie_graph(spark, sf_dir))
    folded = (
        g.V("customer").has("c_mktsegment", "BUILDING").out("placed").fold()
    )
    return count_local(folded).select(F.col("value").alias("n"))


def q_gie_sssp_step(spark, sf_dir):
    """Traversal-embedded shortestPath() step
    (ShortestPathVertexProgramTreeNode.java): traverse the 'link'
    edges, subgraph(), BFS hop distances from the min-vid source —
    hash-matching the SAME oracle as the explicit g_bfs composition
    (dense remap is order-isomorphic; BFS is purely structural)."""
    from linkgraph import queries as Q
    from linkgraph.gie import traversal

    g = Q._oracle_graph(spark, sf_dir)
    src = g.vertices.agg(F.min("vid")).first()[0]
    t = traversal(_gie_algo_graph(spark, sf_dir))
    d = t.V("node").outE("link").shortest_path(f"{src:06d}")
    return (
        d.where(F.col("value") >= 0)
        .select(
            F.col("oid").cast("long").alias("vid"),
            F.col("value").cast("long").alias("depth"),
        )
    )


def q_gie_hits_step(spark, sf_dir):
    """Traversal-embedded hits() step (HitsVertexProgramTreeNode.java):
    subgraph()→2-round HITS (tolerance=0 pins the round count exactly
    like g_hits_r2) — hub/auth are structural, so the dense remap is
    score-neutral and the SAME oracle applies."""
    from linkgraph.gie import traversal

    t = traversal(_gie_algo_graph(spark, sf_dir))
    h = t.V("node").outE("link").hits_step(tolerance=0.0, max_round=2)
    return h.select(
        F.col("oid").cast("long").alias("vid"),
        F.round("hub", 6).alias("hub"),
        F.round("auth", 6).alias("auth"),
    )


def q_gie_branch(spark, sf_dir):
    """branch().option() (BranchTreeNode.java) through the TEXT
    front-end: route each customer by its market segment — BUILDING
    customers flow to their orders, AUTOMOBILE customers to their
    F-status orders, everyone else ('none' catch-all, Pick.none) passes
    through unchanged. One shared token-extended scan, one Catalyst
    filter per option, unionByName merge."""
    from linkgraph import queries as Q
    from linkgraph.gremlin import gremlin

    q = gremlin(Q._gie_graph(spark, sf_dir))
    return q.execute(
        "g.V('customer')"
        ".branch(__.values('c_mktsegment'))"
        ".option('BUILDING', __.out('placed'))"
        ".option('AUTOMOBILE', __.out('placed').has('o_orderstatus', 'F'))"
        ".option('none', __.identity())"
        ".groupCount()"
    )


def q_gie_allpath(spark, sf_dir):
    """allPath() step (AllPathTreeNode.java, runtime program
    PROGRAM_GRAPH_ALLPATH): every simple path min-oid → max-oid within 3
    hops over the traversed edges, as comma-joined oid strings. Oracle is
    the same recursive path CTE that backs g_all_simple_paths_c3, with
    vids rendered through the padded-oid mapping of _gie_algo_graph."""
    from linkgraph import queries as Q
    from linkgraph.gie import traversal

    g = Q._oracle_graph(spark, sf_dir)
    lohi = g.vertices.agg(F.min("vid"), F.max("vid")).first()
    src, dst = f"{lohi[0]:06d}", f"{lohi[1]:06d}"
    pg = _gie_algo_graph(spark, sf_dir)
    paths = traversal(pg).V().outE().all_path(src, dst, 3)
    return paths.select(F.concat_ws(",", "path").alias("path_csv"))


def q_gie_lambda(spark, sf_dir):
    """Lambda steps (LambdaFilterTreeNode.java / LambdaMapTreeNode.java):
    filter customers by a computed predicate over c_acctbal, then map
    each survivor to a computed value — both lambdas are Catalyst Column
    functions (df → Column), so the whole chain is one codegen'd plan
    with zero Python in the row path."""
    from linkgraph import queries as Q
    from linkgraph.gie import traversal

    g = traversal(Q._gie_graph(spark, sf_dir))
    return (
        g.V("customer")
        .lambda_filter(lambda df: F.col("c_acctbal") > 5000, "c_acctbal")
        .lambda_map(
            lambda df: F.floor("c_acctbal").cast("long"), "c_acctbal"
        )
    )


def q_gie_output(spark, sf_dir):
    """output() sink (OutputTreeNode.java — tunnel:// stays
    unimplemented; OutputVineyardTreeNode.java capability expressed as a
    columnar parquet write): BUILDING customers with their segment are
    written out and read back; the round-trip must hash-match the plain
    projection oracle."""
    import tempfile

    from linkgraph import queries as Q
    from linkgraph.gie import traversal

    g = traversal(Q._gie_graph(spark, sf_dir))
    d = tempfile.mkdtemp(prefix="lg_gie_out_")
    return (
        g.V("customer")
        .has("c_mktsegment", "BUILDING")
        .output(f"{d}/building", "c_mktsegment")
    )


def _edge_betweenness_sql(levels: int = 10) -> str:
    """Unrolled edge-Brandes twin of queries._betweenness_sql: identical
    forward multi-source BFS + backward δ CTE chain, but the per-edge
    terms σ_v·(1+δ_w)/σ_w are aggregated per DAG edge (v, w) instead of
    folded into δ(v); normalization 1/(n(n−1)) (nx directed rescale)."""
    from linkgraph import queries as Q

    parts = [
        "lvl0 AS MATERIALIZED (SELECT vid AS root, vid, 1.0 AS sigma FROM v)",
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
    ecs = []
    for d in range(1, levels + 1):
        lvl_prev = f"lvl{d - 1}" if d > 1 else "lvl0"
        parts.append(
            f"""ec{d} AS MATERIALIZED (
      SELECT p.vid AS src, e.dst AS dst,
             sum(p.sigma * (1.0 + w.delta) / w.sigma) AS c
      FROM {lvl_prev} p JOIN e ON p.vid = e.src
      JOIN wd{d} w ON w.root = p.root AND w.vid = e.dst
      GROUP BY p.vid, e.dst)"""
        )
        ecs.append(f"SELECT * FROM ec{d}")
    parts.append(
        f"""eacc AS (SELECT src, dst, sum(c) AS ebc FROM ({' UNION ALL '.join(ecs)}) GROUP BY src, dst),
  nv AS (SELECT count(*) AS n FROM v)
  SELECT e.src, e.dst,
         round(coalesce(eacc.ebc, 0)
               / ((SELECT n FROM nv) * ((SELECT n FROM nv) - 1.0)), 6) AS value
  FROM e LEFT JOIN eacc ON e.src = eacc.src AND e.dst = eacc.dst"""
    )
    return Q._with_graph(",\n  ".join(parts))


def q_edge_betweenness(spark, sf_dir):
    """nx.edge_betweenness_centrality (unweighted, directed) — per-edge
    Brandes contributions keyed by the shortest-path-DAG edge; same
    level-parallel all-sources machinery as g_betweenness."""
    from linkgraph import queries as Q
    from linkgraph.algorithms import edge_betweenness_centrality

    g = Q._oracle_graph(spark, sf_dir)
    return edge_betweenness_centrality(g).select(
        "src", "dst", F.round("value", 6).alias("value")
    )


def q_mst(spark, sf_dir):
    """Deterministic Borůvka minimum spanning forest (mst.py) with
    derived symmetric weights w = (src+dst)%7+1; ties broken by the
    strict (w, lo, hi) order make the forest unique, so the sequential
    Kruskal list-replay oracle must produce the identical edge set."""
    from linkgraph import queries as Q
    from linkgraph.algorithms import minimum_spanning_forest
    from linkgraph.graph import LinkGraph

    g = Q._oracle_graph(spark, sf_dir)
    e = g.edges.select(
        "src",
        "dst",
        ((F.col("src") + F.col("dst")) % 7 + 1).cast("double").alias("w"),
    )
    wg = LinkGraph(vertices=g.vertices, edges=e)
    return minimum_spanning_forest(wg, weight="w").select(
        "lo", "hi", F.col("w").cast("long").alias("w")
    )


def q_diameter_approx(spark, sf_dir):
    """Double-sweep diameter lower bound (paths.diameter_approx —
    nx.approximation.diameter heuristic, deterministic start/tie-break);
    oracle replays the same two BFS sweeps as recursive walk CTEs."""
    from linkgraph import queries as Q
    from linkgraph.algorithms import diameter_approx

    g = Q._oracle_graph(spark, sf_dir)
    return spark.createDataFrame(
        [(diameter_approx(g),)], "diameter_lb bigint"
    )


def q_doc_pack(spark, sf_dir):
    """Concat-and-chunk sequence packing (curation.pack_sequences, md5
    hash mode): fixed 2048-token training bins, one row per (doc, bin)
    overlap — the window-cumsum bin spans replay exactly in DuckDB."""
    from linkgraph import queries as Q
    from linkgraph.pipeline import pack_sequences

    return pack_sequences(
        Q._docs(spark, sf_dir), budget=2048, n_shards=64, seed=0, hash_mode="md5"
    )


def q_doc_mixture(spark, sf_dir):
    """Data-mixing downsample (curation.mixture_sample, md5 hash mode):
    keep per-lang fractions so surviving tokens match 3:2:1 weights for
    en:de:fr; cutoffs are exact integer arithmetic, so DuckDB replays
    the whole pipeline — binding-stratum selection included. Returns
    per-lang kept doc counts + token sums."""
    from linkgraph import queries as Q
    from linkgraph.pipeline import mixture_sample
    from linkgraph.pipeline.text import token_counts

    kept = mixture_sample(
        Q._docs(spark, sf_dir),
        {"en": 3, "de": 2, "fr": 1},
        by="lang",
        seed=1,
        hash_mode="md5",
    )
    tk = token_counts(kept).select("doc_id", F.col("ws_tokens").alias("t"))
    return (
        kept.join(tk, "doc_id")
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"), F.sum("t").alias("tokens"))
    )


def register(
    queries: dict[str, Callable[[SparkSession, str], DataFrame]],
    oracle_sql: dict[str, str],
) -> None:
    """Populate the round-5 query/oracle dicts (called from queries.py)."""
    from linkgraph import queries as Q

    queries.update(
        {
            "gie_aggregate_cap": q_gie_aggregate_cap,
            "gie_barrier": q_gie_barrier,
            "gie_tokens": q_gie_tokens,
            "gie_count_local": q_gie_count_local,
            "gie_sssp_step": q_gie_sssp_step,
            "gie_hits_step": q_gie_hits_step,
            "gie_optional": q_gie_optional,
            "gie_coalesce": q_gie_coalesce,
            "gie_and": q_gie_and,
            "gie_or": q_gie_or,
            "gie_project": q_gie_project,
            "gie_pagerank_step": q_gie_pagerank_step,
            "gie_wcc_step": q_gie_wcc_step,
            "gie_lpa_step": q_gie_lpa_step,
            "g_louvain_full": q_louvain_full,
            "g_ktruss_fast": q_ktruss_fast,
            "gie_peer_pressure": q_gie_peer_pressure,
            "gie_branch": q_gie_branch,
            "gie_allpath": q_gie_allpath,
            "gie_lambda": q_gie_lambda,
            "gie_output": q_gie_output,
            "g_edge_betweenness": q_edge_betweenness,
            "g_mst": q_mst,
            "g_diameter_approx": q_diameter_approx,
            "doc_pack": q_doc_pack,
            "doc_mixture": q_doc_mixture,
        }
    )
    oracle_sql.update(
        {
            "gie_aggregate_cap": """
  SELECT 'o' || o_orderkey AS oid
  FROM orders o JOIN customer c
    ON c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING'""",
            "gie_barrier": """
  SELECT 'o' || o_orderkey AS oid
  FROM orders o JOIN customer c
    ON c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING'
  WHERE o.o_orderstatus = 'F'""",
            "gie_tokens": """
  SELECT 'c' || o_custkey || '->o' || o_orderkey AS value FROM orders""",
            "gie_count_local": """
  SELECT count(*)::BIGINT AS n
  FROM orders o JOIN customer c
    ON c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING'""",
            "gie_sssp_step": Q.ORACLE_SQL["g_bfs"],
            "gie_hits_step": Q.ORACLE_SQL["g_hits_r2"],
            "gie_optional": """
  SELECT 'o' || o_orderkey AS oid
  FROM orders o JOIN customer c
    ON c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING'
  UNION ALL
  SELECT 'c' || c_custkey FROM customer c
  WHERE c.c_mktsegment = 'BUILDING'
    AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""",
            "gie_coalesce": """
  SELECT 'o' || o_orderkey AS key, 1::BIGINT AS n
  FROM orders WHERE o_orderstatus = 'F'
  UNION ALL
  SELECT 'c' || c_custkey, 1::BIGINT FROM customer c
  WHERE NOT EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')""",
            "gie_and": """
  SELECT 'c' || c_custkey AS oid FROM customer c
  WHERE EXISTS (SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    AND EXISTS (SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')""",
            "gie_or": """
  SELECT 'c' || c_custkey AS key, 1::BIGINT AS n FROM customer c
  WHERE c.c_mktsegment = 'BUILDING'
     OR EXISTS (SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')""",
            "gie_project": """
  SELECT 'c' || c_custkey AS cust, c_mktsegment AS seg,
         (SELECT count(*) FROM orders o
          WHERE o.o_custkey = c.c_custkey)::BIGINT AS n_orders
  FROM customer c WHERE c.c_mktsegment = 'BUILDING'""",
            "gie_pagerank_step": Q.ORACLE_SQL["g_pagerank_r3"],
            "gie_wcc_step": Q.ORACLE_SQL["g_wcc"],
            "gie_lpa_step": Q.ORACLE_SQL["g_cdlp_r2"],
            "g_louvain_full": _louvain_canonical_sql(4, 2),
            "g_ktruss_fast": Q.ORACLE_SQL["g_ktruss"],
            "gie_peer_pressure": _peer_pressure_sql(Q.CDLP_ROUNDS),
            "gie_branch": """
  SELECT key, count(*)::BIGINT AS n FROM (
    SELECT 'o' || o_orderkey AS key
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT 'o' || o_orderkey
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE c.c_mktsegment = 'AUTOMOBILE' AND o.o_orderstatus = 'F'
    UNION ALL
    SELECT 'c' || c_custkey FROM customer
    WHERE c_mktsegment NOT IN ('BUILDING', 'AUTOMOBILE')
  ) GROUP BY key""",
            "gie_allpath": Q._with_graph(
                """paths AS (
    WITH RECURSIVE p(cur, path) AS (
      SELECT (SELECT min(vid) FROM v),
             [lpad((SELECT min(vid) FROM v)::VARCHAR, 6, '0')]
      UNION ALL
      SELECT e.dst, list_append(p.path, lpad(e.dst::VARCHAR, 6, '0'))
      FROM p JOIN e ON p.cur = e.src
      WHERE p.cur <> (SELECT max(vid) FROM v)
        AND NOT list_contains(p.path, lpad(e.dst::VARCHAR, 6, '0'))
        AND len(p.path) <= 3)
    SELECT * FROM p)
  SELECT array_to_string(path, ',') AS path_csv
  FROM paths WHERE cur = (SELECT max(vid) FROM v)"""
            ),
            "gie_lambda": """
  SELECT floor(c_acctbal)::BIGINT AS value
  FROM customer WHERE c_acctbal > 5000""",
            "gie_output": """
  SELECT 'c' || c_custkey AS oid, 'customer' AS label, c_mktsegment
  FROM customer WHERE c_mktsegment = 'BUILDING'""",
            "g_edge_betweenness": _edge_betweenness_sql(10),
            # sequential Kruskal replayed as a single-row recursive CTE:
            # the component assignment rides ONE list column indexed by
            # vid rank; each recursion step consumes edge rank r under
            # the strict (w, lo, hi) total order (unique forest ⇒ must
            # equal Borůvka's edge set exactly)
            "doc_pack": """
  WITH tk AS (
    SELECT doc_id,
           len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS tokens,
           (('0x' || substring(md5('0:' || doc_id::VARCHAR), 1, 15))::BIGINT % 1000000) % 64 AS shard
    FROM documents),
  x AS (SELECT doc_id, shard, tokens,
               sum(tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS e
        FROM tk WHERE tokens > 0),
  y AS (SELECT doc_id, shard, tokens, e - tokens AS s, e FROM x),
  z AS (SELECT doc_id, shard, s, e,
               unnest(range((s // 2048)::BIGINT, ((e - 1) // 2048 + 1)::BIGINT)) AS bin
        FROM y)
  SELECT shard::INT AS shard, bin::BIGINT AS bin, doc_id,
         (least(e, (bin + 1) * 2048) - greatest(s, bin * 2048))::BIGINT AS tok_in_bin
  FROM z""",
            "doc_mixture": """
  WITH w(lang, wt) AS (VALUES ('en', 3), ('de', 2), ('fr', 1)),
  tk AS (
    SELECT doc_id, lang,
           len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS t
    FROM documents),
  c AS (SELECT tk.lang, w.wt, sum(t)::BIGINT AS c FROM tk JOIN w ON w.lang = tk.lang
        GROUP BY tk.lang, w.wt HAVING sum(t) > 0),
  u AS (SELECT lang AS ul, wt AS uw, c AS uc FROM c
        ORDER BY c::DOUBLE / wt, lang LIMIT 1),
  cuts AS (SELECT c.lang, least(1000000::HUGEINT,
                  (1000000::HUGEINT * u.uc * c.wt) // (u.uw * c.c)) AS cut
           FROM c, u),
  kept AS (
    SELECT tk.doc_id, tk.lang, tk.t
    FROM tk JOIN cuts ON cuts.lang = tk.lang
    WHERE ('0x' || substring(md5('1:' || tk.lang || '|' || tk.doc_id::VARCHAR), 1, 15))::BIGINT
          % 1000000 < cut)
  SELECT lang, count(*)::BIGINT AS n_docs, sum(t)::BIGINT AS tokens
  FROM kept GROUP BY lang""",
            "g_diameter_approx": Q._with_graph(
                """b1 AS (
    WITH RECURSIVE w(vid, d) AS (
      SELECT (SELECT min(vid) FROM v), 0
      UNION
      SELECT und.dst, w.d + 1 FROM w JOIN und ON w.vid = und.src WHERE w.d < 50)
    SELECT vid, min(d) AS d FROM w GROUP BY vid),
  far AS (SELECT vid FROM b1 ORDER BY d DESC, vid ASC LIMIT 1),
  b2 AS (
    WITH RECURSIVE w2(vid, d) AS (
      SELECT (SELECT vid FROM far), 0
      UNION
      SELECT und.dst, w2.d + 1 FROM w2 JOIN und ON w2.vid = und.src WHERE w2.d < 50)
    SELECT vid, min(d) AS d FROM w2 GROUP BY vid)
  SELECT max(d)::BIGINT AS diameter_lb FROM b2"""
            ),
            "g_mst": Q._with_graph(
                """sw AS (SELECT lo, hi, (lo + hi) % 7 + 1 AS w
         FROM simple_und WHERE lo <> hi),
  vv AS (SELECT vid, row_number() OVER (ORDER BY vid) AS idx FROM v),
  re AS (SELECT sw.lo, sw.hi, sw.w,
                row_number() OVER (ORDER BY sw.w, sw.lo, sw.hi) AS r,
                a.idx AS li, b.idx AS hi_i
         FROM sw JOIN vv a ON a.vid = sw.lo JOIN vv b ON b.vid = sw.hi),
  ks AS (
    WITH RECURSIVE s(r, comps, took) AS (
      SELECT 0::BIGINT, (SELECT list(vid ORDER BY vid) FROM v), false
      UNION ALL
      SELECT s.r + 1,
             CASE WHEN s.comps[re.li] = s.comps[re.hi_i] THEN s.comps
                  ELSE list_transform(s.comps,
                         c -> CASE WHEN c = greatest(s.comps[re.li], s.comps[re.hi_i])
                                   THEN least(s.comps[re.li], s.comps[re.hi_i])
                              ELSE c END)
             END,
             s.comps[re.li] <> s.comps[re.hi_i]
      FROM s JOIN re ON re.r = s.r + 1)
    SELECT r, took FROM s)
  SELECT re.lo, re.hi, re.w::BIGINT AS w
  FROM ks JOIN re ON re.r = ks.r WHERE ks.took"""
            ),
        }
    )
