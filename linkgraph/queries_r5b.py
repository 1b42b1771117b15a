"""Round-5 second-wave registry additions (implemented after the r5
splice; ride in the driver window immediately behind queries_r5's
entries — see queries.py's window note).

Covered here:

- ``g_matching`` — deterministic distributed maximal matching
  (mutual-min proposal rounds, algorithms/matching.py) with a
  round-for-round unrolled SQL twin.
- ``g_pagerank_w`` — edge-weighted PageRank (nx ``pagerank(G,
  weight=...)`` semantics), fixed rounds, weighted unrolled oracle.
- ``g_bipartite_proj`` — weighted one-mode bipartite projection
  (nx ``bipartite.weighted_projected_graph``) of the lineitem
  part↔order incidence.
- ``g_msbfs`` — bit-parallel multi-source BFS (csr.msbfs_csr, 64 BFS
  trees per int64 mask) vs a 64-root recursive-CTE walk.
- ``g_bridges`` — exact bridges (spanning-forest XOR-cover,
  algorithms/bridges.py) vs the banned-edge reachability ground truth.
- ``g_harmonic_msbfs`` — 64-root harmonic centrality batch computed by
  ONE reversed-graph MSBFS instead of 64 sequential BFS runs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MATCH_ROUNDS = 12


def q_matching(spark, sf_dir):
    from linkgraph import queries as Q
    from linkgraph.algorithms.matching import maximal_matching

    g = Q._oracle_graph(spark, sf_dir)
    return maximal_matching(g, max_rounds=MATCH_ROUNDS)


def q_pagerank_w(spark, sf_dir):
    from linkgraph import queries as Q
    from linkgraph.algorithms.pagerank import pagerank_weighted

    g = Q._oracle_graph(spark, sf_dir)
    w = g.edges.select(
        "src", "dst", (F.pmod(F.col("src") + F.col("dst"), F.lit(7)) + 1).alias("w")
    )
    out = pagerank_weighted(g, w, alpha=Q.ALPHA, max_iter=Q.PR_ROUNDS, tol=None)
    return out.select("vid", F.round("value", 6).alias("value"))


def q_bipartite_proj(spark, sf_dir):
    from linkgraph.algorithms.bipartite import weighted_projection

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    inc = li.select(F.col("l_partkey").alias("u"), F.col("l_orderkey").alias("item"))
    return weighted_projection(inc, min_weight=2).select(
        F.col("u1").alias("p1"), F.col("u2").alias("p2"), F.col("w").cast("long").alias("w")
    )


def _matching_sql(rounds: int) -> str:
    """Unrolled mutual-min proposal rounds — textually the same rule the
    engine applies (min proposal per src, mutual pairs, pool shrink)."""
    from linkgraph import queries as Q

    ctes = ["av_0 AS MATERIALIZED (SELECT lo, hi FROM simple_und)"]
    for i in range(1, rounds + 1):
        p = i - 1
        ctes.append(
            f"""und_{i} AS (SELECT lo AS src, hi AS dst FROM av_{p}
           UNION ALL SELECT hi, lo FROM av_{p}),
  pr_{i} AS MATERIALIZED (SELECT src, min(dst) AS pick FROM und_{i} GROUP BY src),
  mp_{i} AS MATERIALIZED (
    SELECT a.src AS lo, a.pick AS hi
    FROM pr_{i} a JOIN pr_{i} b ON a.pick = b.src AND b.pick = a.src
    WHERE a.src < a.pick),
  mv_{i} AS (SELECT lo AS vid FROM mp_{i} UNION SELECT hi FROM mp_{i}),
  av_{i} AS MATERIALIZED (
    SELECT * FROM av_{p}
    WHERE lo NOT IN (SELECT vid FROM mv_{i})
      AND hi NOT IN (SELECT vid FROM mv_{i}))"""
        )
    readout = " UNION ALL ".join(f"SELECT lo, hi FROM mp_{i}" for i in range(1, rounds + 1))
    return Q._with_graph(",\n  ".join(ctes) + f"\n  {readout}")


def _pagerank_w_sql(rounds: int) -> str:
    """Weighted twin of queries._pagerank_body: W(u) = Σ w out of u,
    message = rank·w/W; dangling ⇔ W = 0."""
    from linkgraph import queries as Q

    pre = f"""
  ew AS (SELECT src, dst, (src + dst) % 7 + 1 AS w FROM e),
  wo AS (SELECT src AS vid, sum(w) AS wout FROM ew GROUP BY src),
  nv AS (SELECT count(*) AS n FROM v),
  vd AS (SELECT v.vid, coalesce(wo.wout, 0) AS wout FROM v LEFT JOIN wo ON v.vid = wo.vid),
  r0 AS (SELECT vid, wout, 1.0 / (SELECT n FROM nv) AS rank FROM vd)"""
    steps = []
    for i in range(1, rounds + 1):
        p = i - 1
        steps.append(
            f"""
  dang{i} AS MATERIALIZED (SELECT {Q.ALPHA} * coalesce(sum(rank), 0) AS m
                           FROM r{p} WHERE wout = 0),
  msg{i} AS MATERIALIZED (SELECT ew.dst AS vid, sum(r.rank * ew.w / r.wout) AS s
             FROM ew JOIN r{p} r ON ew.src = r.vid WHERE r.wout > 0 GROUP BY ew.dst),
  r{i} AS MATERIALIZED (SELECT vd.vid, vd.wout,
                  {Q.ALPHA} * coalesce(m.s, 0)
                  + (1 - {Q.ALPHA}) / (SELECT n FROM nv)
                  + (SELECT m FROM dang{i}) / (SELECT n FROM nv) AS rank
           FROM vd LEFT JOIN msg{i} m ON vd.vid = m.vid)"""
        )
    return Q._with_graph(
        pre + "," + ",".join(steps)
        + f"\n  SELECT vid, round(rank, 6) AS value FROM r{rounds}"
    )


_BIPARTITE_PROJ_SQL = """
  WITH inc AS (SELECT DISTINCT l_partkey AS u, l_orderkey AS item FROM lineitem)
  SELECT a.u AS p1, b.u AS p2, count(*)::BIGINT AS w
  FROM inc a JOIN inc b ON a.item = b.item AND a.u < b.u
  GROUP BY a.u, b.u HAVING count(*) >= 2"""


MSBFS_SEEDS = 64


def q_msbfs(spark, sf_dir):
    """Bit-parallel multi-source BFS (csr.msbfs_csr): 64 BFS trees per
    int64 mask, one shared edge pass per round. Seeds = the 64 smallest
    vids; output = every reached (seed, vid) pair with hop distance."""
    from linkgraph import queries as Q
    from linkgraph.csr import msbfs_csr

    g = Q._oracle_graph(spark, sf_dir)
    seeds = [r.vid for r in g.vertices.select("vid").orderBy("vid").limit(MSBFS_SEEDS).collect()]
    return msbfs_csr(g, seeds).select("seed", "vid", "dist")


def q_bridges(spark, sf_dir):
    """Exact bridges via the spanning-forest XOR-cover
    (algorithms/bridges.py). The V_MOD oracle graph is too dense to have
    any bridge at sf≥0.01, so this entry derives a tree-plus-chords graph
    from orders (binary-heap tree edges k→k//2 plus k→k-2 chords on
    k≡0 mod 5): ~25% of its edges are real bridges."""
    from linkgraph.algorithms.bridges import bridges
    from linkgraph.graph import LinkGraph

    ks = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(F.pmod("o_orderkey", F.lit(4096)).alias("k"))
        .where(F.col("k") > 0)
        .distinct()
    )
    e = (
        ks.select(F.col("k").alias("src"), (F.col("k") / 2).cast("long").alias("dst"))
        .union(
            ks.where((F.col("k") % 5 == 0) & (F.col("k") >= 2)).select(
                F.col("k").alias("src"), (F.col("k") - 2).alias("dst")
            )
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
    return bridges(LinkGraph(vertices=v, edges=e))


_BRIDGES_SQL = """
  WITH ks AS (SELECT DISTINCT o_orderkey % 4096 AS k FROM orders WHERE o_orderkey % 4096 > 0),
  e AS (
    SELECT k AS src, k // 2 AS dst FROM ks
    UNION
    SELECT k AS src, k - 2 AS dst FROM ks WHERE k % 5 = 0 AND k >= 2),
  uek AS (SELECT lo, hi, lo * 4294967296 + hi AS eid FROM (
    SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi
    FROM e WHERE src <> dst)),
  adj AS (SELECT eid, lo AS a, hi AS b FROM uek
          UNION ALL SELECT eid, hi AS a, lo AS b FROM uek),
  -- ground truth: (lo,hi) is a bridge iff hi is unreachable from lo with
  -- that one undirected edge banned; finite (eid, vid) state space, so
  -- the UNION-dedup recursion terminates without a depth bound
  walk AS (
    WITH RECURSIVE w(eid, vid) AS (
      SELECT eid, lo FROM uek
      UNION
      SELECT w.eid, n.b FROM w JOIN adj n ON n.a = w.vid AND n.eid <> w.eid)
    SELECT * FROM w)
  SELECT u.lo, u.hi FROM uek u
  WHERE NOT EXISTS (SELECT 1 FROM walk w WHERE w.eid = u.eid AND w.vid = u.hi)"""


def _msbfs_sql() -> str:
    from linkgraph import queries as Q

    return Q._with_graph(
        f"""seeds AS (SELECT vid FROM v ORDER BY vid LIMIT {MSBFS_SEEDS}),
  walk AS (
    WITH RECURSIVE w(root, vid, d) AS (
      SELECT vid, vid, 0 FROM seeds
      UNION
      SELECT w.root, e.dst, w.d + 1 FROM w JOIN e ON w.vid = e.src WHERE w.d < 50)
    SELECT * FROM w)
  SELECT root AS seed, vid, CAST(min(d) AS BIGINT) AS dist
  FROM walk GROUP BY root, vid"""
    )


def q_harmonic_msbfs(spark, sf_dir):
    """Harmonic centrality for a 64-root batch, computed by ONE
    bit-parallel multi-source BFS over the reversed graph (csr.msbfs_csr)
    instead of 64 sequential BFS runs — the scale path for centrality
    batches (64× fewer edge passes). dist(root→u) on reversed edges =
    d(u→root) on the original, i.e. nx harmonic's incoming distance."""
    from linkgraph import queries as Q
    from linkgraph.csr import msbfs_csr
    from linkgraph.graph import LinkGraph

    g = Q._oracle_graph(spark, sf_dir)
    rev = LinkGraph(
        vertices=g.vertices,
        edges=g.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
    )
    seeds = [r.vid for r in g.vertices.select("vid").orderBy("vid").limit(MSBFS_SEEDS).collect()]
    d = msbfs_csr(rev, seeds)
    h = (
        d.where(F.col("dist") > 0)
        .groupBy("seed")
        .agg(F.round(F.sum(1.0 / F.col("dist")), 6).alias("h"))
    )
    seed_df = spark.createDataFrame([(int(s),) for s in seeds], "vid long")
    return seed_df.join(h, seed_df["vid"] == h["seed"], "left").select(
        "vid", F.coalesce("h", F.lit(0.0)).alias("value")
    )


def _harmonic_msbfs_sql() -> str:
    from linkgraph import queries as Q

    return Q._with_graph(
        f"""seeds AS (SELECT vid FROM v ORDER BY vid LIMIT {MSBFS_SEEDS}),
  walk AS (
    WITH RECURSIVE w(root, vid, d) AS (
      SELECT vid, vid, 0 FROM seeds
      UNION
      SELECT w.root, e.src, w.d + 1 FROM w JOIN e ON w.vid = e.dst WHERE w.d < 50)
    SELECT * FROM w),
  sp AS (SELECT root, vid, min(d) AS dist FROM walk GROUP BY root, vid),
  agg AS (SELECT root, round(sum(1.0 / dist), 6) AS value
          FROM sp WHERE dist > 0 GROUP BY root)
  SELECT s.vid, coalesce(agg.value, 0.0) AS value
  FROM seeds s LEFT JOIN agg ON s.vid = agg.root"""
    )


PQ_M = 4
PQ_K = 16
PQ_QUERY_ID = 333


def q_pq_adc(spark, sf_dir):
    """Product-quantization encode + ADC scores for the whole embedding
    corpus (pipeline/similarity.py pq_*): deterministic codebooks = the
    16 smallest-id vectors' subvectors, query = embedding #333. Emits
    every row's code (joined 'c0-c1-c2-c3') and rounded ADC — pinning the
    encode argmin AND the LUT sum, with no top-k boundary to flake on."""
    from linkgraph.pipeline.similarity import pq_adc, pq_codebooks
    import numpy as np

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cb = pq_codebooks(emb, m=PQ_M, k=PQ_K)
    q = np.asarray(
        emb.where(F.col("vec_id") == PQ_QUERY_ID).select("embedding").first()[0],
        dtype=np.float64,
    )
    out = pq_adc(emb, q, cb)
    return out.select(
        "vec_id",
        F.concat_ws("-", F.transform("pq_code", lambda c: c.cast("string"))).alias("code"),
        F.round("adc", 6).alias("adc"),
    )


_PQ_ADC_SQL = f"""
  WITH ve AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                     CAST(unnest(embedding) AS DOUBLE) AS x
              FROM embeddings),
  vx AS (SELECT vec_id, CAST((i - 1) // 16 AS INT) AS s, (i - 1) % 16 AS p, x FROM ve),
  cbids AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS j
            FROM (SELECT DISTINCT vec_id FROM embeddings ORDER BY vec_id LIMIT {PQ_K})),
  cbx AS (SELECT c.j, v.s, v.p, v.x FROM vx v JOIN cbids c ON v.vec_id = c.vec_id),
  dist AS (SELECT v.vec_id, v.s, c.j, sum((v.x - c.x) * (v.x - c.x)) AS d
           FROM vx v JOIN cbx c ON v.s = c.s AND v.p = c.p
           GROUP BY v.vec_id, v.s, c.j),
  code AS (SELECT vec_id, s, j FROM (
             SELECT vec_id, s, j,
                    row_number() OVER (PARTITION BY vec_id, s ORDER BY d ASC, j ASC) AS rn
             FROM dist) WHERE rn = 1),
  qd AS (SELECT s, j, d FROM dist WHERE vec_id = {PQ_QUERY_ID}),
  adc AS (SELECT c.vec_id, sum(q.d) AS adc
          FROM code c JOIN qd q ON c.s = q.s AND c.j = q.j GROUP BY c.vec_id),
  codes AS (SELECT vec_id, string_agg(j::VARCHAR, '-' ORDER BY s) AS code
            FROM code GROUP BY vec_id)
  SELECT codes.vec_id, codes.code, round(adc.adc, 6) AS adc
  FROM codes JOIN adc ON codes.vec_id = adc.vec_id"""


def register(
    queries: dict[str, Callable[[SparkSession, str], DataFrame]],
    oracle_sql: dict[str, str],
) -> None:
    """Populate the round-5 second-wave query/oracle dicts."""
    queries.update(
        {
            "g_matching": q_matching,
            "g_pagerank_w": q_pagerank_w,
            "g_bipartite_proj": q_bipartite_proj,
            "g_msbfs": q_msbfs,
            "g_bridges": q_bridges,
            "g_harmonic_msbfs": q_harmonic_msbfs,
            "emb_pq_adc": q_pq_adc,
            "g_kclique4": q_kclique4,
            "g_bidir_dist": q_bidir,
        }
    )
    oracle_sql.update(
        {
            "g_matching": _matching_sql(MATCH_ROUNDS),
            "g_pagerank_w": _pagerank_w_sql(3),
            "g_bipartite_proj": _BIPARTITE_PROJ_SQL,
            "g_msbfs": _msbfs_sql(),
            "g_bridges": _BRIDGES_SQL,
            "g_harmonic_msbfs": _harmonic_msbfs_sql(),
            "emb_pq_adc": _PQ_ADC_SQL,
            "g_kclique4": _kclique4_sql(24),
            "g_bidir_dist": _bidir_sql(),
        }
    )


def q_kclique4(spark, sf_dir):
    """k=4 clique percolation (algorithms/cliques.py
    k_clique_communities_4): 4-cliques chained through shared triangle
    faces, communities = WCC over packed face-key nodes."""
    from linkgraph import queries as Q
    from linkgraph.algorithms.cliques import k_clique_communities

    g = Q._oracle_graph(spark, sf_dir)
    return k_clique_communities(g, k=4).select("community", "vid")


def _kclique4_sql(rounds: int = 24) -> str:
    """4-clique/face percolation replay, one rung up from
    queries._kclique3_sql: enumerate quads, star-link the min face to the
    other three, unrolled min-label propagation (converges by round 20
    at sf0.01 — 24 gives headroom), unpack member vids from
    the (a<<42 | b<<21 | c) face keys."""
    from linkgraph import queries as Q

    t21 = 1 << 21
    parts = [
        f"e AS ({Q._EDGES_SQL})",
        """und AS (SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi
          FROM e WHERE src <> dst)""",
        """tri AS (SELECT u1.lo AS a, u1.hi AS b, u2.hi AS c
          FROM und u1
          JOIN und u2 ON u2.lo = u1.lo AND u2.hi > u1.hi
          JOIN und u3 ON u3.lo = u1.hi AND u3.hi = u2.hi)""",
        """q4 AS (SELECT t.a, t.b, t.c, u4.hi AS d
          FROM tri t
          JOIN und u4 ON u4.lo = t.c
          JOIN und u5 ON u5.lo = t.b AND u5.hi = u4.hi
          JOIN und u6 ON u6.lo = t.a AND u6.hi = u4.hi)""",
        f"""fk AS (SELECT (a * {t21} + b) * {t21} + c AS f1,
                 (a * {t21} + b) * {t21} + d AS f2,
                 (a * {t21} + c) * {t21} + d AS f3,
                 (b * {t21} + c) * {t21} + d AS f4
          FROM q4)""",
        """lnk0 AS (SELECT f1 AS s, f2 AS d FROM fk
           UNION ALL SELECT f1, f3 FROM fk
           UNION ALL SELECT f1, f4 FROM fk)""",
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
    SELECT DISTINCT cm, id // {t21 * t21} AS vid FROM comp
    UNION SELECT cm, (id // {t21}) % {t21} FROM comp
    UNION SELECT cm, id % {t21} FROM comp)
  SELECT cm AS community, vid FROM members"""
    )


def q_bidir(spark, sf_dir):
    """Meet-in-the-middle s→t hop distance
    (algorithms/traversal.py bidirectional_distance): src = min vid,
    dst = max vid of the oracle graph; one (src, dst, dist) row."""
    from linkgraph import queries as Q
    from linkgraph.algorithms.traversal import bidirectional_distance

    g = Q._oracle_graph(spark, sf_dir)
    lohi = g.vertices.agg(F.min("vid"), F.max("vid")).first()
    return bidirectional_distance(g, int(lohi[0]), int(lohi[1]))


def _bidir_sql() -> str:
    from linkgraph import queries as Q

    return Q._with_graph(
        """st AS (SELECT min(vid) AS s, max(vid) AS t FROM v),
  walk AS (
    WITH RECURSIVE w(vid, d) AS (
      SELECT (SELECT s FROM st), 0
      UNION
      SELECT e.dst, w.d + 1 FROM w JOIN e ON w.vid = e.src WHERE w.d < 50)
    SELECT * FROM w)
  SELECT st.s AS src, st.t AS dst,
         coalesce((SELECT min(d) FROM walk WHERE vid = st.t), -1) AS dist
  FROM st"""
    )
