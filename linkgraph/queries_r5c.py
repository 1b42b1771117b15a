"""Round-5 third-wave registry additions (late-round window fill: the
driver window had six green-buffer slots at positions 44-49; these six
never-verified entries take them — see queries.py's window note).

Covered here:

- ``g_transitive_reduction`` — DAG transitive reduction
  (nx.transitive_reduction parity) via semi-naive closure + one
  anti-join, vs a recursive-CTE closure oracle.
- ``g_label_spreading`` — seeded harmonic-function node classification
  (nx.node_classification.harmonic_function, Zhu et al. ICML'03),
  fixed 3 rounds, sparse long-format state, vs a round-for-round
  unrolled SQL twin.
- ``g_eulerian`` — nx.is_eulerian / nx.has_eulerian_path verdicts on
  BOTH the cyclic oracle graph and a constructed directed cycle (one
  Eulerian, one not — both polarities proved).
- ``g_effdiam`` — 90th-percentile effective diameter from a 64-root
  bit-parallel MSBFS distance histogram (exact integer quantile).
- ``doc_dup_ngrams`` — cross-document duplicated 3-gram share per doc
  (curation.cross_doc_ngram_dup), md5 gram keys so DuckDB replays the
  shuffle keys bit-for-bit.
- ``emb_sq8`` — symmetric int8 scalar-quantized L2 top-k
  (similarity.sq8_topk): integer ADC distances, bit-identical across
  engines by construction.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HF_ROUNDS = 3
SQ8_QUERY_IDS = [0, 1, 2, 3]
SQ8_K = 5
EFFDIAM_ROOTS = 64


# ------------------------------------------------------------------ graph


def q_transitive_reduction(spark, sf_dir):
    """Transitive reduction of the forward (src < dst) DAG
    (algorithms/dag.py transitive_reduction): semi-naive closure, then
    edges with a length-≥2 path are anti-joined away."""
    from linkgraph import queries as Q
    from linkgraph.algorithms.dag import transitive_reduction

    return transitive_reduction(Q._fwd_graph(spark, sf_dir)).select(
        F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst")
    )


def _transitive_reduction_sql() -> str:
    from linkgraph import queries as Q

    return Q._with_graph(
        """fe AS (SELECT src, dst FROM e WHERE src < dst),
  reach AS (
    WITH RECURSIVE r(src, dst) AS (
      SELECT src, dst FROM fe
      UNION
      SELECT r.src, fe.dst FROM r JOIN fe ON r.dst = fe.src)
    SELECT * FROM r),
  two AS (SELECT DISTINCT fe.src, reach.dst
          FROM fe JOIN reach ON fe.dst = reach.src)
  SELECT src, dst FROM fe
  EXCEPT
  SELECT src, dst FROM two"""
    )


def q_label_spreading(spark, sf_dir):
    """Harmonic-function label spreading (algorithms/nodeclass.py):
    seeds = vids ≡ 0 (mod 10) with class vid % 3, 3 fixed rounds over
    the simple undirected graph, argmax label (NULL if unreached)."""
    from linkgraph import queries as Q
    from linkgraph.algorithms.nodeclass import harmonic_function

    g = Q._oracle_graph(spark, sf_dir)
    seeds = g.vertices.where(F.col("vid") % 10 == 0).select(
        "vid", (F.col("vid") % 3).alias("cls")
    )
    return harmonic_function(g, seeds, rounds=HF_ROUNDS)


def _label_spreading_sql(rounds: int) -> str:
    from linkgraph import queries as Q

    ctes = [
        "seeds AS (SELECT vid, vid % 3 AS cls FROM v WHERE vid % 10 = 0)",
        """adj AS (SELECT lo AS vx, hi AS nbr FROM simple_und
           UNION ALL SELECT hi AS vx, lo AS nbr FROM simple_und)""",
        "deg AS (SELECT vx AS vid, count(*) AS deg FROM adj GROUP BY vx)",
        "s0 AS (SELECT vid, cls, 1.0 AS p FROM seeds)",
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"""s{r} AS (
    SELECT vid, cls, 1.0 AS p FROM seeds
    UNION ALL
    SELECT a.vx AS vid, s.cls AS cls, sum(s.p) / any_value(d.deg) AS p
    FROM adj a JOIN s{r - 1} s ON s.vid = a.nbr JOIN deg d ON d.vid = a.vx
    WHERE a.vx NOT IN (SELECT vid FROM seeds)
    GROUP BY a.vx, s.cls)"""
        )
    readout = f"""ranked AS (
    SELECT vid, cls,
           row_number() OVER (PARTITION BY vid
                              ORDER BY round(p, 6) DESC, cls ASC) AS rk
    FROM s{rounds})
  SELECT v.vid, CAST(r.cls AS BIGINT) AS label
  FROM v LEFT JOIN ranked r ON r.vid = v.vid AND r.rk = 1"""
    return Q._with_graph(",\n  ".join(ctes) + ",\n  " + readout)


def q_eulerian(spark, sf_dir):
    """Euler verdicts on two graphs: the cyclic oracle graph (neither
    circuit nor path — unbalanced degrees) and its SYMMETRIZED twin
    (every simple undirected edge as two arcs — balanced by
    construction and weakly connected, so both verdicts flip true).
    Rows (graph, which, value) — both polarities proved."""
    from linkgraph import queries as Q
    from linkgraph.algorithms.globals import eulerian_summary
    from linkgraph.graph import LinkGraph

    g = Q._oracle_graph(spark, sf_dir)
    base = eulerian_summary(g).select(F.lit("oracle").alias("graph"), "which", "value")
    sym_e = g.symmetrized_simple_edges().select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    )
    sym = LinkGraph(vertices=g.vertices, edges=sym_e)
    ring = eulerian_summary(sym).select(F.lit("sym").alias("graph"), "which", "value")
    return base.unionByName(ring)


def _eulerian_sql() -> str:
    from linkgraph import queries as Q

    # theorem form (matches algorithms/globals.py eulerian_summary):
    # circuit = balanced AND weakly connected; path adds one +1/-1 pair.
    verdict = """outs{T} AS (SELECT src AS vid, count(*) AS outd FROM {E} GROUP BY src),
  ins{T} AS (SELECT dst AS vid, count(*) AS ind FROM {E} GROUP BY dst),
  degs{T} AS (SELECT coalesce(o.vid, i.vid) AS vid,
                coalesce(o.outd, 0) AS outd, coalesce(i.ind, 0) AS ind
              FROM outs{T} o FULL JOIN ins{T} i ON o.vid = i.vid),
  bal{T} AS (SELECT sum(CASE WHEN outd <> ind THEN 1 ELSE 0 END) AS nbad,
               sum(CASE WHEN outd - ind = 1 THEN 1 ELSE 0 END) AS plus1,
               sum(CASE WHEN ind - outd = 1 THEN 1 ELSE 0 END) AS minus1
             FROM degs{T}),
  v0{T} AS (SELECT min(vid) AS vid FROM degs{T}),
  wr{T} AS (WITH RECURSIVE w(vid) AS (
      SELECT vid FROM v0{T}
      UNION SELECT t.dst FROM w JOIN (SELECT src, dst FROM {E}
                                      UNION SELECT dst, src FROM {E}) t
            ON t.src = w.vid)
    SELECT * FROM w),
  nv{T} AS (SELECT count(*) AS n FROM degs{T})"""
    body = (
        verdict.replace("{E}", "e").replace("{T}", "_a")
        + ",\n  "
        + verdict.replace("{E}", "und").replace("{T}", "_b")
        + """
  SELECT 'oracle' AS graph, 'is_eulerian' AS which,
         (SELECT nbad FROM bal_a) = 0
         AND (SELECT count(*) FROM wr_a) = (SELECT n FROM nv_a) AS value
  UNION ALL
  SELECT 'oracle', 'has_eulerian_path',
         ((SELECT nbad FROM bal_a) = 0
          OR ((SELECT plus1 FROM bal_a) = 1 AND (SELECT minus1 FROM bal_a) = 1
              AND (SELECT nbad FROM bal_a) = 2))
         AND (SELECT count(*) FROM wr_a) = (SELECT n FROM nv_a)
  UNION ALL
  SELECT 'sym', 'is_eulerian',
         (SELECT nbad FROM bal_b) = 0
         AND (SELECT count(*) FROM wr_b) = (SELECT n FROM nv_b)
  UNION ALL
  SELECT 'sym', 'has_eulerian_path',
         ((SELECT nbad FROM bal_b) = 0
          OR ((SELECT plus1 FROM bal_b) = 1 AND (SELECT minus1 FROM bal_b) = 1
              AND (SELECT nbad FROM bal_b) = 2))
         AND (SELECT count(*) FROM wr_b) = (SELECT n FROM nv_b)"""
    )
    return Q._with_graph(body)


def q_effdiam(spark, sf_dir):
    """90th-percentile effective diameter from the 64 smallest vids'
    directed BFS distances, computed by ONE bit-parallel MSBFS sweep
    (paths.effective_diameter)."""
    from linkgraph import queries as Q
    from linkgraph.algorithms.paths import effective_diameter

    return effective_diameter(Q._oracle_graph(spark, sf_dir), n_roots=EFFDIAM_ROOTS)


def _effdiam_sql() -> str:
    from linkgraph import queries as Q

    return Q._with_graph(
        f"""seeds AS (SELECT vid FROM v ORDER BY vid LIMIT {EFFDIAM_ROOTS}),
  walk AS (
    WITH RECURSIVE w(root, vid, d) AS (
      SELECT vid, vid, 0 FROM seeds
      UNION
      SELECT w.root, e.dst, w.d + 1 FROM w JOIN e ON w.vid = e.src WHERE w.d < 50)
    SELECT * FROM w),
  sp AS (SELECT root, vid, min(d) AS dist FROM walk GROUP BY root, vid),
  hist AS (SELECT dist, count(*) AS cnt FROM sp WHERE dist > 0 GROUP BY dist),
  cum AS (SELECT dist, sum(cnt) OVER (ORDER BY dist) AS cum,
                 sum(cnt) OVER () AS n_pairs
          FROM hist)
  SELECT CAST(max(n_pairs) AS BIGINT) AS n_pairs,
         CAST(min(dist) AS BIGINT) AS effective_diameter
  FROM cum WHERE cum * 1000 >= n_pairs * 900"""
    )


# --------------------------------------------------------------- pipeline


def q_dup_ngrams(spark, sf_dir):
    """Cross-document duplicated 3-gram share per document
    (pipeline/curation.py cross_doc_ngram_dup)."""
    from linkgraph.pipeline.curation import cross_doc_ngram_dup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return cross_doc_ngram_dup(docs, n=3, min_docs=2)


_DUP_NGRAMS_SQL = """
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                     x -> x <> '') AS w
  FROM documents),
grams AS (
  SELECT DISTINCT doc_id,
         md5(list_extract(w, i) || ' ' || list_extract(w, i + 1) || ' ' ||
             list_extract(w, i + 2)) AS gk
  FROM toks, LATERAL unnest(range(1, len(w) - 1)) AS t(i)
  WHERE len(w) >= 3),
gd AS (SELECT gk, count(DISTINCT doc_id) AS nd FROM grams GROUP BY gk),
dup AS (SELECT gk FROM gd WHERE nd >= 2),
tot AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id),
dg AS (SELECT doc_id, count(*) AS dup_grams FROM grams
       WHERE gk IN (SELECT gk FROM dup) GROUP BY doc_id)
SELECT d.doc_id,
       CAST(coalesce(t.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(g.dup_grams, 0) AS BIGINT) AS dup_grams,
       round(CASE WHEN coalesce(t.n_grams, 0) > 0
                  THEN coalesce(g.dup_grams, 0) * 1.0 / t.n_grams
                  ELSE 0.0 END, 6) AS dup_frac
FROM (SELECT DISTINCT doc_id FROM documents) d
LEFT JOIN tot t ON t.doc_id = d.doc_id
LEFT JOIN dg g ON g.doc_id = d.doc_id
"""


def q_sq8(spark, sf_dir):
    """Symmetric int8 scalar-quantized L2 top-k
    (pipeline/similarity.py sq8_topk) — integer ADC distances."""
    from linkgraph.pipeline.similarity import sq8_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = sq8_topk(emb, SQ8_QUERY_IDS, k=SQ8_K)
    return out.select(
        F.col("qid").cast("long").alias("qid"),
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("dist").cast("long").alias("dist"),
        F.col("rank").cast("long").alias("rank"),
    )


_SQ8_SQL = f"""
WITH longf AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings),
stats AS (SELECT i, min(x) AS mn, max(x) AS mx FROM longf GROUP BY i),
codes AS (
  SELECT l.vec_id, l.i,
         greatest(0, least(255, CAST(floor(
           (l.x - s.mn) * 255.0 /
           (CASE WHEN s.mx > s.mn THEN s.mx - s.mn ELSE 1.0 END) + 0.5
         ) AS INT))) AS c
  FROM longf l JOIN stats s USING (i)),
q AS (SELECT vec_id AS qid, i, c AS qc FROM codes
      WHERE vec_id IN ({", ".join(str(i) for i in SQ8_QUERY_IDS)})),
dist AS (
  SELECT q.qid, c.vec_id,
         sum(CAST(q.qc - c.c AS BIGINT) * CAST(q.qc - c.c AS BIGINT)) AS dist
  FROM q JOIN codes c USING (i)
  WHERE c.vec_id <> q.qid
  GROUP BY q.qid, c.vec_id),
rk AS (SELECT qid, vec_id, dist,
              row_number() OVER (PARTITION BY qid ORDER BY dist, vec_id) AS rank
       FROM dist)
SELECT CAST(qid AS BIGINT) AS qid, CAST(vec_id AS BIGINT) AS vec_id,
       CAST(dist AS BIGINT) AS dist, CAST(rank AS BIGINT) AS rank
FROM rk WHERE rank <= {SQ8_K}
"""


def register(
    queries: dict[str, Callable[[SparkSession, str], DataFrame]],
    oracle_sql: dict[str, str],
) -> None:
    """Populate the round-5 third-wave query/oracle dicts."""
    queries.update(
        {
            "g_transitive_reduction": q_transitive_reduction,
            "g_label_spreading": q_label_spreading,
            "g_eulerian": q_eulerian,
            "g_effdiam": q_effdiam,
            "doc_dup_ngrams": q_dup_ngrams,
            "emb_sq8": q_sq8,
        }
    )
    oracle_sql.update(
        {
            "g_transitive_reduction": _transitive_reduction_sql(),
            "g_label_spreading": _label_spreading_sql(HF_ROUNDS),
            "g_eulerian": _eulerian_sql(),
            "g_effdiam": _effdiam_sql(),
            "doc_dup_ngrams": _DUP_NGRAMS_SQL,
            "emb_sq8": _SQ8_SQL,
        }
    )


# -------------------------------------------------- staged (post-window)
# The 50-slot driver window is FULL this round (never-verified entries at
# positions 0-49), so operators implemented after the window-fill wave
# stage here with the SAME query+oracle shape and a local pytest gate
# (tests/test_biconnectivity.py) instead of a driver row — the r4 queue
# discipline (SURVEY §8 documents the hold-out).


def q_articulation(spark, sf_dir):
    """Articulation points (algorithms/biconnectivity.py — Tarjan–
    Vishkin aux-graph blocks, exact, hash-free). The V_MOD oracle graph
    is biconnected at sf≥0.001 (0 articulation points — vacuous), so
    this entry reuses the bridges entry's tree-plus-chords derivation
    (binary-heap edges k→k//2 + k→k-2 chords on k≡0 mod 5): most
    internal tree vertices are cut vertices."""
    from linkgraph.algorithms.biconnectivity import articulation_points
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
    return articulation_points(LinkGraph(vertices=v, edges=e)).select(
        F.col("vid").cast("long").alias("vid")
    )


def _articulation_sql() -> str:
    # ground truth on the same tree-plus-chords graph: c is an
    # articulation point iff some neighbor of c is unreachable from c's
    # smallest neighbor when every walk step avoids c
    return """
WITH RECURSIVE ks AS (
  SELECT DISTINCT o_orderkey % 4096 AS k FROM orders WHERE o_orderkey % 4096 > 0),
e AS (
  SELECT k AS src, k // 2 AS dst FROM ks WHERE k <> k // 2
  UNION
  SELECT k AS src, k - 2 AS dst FROM ks WHERE k % 5 = 0 AND k >= 2 AND k <> k - 2),
und AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
nb AS (SELECT u.src AS c, u.dst AS n FROM und u),
start AS (SELECT c, min(n) AS s FROM nb GROUP BY c),
walk(c, vid) AS (
  SELECT c, s FROM start
  UNION
  SELECT w.c, u.dst FROM walk w JOIN und u ON u.src = w.vid
  WHERE u.dst <> w.c)
SELECT DISTINCT nb.c AS vid
FROM nb LEFT JOIN walk ON walk.c = nb.c AND walk.vid = nb.n
WHERE walk.vid IS NULL
"""


STAGED_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "g_articulation": q_articulation,
}
STAGED_ORACLE_SQL: dict[str, str] = {
    "g_articulation": _articulation_sql(),
}


ANF_H = 4
ANF_TRIALS = 16


def q_anf(spark, sf_dir):
    """ANF neighborhood-function integer sketch statistic
    (algorithms/anf.py anf_sketch_stats): 16 FM sketches per vertex,
    4 OR-propagation rounds, readout = Σ lowest-zero-bit ranks."""
    from linkgraph import queries as Q
    from linkgraph.algorithms.anf import anf_sketch_stats

    return anf_sketch_stats(
        Q._oracle_graph(spark, sf_dir), max_h=ANF_H, trials=ANF_TRIALS
    )


def _anf_sql(max_h: int, trials: int) -> str:
    from linkgraph import queries as Q

    ctes = [
        f"tr AS (SELECT t FROM range({trials}) AS r(t))",
        """init AS (
    SELECT vid, t,
           (CAST(1 AS BIGINT) << least(31, bit_count((g & -g) - 1))) AS s
    FROM (SELECT v.vid, tr.t,
                 CAST(('0x' || substring(
                   md5(CAST(v.vid AS VARCHAR) || ':' || CAST(tr.t AS VARCHAR)),
                   1, 15)) AS BIGINT) AS g
          FROM v, tr))""",
        "s0 AS (SELECT vid, t, s FROM init)",
    ]
    for h in range(1, max_h + 1):
        ctes.append(
            f"""s{h} AS (
    SELECT vid, t, bit_or(s) AS s FROM (
      SELECT vid, t, s FROM s{h - 1}
      UNION ALL
      SELECT e.dst AS vid, p.t, p.s FROM e JOIN s{h - 1} p ON p.vid = e.src
    ) GROUP BY vid, t)"""
        )
    reads = [
        f"""SELECT {h} AS h,
       CAST(sum(bit_count((xor(s, CAST(-1 AS BIGINT)) & (s + 1)) - 1)) AS BIGINT) AS sum_r,
       CAST(count(*) AS BIGINT) AS n_rows FROM s{h}"""
        for h in range(1, max_h + 1)
    ]
    return Q._with_graph(",\n  ".join(ctes) + "\n  " + "\n  UNION ALL\n  ".join(reads))


STAGED_QUERIES["g_anf"] = q_anf
STAGED_ORACLE_SQL["g_anf"] = _anf_sql(ANF_H, ANF_TRIALS)


def q_salsa(spark, sf_dir):
    """SALSA hub/authority scores (algorithms/salsa.py — Lempel–Moran
    closed form: one degree agg + one bipartite-support WCC; no power
    iteration)."""
    from linkgraph import queries as Q
    from linkgraph.algorithms.salsa import salsa

    return salsa(Q._oracle_graph(spark, sf_dir))


def _salsa_sql() -> str:
    from linkgraph import queries as Q

    return Q._with_graph(
        """bip AS (SELECT src * 2 AS s, dst * 2 + 1 AS d FROM e),
  bu AS (SELECT s, d FROM bip UNION SELECT d AS s, s AS d FROM bip),
  bn AS (SELECT s AS n FROM bu UNION SELECT d FROM bu),
  reach AS (
    WITH RECURSIVE r(a, b) AS (
      SELECT n, n FROM bn
      UNION
      SELECT r.a, u.d FROM r JOIN bu u ON u.s = r.b)
    SELECT * FROM r),
  comp AS (SELECT a AS vid, min(b) AS comp FROM reach GROUP BY a),
  hub_comp AS (SELECT vid // 2 AS src, comp FROM comp WHERE vid % 2 = 0),
  auth_comp AS (SELECT (vid - 1) // 2 AS dst, comp FROM comp WHERE vid % 2 = 1),
  comp_edges AS (SELECT hc.comp, count(*) AS ce
                 FROM e JOIN hub_comp hc ON hc.src = e.src GROUP BY hc.comp),
  comp_hubs AS (SELECT comp, count(*) AS ch FROM hub_comp GROUP BY comp),
  comp_auths AS (SELECT comp, count(*) AS ca FROM auth_comp GROUP BY comp),
  tot AS (SELECT
            (SELECT count(*) FROM hub_comp) AS th,
            (SELECT count(*) FROM auth_comp) AS ta),
  outs AS (SELECT src, count(*) AS outd FROM e GROUP BY src),
  ins AS (SELECT dst, count(*) AS ind FROM e GROUP BY dst),
  hub AS (SELECT o.src AS vid,
                 round((chs.ch * o.outd) /
                       (CAST(greatest((SELECT th FROM tot), 1) AS DOUBLE) * ce.ce), 9) AS hub
          FROM outs o JOIN hub_comp h ON h.src = o.src
          JOIN comp_edges ce ON ce.comp = h.comp
          JOIN comp_hubs chs ON chs.comp = h.comp),
  auth AS (SELECT i.dst AS vid,
                  round((a.ca_ * i.ind) /
                        (CAST(greatest((SELECT ta FROM tot), 1) AS DOUBLE) * ce.ce), 9) AS authority
           FROM ins i
           JOIN (SELECT ac.dst, ac.comp, cas.ca AS ca_
                 FROM auth_comp ac JOIN comp_auths cas ON cas.comp = ac.comp) a
             ON a.dst = i.dst
           JOIN comp_edges ce ON ce.comp = a.comp)
  SELECT v.vid, coalesce(h.hub, 0.0) AS hub,
         coalesce(a.authority, 0.0) AS authority
  FROM v LEFT JOIN hub h ON h.vid = v.vid LEFT JOIN auth a ON a.vid = v.vid"""
    )


STAGED_QUERIES["g_salsa"] = q_salsa
STAGED_ORACLE_SQL["g_salsa"] = _salsa_sql()


# ------------------------------------------- staged wave 2 (post-window)
# Late-round operators (maxcliques.py / cores.k_corona / globals.
# forest_summary) with the same query+oracle shape; the window is full,
# so these gate locally via tests/test_staged_wave2.py until a driver
# slot opens (SURVEY §8 hold-out discipline).

# sparsified oracle graph (the g_ktruss/g_core_number edge subset: the
# full V_MOD graph is too dense for clique enumeration to be readable)
_SP_SQL = """sp AS MATERIALIZED (
    SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi
    FROM e WHERE (src * 31 + dst) % 10 < 2),
  spadj AS MATERIALIZED (
    SELECT lo AS a, hi AS b FROM sp UNION ALL SELECT hi, lo FROM sp)"""


def _sparse_graph(spark, sf_dir):
    from linkgraph import queries as Q
    from linkgraph.graph import LinkGraph

    g = Q._oracle_graph(spark, sf_dir)
    keep = (F.col("src") * 31 + F.col("dst")) % 10 < 2
    return LinkGraph(vertices=g.vertices, edges=g.edges.where(keep))


def q_k_corona(spark, sf_dir):
    """k-corona, k=5 (cores.k_corona — nx.k_corona parity): members of
    the 5-core with EXACTLY 5 neighbors inside it, on the sparsified
    edge set (max core there is 9, so k=5 exercises both peel and the
    within-core degree filter)."""
    from linkgraph.algorithms.cores import k_corona

    return k_corona(_sparse_graph(spark, sf_dir), k=5).select(
        "vid", F.col("value").cast("long").alias("value")
    )


def _k_corona_sql(k: int = 5, rounds: int = 12) -> str:
    from linkgraph import queries as Q

    parts = [_SP_SQL, "c0 AS MATERIALIZED (SELECT lo, hi FROM sp)"]
    for i in range(1, rounds + 1):
        p = i - 1
        parts.append(
            f"""d{i} AS MATERIALIZED (SELECT vid, count(*) AS c FROM (
      SELECT lo AS vid FROM c{p} UNION ALL SELECT hi FROM c{p}) GROUP BY vid),
  c{i} AS MATERIALIZED (SELECT x.lo, x.hi FROM c{p} x
    JOIN d{i} dl ON dl.vid = x.lo AND dl.c >= {k}
    JOIN d{i} dh ON dh.vid = x.hi AND dh.c >= {k})"""
        )
    parts.append(
        f"""cdeg AS (SELECT vid, count(*) AS c FROM (
      SELECT lo AS vid FROM c{rounds} UNION ALL SELECT hi FROM c{rounds}) GROUP BY vid)
  SELECT v.vid,
         (CASE WHEN coalesce(cd.c, 0) = {k} THEN 1 ELSE 0 END)::BIGINT AS value
  FROM v LEFT JOIN cdeg cd ON cd.vid = v.vid"""
    )
    return Q._with_graph(",\n  ".join(parts))


STAGED_QUERIES["g_k_corona"] = q_k_corona
STAGED_ORACLE_SQL["g_k_corona"] = _k_corona_sql()


def q_forest_verdicts(spark, sf_dir):
    """is_forest / is_tree verdicts (globals.forest_summary — the
    |E| = |V| − #components identity) on BOTH polarities: the heap-
    parent graph (k → k//2: acyclic by parent < child, so always a
    forest) and the cyclic full oracle graph (never a forest)."""
    from linkgraph import queries as Q
    from linkgraph.algorithms.globals import forest_summary
    from linkgraph.graph import LinkGraph

    ks = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(F.pmod("o_orderkey", F.lit(4096)).alias("k"))
        .where(F.col("k") > 0)
        .distinct()
    )
    te = (
        ks.select(F.col("k").alias("src"), (F.col("k") / 2).cast("long").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    tv = (
        te.select(F.col("src").alias("vid"))
        .union(te.select(F.col("dst").alias("vid")))
        .distinct()
        .select("vid", F.col("vid").cast("string").alias("oid"))
    )
    heap = forest_summary(LinkGraph(vertices=tv, edges=te)).select(
        F.concat(F.lit("heap_"), "which").alias("which"), "value"
    )
    full = forest_summary(Q._oracle_graph(spark, sf_dir)).select(
        F.concat(F.lit("full_"), "which").alias("which"), "value"
    )
    return heap.unionByName(full)


def _forest_sql() -> str:
    from linkgraph import queries as Q

    return Q._with_graph(
        """tks AS (SELECT DISTINCT o_orderkey % 4096 AS k FROM orders
         WHERE o_orderkey % 4096 > 0),
  te AS MATERIALIZED (SELECT DISTINCT k AS src, k // 2 AS dst FROM tks
        WHERE k <> k // 2),
  tund AS MATERIALIZED (SELECT least(src, dst) AS lo, greatest(src, dst) AS hi
         FROM te GROUP BY 1, 2),
  tv AS MATERIALIZED (SELECT src AS vid FROM te UNION SELECT dst FROM te),
  tub AS MATERIALIZED (SELECT lo AS a, hi AS b FROM tund
        UNION ALL SELECT hi, lo FROM tund),
  treach AS (
    WITH RECURSIVE r(id, m) AS (
      SELECT vid, vid FROM tv
      UNION
      SELECT u.a, r.m FROM tub u JOIN r ON r.id = u.b)
    SELECT * FROM r),
  tnc AS (SELECT count(DISTINCT c) AS nc
          FROM (SELECT id, min(m) AS c FROM treach GROUP BY id)),
  tst AS (SELECT (SELECT count(*) FROM tv) AS nv,
                 (SELECT count(*) FROM tund) AS ne,
                 (SELECT nc FROM tnc) AS nc),
  fub AS MATERIALIZED (SELECT lo AS a, hi AS b FROM simple_und
        UNION ALL SELECT hi, lo FROM simple_und),
  freach AS (
    WITH RECURSIVE r(id, m) AS (
      SELECT vid, vid FROM v
      UNION
      SELECT u.a, r.m FROM fub u JOIN r ON r.id = u.b)
    SELECT * FROM r),
  fnc AS (SELECT count(DISTINCT c) AS nc
          FROM (SELECT id, min(m) AS c FROM freach GROUP BY id)),
  fst AS (SELECT (SELECT count(*) FROM v) AS nv,
                 (SELECT count(*) FROM simple_und) AS ne,
                 (SELECT nc FROM fnc) AS nc)
  SELECT 'heap_is_forest' AS which, (nv > 0 AND ne = nv - nc) AS value FROM tst
  UNION ALL
  SELECT 'heap_is_tree', (nv > 0 AND ne = nv - nc AND nc = 1) FROM tst
  UNION ALL
  SELECT 'full_is_forest', (nv > 0 AND ne = nv - nc) FROM fst
  UNION ALL
  SELECT 'full_is_tree', (nv > 0 AND ne = nv - nc AND nc = 1) FROM fst"""
    )


STAGED_QUERIES["g_is_tree"] = q_forest_verdicts
STAGED_ORACLE_SQL["g_is_tree"] = _forest_sql()


def q_maxcliques(spark, sf_dir):
    """Maximal clique enumeration (maxcliques.find_cliques — vertex-
    ordered Bron–Kerbosch, nx.find_cliques parity) on the sparsified
    edge set: one row per maximal clique, members sorted ascending
    (2420 cliques at sf0.01, max size 5)."""
    from linkgraph.algorithms.maxcliques import find_cliques

    return find_cliques(_sparse_graph(spark, sf_dir))


def _maxcliques_sql(kmax: int = 6) -> str:
    """Level-wise clique enumeration + common-neighbor maximality: k_n
    extends k_{n-1} by a later vertex adjacent to all members; a clique
    is maximal iff NO vertex is adjacent to every member. kmax exceeds
    the observed max clique size (5 at sf0.01) by one; a larger true
    clique would surface as an engine/oracle mismatch, not silence."""
    from linkgraph import queries as Q

    parts = [_SP_SQL, "k2 AS MATERIALIZED (SELECT lo AS v1, hi AS v2 FROM sp)"]
    for n in range(3, kmax + 1):
        p = n - 1
        prev_cols = ", ".join(f"k{p}.v{i}" for i in range(1, n))
        joins = "\n    ".join(
            f"JOIN spadj j{i} ON j{i}.a = k{p}.v{i} AND j{i}.b = j1.b"
            for i in range(2, n)
        )
        parts.append(
            f"""k{n} AS MATERIALIZED (
    SELECT {prev_cols}, j1.b AS v{n} FROM k{p}
    JOIN spadj j1 ON j1.a = k{p}.v1 AND j1.b > k{p}.v{p}
    {joins})"""
        )
    outs = [
        """SELECT CAST([v.vid] AS BIGINT[]) AS members FROM v
  WHERE v.vid NOT IN (SELECT a FROM spadj)"""
    ]
    for n in range(2, kmax + 1):
        cols = ", ".join(f"v{i}" for i in range(1, n + 1))
        joins = "\n      ".join(
            f"JOIN spadj x{i} ON x{i}.a = x1.a AND x{i}.b = k{n}.v{i}"
            for i in range(2, n + 1)
        )
        outs.append(
            f"""SELECT CAST([{cols}] AS BIGINT[]) AS members FROM k{n}
  WHERE NOT EXISTS (
      SELECT 1 FROM spadj x1
      {joins}
      WHERE x1.b = k{n}.v1)"""
        )
    return Q._with_graph(",\n  ".join(parts) + "\n  " + "\n  UNION ALL\n  ".join(outs))


STAGED_QUERIES["g_maxcliques"] = q_maxcliques
STAGED_ORACLE_SQL["g_maxcliques"] = _maxcliques_sql()


def q_kclique5(spark, sf_dir):
    """General-k clique percolation at k=5 (maxcliques.
    k_clique_communities_general — the completeness tier above the
    packed-key k=3/k=4 kernels): communities of 5-cliques chained by
    4-vertex overlap on the sparsified graph (exactly one 5-clique at
    sf0.01, none at sf0.001 — the empty case is part of the check)."""
    from linkgraph.algorithms.maxcliques import k_clique_communities_general

    return k_clique_communities_general(_sparse_graph(spark, sf_dir), k=5)


def _kclique5_sql() -> str:
    """5-cliques from the maxcliques ladder; adjacency = shared sorted
    4-subset key; community id = min member-CSV key per component
    (string-lexicographic on both engines)."""
    from linkgraph import queries as Q

    parts = [_SP_SQL, "k2 AS MATERIALIZED (SELECT lo AS v1, hi AS v2 FROM sp)"]
    for n in range(3, 6):
        p = n - 1
        prev_cols = ", ".join(f"k{p}.v{i}" for i in range(1, n))
        joins = "\n    ".join(
            f"JOIN spadj j{i} ON j{i}.a = k{p}.v{i} AND j{i}.b = j1.b"
            for i in range(2, n)
        )
        parts.append(
            f"""k{n} AS MATERIALIZED (
    SELECT {prev_cols}, j1.b AS v{n} FROM k{p}
    JOIN spadj j1 ON j1.a = k{p}.v1 AND j1.b > k{p}.v{p}
    {joins})"""
        )
    key = "v1 || ',' || v2 || ',' || v3 || ',' || v4 || ',' || v5"
    subs = []
    for skip in range(1, 6):
        cols = " || ',' || ".join(f"v{i}" for i in range(1, 6) if i != skip)
        subs.append(f"SELECT key, {cols} AS sk FROM kk")
    parts.append(
        f"""kk AS MATERIALIZED (SELECT *, {key} AS key FROM k5),
  sub AS MATERIALIZED ({' UNION ALL '.join(subs)}),
  cadj AS MATERIALIZED (SELECT a.key AS ka, b.key AS kb
         FROM sub a JOIN sub b ON a.sk = b.sk AND a.key <> b.key),
  reach AS (
    WITH RECURSIVE r(k, m) AS (
      SELECT key, key FROM kk
      UNION
      SELECT p.ka, r.m FROM cadj p JOIN r ON r.k = p.kb)
    SELECT * FROM r),
  comm AS (SELECT k, min(m) AS community FROM reach GROUP BY k)
  SELECT DISTINCT c.community, u.vid FROM comm c JOIN (
      SELECT key, v1 AS vid FROM kk UNION ALL SELECT key, v2 FROM kk
      UNION ALL SELECT key, v3 FROM kk UNION ALL SELECT key, v4 FROM kk
      UNION ALL SELECT key, v5 FROM kk) u ON u.key = c.k"""
    )
    return Q._with_graph(",\n  ".join(parts))


STAGED_QUERIES["g_kclique5"] = q_kclique5
STAGED_ORACLE_SQL["g_kclique5"] = _kclique5_sql()


def q_barycenter(spark, sf_dir):
    """Barycenter (paths.barycenter — argmin Σ d(v,u), nx.barycenter
    semantics; the V_MOD oracle graph is strongly connected at sf0.01 so
    the reachable-set totality matches the nx definition there)."""
    from linkgraph import queries as Q
    from linkgraph.algorithms import barycenter

    return barycenter(Q._oracle_graph(spark, sf_dir))


def _barycenter_sql() -> str:
    from linkgraph import queries as Q

    return Q._with_graph(
        """walk AS (
    WITH RECURSIVE w(root, vid, d) AS (
      SELECT vid, vid, 0 FROM v
      UNION
      SELECT w.root, e.dst, w.d + 1 FROM w JOIN e ON e.src = w.vid
      WHERE w.d < 30)
    SELECT * FROM w),
  sp AS (SELECT root, vid, min(d) AS dist FROM walk GROUP BY root, vid),
  tot AS (SELECT root AS vid, sum(dist) AS td FROM sp GROUP BY root),
  best AS (SELECT min(td) AS m FROM tot)
  SELECT vid FROM tot WHERE td = (SELECT m FROM best)"""
    )


STAGED_QUERIES["g_barycenter"] = q_barycenter
STAGED_ORACLE_SQL["g_barycenter"] = _barycenter_sql()


def q_reach(spark, sf_dir):
    """descendants ∪ ancestors of vertex 0 (paths.descendants /
    paths.ancestors — nx parity): one row per (which, vid), the two
    single-root frontier sweeps (forward + reversed)."""
    from linkgraph import queries as Q
    from linkgraph.algorithms import ancestors, descendants

    g = Q._oracle_graph(spark, sf_dir)
    d = descendants(g, 0).select(F.lit("desc").alias("which"), "vid")
    a = ancestors(g, 0).select(F.lit("anc").alias("which"), "vid")
    return d.unionByName(a)


def _reach_sql() -> str:
    from linkgraph import queries as Q

    return Q._with_graph(
        """fwd AS (
    WITH RECURSIVE r(vid) AS (
      SELECT 0::BIGINT
      UNION
      SELECT e.dst FROM r JOIN e ON e.src = r.vid)
    SELECT vid FROM r WHERE vid <> 0),
  bwd AS (
    WITH RECURSIVE r(vid) AS (
      SELECT 0::BIGINT
      UNION
      SELECT e.src FROM r JOIN e ON e.dst = r.vid)
    SELECT vid FROM r WHERE vid <> 0)
  SELECT 'desc' AS which, vid FROM fwd
  UNION ALL
  SELECT 'anc' AS which, vid FROM bwd"""
    )


STAGED_QUERIES["g_reach"] = q_reach
STAGED_ORACLE_SQL["g_reach"] = _reach_sql()
