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


# ---------------------------------------------------------------- queries


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


def register(
    queries: dict[str, Callable[[SparkSession, str], DataFrame]],
    oracle_sql: dict[str, str],
) -> None:
    """Populate the round-5 query/oracle dicts (called from queries.py)."""
    from linkgraph import queries as Q

    queries.update(
        {
            "gie_optional": q_gie_optional,
            "gie_coalesce": q_gie_coalesce,
            "gie_and": q_gie_and,
            "gie_or": q_gie_or,
            "gie_project": q_gie_project,
            "gie_pagerank_step": q_gie_pagerank_step,
            "gie_wcc_step": q_gie_wcc_step,
            "gie_lpa_step": q_gie_lpa_step,
        }
    )
    oracle_sql.update(
        {
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
        }
    )
