"""Plan-shape guards: the optimizations VERDICT r1 asked for stay in place.

- A graph pre-partitioned on ``src`` (LinkGraph.partitioned) must be
  reused by pagerank's per-round join without a second Exchange of the
  big edge table (VERDICT r1 finding 4: entry() used to shuffle edges
  twice — once by dst in partitioned(), once by src in pagerank).
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from linkgraph.graph import graph_from_edge_vids
from tests.conftest import LANGVILLE_MEYER


def _explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_prepartitioned_edges_single_exchange(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        g = graph_from_edge_vids(spark, LANGVILLE_MEYER).partitioned(num_partitions=4)
        assert g.partition_key == "src"
        # reconstruct the per-round message plan exactly as _pagerank_impl does
        edges = g.edges.select("src", "dst")
        state = (
            g.vertices.select("vid")
            .withColumn("rank", F.lit(1.0))
            .withColumn("deg", F.lit(1))
        )
        def round_plan(edge_df):
            return _explain_str(
                state.join(edge_df, state["vid"] == edge_df["src"])
                .groupBy("dst")
                .agg(F.sum("rank").alias("m"))
            )

        # planner-inserted exchanges (ENSURE_REQUIREMENTS): state side of the
        # join + the groupBy(dst). The cached src-partitioned edge table must
        # NOT re-exchange (its own one-time REPARTITION shuffle lives inside
        # the InMemoryRelation build plan, not the per-round plan).
        plan_pre = round_plan(edges)
        assert plan_pre.count("ENSURE_REQUIREMENTS") == 2, plan_pre

        g_raw = graph_from_edge_vids(spark, LANGVILLE_MEYER)
        plan_raw = round_plan(g_raw.edges.select("src", "dst"))
        assert plan_raw.count("ENSURE_REQUIREMENTS") == 3, plan_raw
        g.unpersist()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_pagerank_reuses_prepartitioned_graph(spark):
    from linkgraph.algorithms import pagerank_nx

    g_pre = graph_from_edge_vids(spark, LANGVILLE_MEYER).partitioned(num_partitions=4)
    g_raw = graph_from_edge_vids(spark, LANGVILLE_MEYER)
    r_pre = {r["vid"]: r["value"] for r in pagerank_nx(g_pre, max_iter=30).collect()}
    r_raw = {r["vid"]: r["value"] for r in pagerank_nx(g_raw, max_iter=30).collect()}
    assert set(r_pre) == set(r_raw)
    assert all(abs(r_pre[k] - r_raw[k]) < 1e-12 for k in r_raw)
    g_pre.unpersist()
