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


def test_csr_blocks_cached_copartitioned_no_per_round_exchange(spark):
    """The persisted CSR blocks must enter the per-round cogroup straight
    from the cache (Sort → InMemoryTableScan), never through a per-round
    Exchange — at 10^8 edges that Exchange re-shuffles the entire ~GB CSR
    payload every superstep."""
    import pyarrow as pa

    from linkgraph import csr
    from linkgraph.graph import graph_from_edge_vids

    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    g = graph_from_edge_vids(spark, LANGVILLE_MEYER)
    blocks = csr.build_csr_blocks(g.edges, p).persist()
    blocks.count()
    try:
        state = g.vertices.select("vid", F.lit(1.0).alias("rank"))
        st_keyed = state.withColumn("bid", F.pmod(F.col("vid"), F.lit(p)).cast("int"))

        def _noop(s, b):
            return pa.table({"dst": pa.array([], pa.int64())})

        out = st_keyed.groupBy("bid").cogroup(blocks.groupBy("bid")).applyInArrow(
            _noop, schema="dst long"
        )
        import re

        plan = out._jdf.queryExecution().executedPlan().toString()
        cogroup_part = plan.split("InMemoryRelation")[0]  # per-round plan only
        assert "InMemoryTableScan" in cogroup_part, plan
        # the blocks branch must read the cache DIRECTLY: a Sort over the
        # InMemoryTableScan with no Exchange between them (the state side
        # may exchange as much as it likes — it changes every round)
        assert re.search(
            r"\+- Sort \[bid#\d+ ASC NULLS FIRST\], false, 0\n\s*\+- InMemoryTableScan",
            cogroup_part,
        ), cogroup_part
    finally:
        blocks.unpersist()


def test_pagerank_reuses_prepartitioned_graph(spark):
    from linkgraph.algorithms import pagerank_nx

    g_pre = graph_from_edge_vids(spark, LANGVILLE_MEYER).partitioned(num_partitions=4)
    g_raw = graph_from_edge_vids(spark, LANGVILLE_MEYER)
    r_pre = {r["vid"]: r["value"] for r in pagerank_nx(g_pre, max_iter=30).collect()}
    r_raw = {r["vid"]: r["value"] for r in pagerank_nx(g_raw, max_iter=30).collect()}
    assert set(r_pre) == set(r_raw)
    assert all(abs(r_pre[k] - r_raw[k]) < 1e-12 for k in r_raw)
    g_pre.unpersist()


def test_hash_split_is_shuffle_free(spark):
    """Split assignment is stateless row arithmetic: scan → project, no
    Exchange anywhere — at 100 TB the split adds zero network cost."""
    from linkgraph.pipeline import hash_split

    df = spark.range(100).select(F.col("id").alias("doc_id"))
    plan = _explain_str(hash_split(df))
    assert "Exchange" not in plan


def test_contamination_benchmark_side_broadcasts(spark):
    """The benchmark n-gram set must reach the semi-join as a broadcast:
    the docs side streams, nothing shuffles it by n-gram."""
    from linkgraph.pipeline import contamination_check

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i}") for i in range(50)], ["doc_id", "text"]
    )
    bench = docs.where(F.col("doc_id") % 10 == 0)
    plan = _explain_str(contamination_check(docs, bench, n=3))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_parquet_scan_prunes_and_pushes_through_pipeline_ops(spark):
    """Filters written around our pipeline operators must reach the parquet
    FileScan (PushedFilters) and the scan must read only the referenced
    columns (ReadSchema) — at 100 TB a scan that reads `text` for a
    lang-only filter, or all 5 columns for a 2-column projection, is the
    whole ballgame. Our operators are plain Catalyst compositions, so
    this is asserting we never break pushdown with an opaque boundary."""
    from linkgraph.pipeline import token_counts

    # a previously-persisted documents scan would satisfy the read from an
    # InMemoryRelation (no FileScan → no PushedFilters line); this test is
    # about the cold-scan plan, so drop any cache another test pinned
    spark.catalog.clearCache()
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = token_counts(docs.where(F.col("lang") == "en"))
    plan = _explain_str(out)
    scan = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("lang" in ln and "en" in ln for ln in scan), plan
    rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert rs and "source" not in rs[0] and "n_chars" not in rs[0], rs
    # filter AFTER the operator prunes too: only doc_id+text are read
    out2 = token_counts(docs).where(F.col("ws_tokens") > 3)
    plan2 = _explain_str(out2)
    rs2 = [ln for ln in plan2.splitlines() if "ReadSchema" in ln]
    assert rs2 and "lang" not in rs2[0] and "source" not in rs2[0], rs2


def test_triangle_incr_broadcasts_delta_no_cartesian(spark):
    """triangle_total_incr's S-term must stream the adjacency against the
    BROADCAST append set (no wedge self-join of the big table, no
    cartesian product anywhere in the incremental path)."""
    from pyspark.sql import functions as F

    from linkgraph.graph import graph_from_edge_vids

    g = graph_from_edge_vids(spark, LANGVILLE_MEYER)
    extra = spark.createDataFrame([(0, 5), (5, 2)], "src long, dst long")

    und_old = g.simple_undirected_edges()
    delta = (
        extra.select(F.least("src", "dst").alias("lo"), F.greatest("src", "dst").alias("hi"))
        .where(F.col("lo") != F.col("hi"))
        .distinct()
        .join(und_old, ["lo", "hi"], "left_anti")
    )
    und2 = und_old.unionByName(delta)
    adj2 = und2.select(F.col("lo").alias("u"), F.col("hi").alias("w")).unionByName(
        und2.select(F.col("hi").alias("u"), F.col("lo").alias("w"))
    )
    cand = adj2.join(F.broadcast(delta), adj2["u"] == delta["lo"]).select(
        "hi", F.col("w").alias("cw")
    )
    s_plan = _explain_str(
        adj2.join(cand, (adj2["u"] == cand["hi"]) & (adj2["w"] == cand["cw"]))
    )
    assert "BroadcastHashJoin" in s_plan
    assert "CartesianProduct" not in s_plan and "BroadcastNestedLoopJoin" not in s_plan


def test_mis_round_plan_no_cartesian(spark):
    """One Luby round = equi joins + a map-side-combinable min(struct)
    aggregate; never a cartesian/nested-loop join."""
    from pyspark.sql import functions as F

    from linkgraph.algorithms.mis import _priority
    from linkgraph.graph import graph_from_edge_vids

    g = graph_from_edge_vids(spark, LANGVILLE_MEYER)
    e = g.edges.select("src", "dst")
    und = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    undecided = g.vertices.select("vid", _priority(F.col("vid"), 42).alias("p"))
    nbr_min = (
        und.join(undecided.select(F.col("vid").alias("dst"), "p"), "dst")
        .groupBy("src")
        .agg(F.min(F.struct("p", F.col("dst").alias("vid"))).alias("m"))
        .select(F.col("src").alias("vid"), "m")
    )
    winners = undecided.join(nbr_min, "vid", "left").where(
        F.col("m").isNull() | (F.struct("p", "vid") < F.col("m"))
    )
    plan = _explain_str(winners)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "HashAggregate" in plan or "ObjectHashAggregate" in plan


def test_pack_sequences_single_exchange(spark):
    """Packing's only network cost is the hash partition by shard: one
    Exchange, one in-partition Sort for the window cumsum, no Python —
    at 100 TB the packing adds one shuffle of (id, tokens) pairs."""
    from linkgraph.pipeline import pack_sequences

    df = spark.createDataFrame(
        [(i, "tok " * (i % 17 + 1)) for i in range(64)], ["doc_id", "text"]
    )
    plan = _explain_str(pack_sequences(df, budget=16, n_shards=4))
    assert plan.count("ENSURE_REQUIREMENTS") == 1, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF", "FlatMapGroupsInPandas"):
        assert marker not in plan
