"""Structured Streaming surface: windowed aggregation + incremental WCC.

The streaming contract is batch-equivalence: draining a stream with the
availableNow trigger must produce exactly what the batch engine computes
on the same data — for the windowed aggregate directly, and for the
incremental graph after canonical re-labeling (arrival order must not
leak into component ids).
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from linkgraph.algorithms.wcc import wcc
from linkgraph.graph import build_graph
from linkgraph.streaming import (
    canonical_components,
    run_available_now,
    stream_parquet,
    streaming_wcc,
    windowed_event_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tmpdir():
    d = tempfile.mkdtemp(prefix="lg_stream_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_windowed_counts_stream_equals_batch(spark, tmpdir):
    batch = spark.read.parquet(f"{SF}/events.parquet")
    expected = {
        (str(r["window_start"]), r["event_type"]): (r["n"], r["sum_value"])
        for r in windowed_event_counts(batch).collect()
    }
    path = f"{tmpdir}/events"
    batch.repartition(3).write.mode("overwrite").parquet(path)  # 3 micro-batches
    sdf = stream_parquet(spark, path, batch.schema)
    got = {
        (str(r["window_start"]), r["event_type"]): (r["n"], r["sum_value"])
        for r in run_available_now(windowed_event_counts(sdf)).collect()
    }
    assert got == expected and len(got) > 0


def test_streaming_wcc_matches_batch(spark, tmpdir):
    # oid-pair edges over two components that only merge in a later batch
    rows = [
        ("1", "2"), ("2", "3"), ("10", "11"), ("11", "12"),
        ("20", "21"), ("3", "10"),  # merges {1,2,3} with {10,11,12}
        ("21", "22"), ("22", "1"),  # merges everything but in the LAST batch
    ]
    df = spark.createDataFrame(rows, "src_oid string, dst_oid string")
    # 4 single-file micro-batches in a deliberately scrambled order
    path = f"{tmpdir}/edges"
    for i, chunk in enumerate([rows[5:6], rows[0:3], rows[6:8], rows[3:5]]):
        spark.createDataFrame(chunk, "src_oid string, dst_oid string").coalesce(
            1
        ).write.mode("append").parquet(path)
    sdf = stream_parquet(spark, path, "src_oid string, dst_oid string")
    g, labels = streaming_wcc(sdf)
    got = {
        (r["oid_num"], r["comp"])
        for r in canonical_components(g, labels).collect()
    }

    gb = build_graph(df)
    exp = {
        (r["oid_num"], r["comp"])
        for r in canonical_components(gb, wcc(gb)).collect()
    }
    assert got == exp
    # everything merged into one component rooted at numeric-min oid 1
    assert {c for _, c in got} == {1}


def test_sessionize_stream_append_subset_of_batch(spark, tmpdir):
    from linkgraph.streaming import sessionize

    batch = spark.read.parquet(f"{SF}/events.parquet")
    exp = {
        (r["user_id"], r["session_start_us"], r["session_end_us"], r["n"], r["sum_value"])
        for r in sessionize(batch).collect()
    }
    path = f"{tmpdir}/sess_events"
    batch.orderBy("ts").coalesce(1).write.mode("overwrite").parquet(path)
    sdf = stream_parquet(spark, path, batch.schema)
    # append mode emits only watermark-finalized sessions — a subset of
    # the batch result, and every emitted session must match it exactly
    got = {
        (r["user_id"], r["session_start_us"], r["session_end_us"], r["n"], r["sum_value"])
        for r in run_available_now(sessionize(sdf), output_mode="append").collect()
    }
    assert got <= exp


def test_running_user_totals_stateful(spark, tmpdir):
    from linkgraph.streaming import running_user_totals

    batch = spark.read.parquet(f"{SF}/events.parquet")
    exp = {
        (r["user_id"], r["n"], round(r["s"], 6))
        for r in batch.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    path = f"{tmpdir}/tot_events"
    batch.repartition(3).write.mode("overwrite").parquet(path)  # 3 micro-batches of state updates
    sdf = stream_parquet(spark, path, batch.schema)
    got = {
        (r["user_id"], r["n"], r["sum_value"])
        for r in running_user_totals(sdf).collect()
    }
    assert got == exp


def test_wcc_warm_start_equals_cold(spark):
    rows = [("a", "b"), ("b", "c"), ("x", "y")]
    g = build_graph(spark.createDataFrame(rows, "src_oid string, dst_oid string"))
    cold = {(r["vid"], r["value"]) for r in wcc(g).collect()}
    # warm-start from a coarser labeling (own vid) must converge identically
    init = g.vertices.select("vid", F.col("vid").alias("label"))
    warm = {(r["vid"], r["value"]) for r in wcc(g, init_labels=init).collect()}
    assert warm == cold


def test_streaming_pagerank_matches_batch(spark, tmpdir):
    """Ranks maintained across micro-batches (delta-push warm start per
    batch) converge to the same fixpoint as a static run on the final
    graph, regardless of arrival order."""
    import numpy as np

    from linkgraph.streaming import streaming_pagerank
    from linkgraph.algorithms import pagerank_nx

    rows = [
        ("1", "2"), ("2", "3"), ("3", "1"), ("10", "11"),
        ("11", "12"), ("3", "10"), ("12", "1"), ("2", "10"),
    ]
    df = spark.createDataFrame(rows, "src_oid string, dst_oid string")
    path = f"{tmpdir}/predges"
    for chunk in [rows[5:6], rows[0:3], rows[6:8], rows[3:5]]:
        spark.createDataFrame(chunk, "src_oid string, dst_oid string").coalesce(
            1
        ).write.mode("append").parquet(path)
    sdf = stream_parquet(spark, path, "src_oid string, dst_oid string")
    g, ranks = streaming_pagerank(sdf, tol=1e-6, maintain_factor=1e-3)
    got = {
        r["oid"]: r["value"]
        for r in ranks.join(g.vertices, "vid").select("oid", "value").collect()
    }

    gb = build_graph(df)
    exp = {
        r["oid"]: r["value"]
        for r in pagerank_nx(gb, alpha=0.85, max_iter=300, tol=1e-10)
        .join(gb.vertices, "vid")
        .select("oid", "value")
        .collect()
    }
    assert set(got) == set(exp)
    ks = sorted(exp)
    assert np.allclose([got[k] for k in ks], [exp[k] for k in ks], atol=1e-7, rtol=0)


def test_streaming_triangles_matches_cold(spark, tmp_path):
    """4-batch ingest → incremental totals == cold count on the union."""
    from linkgraph.algorithms.triangles import triangle_total
    from linkgraph.graph import build_graph
    from linkgraph.streaming import stream_parquet, streaming_triangles

    edges = [
        ("a", "b"), ("b", "c"), ("a", "c"),       # triangle 1
        ("c", "d"), ("b", "d"),                   # triangle 2 (b,c,d)
        ("e", "f"),                               # no triangle
        ("d", "a"),                               # triangle (a,b,d)? a-b yes, b-d yes → yes
    ]
    df = spark.createDataFrame(edges, "src_oid string, dst_oid string")
    out = str(tmp_path / "stream_tri")
    df.repartition(3).write.parquet(out)
    sdf = stream_parquet(spark, out, "src_oid string, dst_oid string")
    g, total = streaming_triangles(sdf)
    cold = triangle_total(build_graph(df))
    assert total == cold
    assert g.edges.count() == len(set(edges))
