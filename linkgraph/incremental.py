"""Incremental edge append with stable vids + warm-start iteration.

Analog of the reference's append-only fragment
(/root/reference/analytical_engine/core/fragment/append_only_arrow_fragment.h):
new batches extend the graph without invalidating existing vertex ids, so
superstep state computed on the old graph (checkpointed ranks, labels)
remains addressable and an iterative algorithm resumes *warm* on the
grown graph instead of restarting cold.

Scale shape: extending ids is one anti-join (new oids vs old map) + one
dense numbering over only the fresh oids; appended edges resolve through
the id map exactly like the initial load. Nothing about the old graph is
recomputed or reshuffled.
"""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph, assign_dense_ids


# assign_dense_ids pins its output for the lazy plans that reference it;
# over an unbounded stream of extend calls that is one stranded persist per
# micro-batch. Bound residency to the most recent call (dedup.py pattern):
# freeing an older map forces a deterministic recompute, never wrong data.
_CACHED: list[DataFrame] = []


def _own_cache(df: DataFrame) -> DataFrame:
    while _CACHED:
        _CACHED.pop().unpersist()
    _CACHED.append(df)
    return df


def extend_dense_ids(vmap: DataFrame, new_oids: DataFrame) -> DataFrame:
    """Append fresh oids to an existing (vid, oid) map with stable ids.

    Existing oids keep their vid; unseen oids get ``max_vid + 1 ...`` in
    sorted-oid order (deterministic, like the initial assignment).
    """
    base = vmap.agg(F.max("vid")).first()[0]
    base = -1 if base is None else int(base)
    fresh = (
        new_oids.select(F.col(new_oids.columns[0]).cast("string").alias("oid"))
        .where(F.col("oid").isNotNull())
        .distinct()
        .join(vmap.select("oid"), "oid", "left_anti")
    )
    fresh_ids = _own_cache(assign_dense_ids(fresh)).select(
        (F.col("vid") + F.lit(base + 1)).alias("vid"), "oid"
    )
    return vmap.select("vid", "oid").unionByName(fresh_ids)


def extend_graph(
    graph: LinkGraph,
    delta_edges: DataFrame,
    src_col: str = "src_oid",
    dst_col: str = "dst_oid",
) -> LinkGraph:
    """Append a batch of oid-pair edges; vids of existing vertices are
    stable (AppendOnlyArrowFragment semantics). Duplicate edges — within
    the batch or vs the existing graph — are not re-added."""
    d = delta_edges.select(
        F.col(src_col).cast("string").alias("src_oid"),
        F.col(dst_col).cast("string").alias("dst_oid"),
    ).dropDuplicates(["src_oid", "dst_oid"])
    oids = d.select(F.col("src_oid").alias("oid")).union(
        d.select(F.col("dst_oid").alias("oid"))
    )
    vmap = extend_dense_ids(graph.vertices, oids)
    if "weight" in graph.edges.columns:
        # delta rows carry no weights; growing a weighted graph would
        # silently change later sssp() results via the unit fallback
        raise ValueError(
            "extend_graph: existing graph is weighted but delta edges have "
            "no weight column — extend with weighted deltas instead"
        )
    ne = (
        d.join(vmap.select(F.col("oid").alias("src_oid"), F.col("vid").alias("src")), "src_oid")
        .join(vmap.select(F.col("oid").alias("dst_oid"), F.col("vid").alias("dst")), "dst_oid")
        .select("src", "dst")
        .join(graph.edges.select("src", "dst"), ["src", "dst"], "left_anti")
    )
    edges = graph.edges.select("src", "dst").unionByName(ne)
    return replace(graph, vertices=vmap, edges=edges, partition_key=None)


def wcc_resume(
    graph: LinkGraph,
    prev_labels: DataFrame,
    max_rounds: int = 200,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Converge WCC on a grown graph starting from previous labels.

    Labels from the pre-append graph are per-component vid minima, so
    they remain valid lower seeds after edges/vertices are appended (see
    ``wcc(init_labels=...)``): the warm run only has to merge components
    the delta connected, typically a handful of supersteps instead of the
    graph diameter.
    """
    from linkgraph.algorithms.wcc import wcc

    return wcc(
        graph,
        max_rounds=max_rounds,
        checkpoint_dir=checkpoint_dir,
        init_labels=prev_labels,
    )


def pagerank_resume(
    graph: LinkGraph,
    prev_ranks: DataFrame,
    alpha: float = 0.85,
    max_iter: int = 100,
    tol: float = 1e-06,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Converge PageRank on a grown graph starting from previous ranks.

    ``prev_ranks`` is (vid, value) from the pre-append graph (or a
    checkpoint snapshot mid-iteration). Vertices added since then start
    at 1/N; the start vector is renormalized to mass 1. PageRank's fixed
    point is unique for α < 1, so the warm start converges to the same
    result as a cold run on the appended graph — it just gets there in
    far fewer supersteps when the delta is small.
    """
    from linkgraph.algorithms.pagerank import _pagerank_impl

    return _pagerank_impl(
        graph, alpha, max_iter, tol, checkpoint_dir, init_ranks=prev_ranks
    )
