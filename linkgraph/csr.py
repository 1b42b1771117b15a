"""Fast tier: per-partition CSR blocks + vectorized gather-scatter.

This is the GRAPE-inspired execution tier (SURVEY.md §7.1): the analog of
the reference's per-fragment CSR over Arrow buffers
(/root/reference/analytical_engine/core/fragment/arrow_projected_fragment.h:351,444-498)
with the ForEach-over-CSR inner loop
(/root/reference/analytical_engine/apps/pagerank/pagerank_networkx.h:90-156)
re-expressed as Arrow-batched pandas UDFs:

- **Block build** (once): edges are hash-partitioned by ``pmod(src, P)``
  and each partition is *compacted into one row of Arrow arrays* forming a
  CSR: unique sorted sources ``us`` + ``indptr`` offsets + destination
  array, with destinations additionally dictionary-compacted to
  ``(udst, dst_idx)`` so per-block message combining is one
  ``np.bincount``. Edges never shuffle again after this.
- **Superstep** (per round): the vertex state (hash-co-partitioned on the
  same key) cogroups with its block; the pandas UDF *gathers* per-source
  values, expands along the CSR (``np.repeat``), and *scatters* partial
  sums per distinct destination (``np.bincount``) — the map-side combine
  the reference gets from per-thread message buffers. Only the combined
  per-(block, distinct-dst) partials shuffle; a global
  ``groupBy(dst).sum`` finishes the reduction (salting unnecessary: at
  most P partial rows per destination reach a reducer, so a hub vertex
  costs P rows, not deg(v) rows — two-phase aggregation is built into the
  tier).

Everything per-element is numpy over Arrow-backed arrays — no per-row
Python anywhere (``input_hint`` requirement).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.superstep import run_supersteps

BLOCK_SCHEMA = (
    "bid int, n_edges long, us array<long>, indptr array<long>, "
    "udst array<long>, dst_idx array<int>"
)


def build_csr_blocks(edges: DataFrame, num_blocks: int) -> DataFrame:
    """Compact ``(src, dst)`` edges into ``num_blocks`` CSR block rows.

    One shuffle (hash on src), then each block compacts locally. The
    result is tiny in row count (P rows) and is meant to be persisted and
    reused across all supersteps.
    """
    e = edges.select(
        F.col("src"), F.col("dst"), F.pmod(F.col("src"), F.lit(num_blocks)).cast("int").alias("bid")
    )

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        bid = int(pdf["bid"].iloc[0])
        src = pdf["src"].to_numpy(dtype=np.int64)
        dst = pdf["dst"].to_numpy(dtype=np.int64)
        order = np.argsort(src, kind="stable")
        src, dst = src[order], dst[order]
        us, counts = np.unique(src, return_counts=True)
        indptr = np.zeros(len(us) + 1, dtype=np.int64)
        np.cumsum(counts, out=indptr[1:])
        udst, dst_idx = np.unique(dst, return_inverse=True)
        return pd.DataFrame(
            {
                "bid": [bid],
                "n_edges": [len(src)],
                "us": [us],
                "indptr": [indptr],
                "udst": [udst],
                "dst_idx": [dst_idx.astype(np.int32)],
            }
        )

    return e.groupBy("bid").applyInPandas(_build, schema=BLOCK_SCHEMA)


def _scatter_partials(
    state_pdf: pd.DataFrame, block_pdf: pd.DataFrame, value_col: str
) -> tuple[np.ndarray, np.ndarray]:
    """Gather ``value_col`` for the block's sources, scatter-sum per dst.

    Returns (udst, partial_sum) for this block; empty arrays when either
    side of the cogroup is absent.
    """
    if len(block_pdf) == 0 or len(state_pdf) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0)
    us = np.asarray(block_pdf["us"].iloc[0], dtype=np.int64)
    indptr = np.asarray(block_pdf["indptr"].iloc[0], dtype=np.int64)
    udst = np.asarray(block_pdf["udst"].iloc[0], dtype=np.int64)
    dst_idx = np.asarray(block_pdf["dst_idx"].iloc[0], dtype=np.int32)

    vids = state_pdf["vid"].to_numpy(dtype=np.int64)
    vals = state_pdf[value_col].to_numpy(dtype=np.float64)
    order = np.argsort(vids, kind="stable")
    vids, vals = vids[order], vals[order]
    # build_graph guarantees edge endpoints ⊆ vertices, but LinkGraph can
    # be constructed directly — mask sources absent from the co-partitioned
    # state (contribute 0) instead of reading out of bounds / wrong rows
    pos = np.searchsorted(vids, us)
    safe = np.minimum(pos, len(vids) - 1)
    active = (pos < len(vids)) & (vids[safe] == us)
    src_vals = np.where(active, vals[safe], 0.0)

    per_edge = np.repeat(src_vals, np.diff(indptr))
    partial = np.bincount(dst_idx, weights=per_edge, minlength=len(udst))
    return udst, partial


def pagerank_csr(
    graph: LinkGraph,
    alpha: float = 0.85,
    max_iter: int = 100,
    tol: float | None = 1e-06,
    num_blocks: int | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """PageRank (NetworkX semantics, §2.4) on the CSR fast tier.

    Same per-round math as :func:`linkgraph.algorithms.pagerank_nx` —
    validated against it in tests — but the scatter runs inside the
    cogrouped pandas UDF and only per-block partials shuffle.
    ``tol=None`` gives the fixed-round LDBC flavor.
    """
    spark = graph.edges.sparkSession
    p = num_blocks or spark.sparkContext.defaultParallelism
    n = graph.vertices.count()
    if n == 0:
        return spark.createDataFrame([], "vid long, value double")

    blocks = build_csr_blocks(graph.edges, p).persist()
    blocks.count()

    out_deg = graph.edges.groupBy("src").agg(F.count("*").alias("deg"))
    state0 = (
        graph.vertices.select("vid")
        .join(out_deg.withColumnRenamed("src", "vid"), "vid", "left")
        .select(
            "vid",
            F.coalesce("deg", F.lit(0)).cast("long").alias("deg"),
            F.lit(1.0 / n).alias("rank"),
        )
    )

    dangling = {"mass": None}

    def _partials(state_pdf: pd.DataFrame, block_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(state_pdf):
            contrib = state_pdf.copy()
            deg = contrib["deg"].to_numpy(dtype=np.float64)
            rank = contrib["rank"].to_numpy(dtype=np.float64)
            contrib["contrib"] = np.divide(rank, deg, out=np.zeros_like(rank), where=deg > 0)
        else:
            contrib = state_pdf
        udst, psum = _scatter_partials(contrib, block_pdf, "contrib")
        return pd.DataFrame({"dst": udst, "psum": psum})

    def step(state: DataFrame, rnd: int) -> tuple[DataFrame, dict]:
        if dangling["mass"] is None:
            dangling["mass"] = (
                state.where(F.col("deg") == 0).agg(F.sum("rank")).first()[0] or 0.0
            ) * alpha
        base = (1.0 - alpha) / n + dangling["mass"] / n

        st_keyed = state.withColumn("bid", F.pmod(F.col("vid"), F.lit(p)).cast("int"))
        partials = st_keyed.groupBy("bid").cogroup(blocks.groupBy("bid")).applyInPandas(
            _partials, schema="dst long, psum double"
        )
        msgs = partials.groupBy("dst").agg(F.sum("psum").alias("msum"))
        new_state = (
            state.join(msgs, state["vid"] == msgs["dst"], "left")
            .select(
                state["vid"],
                state["deg"],
                (alpha * F.coalesce(F.col("msum"), F.lit(0.0)) + F.lit(base)).alias("rank"),
                state["rank"].alias("prev_rank"),
            )
            .persist()
        )
        row = new_state.agg(
            F.sum(F.abs(F.col("rank") - F.col("prev_rank"))).alias("l1"),
            F.sum(F.when(F.col("deg") == 0, F.col("rank")).otherwise(F.lit(0.0))).alias("dg"),
        ).first()
        dangling["mass"] = (row["dg"] or 0.0) * alpha
        return new_state, {"l1": row["l1"] or 0.0}

    conv = (lambda s: False) if tol is None else (lambda s: s["l1"] < tol * n)
    result = run_supersteps(
        state0, step, conv, max_rounds=max_iter, checkpoint_dir=checkpoint_dir
    )
    out = result.state.select("vid", F.col("rank").alias("value"))
    blocks.unpersist()
    return out


def wcc_csr(
    graph: LinkGraph,
    max_rounds: int = 200,
    num_blocks: int | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """WCC (min-label propagation, §2.4) on the CSR fast tier.

    The undirected closure is block-compacted once; each round gathers
    labels, scatters per-block **minima** (np.minimum.at on the compacted
    dst dictionary), and a global ``groupBy(dst).min`` finishes. Exact
    same fixpoint as :func:`linkgraph.algorithms.wcc`.
    """
    spark = graph.edges.sparkSession
    p = num_blocks or spark.sparkContext.defaultParallelism
    e = graph.edges.select("src", "dst")
    und = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    blocks = build_csr_blocks(und, p).persist()
    blocks.count()

    state0 = graph.vertices.select(
        "vid", F.col("vid").alias("label"), F.lit(True).alias("changed")
    )

    def _partials(state_pdf: pd.DataFrame, block_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(block_pdf) == 0 or len(state_pdf) == 0:
            return pd.DataFrame({"dst": [], "plabel": []}).astype(
                {"dst": np.int64, "plabel": np.int64}
            )
        frontier = state_pdf[state_pdf["changed"]]
        if len(frontier) == 0:
            return pd.DataFrame({"dst": [], "plabel": []}).astype(
                {"dst": np.int64, "plabel": np.int64}
            )
        us = np.asarray(block_pdf["us"].iloc[0], dtype=np.int64)
        indptr = np.asarray(block_pdf["indptr"].iloc[0], dtype=np.int64)
        udst = np.asarray(block_pdf["udst"].iloc[0], dtype=np.int64)
        dst_idx = np.asarray(block_pdf["dst_idx"].iloc[0], dtype=np.int32)

        vids = frontier["vid"].to_numpy(dtype=np.int64)
        labels = frontier["label"].to_numpy(dtype=np.int64)
        order = np.argsort(vids, kind="stable")
        vids, labels = vids[order], labels[order]
        # only frontier sources contribute this round
        pos = np.searchsorted(vids, us)
        active = (pos < len(vids)) & (vids[np.minimum(pos, len(vids) - 1)] == us)
        src_label = np.where(active, labels[np.minimum(pos, len(vids) - 1)], np.iinfo(np.int64).max)

        per_edge = np.repeat(src_label, np.diff(indptr))
        pmin = np.full(len(udst), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(pmin, dst_idx, per_edge)
        mask = pmin != np.iinfo(np.int64).max
        return pd.DataFrame({"dst": udst[mask], "plabel": pmin[mask]})

    def step(state: DataFrame, rnd: int) -> tuple[DataFrame, dict]:
        st_keyed = state.withColumn("bid", F.pmod(F.col("vid"), F.lit(p)).cast("int"))
        partials = st_keyed.groupBy("bid").cogroup(blocks.groupBy("bid")).applyInPandas(
            _partials, schema="dst long, plabel long"
        )
        msgs = partials.groupBy("dst").agg(F.min("plabel").alias("mlabel"))
        new_state = (
            state.join(msgs, state["vid"] == msgs["dst"], "left")
            .select(
                state["vid"],
                F.least(state["label"], F.coalesce("mlabel", state["label"])).alias("label"),
                (F.coalesce("mlabel", state["label"]) < state["label"]).alias("changed"),
            )
            .persist()
        )
        n_changed = new_state.agg(F.sum(F.col("changed").cast("long"))).first()[0] or 0
        return new_state, {"changed": n_changed}

    result = run_supersteps(
        state0,
        step,
        converged=lambda s: s["changed"] == 0,
        max_rounds=max_rounds,
        checkpoint_dir=checkpoint_dir,
    )
    out = result.state.select("vid", F.col("label").alias("value"))
    blocks.unpersist()
    return out
