"""Fast tier: per-partition CSR blocks + vectorized gather-scatter.

This is the GRAPE-inspired execution tier (SURVEY.md §7.1): the analog of
the reference's per-fragment CSR over Arrow buffers
(/root/reference/analytical_engine/core/fragment/arrow_projected_fragment.h:351,444-498)
with the ForEach-over-CSR inner loop
(/root/reference/analytical_engine/apps/pagerank/pagerank_networkx.h:90-156)
re-expressed as Arrow-batched UDFs:

- **Block build** (once): edges are hash-partitioned by ``pmod(src, P)``
  and each partition is *compacted into one row of Arrow arrays* forming a
  CSR: unique sorted sources ``us`` + ``indptr`` offsets + destination
  array, with destinations additionally dictionary-compacted to
  ``(udst, dst_idx)`` so per-block message combining is one
  ``np.bincount``. Edges never shuffle again after this.
- **Superstep** (per round): the vertex state (hash-co-partitioned on the
  same key) cogroups with its block; the UDF *gathers* per-source
  values, expands along the CSR (``np.repeat``), and *scatters* partial
  sums per distinct destination (``np.bincount``) — the map-side combine
  the reference gets from per-thread message buffers. Only the combined
  per-(block, distinct-dst) partials shuffle; a global
  ``groupBy(dst).sum`` finishes the reduction (salting unnecessary: at
  most P partial rows per destination reach a reducer, so a hub vertex
  costs P rows, not deg(v) rows — two-phase aggregation is built into the
  tier).

All per-element compute is numpy over **zero-copy Arrow buffers** via
``applyInArrow`` (plain ``applyInPandas`` re-boxes the 10^8-element CSR
arrays into pandas objects every round — measured 5× slower at 10^8
edges). No per-row Python anywhere (``input_hint`` requirement).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.superstep import run_supersteps

BLOCK_SCHEMA = (
    "bid int, n_edges long, us array<long>, indptr array<long>, "
    "udst array<long>, dst_idx array<int>"
)

# bench instrumentation: rounds/history of the most recent pagerank_csr run
LAST_ROUNDS: int | None = None
LAST_HISTORY: list[dict] | None = None
# Σ over blocks of |compacted dst dictionary| — the exact partial-row count
# every round emits (BENCH bytes-per-round accounting)
LAST_PARTIAL_ROWS: int | None = None


def _np_col(tbl: pa.Table, name: str, dtype) -> np.ndarray:
    """Plain column → numpy (zero-copy when the buffer allows)."""
    return tbl.column(name).combine_chunks().to_numpy(zero_copy_only=False).astype(
        dtype, copy=False
    )


def _iter_blocks(block_tbl: pa.Table):
    """Yield (us, indptr, udst, dst_idx) numpy views per block row."""
    cols = [block_tbl.column(c).combine_chunks() for c in ("us", "indptr", "udst", "dst_idx")]
    dtypes = (np.int64, np.int64, np.int64, np.int32)
    for i in range(block_tbl.num_rows):
        yield tuple(
            np.asarray(c.slice(i, 1).flatten()).astype(t, copy=False)
            for c, t in zip(cols, dtypes)
        )


def _one_row_list(a: np.ndarray, typ) -> pa.ListArray:
    # Spark's ArrayType interchanges as arrow list (int32 offsets), so one
    # block row is capped at 2^31 elements. Fail loudly instead of letting
    # pyarrow overflow at build time: the fix is more blocks, not a bigger
    # list (num_blocks >= n_edges / 2e9 keeps every block under the cap).
    if len(a) >= 2**31:
        raise ValueError(
            f"CSR block row would hold {len(a)} elements (>= 2^31, the arrow "
            "list-offset cap) — raise num_blocks so each block stays smaller"
        )
    return pa.ListArray.from_arrays(
        pa.array([0, len(a)], type=pa.int32()), pa.array(a, type=typ)
    )


def build_csr_blocks(edges: DataFrame, num_blocks: int) -> DataFrame:
    """Compact ``(src, dst)`` edges into ``num_blocks`` CSR block rows.

    One shuffle (hash on src), then each block compacts locally. The
    result is tiny in row count (P rows) and is meant to be persisted and
    reused across all supersteps.
    """
    e = edges.select(
        F.col("src"), F.col("dst"), F.pmod(F.col("src"), F.lit(num_blocks)).cast("int").alias("bid")
    ).repartition(num_blocks, "bid")

    def _build(batches):
        # streaming accumulation: grouped applyInArrow would materialize
        # each whole group as one JVM batch (GC-heavy at 10^8 edges);
        # mapInArrow streams the shuffle output batch by batch instead
        acc: dict[int, tuple[list, list]] = {}
        for batch in batches:
            bids = batch.column(2).to_numpy(zero_copy_only=False)
            src = batch.column(0).to_numpy(zero_copy_only=False)
            dst = batch.column(1).to_numpy(zero_copy_only=False)
            for b in np.unique(bids):
                m = bids == b
                srcs, dsts = acc.setdefault(int(b), ([], []))
                srcs.append(src[m])
                dsts.append(dst[m])
        for bid, (srcs, dsts) in acc.items():
            src = np.concatenate(srcs).astype(np.int64, copy=False)
            dst = np.concatenate(dsts).astype(np.int64, copy=False)
            order = np.argsort(src, kind="stable")
            src, dst = src[order], dst[order]
            us, counts = np.unique(src, return_counts=True)
            indptr = np.zeros(len(us) + 1, dtype=np.int64)
            np.cumsum(counts, out=indptr[1:])
            udst, dst_idx = np.unique(dst, return_inverse=True)
            yield pa.record_batch(
                {
                    "bid": pa.array([bid], pa.int32()),
                    "n_edges": pa.array([len(src)], pa.int64()),
                    "us": _one_row_list(us, pa.int64()),
                    "indptr": _one_row_list(indptr, pa.int64()),
                    "udst": _one_row_list(udst, pa.int64()),
                    "dst_idx": _one_row_list(dst_idx.astype(np.int32), pa.int32()),
                }
            )

    # Re-hash the P block rows onto their final layout BEFORE persisting:
    # mapInArrow does not carry the pre-build hash partitioning through the
    # schema change, so without this the per-round cogroup would push the
    # entire cached CSR payload (~GBs at 10^8 edges) through a shuffle
    # Exchange EVERY round. Cached with HashPartitioning(bid, P) matching
    # the cogroup's required distribution, the blocks side is read
    # shuffle-free each superstep (asserted in tests/test_plan_shape.py).
    return e.mapInArrow(_build, schema=BLOCK_SCHEMA).repartition(num_blocks, "bid")


def _gather(vids: np.ndarray, vals: np.ndarray, us: np.ndarray, fill) -> np.ndarray:
    """vals aligned to us via sorted lookup; sources absent from the state
    partition get ``fill`` (LinkGraph can be built without build_graph's
    closure guarantee — never read out of bounds / wrong rows)."""
    order = np.argsort(vids, kind="stable")
    vids, vals = vids[order], vals[order]
    pos = np.searchsorted(vids, us)
    safe = np.minimum(pos, len(vids) - 1)
    active = (pos < len(vids)) & (vids[safe] == us)
    return np.where(active, vals[safe], fill)


def pagerank_csr(
    graph: LinkGraph,
    alpha: float = 0.85,
    max_iter: int = 100,
    tol: float | None = 1e-06,
    num_blocks: int | None = None,
    checkpoint_dir: str | None = None,
    rank_dtype: str = "float64",
) -> DataFrame:
    """PageRank (NetworkX semantics, §2.4) on the CSR fast tier.

    Same per-round math as :func:`linkgraph.algorithms.pagerank_nx` —
    validated against it in tests — but the scatter runs inside the
    cogrouped Arrow UDF and only per-block partials shuffle.
    ``tol=None`` gives the fixed-round LDBC flavor.

    Bytes-per-round levers (the kernel is memory-bandwidth-bound at
    10^8+ edges — BENCH/BASELINE.md):

    - partial ``dst`` keys are int32 whenever the dense vid space fits
      (exact — ids are just narrower on the wire/in the shuffle);
    - ``rank_dtype="float32"`` halves state + partial value bytes. The
      per-block scatter still accumulates in float64 (np.bincount) and
      the global sum/L1 aggregate in double, so only the stored state
      rounds to float32 (~1e-7 relative) — the documented precision
      trade of the scale tier, NOT the default (float64 matches the
      join tier to 1e-12; tests pin both).
    """
    spark = graph.edges.sparkSession
    p = num_blocks or spark.sparkContext.defaultParallelism
    n = graph.vertices.count()
    if n == 0:
        return spark.createDataFrame([], "vid long, value double")

    use_f32 = rank_dtype == "float32"
    np_val = np.float32 if use_f32 else np.float64
    sql_val = "float" if use_f32 else "double"
    compact_dst = n < 2**31 - 1  # dense vids fit int32 partial keys
    np_dst = np.int32 if compact_dst else np.int64
    pa_dst = pa.int32() if compact_dst else pa.int64()
    sql_dst = "int" if compact_dst else "long"
    partial_schema = pa.schema([("dst", pa_dst), ("psum", pa.from_numpy_dtype(np_val))])

    blocks = build_csr_blocks(graph.edges, p).persist()
    global LAST_PARTIAL_ROWS
    LAST_PARTIAL_ROWS = int(
        blocks.select(F.size("udst").alias("k")).agg(F.sum("k")).first()[0] or 0
    )

    out_deg = graph.edges.groupBy("src").agg(F.count("*").alias("deg"))
    state0 = (
        graph.vertices.select("vid")
        .join(out_deg.withColumnRenamed("src", "vid"), "vid", "left")
        .select(
            "vid",
            F.coalesce("deg", F.lit(0)).cast("int").alias("deg"),
            F.lit(1.0 / n).cast(sql_val).alias("rank"),
        )
    )

    dangling = {"mass": None}

    def _partials(state_tbl: pa.Table, block_tbl: pa.Table) -> pa.Table:
        if state_tbl.num_rows == 0 or block_tbl.num_rows == 0:
            return partial_schema.empty_table()
        vids = _np_col(state_tbl, "vid", np.int64)
        deg = _np_col(state_tbl, "deg", np.float64)
        rank = _np_col(state_tbl, "rank", np.float64)
        contrib = np.divide(rank, deg, out=np.zeros_like(rank), where=deg > 0)
        outs_d, outs_p = [], []
        for us, indptr, udst, dst_idx in _iter_blocks(block_tbl):
            src_vals = _gather(vids, contrib, us, 0.0)
            per_edge = np.repeat(src_vals, np.diff(indptr))
            outs_d.append(udst.astype(np_dst, copy=False))
            # bincount accumulates in float64; round once on emit
            outs_p.append(
                np.bincount(dst_idx, weights=per_edge, minlength=len(udst)).astype(
                    np_val, copy=False
                )
            )
        return pa.table(
            {
                "dst": pa.array(np.concatenate(outs_d), pa_dst),
                "psum": pa.array(np.concatenate(outs_p)),
            }
        )

    def step(state: DataFrame, rnd: int) -> tuple[DataFrame, dict]:
        if dangling["mass"] is None:
            dangling["mass"] = (
                state.where(F.col("deg") == 0).agg(F.sum("rank")).first()[0] or 0.0
            ) * alpha
        base = (1.0 - alpha) / n + dangling["mass"] / n

        st_keyed = state.withColumn("bid", F.pmod(F.col("vid"), F.lit(p)).cast("int"))
        partials = st_keyed.groupBy("bid").cogroup(blocks.groupBy("bid")).applyInArrow(
            _partials, schema=f"dst {sql_dst}, psum {sql_val}"
        )
        msgs = partials.groupBy("dst").agg(F.sum("psum").alias("msum"))
        new_state = (
            state.join(msgs, state["vid"] == msgs["dst"], "left")
            .select(
                state["vid"],
                state["deg"],
                (alpha * F.coalesce(F.col("msum"), F.lit(0.0)) + F.lit(base))
                .cast(sql_val)
                .alias("rank"),
                state["rank"].alias("prev_rank"),
            )
            .persist()
        )
        row = new_state.agg(
            F.sum(F.abs(F.col("rank").cast("double") - F.col("prev_rank"))).alias("l1"),
            F.sum(F.when(F.col("deg") == 0, F.col("rank")).otherwise(F.lit(0.0))).alias("dg"),
        ).first()
        dangling["mass"] = (row["dg"] or 0.0) * alpha
        return new_state, {"l1": row["l1"] or 0.0}

    conv = (lambda s: False) if tol is None else (lambda s: s["l1"] < tol * n)
    result = run_supersteps(
        state0, step, conv, max_rounds=max_iter, checkpoint_dir=checkpoint_dir
    )
    global LAST_ROUNDS, LAST_HISTORY
    LAST_ROUNDS = result.rounds
    LAST_HISTORY = result.history
    out = result.state.select("vid", F.col("rank").cast("double").alias("value"))
    blocks.unpersist()
    return out


_WCC_PARTIAL_SCHEMA = pa.schema([("dst", pa.int64()), ("plabel", pa.int64())])


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

    imax = np.iinfo(np.int64).max

    def _partials(state_tbl: pa.Table, block_tbl: pa.Table) -> pa.Table:
        if state_tbl.num_rows == 0 or block_tbl.num_rows == 0:
            return _WCC_PARTIAL_SCHEMA.empty_table()
        changed = _np_col(state_tbl, "changed", np.bool_)
        if not changed.any():
            return _WCC_PARTIAL_SCHEMA.empty_table()
        vids = _np_col(state_tbl, "vid", np.int64)[changed]
        labels = _np_col(state_tbl, "label", np.int64)[changed]
        outs_d, outs_l = [], []
        for us, indptr, udst, dst_idx in _iter_blocks(block_tbl):
            # only frontier sources contribute this round
            src_label = _gather(vids, labels, us, imax)
            per_edge = np.repeat(src_label, np.diff(indptr))
            pmin = np.full(len(udst), imax, dtype=np.int64)
            np.minimum.at(pmin, dst_idx, per_edge)
            mask = pmin != imax
            outs_d.append(udst[mask])
            outs_l.append(pmin[mask])
        return pa.table(
            {
                "dst": pa.array(np.concatenate(outs_d) if outs_d else np.empty(0, np.int64), pa.int64()),
                "plabel": pa.array(np.concatenate(outs_l) if outs_l else np.empty(0, np.int64), pa.int64()),
            }
        )

    def step(state: DataFrame, rnd: int) -> tuple[DataFrame, dict]:
        st_keyed = state.withColumn("bid", F.pmod(F.col("vid"), F.lit(p)).cast("int"))
        partials = st_keyed.groupBy("bid").cogroup(blocks.groupBy("bid")).applyInArrow(
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
