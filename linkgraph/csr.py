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


def _pack_by_tgt(all_d: np.ndarray, p: int):
    """Group partial arrays by destination partition (``pmod(dst, p)``)
    for Arrow-list packed emission — the shared core of the four packed
    tiers (pagerank/wcc/sssp/cdlp). Returns ``(tgt, offsets, order)``:
    one ``tgt`` int32 per output row, int32 list offsets, and the stable
    sort order to apply to every payload array."""
    tgt = np.mod(all_d.astype(np.int64), p).astype(np.int32)
    order = np.argsort(tgt, kind="stable")
    t_s = tgt[order]
    bounds = np.flatnonzero(np.diff(t_s)) + 1
    starts = np.concatenate([[0], bounds]).astype(np.int64)
    offsets = pa.array(
        np.concatenate([starts, [len(t_s)]]).astype(np.int32), pa.int32()
    )
    return pa.array(t_s[starts], pa.int32()), offsets, order


def _scatter_positions(vids: np.ndarray, keys: np.ndarray):
    """Map incoming dst ``keys`` to positions in this partition's
    (unsorted) ``vids`` via sorted lookup; keys absent from ``vids`` are
    masked out (the dst-side closure guard, mirroring ``_gather`` for
    sources). Returns ``(positions, ok_mask)``."""
    so = np.argsort(vids, kind="stable")
    sv = vids[so]
    pos = np.searchsorted(sv, keys)
    safe = np.minimum(pos, len(sv) - 1)
    ok = (pos < len(sv)) & (sv[safe] == keys)
    return so[safe[ok]], ok


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
    packed: bool = True,
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
      join tier to 1e-12; tests pin both);
    - ``packed=True`` (default, r4): partials ship as one Arrow-list row
      per destination partition instead of one row per partial — kills
      the ~16 B/partial UnsafeRow overhead AND replaces the hash-agg +
      state-join pair with a single state↔partials cogroup on the shared
      pmod key: one state exchange + one packed exchange per round
      instead of three shuffles. ``packed=False`` keeps the r1-r3
      row-per-partial plan (the two paths are allclose-tested; only the
      float reduction order differs).
    """
    spark = graph.edges.sparkSession
    p = num_blocks or spark.sparkContext.defaultParallelism
    n = graph.vertices.count()
    if n == 0:
        return spark.createDataFrame([], "vid long, value double")

    use_f32 = rank_dtype == "float32"
    np_val = np.float32 if use_f32 else np.float64
    sql_val = "float" if use_f32 else "double"
    # int32 partial keys need the vid VALUE RANGE to fit, not just the count —
    # this tier accepts arbitrary signed 64-bit vid spaces (e.g. hash vids),
    # where casting would wrap keys and silently corrupt the aggregation.
    # Both ends are gated: vids < 0 (possible even when max fits) wrap too.
    min_vid, max_vid = graph.vertices.agg(F.min("vid"), F.max("vid")).first()
    min_vid, max_vid = (min_vid or 0), (max_vid or 0)
    compact_dst = 0 <= min_vid and max_vid < 2**31 - 1
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

    def _block_partials(state_tbl: pa.Table, block_tbl: pa.Table):
        """Per-block combined (dst, psum) numpy pair — shared by both
        emission formats below."""
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
        return np.concatenate(outs_d), np.concatenate(outs_p)

    def _partials(state_tbl: pa.Table, block_tbl: pa.Table) -> pa.Table:
        if state_tbl.num_rows == 0 or block_tbl.num_rows == 0:
            return partial_schema.empty_table()
        all_d, all_p = _block_partials(state_tbl, block_tbl)
        return pa.table({"dst": pa.array(all_d, pa_dst), "psum": pa.array(all_p)})

    packed_schema = pa.schema(
        [
            ("tgt", pa.int32()),
            ("dsts", pa.list_(pa_dst)),
            ("psums", pa.list_(pa.from_numpy_dtype(np_val))),
        ]
    )

    def _partials_packed(state_tbl: pa.Table, block_tbl: pa.Table) -> pa.Table:
        """Packed emission (the bytes/round + stages/round lever): ONE row
        per destination partition instead of one row per partial — the
        same (dst, psum) payload rides as Arrow list columns, so the
        per-partial UnsafeRow overhead (~16 B on an 8-12 B payload)
        collapses to P² list headers per round. Downstream, the packed
        rows cogroup with the state on the same pmod key, so the
        hash-agg exchange AND the state join of the row-per-partial path
        disappear: two shuffles per round become one state exchange +
        one packed-partial exchange."""
        if state_tbl.num_rows == 0 or block_tbl.num_rows == 0:
            return packed_schema.empty_table()
        all_d, all_p = _block_partials(state_tbl, block_tbl)
        if not len(all_d):
            return packed_schema.empty_table()
        tgt, off, order = _pack_by_tgt(all_d, p)
        return pa.table(
            {
                "tgt": tgt,
                "dsts": pa.ListArray.from_arrays(off, pa.array(all_d[order], pa_dst)),
                "psums": pa.ListArray.from_arrays(off, pa.array(all_p[order])),
            }
        )

    state_schema_str = f"vid long, deg int, rank {sql_val}, prev_rank {sql_val}"

    def _make_update(base: float):
        def _update(state_tbl: pa.Table, packed_tbl: pa.Table) -> pa.Table:
            if state_tbl.num_rows == 0:
                return pa.schema(
                    [
                        ("vid", pa.int64()),
                        ("deg", pa.int32()),
                        ("rank", pa.from_numpy_dtype(np_val)),
                        ("prev_rank", pa.from_numpy_dtype(np_val)),
                    ]
                ).empty_table()
            vids = _np_col(state_tbl, "vid", np.int64)
            deg = _np_col(state_tbl, "deg", np.int32)
            prev = _np_col(state_tbl, "rank", np_val)
            msum = np.zeros(len(vids), np.float64)
            if packed_tbl.num_rows:
                all_d = (
                    packed_tbl.column("dsts").combine_chunks().flatten()
                    .to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
                )
                all_p = (
                    packed_tbl.column("psums").combine_chunks().flatten()
                    .to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
                )
                idx, ok = _scatter_positions(vids, all_d)  # closure guard
                np.add.at(msum, idx, all_p[ok])
            new_rank = (alpha * msum + base).astype(np_val)
            return pa.table(
                {
                    "vid": pa.array(vids, pa.int64()),
                    "deg": pa.array(deg, pa.int32()),
                    "rank": pa.array(new_rank),
                    "prev_rank": pa.array(prev),
                }
            )

        return _update

    def step(state: DataFrame, rnd: int) -> tuple[DataFrame, dict]:
        if dangling["mass"] is None:
            dangling["mass"] = (
                state.where(F.col("deg") == 0).agg(F.sum("rank")).first()[0] or 0.0
            ) * alpha
        base = (1.0 - alpha) / n + dangling["mass"] / n

        # key only the live columns: from round 2 the state also carries
        # prev_rank, which neither the scatter nor the update reads —
        # shipping it through the per-round exchange would add dead
        # bytes/vertex to exactly the shuffle the packed lever shrinks
        st_keyed = state.select("vid", "deg", "rank").withColumn(
            "bid", F.pmod(F.col("vid"), F.lit(p)).cast("int")
        )
        if packed:
            partials = st_keyed.groupBy("bid").cogroup(blocks.groupBy("bid")).applyInArrow(
                _partials_packed,
                schema=f"tgt int, dsts array<{sql_dst}>, psums array<{sql_val}>",
            )
            new_state = (
                st_keyed.groupBy("bid")
                .cogroup(partials.groupBy("tgt"))
                .applyInArrow(_make_update(base), schema=state_schema_str)
                .persist()
            )
        else:
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


def pagerank_delta_csr(
    graph: LinkGraph,
    alpha: float = 0.85,
    max_iter: int = 200,
    tol: float = 1e-06,
    theta: float | None = None,
    num_blocks: int | None = None,
    checkpoint_dir: str | None = None,
    init_ranks: DataFrame | None = None,
) -> DataFrame:
    """Push-style (delta-propagation) PageRank on the CSR fast tier —
    the frontier-damping bytes/round lever.

    Solves the same fixpoint as :func:`pagerank_csr` /
    ``pagerank_nx`` — ``r = (1-α)/n + α·P·r`` with dangling mass
    redistributed uniformly (reference semantics:
    ``analytical_engine/apps/pagerank/pagerank_networkx.h``) — but via
    the Neumann/push formulation: state carries ``(rank, resid)`` with
    the invariant ``r_true = rank + Σ_k (αP)^k resid``. Each round,
    only vertices whose residual exceeds ``theta`` push
    ``α·resid/out_deg`` along their out-edges (dangling frontier
    residual is redistributed as one scalar, ``α·D/n`` to every
    vertex), absorb the pushed residual into ``rank``, and collect
    incoming pushes as new residual. Held-back residual is **never
    dropped** — it accumulates at the vertex until it crosses
    ``theta`` — so the result is exact up to the stopping bound, not
    an approximation.

    Why it's a scale lever: :func:`pagerank_csr` ships one partial per
    reachable (block, dst) pair every round regardless of progress.
    Here the per-round partial volume is proportional to the
    *frontier's* out-edges; on skewed graphs low-rank vertices fall
    below ``theta`` within a few rounds and the shuffle shrinks
    monotonically (``LAST_HISTORY`` records frontier size + partial
    rows per round).

    Precision accounting (P is column-stochastic and nonnegative, so
    ``‖Px‖₁ ≤ ‖x‖₁`` — equality for the nonnegative cold-start
    residuals, inequality for signed warm-start ones): remaining error
    after the final absorb is ``Σ_{k≥1} (αP)^k resid``, i.e. at most
    ``‖resid‖₁ · α/(1-α)``. The loop stops when
    ``‖resid‖₁ ≤ tol·n·(1-α)``, giving total L1 error ≤ ``tol·n·α`` —
    at least as tight as the iterative tiers' ``Σ|Δr| < tol·n`` stop.
    Default ``theta = tol·(1-α)/2`` guarantees the stop always
    triggers (an all-sub-theta state satisfies it by construction), so
    the frontier can never stall non-converged.

    **When the lever pays** (measured, BENCH/delta_probe.jsonl): a COLD
    start is the tier's worst case — the nonnegative residual L1 decays
    by exactly ``α`` per full-frontier round with zero cancellation,
    while the iterative tiers' signed difference contracts at the
    graph's mixing rate (94 vs 17 rounds to 1e-12 accuracy on the 2e6
    synthetic expander; the two results still agree to 1.2e-10). The
    tier exists for the WARM start: pass ``init_ranks`` (vid, value —
    e.g. the converged ranks from before an edge append) and the seed
    residual is ``b + αP'·r_init − r_init``, which is ≈ 0 everywhere
    the graph didn't change — the frontier starts at the blast radius
    of the delta, not at n, and recomputation touches only the part of
    the graph the append actually perturbed.
    """
    spark = graph.edges.sparkSession
    p = num_blocks or spark.sparkContext.defaultParallelism
    n = graph.vertices.count()
    if n == 0:
        return spark.createDataFrame([], "vid long, value double")
    if theta is None:
        theta = tol * (1.0 - alpha) / 2.0
    stop_l1 = tol * n * (1.0 - alpha)

    min_vid, max_vid = graph.vertices.agg(F.min("vid"), F.max("vid")).first()
    min_vid, max_vid = (min_vid or 0), (max_vid or 0)
    compact_dst = 0 <= min_vid and max_vid < 2**31 - 1
    np_dst = np.int32 if compact_dst else np.int64
    pa_dst = pa.int32() if compact_dst else pa.int64()
    sql_dst = "int" if compact_dst else "long"

    blocks = build_csr_blocks(graph.edges, p).persist()
    blocks.count()

    out_deg = graph.edges.groupBy("src").agg(F.count("*").alias("deg"))
    base_state = graph.vertices.select("vid").join(
        out_deg.withColumnRenamed("src", "vid"), "vid", "left"
    )

    packed_schema = pa.schema(
        [("tgt", pa.int32()), ("dsts", pa.list_(pa_dst)), ("pdeltas", pa.list_(pa.float64()))]
    )

    def _make_partials(src_col: str, th: float):
        """Frontier-only packed emission: gather α·src/deg for sources
        with |src| above ``th``, scatter per-block sums, ship one
        Arrow-list row per destination partition. Sub-theta sources emit
        nothing — that is the entire lever. ``src_col='resid'`` for loop
        rounds; ``('rank', -1.0)`` for the warm-start seeding pass
        (push everything once to compute αP'·r_init)."""

        def _partials_packed(state_tbl: pa.Table, block_tbl: pa.Table) -> pa.Table:
            if state_tbl.num_rows == 0 or block_tbl.num_rows == 0:
                return packed_schema.empty_table()
            src = _np_col(state_tbl, src_col, np.float64)
            frontier = np.abs(src) > th
            if not frontier.any():
                return packed_schema.empty_table()
            vids = _np_col(state_tbl, "vid", np.int64)[frontier]
            deg = _np_col(state_tbl, "deg", np.float64)[frontier]
            push = alpha * src[frontier]
            contrib = np.divide(push, deg, out=np.zeros_like(push), where=deg > 0)
            outs_d, outs_p = [], []
            for us, indptr, udst, dst_idx in _iter_blocks(block_tbl):
                src_vals = _gather(vids, contrib, us, 0.0)
                per_edge = np.repeat(src_vals, np.diff(indptr))
                psum = np.bincount(dst_idx, weights=per_edge, minlength=len(udst))
                mask = psum != 0.0  # warm-start residuals are signed
                outs_d.append(udst[mask].astype(np_dst, copy=False))
                outs_p.append(psum[mask])
            all_d = np.concatenate(outs_d)
            if not len(all_d):
                return packed_schema.empty_table()
            all_p = np.concatenate(outs_p)
            tgt, off, order = _pack_by_tgt(all_d, p)
            return pa.table(
                {
                    "tgt": tgt,
                    "dsts": pa.ListArray.from_arrays(off, pa.array(all_d[order], pa_dst)),
                    "pdeltas": pa.ListArray.from_arrays(off, pa.array(all_p[order])),
                }
            )

        return _partials_packed

    _partials_packed = _make_partials("resid", theta)

    _STATE_SCHEMA = pa.schema(
        [
            ("vid", pa.int64()),
            ("deg", pa.int32()),
            ("rank", pa.float64()),
            ("resid", pa.float64()),
        ]
    )

    def _make_update(dang_term: float):
        """dang_term = α·(frontier dangling residual)/n — same
        round-lagged scalar pattern as pagerank_csr's dangling mass."""

        def _update(state_tbl: pa.Table, packed_tbl: pa.Table) -> pa.Table:
            if state_tbl.num_rows == 0:
                return _STATE_SCHEMA.empty_table()
            vids = _np_col(state_tbl, "vid", np.int64)
            deg = _np_col(state_tbl, "deg", np.int32)
            rank = _np_col(state_tbl, "rank", np.float64).copy()
            resid = _np_col(state_tbl, "resid", np.float64).copy()
            incoming = np.full(len(vids), dang_term, dtype=np.float64)
            if packed_tbl.num_rows:
                all_d = (
                    packed_tbl.column("dsts").combine_chunks().flatten()
                    .to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
                )
                all_p = (
                    packed_tbl.column("pdeltas").combine_chunks().flatten()
                    .to_numpy(zero_copy_only=False)
                )
                idx, ok = _scatter_positions(vids, all_d)
                np.add.at(incoming, idx, all_p[ok])
            pushed = np.abs(resid) > theta
            rank[pushed] += resid[pushed]
            resid[pushed] = 0.0
            resid += incoming
            return pa.table(
                {
                    "vid": pa.array(vids, pa.int64()),
                    "deg": pa.array(deg, pa.int32()),
                    "rank": pa.array(rank),
                    "resid": pa.array(resid),
                }
            )

        return _update

    if init_ranks is None:
        state0 = base_state.select(
            "vid",
            F.coalesce("deg", F.lit(0)).cast("int").alias("deg"),
            F.lit(0.0).alias("rank"),
            F.lit((1.0 - alpha) / n).alias("resid"),
        )
    else:
        # warm-start seeding: rank = r_init, resid = b + αP'·r_init − r_init
        # (the defect of the old ranks under the NEW operator) — one
        # full-push pass through the same cogroup machinery, after which
        # the loop's frontier is the blast radius of the graph change.
        seeded = base_state.join(
            init_ranks.select("vid", F.col(init_ranks.columns[1]).alias("r0")),
            "vid",
            "left",
        ).select(
            "vid",
            F.coalesce("deg", F.lit(0)).cast("int").alias("deg"),
            F.coalesce("r0", F.lit(0.0)).alias("rank"),
        )
        d_init = (
            seeded.where(F.col("deg") == 0).agg(F.sum("rank")).first()[0] or 0.0
        )
        seed_base = (1.0 - alpha) / n + alpha * d_init / n

        def _seed_update(state_tbl: pa.Table, packed_tbl: pa.Table) -> pa.Table:
            if state_tbl.num_rows == 0:
                return _STATE_SCHEMA.empty_table()
            vids = _np_col(state_tbl, "vid", np.int64)
            deg = _np_col(state_tbl, "deg", np.int32)
            rank = _np_col(state_tbl, "rank", np.float64)
            incoming = np.full(len(vids), seed_base, dtype=np.float64)
            if packed_tbl.num_rows:
                all_d = (
                    packed_tbl.column("dsts").combine_chunks().flatten()
                    .to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
                )
                all_p = (
                    packed_tbl.column("pdeltas").combine_chunks().flatten()
                    .to_numpy(zero_copy_only=False)
                )
                idx, ok = _scatter_positions(vids, all_d)
                np.add.at(incoming, idx, all_p[ok])
            return pa.table(
                {
                    "vid": pa.array(vids, pa.int64()),
                    "deg": pa.array(deg, pa.int32()),
                    "rank": pa.array(rank),
                    "resid": pa.array(incoming - rank),
                }
            )

        sk = seeded.withColumn("bid", F.pmod(F.col("vid"), F.lit(p)).cast("int"))
        seed_parts = sk.groupBy("bid").cogroup(blocks.groupBy("bid")).applyInArrow(
            _make_partials("rank", -1.0),
            schema=f"tgt int, dsts array<{sql_dst}>, pdeltas array<double>",
        )
        state0 = (
            sk.groupBy("bid")
            .cogroup(seed_parts.groupBy("tgt"))
            .applyInArrow(_seed_update, schema="vid long, deg int, rank double, resid double")
        )

    dang = {"term": None}

    def step(state: DataFrame, rnd: int) -> tuple[DataFrame, dict]:
        if dang["term"] is None:
            d0 = (
                state.where((F.col("deg") == 0) & (F.abs(F.col("resid")) > theta))
                .agg(F.sum("resid"))
                .first()[0]
                or 0.0
            )
            dang["term"] = alpha * d0 / n
        st_keyed = state.withColumn("bid", F.pmod(F.col("vid"), F.lit(p)).cast("int"))
        partials = st_keyed.groupBy("bid").cogroup(blocks.groupBy("bid")).applyInArrow(
            _partials_packed,
            schema=f"tgt int, dsts array<{sql_dst}>, pdeltas array<double>",
        )
        new_state = (
            st_keyed.groupBy("bid")
            .cogroup(partials.groupBy("tgt"))
            .applyInArrow(
                _make_update(dang["term"]),
                schema="vid long, deg int, rank double, resid double",
            )
            .persist()
        )
        row = new_state.agg(
            F.sum(F.abs(F.col("resid"))).alias("l1"),
            F.sum(
                F.when(
                    (F.col("deg") == 0) & (F.abs(F.col("resid")) > theta),
                    F.col("resid"),
                ).otherwise(F.lit(0.0))
            ).alias("dg"),
            F.sum((F.abs(F.col("resid")) > theta).cast("long")).alias("frontier"),
        ).first()
        dang["term"] = alpha * (row["dg"] or 0.0) / n
        return new_state, {
            "l1": row["l1"] or 0.0,
            "frontier": int(row["frontier"] or 0),
        }

    result = run_supersteps(
        state0,
        step,
        converged=lambda s: s["l1"] <= stop_l1 or s["frontier"] == 0,
        max_rounds=max_iter,
        checkpoint_dir=checkpoint_dir,
    )
    global LAST_ROUNDS, LAST_HISTORY
    LAST_ROUNDS = result.rounds
    LAST_HISTORY = result.history
    # final absorb: rank + resid (the k=0 term of the remaining series)
    out = result.state.select(
        "vid", (F.col("rank") + F.col("resid")).alias("value")
    )
    blocks.unpersist()
    return out


def _multi_row_list(arrays: list[np.ndarray], typ) -> pa.ListArray:
    """Pack numpy arrays as one arrow list column (one row per array)."""
    lens = np.array([len(a) for a in arrays], dtype=np.int64)
    offsets = np.zeros(len(arrays) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    if offsets[-1] >= 2**31:
        raise ValueError("list column exceeds arrow int32 offsets — raise num_blocks")
    values = np.concatenate(arrays) if arrays else np.empty(0)
    return pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), pa.array(values, type=typ)
    )


def pagerank_csr_dense(
    graph: LinkGraph,
    alpha: float = 0.85,
    max_iter: int = 100,
    tol: float | None = 1e-06,
    num_blocks: int | None = None,
    checkpoint_dir: str | None = None,
    rank_dtype: str = "float64",
) -> DataFrame:
    """PageRank on the **dense-chunk tier**: state as P array-chunks.

    Same math and CSR edge blocks as :func:`pagerank_csr`, but vertex
    state lives in P rows of dense arrays (chunk ``c`` holds rank/deg for
    vids ≡ c mod P at index vid // P — requires the dense 0..n-1 vid
    space :func:`linkgraph.graph.assign_dense_ids` produces; raises
    otherwise). Each round is two chunk-aligned cogroups instead of a
    145M-row shuffle pipeline:

    - **scatter**: block b cogroups with state chunk b (gather is pure
      indexing, ``contrib[us // P]``) and emits, per destination chunk,
      an *array-packed sparse partial* ``(pos[], psum[])`` — the same
      per-block combined sums as the sparse tier but as two plain
      buffers, ≤ P² tiny rows per round instead of Σ|udst| ≈ 0.7·E rows;
    - **reduce**: chunk c cogroups its ≤ P partials with its old state
      row, accumulates with vectorized indexed adds (positions are
      unique per partial), applies ``rank = α·msgs + base``, and emits
      the new chunk **plus its L1/dangling contributions** — the
      convergence aggregate is a P-row scan, not an n-row one.

    Per-round shuffled bytes at 1e8 edges / 12.5M vids (float32):
    ~580 MB of partials + ~100 MB of state vs the sparse tier's ~930 MB
    of partial rows + ~350 MB state join traffic — and zero hash
    aggregation on the hot path. At 10^12-file scale the state stays
    viable (1e10 vids × 8 B = 80 GB spread over P chunks); the sparse
    tier remains for graphs without dense ids.
    """
    spark = graph.edges.sparkSession
    p = num_blocks or spark.sparkContext.defaultParallelism
    n = graph.vertices.count()
    if n == 0:
        return spark.createDataFrame([], "vid long, value double")
    if n // p >= 2**31:
        raise ValueError("chunk longer than 2^31 — raise num_blocks")

    use_f32 = rank_dtype == "float32"
    np_val = np.float32 if use_f32 else np.float64
    sql_val = "float" if use_f32 else "double"
    partial_sql = f"bid int, pos array<int>, psum array<{sql_val}>"
    partial_schema = pa.schema(
        [("bid", pa.int32()), ("pos", pa.list_(pa.int32())),
         ("psum", pa.list_(pa.from_numpy_dtype(np_val)))]
    )
    state_sql = f"bid int, deg array<int>, rank array<{sql_val}>, l1p double, dgp double"

    blocks = build_csr_blocks(graph.edges, p).persist()
    global LAST_PARTIAL_ROWS
    LAST_PARTIAL_ROWS = int(
        blocks.select(F.size("udst").alias("k")).agg(F.sum("k")).first()[0] or 0
    )

    out_deg = graph.edges.groupBy("src").agg(F.count("*").alias("deg"))
    rows0 = (
        graph.vertices.select("vid")
        .join(out_deg.withColumnRenamed("src", "vid"), "vid", "left")
        .select("vid", F.coalesce("deg", F.lit(0)).cast("int").alias("deg"))
    )

    def _chunk_len(c: int) -> int:
        return (n - c + p - 1) // p if c < n else 0

    r0 = 1.0 / n

    def _to_chunks(tbl: pa.Table) -> pa.Table:
        c = int(tbl.column("bid")[0].as_py())
        n_c = _chunk_len(c)
        vids = _np_col(tbl, "vid", np.int64)
        deg = _np_col(tbl, "deg", np.int32)
        pos = vids // p
        if len(vids) != n_c or (len(pos) and pos.max() >= n_c) or len(
            np.unique(pos)
        ) != len(pos):
            raise ValueError(
                "pagerank_csr_dense requires the dense 0..n-1 vid space "
                "(assign_dense_ids); chunk %d got %d/%d vids" % (c, len(vids), n_c)
            )
        darr = np.zeros(n_c, dtype=np.int32)
        darr[pos] = deg
        # dgp = this chunk's dangling rank sum, so the lazy driver-side
        # dangling init below reads the SAME quantity from a fresh round-0
        # state and from a checkpoint-restored round-k state alike
        return pa.table(
            {
                "bid": pa.array([c], pa.int32()),
                "deg": _multi_row_list([darr], pa.int32()),
                "rank": _multi_row_list(
                    [np.full(n_c, r0, dtype=np_val)], pa.from_numpy_dtype(np_val)
                ),
                "l1p": pa.array([0.0], pa.float64()),
                "dgp": pa.array([float(r0 * int((darr == 0).sum()))], pa.float64()),
            }
        )

    state0 = (
        rows0.withColumn("bid", F.pmod(F.col("vid"), F.lit(p)).cast("int"))
        .groupBy("bid")
        .applyInArrow(_to_chunks, schema=state_sql)
    )
    # Lazy: first step reads sum(dgp) off the CURRENT state, so a
    # checkpoint-restored round-k state seeds the correct mass (the
    # sparse tier's resume-safe pattern; eager round-0 init here was a
    # one-round perturbation after every resume).
    dangling: dict = {"mass": None}

    def _scatter(state_tbl: pa.Table, block_tbl: pa.Table) -> pa.Table:
        if state_tbl.num_rows == 0 or block_tbl.num_rows == 0:
            return partial_schema.empty_table()
        deg = np.asarray(
            state_tbl.column("deg").combine_chunks().flatten(), dtype=np.float64
        )
        rank = np.asarray(
            state_tbl.column("rank").combine_chunks().flatten(), dtype=np.float64
        )
        contrib = np.divide(rank, deg, out=np.zeros_like(rank), where=deg > 0)
        bids, poss, psums = [], [], []
        for us, indptr, udst, dst_idx in _iter_blocks(block_tbl):
            # edges referencing vids outside 0..n-1 contribute/receive
            # nothing (mirror of the sparse tier's _gather fill)
            idx = us // p
            ok = idx < len(contrib)
            src_vals = np.where(ok, contrib[np.minimum(idx, max(len(contrib) - 1, 0))], 0.0)
            per_edge = np.repeat(src_vals, np.diff(indptr))
            block_psum = np.bincount(dst_idx, weights=per_edge, minlength=len(udst))
            out_c = udst % p
            dst_ok = udst < n
            for c in range(p):
                m = (out_c == c) & dst_ok
                if not m.any():
                    continue
                bids.append(c)
                poss.append((udst[m] // p).astype(np.int32))
                psums.append(block_psum[m].astype(np_val, copy=False))
        if not bids:
            return partial_schema.empty_table()
        return pa.table(
            {
                "bid": pa.array(np.array(bids, dtype=np.int32), pa.int32()),
                "pos": _multi_row_list(poss, pa.int32()),
                "psum": _multi_row_list(psums, pa.from_numpy_dtype(np_val)),
            }
        )

    def step(state: DataFrame, rnd: int) -> tuple[DataFrame, dict]:
        if dangling["mass"] is None:
            dangling["mass"] = (
                state.agg(F.sum("dgp")).first()[0] or 0.0
            ) * alpha
        base = (1.0 - alpha) / n + dangling["mass"] / n

        partials = state.groupBy("bid").cogroup(blocks.groupBy("bid")).applyInArrow(
            _scatter, schema=partial_sql
        )

        def _reduce(part_tbl: pa.Table, state_tbl: pa.Table) -> pa.Table:
            # state chunks cover every populated bid; partial-only groups
            # cannot occur (partials only target chunks blocks point into)
            if state_tbl.num_rows == 0:
                return pa.schema(
                    [("bid", pa.int32()), ("deg", pa.list_(pa.int32())),
                     ("rank", pa.list_(pa.from_numpy_dtype(np_val))),
                     ("l1p", pa.float64()), ("dgp", pa.float64())]
                ).empty_table()
            c = int(state_tbl.column("bid")[0].as_py())
            deg = np.asarray(
                state_tbl.column("deg").combine_chunks().flatten(), dtype=np.int32
            )
            old = np.asarray(
                state_tbl.column("rank").combine_chunks().flatten(), dtype=np.float64
            )
            acc = np.zeros(len(old), dtype=np.float64)
            pos_col = part_tbl.column("pos").combine_chunks() if part_tbl.num_rows else None
            val_col = part_tbl.column("psum").combine_chunks() if part_tbl.num_rows else None
            for i in range(part_tbl.num_rows):
                pos = np.asarray(pos_col.slice(i, 1).flatten(), dtype=np.int64)
                vals = np.asarray(val_col.slice(i, 1).flatten(), dtype=np.float64)
                acc[pos] += vals  # positions unique within one partial
            new = alpha * acc + base
            l1p = float(np.abs(new - old).sum())
            dgp = float(new[deg == 0].sum())
            return pa.table(
                {
                    "bid": pa.array([c], pa.int32()),
                    "deg": _multi_row_list([deg], pa.int32()),
                    "rank": _multi_row_list(
                        [new.astype(np_val, copy=False)], pa.from_numpy_dtype(np_val)
                    ),
                    "l1p": pa.array([l1p], pa.float64()),
                    "dgp": pa.array([dgp], pa.float64()),
                }
            )

        new_state = (
            partials.groupBy("bid")
            .cogroup(state.groupBy("bid"))
            .applyInArrow(_reduce, schema=state_sql)
            .persist()
        )
        row = new_state.agg(
            F.sum("l1p").alias("l1"), F.sum("dgp").alias("dg")
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
    out = (
        result.state.select("bid", F.posexplode("rank"))
        .select(
            (F.col("pos").cast("long") * p + F.col("bid")).alias("vid"),
            F.col("col").cast("double").alias("value"),
        )
    )
    blocks.unpersist()
    return out


_WCC_PARTIAL_SCHEMA = pa.schema([("dst", pa.int64()), ("plabel", pa.int64())])


def wcc_csr(
    graph: LinkGraph,
    max_rounds: int = 200,
    num_blocks: int | None = None,
    checkpoint_dir: str | None = None,
    packed: bool = True,
    init_labels: DataFrame | None = None,
    frontier: DataFrame | None = None,
) -> DataFrame:
    """WCC (min-label propagation, §2.4) on the CSR fast tier.

    The undirected closure is block-compacted once; each round gathers
    labels, scatters per-block **minima** (np.minimum.at on the compacted
    dst dictionary), and a global ``groupBy(dst).min`` finishes. Exact
    same fixpoint as :func:`linkgraph.algorithms.wcc`.

    **Incremental warm start** (edge APPENDS only — components can only
    merge, so old labels are valid upper bounds on the new min-labels):
    pass ``init_labels`` = the previous run's (vid, value) output and
    ``frontier`` = BOTH endpoints of every appended edge — the side
    holding the smaller label must push it across the new edge, and
    either side may be the holder, so one-sided frontiers deadlock a
    merge. Min-propagation from that frontier reaches the exact merged
    fixpoint; vertices absent from ``init_labels`` (new arrivals) start
    at their own vid.
    With ``init_labels`` but no ``frontier``, every vertex re-propagates
    once (correct fallback for unknown deltas).
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

    if init_labels is None:
        state0 = graph.vertices.select(
            "vid", F.col("vid").alias("label"), F.lit(True).alias("changed")
        )
    else:
        l0 = init_labels.select("vid", F.col(init_labels.columns[1]).alias("_l0"))
        st = graph.vertices.select("vid").join(l0, "vid", "left")
        label = F.coalesce("_l0", F.col("vid"))
        if frontier is None:
            state0 = st.select("vid", label.alias("label"), F.lit(True).alias("changed"))
        else:
            fr = (
                frontier.select(F.col(frontier.columns[0]).alias("vid"))
                .distinct()
                .withColumn("_fr", F.lit(True))
            )
            state0 = st.join(fr, "vid", "left").select(
                "vid",
                label.alias("label"),
                F.coalesce("_fr", F.lit(False)).alias("changed"),
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

    _WCC_PACKED_SCHEMA = pa.schema(
        [("tgt", pa.int32()), ("dsts", pa.list_(pa.int64())), ("plabels", pa.list_(pa.int64()))]
    )

    def _partials_packed(state_tbl: pa.Table, block_tbl: pa.Table) -> pa.Table:
        """Packed emission (r4 lever, as in pagerank/cdlp): WCC's round 1
        moves one (dst, plabel) minimum per (block, reachable-dst) — the
        frontier is every vertex, so packing kills the per-row overhead
        exactly when the shuffle is largest; later rounds shrink with the
        frontier either way."""
        raw = _partials(state_tbl, block_tbl)
        if raw.num_rows == 0:
            return _WCC_PACKED_SCHEMA.empty_table()
        all_d = raw.column("dst").to_numpy(zero_copy_only=False)
        all_l = raw.column("plabel").to_numpy(zero_copy_only=False)
        tgt, off, order = _pack_by_tgt(all_d, p)
        return pa.table(
            {
                "tgt": tgt,
                "dsts": pa.ListArray.from_arrays(off, pa.array(all_d[order], pa.int64())),
                "plabels": pa.ListArray.from_arrays(off, pa.array(all_l[order], pa.int64())),
            }
        )

    def _update(state_tbl: pa.Table, packed_tbl: pa.Table) -> pa.Table:
        """Per-dst min over packed partials + least/changed merge —
        integer-exact, identical to the hash-agg + join path."""
        if state_tbl.num_rows == 0:
            return pa.schema(
                [("vid", pa.int64()), ("label", pa.int64()), ("changed", pa.bool_())]
            ).empty_table()
        vids = _np_col(state_tbl, "vid", np.int64)
        labels = _np_col(state_tbl, "label", np.int64)
        incoming = np.full(len(vids), imax, dtype=np.int64)
        if packed_tbl.num_rows:
            d = (
                packed_tbl.column("dsts").combine_chunks().flatten()
                .to_numpy(zero_copy_only=False)
            )
            l = (
                packed_tbl.column("plabels").combine_chunks().flatten()
                .to_numpy(zero_copy_only=False)
            )
            if len(d):
                idx, ok = _scatter_positions(vids, d)
                np.minimum.at(incoming, idx, l[ok])
        new_labels = np.minimum(labels, incoming)
        changed = incoming < labels
        return pa.table(
            {
                "vid": pa.array(vids, pa.int64()),
                "label": pa.array(new_labels, pa.int64()),
                "changed": pa.array(changed),
            }
        )

    def step(state: DataFrame, rnd: int) -> tuple[DataFrame, dict]:
        st_keyed = state.withColumn("bid", F.pmod(F.col("vid"), F.lit(p)).cast("int"))
        if packed:
            parts = st_keyed.groupBy("bid").cogroup(blocks.groupBy("bid")).applyInArrow(
                _partials_packed,
                schema="tgt int, dsts array<long>, plabels array<long>",
            )
            new_state = (
                st_keyed.groupBy("bid")
                .cogroup(parts.groupBy("tgt"))
                .applyInArrow(_update, schema="vid long, label long, changed boolean")
                .persist()
            )
        else:
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


# ---------------- weighted blocks + SSSP/BFS on the fast tier ----------------

WBLOCK_SCHEMA = (
    "bid int, n_edges long, us array<long>, indptr array<long>, "
    "udst array<long>, dst_idx array<int>, w array<double>"
)

_SSSP_PARTIAL_SCHEMA = pa.schema([("dst", pa.int64()), ("pdist", pa.float64())])


def build_csr_blocks_weighted(
    edges: DataFrame, num_blocks: int, weight_col: str | None = None
) -> DataFrame:
    """:func:`build_csr_blocks` with a per-edge weight array riding each
    block (aligned with the src-sorted edge order the CSR uses).
    ``weight_col=None`` stores unit weights — BFS is SSSP over them."""
    wcol = (
        F.col(weight_col).cast("double").alias("w")
        if weight_col
        else F.lit(1.0).alias("w")
    )
    e = edges.select(
        F.col("src"), F.col("dst"), wcol,
        F.pmod(F.col("src"), F.lit(num_blocks)).cast("int").alias("bid"),
    ).repartition(num_blocks, "bid")

    def _build(batches):
        acc: dict[int, tuple[list, list, list]] = {}
        for batch in batches:
            src = batch.column(0).to_numpy(zero_copy_only=False)
            dst = batch.column(1).to_numpy(zero_copy_only=False)
            w = batch.column(2).to_numpy(zero_copy_only=False)
            bids = batch.column(3).to_numpy(zero_copy_only=False)
            for b in np.unique(bids):
                m = bids == b
                buf = acc.setdefault(int(b), ([], [], []))
                buf[0].append(src[m])
                buf[1].append(dst[m])
                buf[2].append(w[m])
        for bid, (srcs, dsts, ws) in acc.items():
            src = np.concatenate(srcs).astype(np.int64, copy=False)
            dst = np.concatenate(dsts).astype(np.int64, copy=False)
            w = np.concatenate(ws).astype(np.float64, copy=False)
            order = np.argsort(src, kind="stable")
            src, dst, w = src[order], dst[order], w[order]
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
                    "w": _one_row_list(w, pa.float64()),
                }
            )

    # same pre-persist re-hash as build_csr_blocks: cache the blocks
    # already laid out for the per-round cogroup, zero per-round Exchange
    return e.mapInArrow(_build, schema=WBLOCK_SCHEMA).repartition(num_blocks, "bid")


def _iter_wblocks(block_tbl: pa.Table):
    cols = [
        block_tbl.column(c).combine_chunks()
        for c in ("us", "indptr", "udst", "dst_idx", "w")
    ]
    dtypes = (np.int64, np.int64, np.int64, np.int32, np.float64)
    for i in range(block_tbl.num_rows):
        yield tuple(
            np.asarray(c.slice(i, 1).flatten()).astype(t, copy=False)
            for c, t in zip(cols, dtypes)
        )


def sssp_csr(
    graph: LinkGraph,
    src: int,
    weight_col: str | None = "weight",
    max_rounds: int = 10_000,
    num_blocks: int | None = None,
    checkpoint_dir: str | None = None,
    packed: bool = True,
    init_dists: DataFrame | None = None,
    frontier: DataFrame | None = None,
) -> DataFrame:
    """SSSP (and BFS via unit weights) on the CSR fast tier.

    Same label-correcting fixpoint as
    :func:`linkgraph.algorithms.traversal.sssp` — per round, only
    *changed* sources relax; per-block minima (np.minimum.at over the
    compacted dst dictionary) shuffle instead of per-edge candidates, and
    a global ``groupBy(dst).min`` finishes. ≤P partial rows per
    destination regardless of in-degree — the same heavy-hitter bound
    the PageRank tier has. Unreachable → -1.0, as the join tier reports.

    **Incremental warm start** (edge APPENDS only — old distances stay
    valid upper bounds because added edges can only shorten paths):
    pass ``init_dists`` = the previous run's (vid, value) output (its
    -1.0 unreachable marker maps back to +inf) and ``frontier`` = the
    src endpoints of the appended edges. Label correcting from that
    frontier reaches the exact full-graph fixpoint (induction on the
    number of new edges on a shortest path: cascaded improvements
    re-mark their vertex changed), and each path's float sum is the
    same left-to-right fold either way, so the result is bit-identical
    to a cold run — not approximately equal. With ``init_dists`` but no
    ``frontier``, every finite-dist vertex re-relaxes (a correct, more
    expensive fallback for unknown deltas).
    """
    spark = graph.edges.sparkSession
    p = num_blocks or spark.sparkContext.defaultParallelism
    wname = weight_col if (weight_col and weight_col in graph.edges.columns) else None
    blocks = build_csr_blocks_weighted(graph.edges, p, wname).persist()
    blocks.count()

    inf = float("inf")
    if init_dists is None:
        state0 = graph.vertices.select(
            "vid",
            F.when(F.col("vid") == src, F.lit(0.0)).otherwise(F.lit(inf)).alias("dist"),
            (F.col("vid") == src).alias("changed"),
        )
    else:
        d0 = init_dists.select(
            "vid", F.col(init_dists.columns[1]).alias("_d0")
        )
        dist = F.when(F.col("vid") == src, F.lit(0.0)).otherwise(
            F.when(F.col("_d0") >= 0, F.col("_d0")).otherwise(F.lit(inf))
        )
        st = graph.vertices.select("vid").join(d0, "vid", "left")
        if frontier is None:
            state0 = st.select("vid", dist.alias("dist"), (dist < inf).alias("changed"))
        else:
            fr = (
                frontier.select(F.col(frontier.columns[0]).alias("vid"))
                .distinct()
                .withColumn("_fr", F.lit(True))
            )
            state0 = st.join(fr, "vid", "left").select(
                "vid",
                dist.alias("dist"),
                (F.coalesce("_fr", F.lit(False)) & (dist < inf)).alias("changed"),
            )

    def _partials(state_tbl: pa.Table, block_tbl: pa.Table) -> pa.Table:
        if state_tbl.num_rows == 0 or block_tbl.num_rows == 0:
            return _SSSP_PARTIAL_SCHEMA.empty_table()
        changed = _np_col(state_tbl, "changed", np.bool_)
        if not changed.any():
            return _SSSP_PARTIAL_SCHEMA.empty_table()
        vids = _np_col(state_tbl, "vid", np.int64)[changed]
        dists = _np_col(state_tbl, "dist", np.float64)[changed]
        outs_d, outs_p = [], []
        for us, indptr, udst, dst_idx, w in _iter_wblocks(block_tbl):
            src_vals = _gather(vids, dists, us, np.inf)
            per_edge = np.repeat(src_vals, np.diff(indptr)) + w
            pmin = np.full(len(udst), np.inf, dtype=np.float64)
            np.minimum.at(pmin, dst_idx, per_edge)
            mask = np.isfinite(pmin)
            outs_d.append(udst[mask])
            outs_p.append(pmin[mask])
        if not outs_d:
            return _SSSP_PARTIAL_SCHEMA.empty_table()
        return pa.table(
            {
                "dst": pa.array(np.concatenate(outs_d), pa.int64()),
                "pdist": pa.array(np.concatenate(outs_p), pa.float64()),
            }
        )

    _SSSP_PACKED_SCHEMA = pa.schema(
        [("tgt", pa.int32()), ("dsts", pa.list_(pa.int64())), ("pdists", pa.list_(pa.float64()))]
    )

    def _partials_packed(state_tbl: pa.Table, block_tbl: pa.Table) -> pa.Table:
        """Packed emission (r4 lever, as in pagerank/wcc/cdlp): min is
        order-free, so the packed path is float-exact vs the hash-agg
        path."""
        raw = _partials(state_tbl, block_tbl)
        if raw.num_rows == 0:
            return _SSSP_PACKED_SCHEMA.empty_table()
        all_d = raw.column("dst").to_numpy(zero_copy_only=False)
        all_p = raw.column("pdist").to_numpy(zero_copy_only=False)
        tgt, off, order = _pack_by_tgt(all_d, p)
        return pa.table(
            {
                "tgt": tgt,
                "dsts": pa.ListArray.from_arrays(off, pa.array(all_d[order], pa.int64())),
                "pdists": pa.ListArray.from_arrays(off, pa.array(all_p[order], pa.float64())),
            }
        )

    def _update(state_tbl: pa.Table, packed_tbl: pa.Table) -> pa.Table:
        if state_tbl.num_rows == 0:
            return pa.schema(
                [("vid", pa.int64()), ("dist", pa.float64()), ("changed", pa.bool_())]
            ).empty_table()
        vids = _np_col(state_tbl, "vid", np.int64)
        dists = _np_col(state_tbl, "dist", np.float64)
        cand = np.full(len(vids), np.inf, dtype=np.float64)
        if packed_tbl.num_rows:
            d = (
                packed_tbl.column("dsts").combine_chunks().flatten()
                .to_numpy(zero_copy_only=False)
            )
            pd_ = (
                packed_tbl.column("pdists").combine_chunks().flatten()
                .to_numpy(zero_copy_only=False)
            )
            if len(d):
                idx, ok = _scatter_positions(vids, d)
                np.minimum.at(cand, idx, pd_[ok])
        new_dist = np.minimum(dists, cand)
        changed = cand < dists
        return pa.table(
            {
                "vid": pa.array(vids, pa.int64()),
                "dist": pa.array(new_dist, pa.float64()),
                "changed": pa.array(changed),
            }
        )

    def step(state: DataFrame, rnd: int) -> tuple[DataFrame, dict]:
        st_keyed = state.withColumn("bid", F.pmod(F.col("vid"), F.lit(p)).cast("int"))
        if packed:
            parts = st_keyed.groupBy("bid").cogroup(blocks.groupBy("bid")).applyInArrow(
                _partials_packed,
                schema="tgt int, dsts array<long>, pdists array<double>",
            )
            new_state = (
                st_keyed.groupBy("bid")
                .cogroup(parts.groupBy("tgt"))
                .applyInArrow(_update, schema="vid long, dist double, changed boolean")
                .persist()
            )
        else:
            partials = st_keyed.groupBy("bid").cogroup(blocks.groupBy("bid")).applyInArrow(
                _partials, schema="dst long, pdist double"
            )
            msgs = partials.groupBy("dst").agg(F.min("pdist").alias("cand"))
            new_state = (
                state.join(msgs, state["vid"] == msgs["dst"], "left")
                .select(
                    state["vid"],
                    F.least(state["dist"], F.coalesce("cand", state["dist"])).alias("dist"),
                    (F.coalesce("cand", state["dist"]) < state["dist"]).alias("changed"),
                )
                .persist()
            )
        n = new_state.agg(F.sum(F.col("changed").cast("long"))).first()[0] or 0
        return new_state, {"changed": n}

    result = run_supersteps(
        state0,
        step,
        converged=lambda s: s["changed"] == 0,
        max_rounds=max_rounds,
        checkpoint_dir=checkpoint_dir,
    )
    out = result.state.select(
        "vid",
        F.when(F.col("dist") == inf, F.lit(-1.0)).otherwise(F.col("dist")).alias("value"),
    )
    blocks.unpersist()
    return out


# ---------------- CDLP / LPA on the fast tier ----------------

def _cdlp_partial_schema(pa_key):
    return pa.schema([("dst", pa_key), ("label", pa_key), ("pcnt", pa.int64())])


def cdlp_csr(
    graph: LinkGraph,
    max_round: int = 10,
    num_blocks: int | None = None,
    checkpoint_dir: str | None = None,
    packed: bool = True,
) -> DataFrame:
    """CDLP (LDBC semantics, exactly ``max_round`` rounds, most-frequent
    neighbor label with min-label tie-break) on the CSR fast tier.

    The neighbor multiset lives in the blocks as the bidirectional edge
    set **with multiplicities kept** (the join tier's ``bidir``). Per
    round each block gathers source labels, expands along the CSR, and
    run-length-encodes the lexsorted ``(dst, label)`` pairs — the
    map-side combine producing one partial row per distinct (dst, label)
    per block instead of one per edge. The global
    ``groupBy(dst, label).sum`` + algebraic ``max(struct(cnt, -label))``
    finish — no window, no sort, hub-safe (≤P partial rows per
    (dst, label) pair reach a reducer). Exact parity with
    :func:`linkgraph.algorithms.cdlp` is test-asserted.
    """
    spark = graph.edges.sparkSession
    p = num_blocks or spark.sparkContext.defaultParallelism
    e = graph.edges.select("src", "dst")
    bidir = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).where(F.col("src") != F.col("dst"))
    blocks = build_csr_blocks(bidir, p).persist()
    blocks.count()

    # labels are vids, so when the vid VALUES fit int32 the (dst, label)
    # partial keys both compact — round 1 is the worst round of any
    # algorithm on this tier (every vertex still owns a distinct label →
    # ~|E| partial pairs shuffle, zero run-length compression), and this
    # halves its key bytes. Same value-range (not count) rule as
    # pagerank_csr's compact_dst — gated on BOTH ends so negative vids
    # (which would wrap an int32 cast) stay on the int64 path.
    min_vid, max_vid = graph.vertices.agg(F.min("vid"), F.max("vid")).first()
    min_vid, max_vid = (min_vid or 0), (max_vid or 0)
    compact = 0 <= min_vid and max_vid < 2**31 - 1
    np_key = np.int32 if compact else np.int64
    pa_key = pa.int32() if compact else pa.int64()
    sql_key = "int" if compact else "long"
    partial_schema = _cdlp_partial_schema(pa_key)

    state0 = graph.vertices.select("vid", F.col("vid").alias("label"))

    def _partials(state_tbl: pa.Table, block_tbl: pa.Table) -> pa.Table:
        if state_tbl.num_rows == 0 or block_tbl.num_rows == 0:
            return partial_schema.empty_table()
        vids = _np_col(state_tbl, "vid", np.int64)
        labels = _np_col(state_tbl, "label", np.int64)
        outs_d, outs_l, outs_c = [], [], []
        imin = np.iinfo(np.int64).min  # non-vid sentinel: labels are vids and
        # vids may legitimately be negative, so -1 cannot mark "missing"
        for us, indptr, udst, dst_idx in _iter_blocks(block_tbl):
            src_label = _gather(vids, labels, us, imin)
            per_edge = np.repeat(src_label, np.diff(indptr))
            ok = per_edge != imin  # sources missing from state contribute nothing
            d, l = dst_idx[ok], per_edge[ok]
            if not len(d):
                continue
            order = np.lexsort((l, d))
            d, l = d[order], l[order]
            # run-length encode consecutive equal (dst, label) pairs
            new_run = np.empty(len(d), dtype=bool)
            new_run[0] = True
            np.logical_or(d[1:] != d[:-1], l[1:] != l[:-1], out=new_run[1:])
            starts = np.flatnonzero(new_run)
            cnts = np.diff(np.append(starts, len(d)))
            outs_d.append(udst[d[starts]])
            outs_l.append(l[starts])
            outs_c.append(cnts.astype(np.int64, copy=False))
        if not outs_d:
            return partial_schema.empty_table()
        return pa.table(
            {
                "dst": pa.array(np.concatenate(outs_d).astype(np_key, copy=False), pa_key),
                "label": pa.array(np.concatenate(outs_l).astype(np_key, copy=False), pa_key),
                "pcnt": pa.array(np.concatenate(outs_c), pa.int64()),
            }
        )

    packed_schema = pa.schema(
        [
            ("tgt", pa.int32()),
            ("dsts", pa.list_(pa_key)),
            ("labels", pa.list_(pa_key)),
            ("pcnts", pa.list_(pa.int64())),
        ]
    )

    def _partials_packed(state_tbl: pa.Table, block_tbl: pa.Table) -> pa.Table:
        """Packed emission (r4, same lever as pagerank_csr): the
        run-length (dst, label, pcnt) partials ride as Arrow lists in one
        row per destination partition — CDLP round 1 moves ~|E| partial
        pairs (zero run-length compression while every vertex owns a
        distinct label), so killing the per-pair UnsafeRow overhead and
        the hash-agg/join shuffles bites exactly where this tier is
        slowest (BENCH/tier_algos.jsonl: round 1 = 43 % of the 5-round
        1e8-edge run)."""
        raw = _partials(state_tbl, block_tbl)
        if raw.num_rows == 0:
            return packed_schema.empty_table()
        all_d = raw.column("dst").to_numpy(zero_copy_only=False)
        all_l = raw.column("label").to_numpy(zero_copy_only=False)
        all_c = raw.column("pcnt").to_numpy(zero_copy_only=False)
        tgt, off, order = _pack_by_tgt(all_d, p)
        return pa.table(
            {
                "tgt": tgt,
                "dsts": pa.ListArray.from_arrays(off, pa.array(all_d[order], pa_key)),
                "labels": pa.ListArray.from_arrays(off, pa.array(all_l[order], pa_key)),
                "pcnts": pa.ListArray.from_arrays(off, pa.array(all_c[order], pa.int64())),
            }
        )

    def _update(state_tbl: pa.Table, packed_tbl: pa.Table) -> pa.Table:
        """Merge packed partials and pick each destination's dominant
        label — integer-exact, identical tie-break (max count, then min
        label) to the hash-agg path, so the packed tier stays
        oracle-hash-identical."""
        if state_tbl.num_rows == 0:
            return pa.schema([("vid", pa.int64()), ("label", pa.int64())]).empty_table()
        vids = _np_col(state_tbl, "vid", np.int64)
        labels = _np_col(state_tbl, "label", np.int64)
        new_labels = labels.copy()
        if packed_tbl.num_rows:
            d = (
                packed_tbl.column("dsts").combine_chunks().flatten()
                .to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            )
            l = (
                packed_tbl.column("labels").combine_chunks().flatten()
                .to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            )
            c = (
                packed_tbl.column("pcnts").combine_chunks().flatten()
                .to_numpy(zero_copy_only=False)
            )
            if len(d):
                # sum counts per (dst, label) run
                order = np.lexsort((l, d))
                d, l, c = d[order], l[order], c[order]
                new_run = np.empty(len(d), dtype=bool)
                new_run[0] = True
                np.logical_or(d[1:] != d[:-1], l[1:] != l[:-1], out=new_run[1:])
                starts = np.flatnonzero(new_run)
                csum = np.add.reduceat(c, starts)
                dd, ll = d[starts], l[starts]
                # per dst: max count, ties -> smallest label (sort by
                # (dst asc, count desc, label asc), take first per dst)
                order2 = np.lexsort((ll, -csum, dd))
                dd2 = dd[order2]
                first = np.empty(len(dd2), dtype=bool)
                first[0] = True
                np.not_equal(dd2[1:], dd2[:-1], out=first[1:])
                win_d, win_l = dd2[first], ll[order2][first]
                # align winners to this partition's vids (sorted lookup)
                idx, ok = _scatter_positions(vids, win_d)
                new_labels[idx] = win_l[ok]
        return pa.table(
            {"vid": pa.array(vids, pa.int64()), "label": pa.array(new_labels, pa.int64())}
        )

    def step(state: DataFrame, rnd: int) -> tuple[DataFrame, dict]:
        st_keyed = state.withColumn("bid", F.pmod(F.col("vid"), F.lit(p)).cast("int"))
        if packed:
            parts = st_keyed.groupBy("bid").cogroup(blocks.groupBy("bid")).applyInArrow(
                _partials_packed,
                schema=(
                    f"tgt int, dsts array<{sql_key}>, labels array<{sql_key}>,"
                    " pcnts array<long>"
                ),
            )
            new_state = (
                st_keyed.groupBy("bid")
                .cogroup(parts.groupBy("tgt"))
                .applyInArrow(_update, schema="vid long, label long")
                .persist()
            )
        else:
            partials = st_keyed.groupBy("bid").cogroup(blocks.groupBy("bid")).applyInArrow(
                _partials, schema=f"dst {sql_key}, label {sql_key}, pcnt long"
            )
            counts = partials.groupBy("dst", "label").agg(F.sum("pcnt").alias("cnt"))
            best = counts.groupBy("dst").agg(
                F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("neg"))).alias("top")
            ).select("dst", (-F.col("top.neg")).alias("new_label"))
            new_state = (
                state.join(best, state["vid"] == best["dst"], "left")
                .select(
                    state["vid"],
                    F.coalesce("new_label", state["label"]).alias("label"),
                )
                .persist()
            )
        new_state.count()
        return new_state, {}

    result = run_supersteps(
        state0,
        step,
        converged=lambda s: False,  # LDBC: exactly max_round rounds
        max_rounds=max_round,
        checkpoint_dir=checkpoint_dir,
    )
    out = result.state.select("vid", F.col("label").alias("value"))
    blocks.unpersist()
    return out


def ppr_batch_csr(
    graph: LinkGraph,
    seeds: DataFrame,
    alpha: float = 0.85,
    max_iter: int = 100,
    tol: float | None = 1e-06,
    num_blocks: int | None = None,
    checkpoint_dir: str | None = None,
    rank_dtype: str = "float64",
) -> DataFrame:
    """Batched multi-seed personalized PageRank on the CSR tier.

    ``seeds`` is ``(seed:int, vid:long, weight:double)`` with seed ids
    ``0..k-1`` — k personalization vectors, each normalized internally.
    Per column the math is exactly
    :func:`linkgraph.algorithms.pagerank_nx` with ``personalization=``
    (nx semantics: teleport AND dangling mass land on the seed vector;
    reference wraps the same nx contract,
    python/graphscope/analytical/app/pagerank.py:61-99) — validated
    column-by-column against the single-seed runs in tests. Returns
    ``(vid, seed, value)``.

    Why batch: GNN/recsys pipelines (PPRGo-style neighborhood weighting,
    seeded relevance for samplers) need PPR from MANY seed sets over the
    SAME graph. k sequential runs read the edge topology k times per
    converged round; here the per-vertex state rides as one
    ``array<k>`` and each CSR block is gathered ONCE per round for all k
    columns — the edge-sized term (the one that matters at 10^8+ edges)
    is paid once, only the k-wide value payload scales. Partials ship
    packed (one Arrow-list row per destination partition, row-major
    ``k·|dsts|`` value payload), the same single-state-exchange shuffle
    shape as :func:`pagerank_csr` ``packed=True``. Per-round dangling
    masses and L1 deltas for all k columns come from ONE narrow
    ``posexplode`` aggregate (map-side combined to k rows per partition).

    ``tol=None`` runs exactly ``max_iter`` rounds (fixed-round oracle
    mode); otherwise stop when every column's L1 < tol·n.
    """
    spark = graph.edges.sparkSession
    p = num_blocks or spark.sparkContext.defaultParallelism
    n = graph.vertices.count()
    if n == 0:
        return spark.createDataFrame([], "vid long, seed int, value double")

    krow = seeds.agg(
        F.max("seed").alias("mx"), F.min("seed").alias("mn"),
        F.countDistinct("seed").alias("c"),
    ).first()
    if krow["c"] is None or krow["c"] == 0:
        raise ValueError("ppr_batch_csr: seeds is empty")
    k = int(krow["mx"]) + 1
    if krow["mn"] < 0 or krow["c"] != k:
        raise ValueError(
            f"ppr_batch_csr: seed ids must be contiguous 0..k-1, got "
            f"min={krow['mn']} max={krow['mx']} distinct={krow['c']}"
        )

    use_f32 = rank_dtype == "float32"
    np_val = np.float32 if use_f32 else np.float64
    sql_val = "float" if use_f32 else "double"
    min_vid, max_vid = graph.vertices.agg(F.min("vid"), F.max("vid")).first()
    min_vid, max_vid = (min_vid or 0), (max_vid or 0)
    compact_dst = 0 <= min_vid and max_vid < 2**31 - 1
    np_dst = np.int32 if compact_dst else np.int64
    pa_dst = pa.int32() if compact_dst else pa.int64()
    sql_dst = "int" if compact_dst else "long"

    blocks = build_csr_blocks(graph.edges, p).persist()

    # per-seed normalization, then one array<k> per vertex (absent → 0)
    totals = seeds.groupBy("seed").agg(F.sum("weight").alias("tot"))
    if totals.where((F.col("tot").isNull()) | (F.col("tot") <= 0)).limit(1).count():
        raise ValueError("ppr_batch_csr: every seed needs positive total weight")
    pmap = (
        seeds.join(totals, "seed")
        .select(
            "vid",
            F.col("seed").cast("int").alias("seed"),
            (F.col("weight") / F.col("tot")).alias("w"),
        )
        .groupBy("vid")
        .agg(F.map_from_entries(F.collect_list(F.struct("seed", "w"))).alias("m"))
    )
    seq = F.sequence(F.lit(0), F.lit(k - 1))
    out_deg = graph.edges.groupBy("src").agg(F.count("*").alias("deg"))
    state0 = (
        graph.vertices.select("vid")
        .join(out_deg.withColumnRenamed("src", "vid"), "vid", "left")
        .join(pmap, "vid", "left")
        .select(
            "vid",
            F.coalesce("deg", F.lit(0)).cast("int").alias("deg"),
            F.transform(
                seq, lambda j: F.coalesce(F.element_at("m", j), F.lit(0.0))
            ).cast(f"array<{sql_val}>").alias("pvec"),
            F.transform(seq, lambda j: F.lit(1.0 / n)).cast(
                f"array<{sql_val}>"
            ).alias("ranks"),
        )
    )

    def _mat(tbl: pa.Table, name: str, rows: int) -> np.ndarray:
        """array<k> column → (rows, k) float64 matrix (row-major)."""
        flat = (
            tbl.column(name).combine_chunks().flatten()
            .to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
        )
        return flat.reshape(rows, k)

    packed_schema_str = f"tgt int, dsts array<{sql_dst}>, psums array<{sql_val}>"

    def _partials_packed(state_tbl: pa.Table, block_tbl: pa.Table) -> pa.Table:
        empty = pa.schema(
            [("tgt", pa.int32()), ("dsts", pa.list_(pa_dst)),
             ("psums", pa.list_(pa.from_numpy_dtype(np_val)))]
        ).empty_table()
        if state_tbl.num_rows == 0 or block_tbl.num_rows == 0:
            return empty
        vids = _np_col(state_tbl, "vid", np.int64)
        deg = _np_col(state_tbl, "deg", np.float64)
        ranks = _mat(state_tbl, "ranks", state_tbl.num_rows)
        contrib = np.divide(
            ranks, deg[:, None], out=np.zeros_like(ranks), where=deg[:, None] > 0
        )
        # matrix gather aligned to each block's us (sorted-lookup, closure-guarded)
        order = np.argsort(vids, kind="stable")
        sv, sc = vids[order], contrib[order]
        outs_d, outs_p = [], []
        for us, indptr, udst, dst_idx in _iter_blocks(block_tbl):
            pos = np.searchsorted(sv, us)
            safe = np.minimum(pos, len(sv) - 1)
            active = (pos < len(sv)) & (sv[safe] == us)
            src_rows = sc[safe]
            src_rows[~active] = 0.0
            counts = np.diff(indptr)
            acc = np.empty((len(udst), k), np.float64)
            # expand + combine ONE column at a time: peak transient stays
            # E floats instead of E×k (the E×k matrix thrashed GC at
            # k=16 × 8e7 edges), and k bincounts beat one 2-D np.add.at
            for j in range(k):
                per_edge_j = np.repeat(src_rows[:, j], counts)
                acc[:, j] = np.bincount(
                    dst_idx, weights=per_edge_j, minlength=len(udst)
                )
            outs_d.append(udst.astype(np_dst, copy=False))
            outs_p.append(acc)
        all_d = np.concatenate(outs_d)
        if not len(all_d):
            return empty
        all_p = np.concatenate(outs_p)
        tgt, off, order2 = _pack_by_tgt(all_d, p)
        off_np = np.asarray(off).astype(np.int64)
        if off_np[-1] * k >= 2**31:
            # Arrow ListArray offsets are int32 (Spark's applyInArrow
            # interchange requires the non-Large list layout): scaling by
            # k must not overflow.  Loud failure beats silent corruption;
            # remedy is a larger block count p (smaller per-bid groups).
            raise OverflowError(
                f"ppr_batch_csr: packed psums value count {off_np[-1] * k} "
                f"exceeds int32 Arrow offsets — raise the block count p "
                f"(currently {p}) or lower k (currently {k})"
            )
        p_off = pa.array((off_np * k).astype(np.int32), pa.int32())
        return pa.table(
            {
                "tgt": tgt,
                "dsts": pa.ListArray.from_arrays(off, pa.array(all_d[order2], pa_dst)),
                "psums": pa.ListArray.from_arrays(
                    p_off,
                    pa.array(all_p[order2].reshape(-1).astype(np_val, copy=False)),
                ),
            }
        )

    state_schema_str = (
        f"vid long, deg int, pvec array<{sql_val}>, ranks array<{sql_val}>, "
        f"prev array<{sql_val}>"
    )
    pa_val = pa.from_numpy_dtype(np_val)

    def _emit_mat(m: np.ndarray) -> pa.ListArray:
        rows = m.shape[0]
        if rows * k >= 2**31:
            raise OverflowError(
                f"ppr_batch_csr: state batch of {rows} rows × k={k} exceeds "
                f"int32 Arrow list offsets — raise the block count p"
            )
        off = pa.array(np.arange(rows + 1, dtype=np.int64) * k, pa.int32())
        return pa.ListArray.from_arrays(
            off, pa.array(m.reshape(-1).astype(np_val, copy=False), pa_val)
        )

    def _make_update(dang: np.ndarray):
        base_scale = (1.0 - alpha) + dang  # (k,) — multiplies pvec per column

        def _update(state_tbl: pa.Table, packed_tbl: pa.Table) -> pa.Table:
            if state_tbl.num_rows == 0:
                return pa.schema(
                    [("vid", pa.int64()), ("deg", pa.int32()),
                     ("pvec", pa.list_(pa_val)), ("ranks", pa.list_(pa_val)),
                     ("prev", pa.list_(pa_val))]
                ).empty_table()
            nrows = state_tbl.num_rows
            vids = _np_col(state_tbl, "vid", np.int64)
            deg = _np_col(state_tbl, "deg", np.int32)
            pvec = _mat(state_tbl, "pvec", nrows)
            prev = _mat(state_tbl, "ranks", nrows)
            msum = np.zeros((nrows, k), np.float64)
            if packed_tbl.num_rows:
                all_d = (
                    packed_tbl.column("dsts").combine_chunks().flatten()
                    .to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
                )
                all_p = (
                    packed_tbl.column("psums").combine_chunks().flatten()
                    .to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
                ).reshape(len(all_d), k)
                idx, ok = _scatter_positions(vids, all_d)
                pok = all_p[ok]
                for j in range(k):
                    msum[:, j] += np.bincount(idx, weights=pok[:, j], minlength=nrows)
            new = alpha * msum + base_scale[None, :] * pvec
            return pa.table(
                {
                    "vid": pa.array(vids, pa.int64()),
                    "deg": pa.array(deg, pa.int32()),
                    "pvec": _emit_mat(pvec),
                    "ranks": _emit_mat(new),
                    "prev": _emit_mat(prev),
                }
            )

        return _update

    def _col_stats(state: DataFrame, with_l1: bool):
        """ONE posexplode aggregate → per-column (l1, dangling mass)."""
        if with_l1:
            ex = state.select("deg", F.posexplode(F.arrays_zip("ranks", "prev")))
            rcol = F.col("col.ranks").cast("double")
            l1_term = F.abs(rcol - F.col("col.prev").cast("double"))
        else:
            ex = state.select("deg", F.posexplode("ranks").alias("pos", "col"))
            rcol = F.col("col").cast("double")
            l1_term = F.lit(0.0)
        z = (
            ex.groupBy("pos")
            .agg(
                F.sum(l1_term).alias("l1"),
                F.sum(
                    F.when(F.col("deg") == 0, rcol).otherwise(F.lit(0.0))
                ).alias("dmass"),
            )
            .collect()
        )
        l1 = np.zeros(k)
        dm = np.zeros(k)
        for r in z:
            l1[r["pos"]] = r["l1"] or 0.0
            dm[r["pos"]] = r["dmass"] or 0.0
        return l1, dm

    dang_state = {"dang": None}

    def step(state: DataFrame, rnd: int) -> tuple[DataFrame, dict]:
        if dang_state["dang"] is None:
            _, dm = _col_stats(state, with_l1=False)
            dang_state["dang"] = alpha * dm
        st_keyed = state.select("vid", "deg", "pvec", "ranks").withColumn(
            "bid", F.pmod(F.col("vid"), F.lit(p)).cast("int")
        )
        partials = st_keyed.groupBy("bid").cogroup(blocks.groupBy("bid")).applyInArrow(
            _partials_packed, schema=packed_schema_str
        )
        new_state = (
            st_keyed.groupBy("bid")
            .cogroup(partials.groupBy("tgt"))
            .applyInArrow(_make_update(dang_state["dang"]), schema=state_schema_str)
            .persist()
        )
        l1, dm = _col_stats(new_state, with_l1=True)
        dang_state["dang"] = alpha * dm
        return new_state, {"l1_max": float(l1.max()), "l1": l1.tolist()}

    conv = (lambda s: False) if tol is None else (lambda s: s["l1_max"] < tol * n)
    result = run_supersteps(
        state0, step, conv, max_rounds=max_iter, checkpoint_dir=checkpoint_dir
    )
    global LAST_ROUNDS, LAST_HISTORY
    LAST_ROUNDS = result.rounds
    LAST_HISTORY = result.history
    out = result.state.select(
        "vid", F.posexplode(F.col("ranks").cast("array<double>")).alias("seed", "value")
    ).select("vid", F.col("seed").cast("int").alias("seed"), "value")
    blocks.unpersist()
    return out


# ---------------- bit-parallel multi-source BFS ----------------

_MSBFS_PACKED_SCHEMA = pa.schema(
    [("tgt", pa.int32()), ("dsts", pa.list_(pa.int64())), ("pmasks", pa.list_(pa.int64()))]
)


def msbfs_csr(
    graph: LinkGraph,
    seeds: list[int],
    max_rounds: int = 50,
    num_blocks: int | None = None,
) -> DataFrame:
    """Bit-parallel multi-source BFS on the CSR fast tier.

    One superstep advances up to 64 BFS trees at once: seed *k* owns bit
    *k* of a single int64 mask per vertex (the MS-BFS idea of Then et al.,
    VLDB 2015 — "The More the Merrier: Efficient Multi-Source BFS").
    Per round each changed vertex broadcasts its *frontier* mask along its
    out-edges; per-block OR-reduction (``np.bitwise_or.at`` over the
    compacted dst dictionary) emits ≤P partial rows per destination —
    the same heavy-hitter bound the PageRank/SSSP tiers have — and the
    destination folds them with OR. OR is idempotent and order-free, so
    the packed Arrow-list path is exactly equal to any re-association of
    the partials. A vertex's distance from seed *k* is the round its bit
    first entered the ``seen`` mask; distances ride in the state as one
    ``array<int>`` per vertex, so no side-channel unions accumulate
    across rounds.

    Replaces the reference's per-source BFS app
    (/root/reference/analytical_engine/apps/bfs/bfs.h) run |seeds| times:
    same frontier semantics, but one shared edge pass per round for all
    sources. Output: one row per *reached* (seed, vid) pair with the hop
    distance (seed rows themselves included at dist 0).

    Cost model at scale: the edge pass is identical to one BFS round; the
    extra state is 8 bytes (mask) + 4·64 bytes (dists) per vertex, and the
    64-way sharing means ~64× fewer total edge passes than sequential
    per-seed BFS — the scale path for closeness/eccentricity batches.
    """
    if not seeds:
        raise ValueError("msbfs_csr needs at least one seed")
    if len(seeds) > 64:
        raise ValueError(f"msbfs_csr packs seeds into one int64 mask: got {len(seeds)} > 64")
    seeds = [int(s) for s in seeds]
    k_seeds = len(seeds)
    spark = graph.edges.sparkSession
    p = num_blocks or spark.sparkContext.defaultParallelism
    blocks = build_csr_blocks(graph.edges, p).persist()
    blocks.count()

    if len(set(seeds)) != len(seeds):
        raise ValueError("msbfs_csr seeds must be distinct (one mask bit each)")
    # bit values precomputed driver-side: bit 63 is the int64 sign bit, so
    # 1<<63 must enter Spark as the negative two's-complement literal
    def _bit(i: int) -> int:
        return (1 << i) if i < 63 else -(1 << 63)

    seed_df = spark.createDataFrame(
        [(int(v), int(i), _bit(i)) for i, v in enumerate(seeds)],
        "vid long, k int, bit long",
    )
    # bit k set for seed vertices (seeds distinct → ≤1 bit per vertex);
    # dists[k] = 0 there, -1 elsewhere
    state0 = (
        graph.vertices.select("vid")
        .join(F.broadcast(seed_df), "vid", "left")
        .select(
            "vid",
            F.coalesce("bit", F.lit(0).cast("long")).alias("seen"),
            F.coalesce("bit", F.lit(0).cast("long")).alias("frontier"),
            F.transform(
                F.sequence(F.lit(0), F.lit(k_seeds - 1)),
                lambda i: F.when(F.col("k").isNotNull() & (F.col("k") == i), F.lit(0)).otherwise(
                    F.lit(-1)
                ),
            ).alias("dists"),
        )
    )

    def _partials_packed(state_tbl: pa.Table, block_tbl: pa.Table) -> pa.Table:
        if state_tbl.num_rows == 0 or block_tbl.num_rows == 0:
            return _MSBFS_PACKED_SCHEMA.empty_table()
        fr = _np_col(state_tbl, "frontier", np.int64)
        changed = fr != 0
        if not changed.any():
            return _MSBFS_PACKED_SCHEMA.empty_table()
        vids = _np_col(state_tbl, "vid", np.int64)[changed]
        masks = fr[changed]
        outs_d, outs_m = [], []
        for us, indptr, udst, dst_idx in _iter_blocks(block_tbl):
            src_masks = _gather(vids, masks, us, 0)
            per_edge = np.repeat(src_masks, np.diff(indptr))
            pmask = np.zeros(len(udst), dtype=np.int64)
            np.bitwise_or.at(pmask, dst_idx, per_edge)
            nz = pmask != 0
            outs_d.append(udst[nz])
            outs_m.append(pmask[nz])
        if not outs_d:
            return _MSBFS_PACKED_SCHEMA.empty_table()
        all_d = np.concatenate(outs_d)
        all_m = np.concatenate(outs_m)
        if len(all_d) == 0:  # every per-block OR came up empty after nz-filter
            return _MSBFS_PACKED_SCHEMA.empty_table()
        tgt, off, order = _pack_by_tgt(all_d, p)
        return pa.table(
            {
                "tgt": tgt,
                "dsts": pa.ListArray.from_arrays(off, pa.array(all_d[order], pa.int64())),
                "pmasks": pa.ListArray.from_arrays(off, pa.array(all_m[order], pa.int64())),
            }
        )

    def _make_update(rnd: int):
        def _update(state_tbl: pa.Table, packed_tbl: pa.Table) -> pa.Table:
            if state_tbl.num_rows == 0:
                return pa.schema(
                    [
                        ("vid", pa.int64()),
                        ("seen", pa.int64()),
                        ("frontier", pa.int64()),
                        ("dists", pa.list_(pa.int32())),
                    ]
                ).empty_table()
            vids = _np_col(state_tbl, "vid", np.int64)
            seen = _np_col(state_tbl, "seen", np.int64)
            dists = np.stack(
                state_tbl.column("dists").combine_chunks().to_numpy(zero_copy_only=False)
            ).astype(np.int32, copy=False)
            cand = np.zeros(len(vids), dtype=np.int64)
            if packed_tbl.num_rows:
                d = (
                    packed_tbl.column("dsts").combine_chunks().flatten()
                    .to_numpy(zero_copy_only=False)
                )
                m = (
                    packed_tbl.column("pmasks").combine_chunks().flatten()
                    .to_numpy(zero_copy_only=False)
                )
                if len(d):
                    idx, ok = _scatter_positions(vids, d)
                    np.bitwise_or.at(cand, idx, m[ok])
            newly = cand & ~seen
            new_seen = seen | newly
            hit = newly != 0
            if hit.any():
                for k in range(dists.shape[1]):
                    kb = ((newly >> np.int64(k)) & np.int64(1)).astype(bool)
                    dists[kb, k] = rnd
            flat = dists.reshape(-1)
            off = pa.array(
                np.arange(0, (len(vids) + 1) * dists.shape[1], dists.shape[1], dtype=np.int32),
                pa.int32(),
            )
            return pa.table(
                {
                    "vid": pa.array(vids, pa.int64()),
                    "seen": pa.array(new_seen, pa.int64()),
                    "frontier": pa.array(newly, pa.int64()),
                    "dists": pa.ListArray.from_arrays(off, pa.array(flat, pa.int32())),
                }
            )

        return _update

    def step(state: DataFrame, rnd: int) -> tuple[DataFrame, dict]:
        st_keyed = state.withColumn("bid", F.pmod(F.col("vid"), F.lit(p)).cast("int"))
        parts = st_keyed.groupBy("bid").cogroup(blocks.groupBy("bid")).applyInArrow(
            _partials_packed, schema="tgt int, dsts array<long>, pmasks array<long>"
        )
        new_state = (
            st_keyed.groupBy("bid")
            .cogroup(parts.groupBy("tgt"))
            .applyInArrow(
                _make_update(rnd),
                schema="vid long, seen long, frontier long, dists array<int>",
            )
            .persist()
        )
        n = new_state.where(F.col("frontier") != 0).count()
        return new_state, {"changed": n}

    result = run_supersteps(
        state0, step, converged=lambda s: s["changed"] == 0, max_rounds=max_rounds
    )
    seed_lookup = F.array(*[F.lit(s).cast("long") for s in seeds])
    out = (
        result.state.select(
            "vid", F.posexplode(F.col("dists")).alias("k", "dist")
        )
        .where(F.col("dist") >= 0)
        .select(
            F.element_at(seed_lookup, F.col("k") + 1).alias("seed"),
            F.col("vid"),
            F.col("dist").cast("long").alias("dist"),
        )
    )
    blocks.unpersist()
    return out
