#!/usr/bin/env python
"""Benchmark harness — headline metric + per-query timings.

Default mode (driver contract): runs the headline queries against
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline metric follows BASELINE.json: NetworkX-semantics PageRank
(alpha=0.85, L1 tol=1e-6) time-to-convergence on the dependency-edge
graph derived from the synthetic source-code corpus, plus
iterations/sec.

``--scaling`` mode runs the same PageRank job at two parallelism levels
(N and 4N cores — the sandbox stand-in for N vs 4N executor clusters)
and reports throughput at both plus scaling efficiency
(eff = throughput_4N / (4 * throughput_N) ... relative to ideal 4x, but
per the north rule we report eff = (T_N / T_4N) / 4 normalized by core
ratio). Results are appended to BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# corpus files per sf unit: sf0.1 -> 60k files (~90k edges)
CORPUS_FILES_PER_SF = 600_000


def _sf_from_dir(sf_dir: str) -> float:
    name = Path(sf_dir).name  # "sf0.1"
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.1


def _mk_spark(cores: int):
    from linkgraph.session import get_spark

    # shuffle partitions == cores == defaultParallelism: every superstep's
    # aggregation output is partitioned compatibly with the cached edge
    # table, so Catalyst drops the redundant exchanges between rounds.
    # Shuffle files go to tmpfs: on a real cluster every executor node has
    # its own disks, so a single shared spindle would otherwise be a
    # single-box artifact that caps measured scaling.
    import os as _os

    _os.makedirs("/dev/shm/linkgraph-spark", exist_ok=True)
    return get_spark(app_name=f"linkgraph-bench-{cores}", cores=cores,
                     shuffle_partitions=cores,
                     extra_conf={"spark.local.dir": "/dev/shm/linkgraph-spark"})


def _run_pagerank_tier(spark, g, tier: str, tol: float | None, max_iter: int,
                       num_blocks: int | None = None, rank_dtype: str = "float64"):
    """Run one PageRank on an already-built graph; returns (sec, rounds,
    checksum)."""
    import importlib

    from pyspark.sql import functions as F

    t1 = time.time()
    if tier == "csr":
        from linkgraph.csr import pagerank_csr

        ranks = pagerank_csr(g, alpha=0.85, max_iter=max_iter, tol=tol,
                             num_blocks=num_blocks, rank_dtype=rank_dtype)
        mod = importlib.import_module("linkgraph.csr")
    elif tier == "dense":
        from linkgraph.csr import pagerank_csr_dense

        ranks = pagerank_csr_dense(g, alpha=0.85, max_iter=max_iter, tol=tol,
                                   num_blocks=num_blocks, rank_dtype=rank_dtype)
        mod = importlib.import_module("linkgraph.csr")
    else:
        from linkgraph.algorithms.pagerank import _pagerank_impl

        ranks = _pagerank_impl(g, alpha=0.85, max_iter=max_iter, tol=tol, checkpoint_dir=None)
        # the package __init__ re-exports a `pagerank` function that shadows
        # the submodule on attribute lookup — go through sys.modules instead
        mod = importlib.import_module("linkgraph.algorithms.pagerank")
    checksum = ranks.agg(F.sum("value")).first()[0]
    return time.time() - t1, mod.LAST_ROUNDS, checksum


def build_corpus_graph(spark, n_files: int):
    from linkgraph import build_graph, derive_edges, synth_corpus

    t0 = time.time()
    corpus = synth_corpus(spark, n_files, seed=42)
    g = build_graph(derive_edges(corpus)).partitioned()
    n_edges = g.edges.count()
    return g, n_edges, time.time() - t0


def build_synth_graph(spark, n_edges_target: int, avg_deg: int = 8):
    """Direct vid-level graph (skew-shaped, JVM-side) for large-scale
    scaling runs — avoids paying corpus-text generation for 10^8 edges."""
    from linkgraph.corpus import synth_edge_graph

    t0 = time.time()
    n_vertices = max(1000, n_edges_target // avg_deg)
    # no .partitioned(): each tier lays the edges out itself (CSR tier
    # compacts by pmod(src,P); join tier repartitions+persists on src) —
    # a generic pre-shuffle here would just be a third copy of the edges
    g = synth_edge_graph(spark, n_vertices, avg_out_degree=avg_deg, seed=42)
    n_edges = g.edges.count()
    return g, n_edges, time.time() - t0


def bench_pagerank(spark, n_files: int, tol: float | None = 1e-6, max_iter: int = 100,
                   tier: str = "reference"):
    """Headline: corpus synth -> edge derivation -> graph build -> PageRank.

    ``tol`` set → NetworkX convergence mode (headline time-to-convergence);
    ``tol=None`` → exactly ``max_iter`` rounds (LDBC mode — used by the
    scaling run so both parallelism levels execute identical work).
    """
    g, n_edges, build_sec = build_corpus_graph(spark, n_files)
    pr_sec, rounds, checksum = _run_pagerank_tier(spark, g, tier, tol, max_iter)
    g.unpersist()
    return build_sec, pr_sec, rounds, n_edges, checksum


def run_default() -> dict:
    sf = _sf_from_dir(SF_DIR)
    n_files = max(2000, int(CORPUS_FILES_PER_SF * sf))
    spark = _mk_spark(CPUS)

    queries: dict[str, float] = {}

    t0 = time.time()
    g, n_edges, build_sec = build_corpus_graph(spark, n_files)
    queries["corpus_build"] = round(build_sec, 3)
    # both execution tiers on the same cached graph: reference (join) tier
    # is the headline continuity metric; the CSR fast tier is the scale
    # path (VERDICT r1 asked for it to be benched, not just tested)
    pr_sec, rounds, _ = _run_pagerank_tier(spark, g, "reference", 1e-6, 100)
    queries["pagerank_convergence"] = round(pr_sec, 3)
    if rounds:
        queries["pagerank_iters_per_sec"] = round(rounds / pr_sec, 3)
    csr_sec, csr_rounds, _ = _run_pagerank_tier(spark, g, "csr", 1e-6, 100)
    queries["pagerank_csr_convergence"] = round(csr_sec, 3)
    if csr_rounds:
        queries["pagerank_csr_iters_per_sec"] = round(csr_rounds / csr_sec, 3)
    dn_sec, dn_rounds, _ = _run_pagerank_tier(spark, g, "dense", 1e-6, 100)
    queries["pagerank_dense_convergence"] = round(dn_sec, 3)
    if dn_rounds:
        queries["pagerank_dense_iters_per_sec"] = round(dn_rounds / dn_sec, 3)

    # incremental maintenance headline (delta-push warm start): converge
    # on 99% of the corpus edges (held ~1e3 tighter than the maintenance
    # target, the warm-start requirement — BENCH/BASELINE.md r4), then
    # recompute on the full graph from the old ranks. The recorded cost
    # is the incremental step only; compare against pagerank_convergence
    # (the cold full-graph run above).
    from pyspark.sql import functions as F

    from linkgraph.csr import pagerank_csr, pagerank_delta_csr
    from linkgraph.graph import LinkGraph as _LG

    keep = F.pmod(F.xxhash64(F.col("src"), F.col("dst"), F.lit(11)), F.lit(100)) != 0
    g_base = _LG(vertices=g.vertices, edges=g.edges.where(keep))
    old_ranks = pagerank_csr(g_base, alpha=0.85, max_iter=100, tol=1e-9).persist()
    old_ranks.count()  # converge the base outside the timed window
    t = time.time()
    pagerank_delta_csr(g, alpha=0.85, max_iter=400, tol=1e-6, init_ranks=old_ranks).count()
    queries["corpus_pagerank_incr"] = round(time.time() - t, 3)
    old_ranks.unpersist()

    # discrete incremental maintenance on the same 1%-append recipe:
    # warm WCC (labels only merge) and delta-driven triangle count —
    # both exactly equal to cold (checksum/oracle-asserted elsewhere)
    from linkgraph.algorithms import triangle_total, triangle_total_incr
    from linkgraph.csr import wcc_csr

    old_labels = wcc_csr(g_base).persist()
    old_labels.count()
    extra = g.edges.where(~keep).persist()
    extra.count()
    fr = extra.select(F.col("src").alias("vid")).union(
        extra.select(F.col("dst").alias("vid"))
    )
    t = time.time()
    wcc_csr(g, init_labels=old_labels, frontier=fr).count()
    queries["corpus_wcc_incr"] = round(time.time() - t, 3)
    old_labels.unpersist()

    base_tri = triangle_total(g_base)  # known count, outside the window
    t = time.time()
    triangle_total_incr(g_base, extra, base_total=base_tri)
    queries["corpus_triangles_incr"] = round(time.time() - t, 3)
    extra.unpersist()

    # r4 families on the same cached corpus graph: GNN sampling data
    # plane + link prediction (candidate join fans out Σ_w deg(w)² —
    # hub-capped here exactly as a 100-TB run would be)
    from linkgraph.sampling import negative_sample, sample_neighbors
    from linkgraph.algorithms import link_prediction

    t = time.time()
    sample_neighbors(g, 5).count()
    queries["corpus_sample_neighbors"] = round(time.time() - t, 3)
    t = time.time()
    negative_sample(g, 3).count()
    queries["corpus_negative_sample"] = round(time.time() - t, 3)
    t = time.time()
    link_prediction(g, max_neighbor_degree=256).count()
    queries["corpus_linkpred"] = round(time.time() - t, 3)

    # r4 census rewrite: carried dyad bits + broadcast third dyad — the
    # wedge stream reduces map-side into 64 counters, no triple shuffle
    from linkgraph.algorithms.triads import triadic_census

    t = time.time()
    triadic_census(g).count()
    queries["corpus_census"] = round(time.time() - t, 3)
    g.unpersist()

    # secondary headline queries on the sf parquet tables
    from linkgraph.queries import QUERIES

    for name in (
        "g_wcc",
        "g_cdlp_r2",
        "g_triangles",
        "g_pagerank_r3",
        "doc_fingerprint",
        "emb_knn",
        "g_prop_degree",
        "gie_twohop_parts",
        # g_cdlp_csr / g_sssp_csr are correctness entries on the tiny
        # 400-vertex oracle graph — there the superstep fixed cost (~1.5
        # s/round scheduling) is 100% of the time, so timing them says
        # nothing about tier throughput; the 1e8-edge scaling harness
        # (BENCH/run_scaling_level.py) is the fast-tier perf signal.
    ):
        t = time.time()
        QUERIES[name](spark, SF_DIR).count()
        queries[name] = round(time.time() - t, 3)

    # production MinHash path: xxhash64 signatures (one JVM hash/shingle).
    # The registry's doc_minhash_dups entry runs hash_mode="md5" purely so
    # the DuckDB oracle can replay signatures bit-identically — 64 md5
    # evaluations per shingle made r2's bench 8.6x slower than the real
    # operator (VERDICT r2 #2).  Correctness is still driver-checked at
    # sf0.01 via the md5 entry; the bench times what production runs.
    # Fixed warm/cold discipline (VERDICT r4 #3): run the operator twice.
    # The first (cold) pass absorbs codegen/JIT warm-up plus whatever
    # memory pressure the preceding bench queries left behind — measured
    # r3 15.4s / r4 24.7s IN-BENCH vs a reproducible 17.9-19.2s isolated
    # cold and 11.2s±0.1 warm across fresh JVMs, i.e. the r4 "regression"
    # was bench-order interference, not a plan change. doc_minhash_fast
    # now reports the steady-state (warm) pass so round-over-round
    # numbers compare like-for-like; the cold pass is kept as
    # doc_minhash_cold for the warm-up-cost signal.
    from linkgraph.pipeline import minhash_lsh_duplicates

    _docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def _minhash_once():
        return minhash_lsh_duplicates(
            _docs, threshold=0.5, hash_mode="xxhash64", max_bucket_size=100
        ).count()

    t = time.time()
    _minhash_once()
    queries["doc_minhash_cold"] = round(time.time() - t, 3)
    t = time.time()
    _minhash_once()
    queries["doc_minhash_fast"] = round(time.time() - t, 3)

    # full production dedup decision: xxhash64 pairs -> WCC clusters ->
    # anti-join keep set (the curation path a 100-TB corpus prep runs).
    from linkgraph.pipeline import deduplicate

    t = time.time()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pairs = minhash_lsh_duplicates(
        docs, threshold=0.5, hash_mode="xxhash64", max_bucket_size=100
    ).select("id_a", "id_b")
    deduplicate(docs, pairs).count()
    queries["doc_dedup_end2end"] = round(time.time() - t, 3)

    # IVF assignment cost vs quantizer size (VERDICT r3 #7): the 8-list
    # quantizer runs as Catalyst plan literals, the 4096-list one through
    # the executor-broadcast Arrow matmul — flat cost per corpus row is
    # the claim, so both rows land in BENCH for comparison.
    import numpy as np

    from linkgraph.pipeline import similarity as _sim

    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    rng = np.random.RandomState(7)
    for n_c, tag_name in ((8, "emb_ivf_assign_8"), (4096, "emb_ivf_assign_4k")):
        cents = rng.randn(n_c, 64)
        t = time.time()
        _sim.ivf_assign(embs, cents).count()
        queries[tag_name] = round(time.time() - t, 3)

    # r5 additions: production-path cross-doc duplicated n-grams
    # (xxhash64 keys — the md5 registry twin exists only for the oracle,
    # same discipline as doc_minhash) and the int8 SQ brute-force tier.
    from linkgraph.pipeline.curation import cross_doc_ngram_dup
    from linkgraph.pipeline.similarity import sq8_topk

    t = time.time()
    cross_doc_ngram_dup(_docs, n=3, hash_mode="xxhash64").count()
    queries["doc_dup_ngrams_fast"] = round(time.time() - t, 3)
    t = time.time()
    sq8_topk(embs, [0, 1, 2, 3], k=5).count()
    queries["emb_sq8_topk"] = round(time.time() - t, 3)

    total = time.time() - t0
    out = {
        "metric": "pagerank_time_to_convergence_1e-6_on_corpus_dependency_graph",
        "value": round(pr_sec, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "n_corpus_files": n_files,
        "n_edges": n_edges,
        "pagerank_rounds": rounds,
        "cores": CPUS,
        "total_sec": round(total, 3),
    }
    spark.stop()
    return out


def run_scaling(
    lo: int,
    hi: int,
    n_files: int | None,
    tier: str = "csr",
    n_edges_target: int | None = None,
    rounds_fixed: int = 10,
    rank_dtype: str = "float32",
) -> dict:
    """Same job at two parallelism levels; scaling efficiency per the
    north rule: eff = (throughput_hi / throughput_lo) / (hi / lo),
    throughput = PageRank iterations/sec.

    Default workload: the CSR fast tier over a ``--edges``-sized synthetic
    skewed graph (large enough that compute dominates per-round fixed
    cost). ``--n-files`` switches to the corpus-derived graph instead.

    The JOB is identical at both levels — ``hi`` shuffle partitions and
    ``hi`` CSR blocks regardless of core count (a cluster keeps its
    partitioning when executors are added); only worker threads vary.
    """
    sf = _sf_from_dir(SF_DIR)
    results = {}
    for cores in (lo, hi):
        from linkgraph.session import get_spark

        os.makedirs("/dev/shm/linkgraph-spark", exist_ok=True)
        spark = get_spark(
            app_name=f"linkgraph-bench-{cores}", cores=cores,
            shuffle_partitions=hi,
            extra_conf={"spark.local.dir": "/dev/shm/linkgraph-spark",
                        "spark.default.parallelism": str(hi)},
        )
        if n_files:
            g, n_edges, build_sec = build_corpus_graph(spark, n_files)
        else:
            g, n_edges, build_sec = build_synth_graph(
                spark, n_edges_target or 100_000_000
            )
        n_vertices = g.vertices.count()
        pr_sec, rounds, checksum = _run_pagerank_tier(
            spark, g, tier, tol=None, max_iter=rounds_fixed, num_blocks=hi,
            rank_dtype=rank_dtype,
        )
        g.unpersist()
        # logical shuffle bytes per superstep (CSR tier): the state shuffles
        # to its block (vid 8B + deg 4B + rank), partials shuffle to their
        # dst-hash reducer (dst + psum), the aggregated messages join back
        # (dst + double msum). Row counts are exact (LAST_PARTIAL_ROWS is
        # the summed compacted-dst dictionary size).
        val_b = 4 if rank_dtype == "float32" else 8
        dst_b = 4 if n_vertices < 2**31 - 1 else 8
        from linkgraph import csr as _csr

        prows = _csr.LAST_PARTIAL_ROWS or 0
        bytes_per_round = (
            n_vertices * (8 + 4 + val_b)      # state -> cogroup shuffle
            + prows * (dst_b + val_b)          # partials -> groupBy(dst)
            + min(prows, n_vertices) * (dst_b + 8)  # msgs -> join
        ) if tier == "csr" else None
        spark.stop()
        results[cores] = {
            "build_sec": round(build_sec, 3),
            "pr_sec": round(pr_sec, 3),
            "rounds": rounds,
            "iters_per_sec": round((rounds or 0) / pr_sec, 4),
            "checksum": checksum,
            "n_edges": n_edges,
            "n_vertices": n_vertices,
            "partial_rows": prows if tier == "csr" else None,
            "logical_shuffle_bytes_per_round": bytes_per_round,
        }
    thr_lo, thr_hi = results[lo]["iters_per_sec"], results[hi]["iters_per_sec"]
    eff = (thr_hi / thr_lo) / (hi / lo) if thr_lo else 0.0
    return {
        "metric": "pagerank_scaling_efficiency",
        "value": round(eff, 4),
        "unit": "efficiency",
        "tier": tier,
        "cores_lo": lo,
        "cores_hi": hi,
        "rank_dtype": rank_dtype,
        "per_level": {str(k): v for k, v in results.items()},
        "sf": sf,
        "n_corpus_files": n_files,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--lo", type=int, default=8)
    ap.add_argument("--hi", type=int, default=32)
    ap.add_argument("--n-files", type=int, default=None)
    ap.add_argument("--tier", choices=["reference", "csr"], default="csr")
    ap.add_argument("--edges", type=int, default=100_000_000)
    ap.add_argument("--rounds", type=int, default=10)
    ap.add_argument("--dtype", choices=["float32", "float64"], default="float32")
    args = ap.parse_args()
    if args.scaling:
        out = run_scaling(
            args.lo, args.hi, args.n_files, tier=args.tier,
            n_edges_target=args.edges, rounds_fixed=args.rounds,
            rank_dtype=args.dtype,
        )
    else:
        out = run_default()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
