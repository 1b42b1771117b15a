"""spark-submit entry point for the linkgraph engine.

The north-rule deployment contract: the engine ships as a plain Python
package submitted with ``--py-files`` — no native code, no jars::

    python tools/make_pyfiles.py dist/linkgraph.zip
    spark-submit --py-files dist/linkgraph.zip -m ...   # cluster
    spark-submit --py-files dist/linkgraph.zip linkgraph/cli.py \
        pagerank --corpus-files 20000 --tol 1e-6 --out /tmp/pr_out

On a cluster, ``--master``/executor memory come from spark-submit; this
module never builds its own session when one is already active (it uses
``SparkSession.builder.getOrCreate()``, so spark-submit's conf wins).

Subcommands cover the flagship algorithms over either a parquet corpus
table (``--corpus-path``, columns repo/path/commit/lang/content) or the
deterministic synthetic corpus (``--corpus-files N``).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import functions as F


def _get_spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.appName("linkgraph-cli")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.maxPlanStringLength", "1048576")
        .getOrCreate()
    )


def _load_graph(spark, args):
    from linkgraph import build_graph, derive_edges, synth_corpus

    if args.corpus_path:
        corpus = spark.read.parquet(args.corpus_path)
    else:
        corpus = synth_corpus(spark, args.corpus_files, seed=args.seed)
    return build_graph(derive_edges(corpus)).partitioned(args.partitions or None)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="linkgraph")
    ap.add_argument(
        "algo",
        choices=[
            "pagerank", "ppr-batch", "wcc", "cdlp", "triangles", "sssp",
            "bfs", "mis", "coloring", "census", "core-number", "ktruss",
        ],
    )
    ap.add_argument("--corpus-path", default=None, help="parquet corpus table")
    ap.add_argument("--corpus-files", type=int, default=10_000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--partitions", type=int, default=0)
    ap.add_argument("--alpha", type=float, default=0.85)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--max-iter", type=int, default=100)
    ap.add_argument("--rounds", type=int, default=10, help="CDLP rounds")
    ap.add_argument("--k", type=int, default=4, help="ktruss k")
    ap.add_argument(
        "--n-seeds", type=int, default=4,
        help="ppr-batch: number of personalization vectors (seed j = vids ≡ j mod 1000)",
    )
    ap.add_argument("--tier", choices=["reference", "csr", "dense"], default="csr")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--out", default=None, help="parquet output path")
    args = ap.parse_args(argv)

    spark = _get_spark()
    g = _load_graph(spark, args)
    t0 = time.time()
    if args.algo == "pagerank":
        if args.tier == "csr":
            from linkgraph.csr import pagerank_csr

            res = pagerank_csr(
                g, alpha=args.alpha, max_iter=args.max_iter, tol=args.tol,
                checkpoint_dir=args.checkpoint_dir,
            )
        elif args.tier == "dense":
            from linkgraph.csr import pagerank_csr_dense

            res = pagerank_csr_dense(
                g, alpha=args.alpha, max_iter=args.max_iter, tol=args.tol,
                checkpoint_dir=args.checkpoint_dir,
            )
        else:
            from linkgraph.algorithms import pagerank_nx

            res = pagerank_nx(
                g, alpha=args.alpha, max_iter=args.max_iter, tol=args.tol,
                checkpoint_dir=args.checkpoint_dir,
            )
    elif args.algo == "ppr-batch":
        from linkgraph.csr import ppr_batch_csr

        seeds = g.vertices.where(
            F.pmod(F.col("vid"), F.lit(1000)) < args.n_seeds
        ).select(
            F.pmod(F.col("vid"), F.lit(1000)).cast("int").alias("seed"),
            "vid",
            F.lit(1.0).alias("weight"),
        )
        res = ppr_batch_csr(
            g, seeds, alpha=args.alpha, max_iter=args.max_iter, tol=args.tol,
            checkpoint_dir=args.checkpoint_dir,
        )
    elif args.algo == "wcc":
        if args.tier in ("csr", "dense"):
            from linkgraph.csr import wcc_csr

            res = wcc_csr(g, checkpoint_dir=args.checkpoint_dir)
        else:
            from linkgraph.algorithms import wcc

            res = wcc(g, checkpoint_dir=args.checkpoint_dir)
    elif args.algo in ("sssp", "bfs"):
        src = g.vertices.agg(F.min("vid")).first()[0]
        wcol = "weight" if (args.algo == "sssp" and "weight" in g.edges.columns) else None
        if args.tier in ("csr", "dense"):
            from linkgraph.csr import sssp_csr

            res = sssp_csr(g, src=src, weight_col=wcol, checkpoint_dir=args.checkpoint_dir)
        else:
            from linkgraph.algorithms import sssp

            res = sssp(g, src=src, weight_col=wcol)
    elif args.algo == "cdlp":
        if args.tier in ("csr", "dense"):
            from linkgraph.csr import cdlp_csr

            res = cdlp_csr(g, max_round=args.rounds, checkpoint_dir=args.checkpoint_dir)
        else:
            from linkgraph.algorithms import cdlp

            res = cdlp(g, max_round=args.rounds, checkpoint_dir=args.checkpoint_dir)
    elif args.algo == "mis":
        from linkgraph.algorithms import maximal_independent_set

        res = maximal_independent_set(g, seed=args.seed)
    elif args.algo == "coloring":
        from linkgraph.algorithms import greedy_color

        res = greedy_color(g, seed=args.seed)
    elif args.algo == "census":
        from linkgraph.algorithms import triadic_census

        res = triadic_census(g)
    elif args.algo == "core-number":
        from linkgraph.algorithms import core_number

        res = core_number(g)
    elif args.algo == "ktruss":
        from linkgraph.algorithms import k_truss

        res = k_truss(g, k=args.k)
    else:
        from linkgraph.algorithms import triangles

        res = triangles(g)

    if "vid" in res.columns:
        res = res.join(g.vertices, "vid").select(
            "vid", "oid", *[c for c in res.columns if c != "vid"]
        )
    if args.out:
        res.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
    else:
        n = res.count()
    print(
        json.dumps(
            {
                "algo": args.algo,
                "tier": args.tier,
                "rows": n,
                "wall_sec": round(time.time() - t0, 3),
                "skew": g.skew_metrics(),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
