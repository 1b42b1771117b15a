"""Driver contract for the spark-graft builder (PySpark target).

Delegates to :mod:`linkgraph.queries`, the engine's registry of
SURVEY.md §2 operators: each SQL-expressible operator has a Spark
callable and a matching DuckDB oracle; iterative algorithms (k-core
peeling, converged PageRank on the synthesized corpus graph) ship as
rows-only entries.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from linkgraph.queries import ORACLE_SQL, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: converged NetworkX-semantics PageRank on the dependency
    graph derived from the synthetic source-code corpus (BASELINE.json
    north_star), joined back to vertex oids."""
    from linkgraph import build_graph, derive_edges, synth_corpus
    from linkgraph.algorithms import pagerank_nx
    from pyspark.sql import functions as F

    corpus = synth_corpus(spark, 2000, seed=42)
    g = build_graph(derive_edges(corpus)).partitioned()
    ranks = pagerank_nx(g, alpha=0.85, max_iter=100, tol=1e-6)
    return (
        ranks.join(g.vertices, "vid")
        .select("vid", "oid", F.round("value", 10).alias("pagerank"))
        .orderBy(F.desc("pagerank"), "vid")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
