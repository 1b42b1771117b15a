"""linkgraph — a from-scratch PySpark-native link-graph analytics engine.

Re-expresses the query/data-processing capabilities of the reference
GraphScope GAE analytical engine (/root/reference/analytical_engine) in
idiomatic Spark: DataFrames + Catalyst for all data movement, vectorized
pandas/Arrow UDFs for the few kernels the built-ins can't express, a
driver-side superstep loop with convergence aggregates standing in for the
reference's PEval/IncEval message-passing workers
(/root/reference/analytical_engine/core/worker/default_worker.h:81-121).

Layout
------
- :mod:`linkgraph.session`    — SparkSession builder tuned for the engine
- :mod:`linkgraph.corpus`     — synthetic source-code corpus + edge derivation
- :mod:`linkgraph.graph`      — LinkGraph (vertices/edges), dense-id vertex map,
  graph ops (project/to_undirected/subgraph/report), the CREATE_GRAPH analog
- :mod:`linkgraph.superstep`  — superstep loop, convergence, checkpoint/resume
- :mod:`linkgraph.checkpoint` — parquet-layout checkpoint store with manifest
  + per-partition lineage (Iceberg-layout compatible; jar-free fallback)
- :mod:`linkgraph.skew`       — salted two-phase aggregation + skew metrics
- :mod:`linkgraph.algorithms` — PageRank, WCC, CDLP/LPA, triangles, BFS, SSSP,
  HITS, k-core/k-shell, clustering, centralities, assortativity, boundaries, SCC
- :mod:`linkgraph.pipeline`   — training-data ops: dedup (exact/MinHash-LSH/
  SimHash/n-gram Jaccard/embedding), ANN similarity search, text analysis,
  multimodal column plumbing
- :mod:`linkgraph.property`   — multi-label property graph (ArrowFragment
  analog): add_vertices/add_edges/project builder, to_simple() flattening
- :mod:`linkgraph.gie`        — Gremlin traversal subset compiled to one
  Catalyst plan (V/E, out/in/both, has, values, groupCount, repeat, ...)
- :mod:`linkgraph.pregel`     — vertex-centric Pregel user API with aggregators
"""

from linkgraph.graph import LinkGraph, assign_dense_ids, build_graph, quotient_graph
from linkgraph.corpus import synth_corpus, derive_edges, synth_edge_graph
from linkgraph.property import PropertyGraph
from linkgraph.gie import traversal
from linkgraph.gremlin import gremlin

# Flat algorithm surface: the reference exposes every built-in app at the
# package top level (`graphscope.pagerank(g)`, `graphscope.lpa(g)`, ... —
# python/graphscope/__init__.py:19 `from graphscope.analytical.app import *`).
# Mirror that so a reference notebook's call sites port verbatim.
from linkgraph.algorithms import *  # noqa: F401,F403
from linkgraph import algorithms as _algorithms

__all__ = [
    "LinkGraph",
    "PropertyGraph",
    "assign_dense_ids",
    "build_graph",
    "quotient_graph",
    "synth_corpus",
    "derive_edges",
    "synth_edge_graph",
    "traversal",
    "gremlin",
    *_algorithms.__all__,
]

__version__ = "0.1.0"
