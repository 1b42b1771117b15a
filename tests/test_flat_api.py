"""Top-level flat API parity with the reference package surface.

The reference re-exports every built-in app at package top level
(python/graphscope/__init__.py:19 `from graphscope.analytical.app import *`),
so user code calls `graphscope.pagerank(g)` / `graphscope.lpa(g)` directly.
`linkgraph` mirrors that: every name the reference's app/__init__.py exports
must be a top-level callable here, and `lpa` must be the cdlp dispatch
(app/lpa.py:27-52 runs algo="cdlp").
"""

import linkgraph

# Every flat name exported by the reference's analytical/app/__init__.py
# (verbatim list; lpa_u2i included via its explicit import at :50).
REFERENCE_FLAT_NAMES = [
    "attribute_assortativity_coefficient",
    "numeric_assortativity_coefficient",
    "average_degree_connectivity",
    "average_shortest_path_length",
    "bfs",
    "cdlp",
    "clustering",
    "degree_assortativity_coefficient",
    "degree_centrality",
    "eigenvector_centrality",
    "hits",
    "is_simple_path",
    "k_core",
    "k_shell",
    "katz_centrality",
    "louvain",
    "lpa",
    "lpa_u2i",
    "pagerank",
    "pagerank_nx",
    "sssp",
    "triangles",
    "wcc",
]


def test_every_reference_flat_name_is_top_level():
    for name in REFERENCE_FLAT_NAMES:
        fn = getattr(linkgraph, name, None)
        assert callable(fn), f"linkgraph.{name} missing from flat surface"
        assert name in linkgraph.__all__, f"{name} not in linkgraph.__all__"


def test_lpa_is_cdlp():
    assert linkgraph.lpa is linkgraph.cdlp


def test_no_duplicate_exports():
    assert len(linkgraph.__all__) == len(set(linkgraph.__all__))


def test_flat_call_runs(spark):
    """The flat name is the same function object as the module path."""
    from linkgraph.algorithms.pagerank import pagerank as deep

    assert linkgraph.pagerank is deep
