"""DAG family: Kahn-peel generations, acyclicity, longest path.

Oracle = hand-computed layers on small graphs plus the Kahn ⇔
longest-path-DP equivalence; the r5-queue entries replay the unrolled
DP in DuckDB at sf0.001/0.01 (test_oracle_parity::test_r5_queue).
"""

import pytest
from pyspark.sql import functions as F

from linkgraph.algorithms.dag import (
    dag_longest_path_length,
    is_directed_acyclic_graph,
    topological_generations,
)
from linkgraph.graph import graph_from_edge_vids

#        0 → 1 → 3 → 5
#         \      ↑
#          2 ----+     4 → 5    6 (isolated source via edge 6→0)
DAG_EDGES = [(0, 1), (1, 3), (0, 2), (2, 3), (3, 5), (4, 5), (6, 0)]
EXPECT_LAYERS = {6: 0, 4: 0, 0: 1, 1: 2, 2: 2, 3: 3, 5: 4}

CYCLE_EDGES = [(0, 1), (1, 2), (2, 0), (2, 3)]


def test_generations_match_hand_layers(spark):
    g = graph_from_edge_vids(spark, DAG_EDGES)
    got = {r.vid: r.layer for r in topological_generations(g).collect()}
    assert got == EXPECT_LAYERS


def test_longest_path_length(spark):
    g = graph_from_edge_vids(spark, DAG_EDGES)
    assert dag_longest_path_length(g).first()["value"] == 4


def test_cycle_raises(spark):
    g = graph_from_edge_vids(spark, CYCLE_EDGES)
    with pytest.raises(ValueError, match="cycle"):
        topological_generations(g)


def test_is_dag_both_verdicts(spark):
    assert is_directed_acyclic_graph(
        graph_from_edge_vids(spark, DAG_EDGES)
    ).first()["value"] is True
    assert is_directed_acyclic_graph(
        graph_from_edge_vids(spark, CYCLE_EDGES)
    ).first()["value"] is False


def test_generations_equal_longest_path_dp(spark):
    """Kahn layer == longest incoming path, replayed in plain python."""
    g = graph_from_edge_vids(spark, DAG_EDGES)
    got = {r.vid: r.layer for r in topological_generations(g).collect()}
    verts = sorted(got)
    dp = {v: 0 for v in verts}
    for _ in verts:
        for s, d in DAG_EDGES:
            dp[d] = max(dp[d], dp[s] + 1)
    assert got == dp


def test_nx_wrappers(spark):
    from linkgraph import nx as lnx

    G = lnx.DiGraph(spark)
    G.add_edges_from([("a", "b"), ("b", "c"), ("a", "c")])
    assert lnx.is_directed_acyclic_graph(G) is True
    gens = list(lnx.topological_generations(G))
    assert gens == [["a"], ["b"], ["c"]]
    assert list(lnx.topological_sort(G)) == ["a", "b", "c"]
    assert lnx.dag_longest_path_length(G) == 2
    G.add_edge("c", "a")
    assert lnx.is_directed_acyclic_graph(G) is False
