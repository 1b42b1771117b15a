"""VoteRank vs the reference's forwarded NetworkX test vector
(/root/reference/python/graphscope/nx/algorithms/tests/forward/
centrality/test_voterank.py test_voterank_centrality_1)."""

from __future__ import annotations

from linkgraph.algorithms import voterank
from linkgraph.graph import graph_from_edge_vids

VOTE_G = [(7, 8), (7, 5), (7, 9), (5, 0), (0, 1), (0, 2), (0, 3),
          (0, 4), (1, 6), (2, 6), (3, 6), (4, 6)]


def test_voterank_networkx_vector(spark):
    g = graph_from_edge_vids(spark, VOTE_G)
    rows = voterank(g, 3).orderBy("rank").collect()
    assert [r["vid"] for r in rows] == [0, 7, 6]


def test_voterank_stops_at_zero_score(spark):
    # two disjoint edges, avg_deg = 1: electing one endpoint zeroes its
    # partner's ability, so only one vertex per edge is ever elected
    g = graph_from_edge_vids(spark, [(0, 1), (2, 3)])
    rows = voterank(g).orderBy("rank").collect()
    assert [r["vid"] for r in rows] == [0, 2]

def test_voterank_empty(spark):
    g = graph_from_edge_vids(spark, [])
    assert voterank(g).count() == 0
