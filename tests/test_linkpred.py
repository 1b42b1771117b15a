"""Link prediction vs hand-computed NetworkX values.

NetworkX ground truth (undirected semantics; the reference forwards
networkx.algorithms.tests.test_link_prediction on its nx surface):

* K5: every non-... K5 has no non-edges, so score explicit pairs.
  jaccard(0,1) = |{2,3,4}| / |{0..4}\\{0,1} ∪ ...| = 3/5 = 0.6,
  AA(0,1) = 3/ln 4, RA(0,1) = 3/4, PA(0,1) = 16.
* P4 path 0-1-2-3: jaccard(0,2) = 1/2, AA(0,2) = 1/ln 2,
  RA(0,2) = 1/2, PA(0,2) = 1·2 = 2.
"""

from __future__ import annotations

import math

import pytest

from linkgraph.algorithms import (
    adamic_adar_index,
    jaccard_coefficient,
    link_prediction,
    preferential_attachment,
    resource_allocation_index,
)
from linkgraph.graph import graph_from_edge_vids

K5 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
P4 = [(0, 1), (1, 2), (2, 3)]


def _pairs(spark, pairs):
    return spark.createDataFrame(pairs, "u long, v long")


def test_k5_explicit_pair(spark):
    g = graph_from_edge_vids(spark, K5)
    row = link_prediction(g, _pairs(spark, [(0, 1)])).first()
    assert row["cn"] == 3
    assert row["jaccard"] == pytest.approx(0.6)
    assert row["adamic_adar"] == pytest.approx(3 / math.log(4))
    assert row["resource_allocation"] == pytest.approx(3 / 4)
    assert row["preferential_attachment"] == 16


def test_path_default_candidates(spark):
    g = graph_from_edge_vids(spark, P4)
    rows = {(r["u"], r["v"]): r for r in link_prediction(g).collect()}
    # candidates = non-adjacent pairs with >=1 common neighbor
    assert set(rows) == {(0, 2), (1, 3)}
    r = rows[(0, 2)]
    assert r["cn"] == 1
    assert r["jaccard"] == pytest.approx(0.5)
    assert r["adamic_adar"] == pytest.approx(1 / math.log(2))
    assert r["resource_allocation"] == pytest.approx(0.5)
    assert r["preferential_attachment"] == 2


def test_zero_common_neighbor_pair_scores_zero_but_pa(spark):
    g = graph_from_edge_vids(spark, P4)
    row = link_prediction(g, _pairs(spark, [(0, 3)])).first()
    assert row["cn"] == 0
    assert row["jaccard"] == 0.0
    assert row["adamic_adar"] == 0.0
    assert row["resource_allocation"] == 0.0
    assert row["preferential_attachment"] == 1  # deg(0)*deg(3) = 1*1


def test_single_metric_wrappers(spark):
    g = graph_from_edge_vids(spark, P4)
    p = _pairs(spark, [(0, 2)])
    assert jaccard_coefficient(g, p).first()["value"] == pytest.approx(0.5)
    assert adamic_adar_index(g, p).first()["value"] == pytest.approx(1 / math.log(2))
    assert resource_allocation_index(g, p).first()["value"] == pytest.approx(0.5)
    assert preferential_attachment(g, p).first()["value"] == 2


def test_directed_edges_treated_undirected(spark):
    # same scores regardless of stored edge orientation
    g1 = graph_from_edge_vids(spark, [(0, 1), (1, 2)])
    g2 = graph_from_edge_vids(spark, [(1, 0), (2, 1)])
    p = lambda g: link_prediction(g, None).collect()
    r1 = {(r["u"], r["v"]): r["jaccard"] for r in p(g1)}
    r2 = {(r["u"], r["v"]): r["jaccard"] for r in p(g2)}
    assert r1 == r2 == {(0, 2): 1.0}


def test_max_neighbor_degree_skips_hubs(spark):
    # star 0-{1,2,3,4}: hub 0 is the only common neighbor
    star = [(0, i) for i in range(1, 5)]
    g = graph_from_edge_vids(spark, star)
    assert link_prediction(g).count() == 6  # C(4,2) leaf pairs via hub
    assert link_prediction(g, max_neighbor_degree=3).count() == 0
