"""GNN sampling family (sampling.py — the GLE data-plane analog)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from linkgraph.graph import graph_from_edge_vids
from linkgraph.sampling import k_hop_sample, negative_sample, sample_neighbors

STAR_PLUS = [(0, i) for i in range(1, 9)] + [(1, 9), (2, 9), (9, 3)]


def test_sample_neighbors_caps_and_determinism(spark):
    g = graph_from_edge_vids(spark, STAR_PLUS)
    s1 = sample_neighbors(g, 3, seed=7)
    rows = s1.collect()
    per_src = {}
    for r in rows:
        per_src.setdefault(r["src"], []).append(r["dst"])
    assert all(len(v) <= 3 for v in per_src.values())
    assert len(per_src[0]) == 3  # deg 8 → capped
    assert sorted(per_src[1]) == [9]  # deg 1 → kept whole
    # deterministic across repartitioning
    g2 = graph_from_edge_vids(spark, STAR_PLUS)
    g2 = type(g2)(vertices=g2.vertices, edges=g2.edges.repartition(7), directed=True)
    assert sorted(map(tuple, rows)) == sorted(
        map(tuple, sample_neighbors(g2, 3, seed=7).collect())
    )
    # different seed → (almost surely) different pick for the hub
    s2 = {r["dst"] for r in sample_neighbors(g, 3, seed=8).where("src = 0").collect()}
    assert s2 != set(per_src[0]) or len(s2) == 3


def test_sample_neighbors_topk_by_weight(spark):
    edges = [(0, 1, 1.0), (0, 2, 5.0), (0, 3, 3.0)]
    df = spark.createDataFrame(edges, "src long, dst long, weight double")
    from linkgraph.graph import LinkGraph

    v = df.select(F.col("src").alias("vid")).union(df.select("dst")).distinct().select(
        "vid", F.col("vid").cast("string").alias("oid")
    )
    g = LinkGraph(vertices=v, edges=df)
    picks = sample_neighbors(g, 2, strategy="topk").orderBy("sample_rank").collect()
    assert [r["dst"] for r in picks] == [2, 3]
    with pytest.raises(ValueError):
        sample_neighbors(g, 2, strategy="nope")


def test_k_hop_layers(spark):
    g = graph_from_edge_vids(spark, STAR_PLUS)
    seeds = spark.createDataFrame([(0,)], "vid long")
    out = k_hop_sample(g, seeds, [2, 2], seed=1)
    l1 = out.where("layer = 1").collect()
    l2 = out.where("layer = 2").collect()
    assert len(l1) == 2 and all(r["src"] == 0 for r in l1)
    # layer-2 sources are exactly layer-1 dsts that have out-edges
    l1_dsts = {r["dst"] for r in l1}
    assert {r["src"] for r in l2} <= l1_dsts


def test_negative_sample_validity(spark):
    g = graph_from_edge_vids(spark, STAR_PLUS)
    negs = negative_sample(g, 3, seed=11)
    adj = {}
    for s, d in STAR_PLUS:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    rows = negs.collect()
    per_src = {}
    for r in rows:
        assert r["neg"] != r["src"]
        assert r["neg"] not in adj.get(r["src"], set())
        per_src.setdefault(r["src"], []).append(r["neg"])
    assert all(len(v) <= 3 for v in per_src.values())
    assert all(len(set(v)) == len(v) for v in per_src.values())  # no dup negs
    # vertex 9 has few non-neighbors but should still find some
    assert len(per_src.get(9, [])) >= 1
    # deterministic
    assert sorted(map(tuple, rows)) == sorted(map(tuple, negative_sample(g, 3, seed=11).collect()))


def test_sample_neighbors_weighted(spark):
    # one hub with a dominant-weight edge: over many seeds the heavy
    # edge must be picked (rank 1) far more often than the light ones
    edges = [(0, 1, 100.0), (0, 2, 1.0), (0, 3, 1.0)]
    df = spark.createDataFrame(edges, "src long, dst long, weight double")
    from linkgraph.graph import LinkGraph

    v = df.select(F.col("src").alias("vid")).union(df.select("dst")).distinct().select(
        "vid", F.col("vid").cast("string").alias("oid")
    )
    g = LinkGraph(vertices=v, edges=df)
    wins = 0
    for seed in range(20):
        first = (
            sample_neighbors(g, 1, strategy="weighted", seed=seed)
            .where("src = 0").first()
        )
        wins += first["dst"] == 1
    assert wins >= 15  # weight 100 vs 1+1 → p(win) ≈ 0.98 per draw
    # deterministic for a fixed seed
    a = sample_neighbors(g, 2, strategy="weighted", seed=3).collect()
    b = sample_neighbors(g, 2, strategy="weighted", seed=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_node2vec_walks_are_paths(spark):
    from linkgraph.sampling import node2vec_walk

    edges = STAR_PLUS + [(3, 4), (4, 5), (5, 3), (9, 0)]
    g = graph_from_edge_vids(spark, edges)
    eset = set(edges)
    rows = node2vec_walk(g, num_walks=6, length=4, p=0.5, q=2.0, seed=7).collect()
    assert len(rows) == 6
    for r in rows:
        walk = r["walk"]
        assert walk[0] == r["walk_id"]
        for a, b in zip(walk, walk[1:]):
            assert (a, b) in eset
    # deterministic across repartitioning
    g2 = graph_from_edge_vids(spark, edges)
    g2 = type(g2)(vertices=g2.vertices, edges=g2.edges.repartition(7), directed=True)
    rows2 = node2vec_walk(g2, num_walks=6, length=4, p=0.5, q=2.0, seed=7).collect()
    assert sorted((r["walk_id"], tuple(r["walk"])) for r in rows) == sorted(
        (r["walk_id"], tuple(r["walk"])) for r in rows2
    )


def test_node2vec_return_bias(spark):
    from linkgraph.sampling import node2vec_walk

    # two-cycles everywhere: with a near-zero return exponent the key of
    # the predecessor is u^p ~ 1, so every second-order hop backtracks.
    edges = [(0, 1), (1, 0), (1, 2), (2, 1), (2, 3), (3, 2), (0, 3), (3, 0)]
    g = graph_from_edge_vids(spark, edges)
    rows = node2vec_walk(g, num_walks=4, length=5, p=1e-9, q=1.0, seed=3).collect()
    for r in rows:
        walk = r["walk"]
        for i in range(2, len(walk)):
            assert walk[i] == walk[i - 2]  # always return to prev


def test_node2vec_explore_bias(spark):
    from linkgraph.sampling import node2vec_walk

    # From 1 the candidates after the hop 0->1 are {0 (return), 2 (nbr of
    # 0), 3 (distance 2)}. A near-zero q exponent makes the distance-2
    # candidate's key u^q ~ 1, so the walk must pick 3.
    edges = [(0, 1), (0, 2), (1, 0), (1, 2), (1, 3)]
    g = graph_from_edge_vids(spark, edges)
    rows = {
        r["walk_id"]: list(r["walk"])
        for r in node2vec_walk(g, num_walks=4, length=2, p=1.0, q=1e-9, seed=1).collect()
    }
    walk0 = rows[0]
    if walk0[1] == 1:  # start 0 hopped to 1 (seed-dependent but deterministic)
        assert walk0[2] == 3
