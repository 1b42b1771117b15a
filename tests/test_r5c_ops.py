"""Unit tests for the round-5 third-wave operators (transitive
reduction, harmonic-function label spreading, Euler verdicts, effective
diameter, cross-doc n-gram dup share, SQ8 quantized search). The
Spark↔DuckDB registry parity for the same six entries rides in
test_oracle_parity.py::test_r5_new_matches_oracle_sf0001."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph


def _g(spark, pairs):
    e = spark.createDataFrame(pairs, "src long, dst long")
    v = (
        e.select(F.col("src").alias("vid"))
        .union(e.select(F.col("dst").alias("vid")))
        .distinct()
        .select("vid", F.col("vid").cast("string").alias("oid"))
    )
    return LinkGraph(vertices=v, edges=e)


def test_transitive_reduction_drops_shortcuts(spark):
    from linkgraph.algorithms.dag import transitive_reduction

    g = _g(spark, [(0, 1), (1, 2), (0, 2), (2, 3), (0, 3), (1, 3), (5, 6)])
    kept = sorted((r.src, r.dst) for r in transitive_reduction(g).collect())
    assert kept == [(0, 1), (1, 2), (2, 3), (5, 6)]


def test_transitive_reduction_preserves_chains(spark):
    from linkgraph.algorithms.dag import transitive_reduction

    g = _g(spark, [(0, 1), (1, 2), (2, 3)])
    kept = sorted((r.src, r.dst) for r in transitive_reduction(g).collect())
    assert kept == [(0, 1), (1, 2), (2, 3)]


def test_transitive_reduction_rejects_cycles(spark):
    from linkgraph.algorithms.dag import transitive_reduction

    g = _g(spark, [(0, 1), (1, 2), (2, 0)])
    with pytest.raises(ValueError, match="cycle"):
        transitive_reduction(g)


def test_harmonic_function_path_graph(spark):
    from linkgraph.algorithms.nodeclass import harmonic_function

    g = _g(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    seeds = spark.createDataFrame([(0, 0), (4, 1)], "vid long, cls long")
    out = {r.vid: r.label for r in harmonic_function(g, seeds, rounds=4).collect()}
    # middle vertex ties 0.5/0.5 -> smallest class; sides lean to their seed
    assert out == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1}


def test_harmonic_function_unreached_is_null(spark):
    from linkgraph.algorithms.nodeclass import harmonic_function

    g = _g(spark, [(0, 1), (5, 6)])
    seeds = spark.createDataFrame([(0, 1)], "vid long, cls long")
    out = {r.vid: r.label for r in harmonic_function(g, seeds, rounds=2).collect()}
    assert out[0] == 1 and out[1] == 1
    assert out[5] is None and out[6] is None


def test_eulerian_verdicts(spark):
    from linkgraph.algorithms.globals import eulerian_summary

    circuit = _g(spark, [(0, 1), (1, 2), (2, 0)])
    got = dict((r.which, r.value) for r in eulerian_summary(circuit).collect())
    assert got == {"is_eulerian": True, "has_eulerian_path": True}

    path_only = _g(spark, [(0, 1), (1, 2)])
    got = dict((r.which, r.value) for r in eulerian_summary(path_only).collect())
    assert got == {"is_eulerian": False, "has_eulerian_path": True}

    disconnected = _g(spark, [(0, 1), (1, 0), (2, 3), (3, 2)])
    got = dict((r.which, r.value) for r in eulerian_summary(disconnected).collect())
    assert got == {"is_eulerian": False, "has_eulerian_path": False}


def test_effective_diameter_path(spark):
    from linkgraph.algorithms.paths import effective_diameter

    # directed path 0->1->2->3: pairs (i<j) distances 1,1,1,2,2,3
    g = _g(spark, [(0, 1), (1, 2), (2, 3)])
    row = effective_diameter(g, n_roots=64, q=0.9).first()
    assert row.n_pairs == 6
    # sorted dists [1,1,1,2,2,3]; ceil(0.9*6)=6 -> 6th value = 3
    assert row.effective_diameter == 3
    row = effective_diameter(g, n_roots=64, q=0.5).first()
    assert row.effective_diameter == 1  # ceil(3) -> third of [1,1,1,...] = 1


def test_cross_doc_ngram_dup_counts(spark):
    from linkgraph.pipeline.curation import cross_doc_ngram_dup

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c x y"), (3, "zz qq ww")],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.n_grams, r.dup_grams, r.dup_frac) for r in
           cross_doc_ngram_dup(df, n=3).collect()}
    assert out[1] == (3, 1, pytest.approx(1 / 3, abs=1e-6))
    assert out[2] == (3, 1, pytest.approx(1 / 3, abs=1e-6))
    assert out[3] == (1, 0, 0.0)


def test_sq8_codes_bounded_and_topk_sane(spark):
    from linkgraph.pipeline.similarity import sq8_quantize, sq8_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    codes, mins, maxs = sq8_quantize(emb)
    stats = codes.select(
        F.min(F.array_min("code")).alias("lo"), F.max(F.array_max("code")).alias("hi")
    ).first()
    assert stats.lo >= 0 and stats.hi <= 255
    assert all(mx >= mn for mn, mx in zip(mins, maxs))

    out = sq8_topk(emb, [0], k=3).collect()
    assert len(out) == 3
    assert all(r.qid == 0 and r.vec_id != 0 for r in out)
    ranks = sorted(r.rank for r in out)
    assert ranks == [1, 2, 3]
    dists = [r.dist for r in sorted(out, key=lambda r: r.rank)]
    assert dists == sorted(dists)


def test_sq8_distance_is_integer_exact(spark):
    from linkgraph.pipeline.similarity import sq8_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = {(r.qid, r.vec_id): r.dist for r in sq8_topk(emb, [0, 1], k=5).collect()}
    b = {(r.qid, r.vec_id): r.dist for r in
         sq8_topk(emb.repartition(7), [0, 1], k=5).collect()}
    assert a == b


def test_nx_wrappers_r5c(spark):
    from linkgraph import nx as lnx

    G = lnx.DiGraph(spark)
    G.add_edges_from([(0, 1), (1, 2), (0, 2), (2, 3)])
    assert lnx.transitive_reduction(G) == [(0, 1), (1, 2), (2, 3)]
    assert lnx.is_eulerian(G) is False
    assert lnx.has_eulerian_path(G) is False
    assert lnx.effective_diameter(G) == 2

    C = lnx.DiGraph(spark)
    C.add_edges_from([(0, 1), (1, 2), (2, 0)])
    assert lnx.is_eulerian(C) is True

    H = lnx.DiGraph(spark)
    H.add_node("a", label="x")
    H.add_node("e", label="y")
    H.add_edges_from([("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")])
    assert lnx.harmonic_function(H) == ["x", "y", "x", "x", "y"]


def test_cross_doc_ngram_dup_xxhash_path_same_counts(spark):
    """The production key expression (xxhash64) gives identical
    counts/fractions to the md5 oracle tier — only the key bytes differ
    (8-byte long vs 32-hex), not the dedup semantics."""
    from linkgraph.pipeline.curation import cross_doc_ngram_dup

    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c x y"), (3, "x y z w"), (4, "q r s")],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, cross_doc_ngram_dup(df, n=3, hash_mode="md5").collect()))
    b = sorted(map(tuple, cross_doc_ngram_dup(df, n=3, hash_mode="xxhash64").collect()))
    assert a == b


def test_k_corona(spark):
    from linkgraph.algorithms.cores import k_corona

    # K4 plus a pendant: 2-corona of the K4 component = {} (all core
    # degrees 3), 3-corona = the K4 itself; pendant never in a k>=1 core
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 9)]
    g = _g(spark, pairs)
    got3 = sorted(r.vid for r in k_corona(g, 3).collect() if r.value == 1)
    assert got3 == [0, 1, 2, 3]
    got2 = sorted(r.vid for r in k_corona(g, 2).collect() if r.value == 1)
    assert got2 == []


def test_forest_tree_verdicts(spark):
    from linkgraph.algorithms.globals import forest_summary

    tree = _g(spark, [(0, 1), (1, 2), (1, 3)])
    got = {r.which: r.value for r in forest_summary(tree).collect()}
    assert got == {"is_forest": True, "is_tree": True}

    forest = _g(spark, [(0, 1), (2, 3)])
    got = {r.which: r.value for r in forest_summary(forest).collect()}
    assert got == {"is_forest": True, "is_tree": False}

    cyc = _g(spark, [(0, 1), (1, 2), (2, 0)])
    got = {r.which: r.value for r in forest_summary(cyc).collect()}
    assert got == {"is_forest": False, "is_tree": False}
