"""Pregel user-API tests: reference algorithms re-implemented on the
vertex-centric surface must match the built-in implementations, and
aggregators must report per-superstep values (pregel_compute_context.h
aggregate/get_aggregated_value semantics)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from linkgraph.graph import graph_from_edge_vids, LinkGraph
from tests.conftest import rmat_edges


def _weighted(spark, edges):
    g = graph_from_edge_vids(spark, edges)
    e = g.edges.select(
        "src", "dst",
        (F.pmod(F.col("src") + F.col("dst"), F.lit(5)) + 1).cast("double").alias("weight"),
    )
    return LinkGraph(vertices=g.vertices, edges=e)


def test_pregel_sssp_matches_builtin(spark):
    from linkgraph.algorithms import sssp
    from linkgraph.pregel import pregel_sssp

    g = _weighted(spark, rmat_edges(80, 300))
    src = 0
    builtin = {r["vid"]: r["value"] for r in sssp(g, src=src).collect()}
    pregel = {
        r["vid"]: r["value"]
        for r in pregel_sssp(g, src=src).collect()
        if not math.isinf(r["value"])
    }
    builtin = {k: v for k, v in builtin.items() if v >= 0}
    assert set(pregel) == set(builtin)
    assert all(math.isclose(pregel[k], builtin[k], abs_tol=1e-9) for k in builtin)


def test_pregel_wcc_matches_builtin(spark):
    from linkgraph.algorithms import wcc
    from linkgraph.pregel import pregel_wcc

    edges = rmat_edges(60, 90)  # sparse → several components
    g = graph_from_edge_vids(spark, edges)
    builtin = {r["vid"]: r["value"] for r in wcc(g).collect()}
    pregel = {r["vid"]: r["value"] for r in pregel_wcc(g).collect()}
    assert pregel == builtin


def test_pregel_aggregators_and_history(spark):
    from linkgraph.pregel import PregelProgram, run_pregel

    chain = [(i, i + 1) for i in range(5)]
    g = graph_from_edge_vids(spark, chain)
    program = PregelProgram(
        initial_value=F.when(F.col("vid") == 0, F.lit(0.0)).otherwise(F.lit(float("inf"))),
        initially_active=F.col("vid") == 0,
        combine=F.min,
        update=lambda value, msg, rnd: (
            F.least(value, F.coalesce(msg, value)),
            F.coalesce(msg, value) < value,
        ),
        emit=lambda value, w: value + F.lit(1.0),
        aggregators={"max_finite": lambda c: F.max(F.when(~F.isnan(c) & (c != float("inf")), c))},
    )
    res = run_pregel(g, program, max_rounds=50)
    assert res.converged
    # BFS over a 5-edge chain: depth frontier advances once per superstep
    assert res.rounds == 6  # 5 propagation rounds + 1 quiescence round
    assert [h["max_finite"] for h in res.history[:5]] == [1.0, 2.0, 3.0, 4.0, 5.0]
    vals = {r["vid"]: r["value"] for r in res.state.collect()}
    assert vals == {i: float(i) for i in range(6)}


def test_graph_mutation_semantics(spark):
    edges = [(0, 1), (1, 2), (2, 0), (2, 3)]
    g = graph_from_edge_vids(spark, edges)
    # remove vertex 0 → incident edges (0,1) and (2,0) go with it
    g2 = g.remove_vertices(spark.createDataFrame([(0,)], "vid long"))
    assert {(r["src"], r["dst"]) for r in g2.edges.collect()} == {(1, 2), (2, 3)}
    assert {r["vid"] for r in g2.vertices.collect()} == {1, 2, 3}
    # add an edge with an implicit new endpoint; duplicates are ignored
    g3 = g2.add_edges(spark.createDataFrame([(3, 9), (1, 2)], "src long, dst long"))
    assert {(r["src"], r["dst"]) for r in g3.edges.collect()} == {(1, 2), (2, 3), (3, 9)}
    assert {r["vid"] for r in g3.vertices.collect()} == {1, 2, 3, 9}
    # remove an edge; vertices stay
    g4 = g3.remove_edges(spark.createDataFrame([(2, 3)], "src long, dst long"))
    assert {(r["src"], r["dst"]) for r in g4.edges.collect()} == {(1, 2), (3, 9)}
    assert {r["vid"] for r in g4.vertices.collect()} == {1, 2, 3, 9}
    # explicit add_vertices keeps existing rows and appends new ones
    g5 = g4.add_vertices(spark.createDataFrame([(9, "nine"), (42, "forty-two")],
                                               "vid long, oid string"))
    oids = {r["vid"]: r["oid"] for r in g5.vertices.collect()}
    assert oids[42] == "forty-two" and oids[9] == "9"  # 9 pre-existing, kept
