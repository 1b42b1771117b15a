"""find_cliques vs a sequential whole-graph Bron–Kerbosch reference
(nx.find_cliques semantics: maximal cliques incl. maximal edges and
isolated-vertex singletons)."""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph


def _g(spark, pairs, extra_vertices=()):
    e = spark.createDataFrame(pairs, "src long, dst long")
    v = e.select(F.col("src").alias("vid")).union(
        e.select(F.col("dst").alias("vid"))
    )
    if extra_vertices:
        v = v.union(
            spark.createDataFrame([(int(x),) for x in extra_vertices], "vid long")
        )
    v = v.distinct().select("vid", F.col("vid").cast("string").alias("oid"))
    return LinkGraph(vertices=v, edges=e)


def ref_cliques(pairs, extra_vertices=()):
    adj: dict = {}
    verts = set(extra_vertices)
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
        verts |= {a, b}
    out = []

    def bk(R, P, X):
        if not P and not X:
            out.append(tuple(sorted(R)))
            return
        u = max(P | X, key=lambda x: (len(P & adj.get(x, set())), -x))
        for v in sorted(P - adj.get(u, set())):
            nv = adj.get(v, set())
            bk(R + [v], P & nv, X & nv)
            P = P - {v}
            X = X | {v}

    bk([], set(verts), set())
    return sorted(out)


CASES = [
    [(0, 1), (1, 2), (0, 2), (2, 3)],  # triangle + pendant
    [(0, 1), (1, 2), (2, 3)],  # path: 3 maximal edges
    [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)],  # K4
    [(0, 1), (1, 2), (0, 2), (1, 3), (2, 3), (1, 4), (2, 4), (3, 4)],
    [(0, 1), (2, 3)],  # two maximal edges
]
_rng = random.Random(555)
for _ in range(5):
    n = _rng.randint(6, 12)
    m = _rng.randint(n, min(n * (n - 1) // 2, 3 * n))
    CASES.append(list(_rng.sample(list(itertools.combinations(range(n), 2)), m)))


@pytest.mark.parametrize("idx", range(len(CASES)))
def test_find_cliques_matches_reference(spark, idx):
    from linkgraph.algorithms.maxcliques import find_cliques

    pairs = CASES[idx]
    got = sorted(tuple(r["members"]) for r in find_cliques(_g(spark, pairs)).collect())
    assert got == ref_cliques(pairs)


def test_find_cliques_singletons_and_counts(spark):
    from linkgraph.algorithms.maxcliques import (
        clique_number,
        find_cliques,
        number_of_cliques,
    )

    pairs = [(0, 1), (1, 2), (0, 2)]
    g = _g(spark, pairs, extra_vertices=[9])
    got = sorted(tuple(r["members"]) for r in find_cliques(g).collect())
    assert got == [(0, 1, 2), (9,)]
    assert clique_number(g) == 3
    assert number_of_cliques(g) == 2


def test_find_cliques_hub_cap_raises(spark):
    from linkgraph.algorithms.maxcliques import find_cliques

    pairs = list(itertools.combinations(range(8), 2))  # K8: 21 pairs/corner
    with pytest.raises(ValueError, match="max_group_pairs"):
        find_cliques(_g(spark, pairs), max_group_pairs=10).collect()


def test_nx_find_cliques_wrapper(spark):
    from linkgraph import nx as lnx

    G = lnx.Graph(spark)
    G.add_edges_from([("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")])
    got = sorted(frozenset(c) for c in lnx.find_cliques(G))
    assert set(got) == {frozenset({"a", "b", "c"}), frozenset({"c", "d"})}
    assert lnx.graph_clique_number(G) == 3
    assert lnx.graph_number_of_cliques(G) == 2
