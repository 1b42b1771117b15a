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


# ---- general-k clique percolation (built on find_cliques)


def ref_percolation(pairs, k):
    """Frozenset-of-frozensets reference: k-cliques from maximal-clique
    subsets, adjacency = shared (k-1) vertices, union-find components."""
    from itertools import combinations

    kcs = sorted({tuple(sorted(sub)) for c in ref_cliques(pairs) if len(c) >= k
                  for sub in combinations(c, k)})
    parent = {c: c for c in kcs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    buckets: dict = {}
    for c in kcs:
        for i in range(k):
            buckets.setdefault(c[:i] + c[i + 1:], []).append(c)
    for mem in buckets.values():
        for other in mem[1:]:
            ra, rb = find(mem[0]), find(other)
            if ra != rb:
                parent[rb] = ra
    comms: dict = {}
    for c in kcs:
        comms.setdefault(find(c), set()).update(c)
    return frozenset(frozenset(s) for s in comms.values())


def _communities(rows):
    groups: dict = {}
    for r in rows:
        groups.setdefault(r["community"], set()).add(r["vid"])
    return frozenset(frozenset(s) for s in groups.values())


@pytest.mark.parametrize("k", [3, 4, 5])
def test_general_percolation_matches_reference(spark, k):
    from linkgraph.algorithms.maxcliques import k_clique_communities_general

    pairs = CASES[5 + k % 3] + CASES[2]  # mix of random + K4 cases
    got = _communities(k_clique_communities_general(_g(spark, pairs), k).collect())
    assert got == ref_percolation(pairs, k)


def test_general_matches_packed_k3_k4(spark):
    """The general tier partitions vertices identically to the packed
    k=3 and k=4 kernels (labels differ — CSV key vs packed long)."""
    from linkgraph.algorithms.cliques import k_clique_communities
    from linkgraph.algorithms.maxcliques import k_clique_communities_general

    pairs = CASES[3] + [(10, 11), (11, 12), (10, 12)]
    g = _g(spark, pairs)
    for k in (3, 4):
        a = _communities(k_clique_communities_general(g, k).collect())
        b = _communities(k_clique_communities(g, k=k).collect())
        assert a == b


def test_public_api_routes_general_k(spark):
    from linkgraph.algorithms.cliques import k_clique_communities

    pairs = list(itertools.combinations(range(6), 2))  # K6
    got = _communities(k_clique_communities(_g(spark, pairs), k=5).collect())
    assert got == frozenset({frozenset(range(6))})
