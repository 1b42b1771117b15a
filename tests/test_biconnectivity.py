"""Tarjan–Vishkin biconnectivity vs sequential references: articulation
points against brute-force vertex removal, blocks against a classic
Tarjan lowpoint DFS, plus parallelism invariance (the determinism half
of the scaling criterion) and the staged driver-entry parity
(g_articulation vs its banned-vertex recursive-CTE oracle)."""

from __future__ import annotations

import itertools
import random
import sys

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


def _adj(pairs):
    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return adj


def brute_articulation(pairs):
    adj = _adj(pairs)
    verts = set(adj)

    def ncomp(vs):
        seen, n = set(), 0
        for s in sorted(vs):
            if s in seen:
                continue
            n += 1
            stack = [s]
            seen.add(s)
            while stack:
                x = stack.pop()
                for y in adj.get(x, ()):
                    if y in vs and y not in seen:
                        seen.add(y)
                        stack.append(y)
        return n

    base = ncomp(verts)
    art = []
    for v in sorted(verts):
        rest = verts - {v}
        if rest and ncomp(rest) > base:
            art.append(v)
    return art


def tarjan_blocks(pairs):
    sys.setrecursionlimit(100_000)
    adj = _adj(pairs)
    disc, low = {}, {}
    timer = [0]
    stack, blocks = [], []

    def dfs(u, parent):
        disc[u] = low[u] = timer[0]
        timer[0] += 1
        for v in sorted(adj[u]):
            e = (min(u, v), max(u, v))
            if v not in disc:
                stack.append(e)
                dfs(v, u)
                low[u] = min(low[u], low[v])
                if low[v] >= disc[u]:
                    blk = set()
                    while True:
                        x = stack.pop()
                        blk.add(x)
                        if x == e:
                            break
                    blocks.append(frozenset(blk))
            elif v != parent and disc[v] < disc[u]:
                stack.append(e)
                low[u] = min(low[u], disc[v])

    for s in sorted(adj):
        if s not in disc:
            dfs(s, None)
    return frozenset(blocks)


CASES = [
    [(0, 1), (1, 2), (0, 2), (0, 3), (3, 4), (0, 4)],  # 2 triangles sharing 0
    [(0, 1), (1, 2), (2, 3)],  # path
    [(0, 1), (1, 2), (2, 3), (3, 0), (2, 5)],  # cycle + pendant
    [(0, 1), (1, 2), (2, 0)],  # triangle
    [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)],  # cycle + chord
    [(0, 1), (2, 3)],  # two components
]
_rng = random.Random(20260821)
for _ in range(8):
    n = _rng.randint(5, 14)
    m = _rng.randint(n - 1, min(n * (n - 1) // 2, n + 7))
    CASES.append(list(_rng.sample(list(itertools.combinations(range(n), 2)), m)))


@pytest.mark.parametrize("idx", range(len(CASES)))
def test_articulation_matches_bruteforce(spark, idx):
    from linkgraph.algorithms.biconnectivity import articulation_points

    pairs = CASES[idx]
    got = sorted(r.vid for r in articulation_points(_g(spark, pairs)).collect())
    assert got == brute_articulation(pairs)


@pytest.mark.parametrize("idx", range(len(CASES)))
def test_blocks_match_tarjan(spark, idx):
    from linkgraph.algorithms.biconnectivity import biconnected_components

    pairs = CASES[idx]
    rows = biconnected_components(_g(spark, pairs)).collect()
    groups: dict = {}
    for r in rows:
        groups.setdefault(r.block, set()).add((r.lo, r.hi))
    got = frozenset(frozenset(s) for s in groups.values())
    assert got == tarjan_blocks(pairs)


def test_block_count_and_invariance(spark):
    """Repartitioned input gives identical blocks AND identical block
    ids (min child vid is partition-independent)."""
    from linkgraph.algorithms.biconnectivity import biconnected_components

    pairs = CASES[2]
    g1 = _g(spark, pairs)
    e2 = spark.createDataFrame(pairs, "src long, dst long").repartition(13)
    g2 = LinkGraph(vertices=g1.vertices, edges=e2)
    a = sorted(map(tuple, biconnected_components(g1).collect()))
    b = sorted(map(tuple, biconnected_components(g2).collect()))
    assert a == b


def test_staged_articulation_entry_matches_oracle(spark):
    """The staged post-window driver entry (queries_r5c.STAGED_QUERIES
    ['g_articulation']) against its banned-vertex recursive-CTE oracle
    at sf0.001 — same gate the window entries get, run locally because
    the 50-slot window is full (SURVEY §8)."""
    import duckdb

    from linkgraph import queries_r5c as R

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("orders",):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    sdf = R.STAGED_QUERIES["g_articulation"](spark, sf)
    got = sorted(r.vid for r in sdf.collect())
    want = sorted(r[0] for r in con.execute(R.STAGED_ORACLE_SQL["g_articulation"]).fetchall())
    assert got == want


# ---- ANF (staged post-window too; shares this file's staged-gate role)


def test_staged_anf_entry_matches_oracle(spark):
    """g_anf (queries_r5c.STAGED_QUERIES) vs the full DuckDB replay of
    the FM sketch computation — md5 bit positions, bit_or propagation,
    lowest-zero-bit ranks — exact integers at sf0.001."""
    import duckdb

    from linkgraph import queries_r5c as R

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM read_parquet('{sf}/orders.parquet')")
    got = sorted(tuple(r) for r in R.STAGED_QUERIES["g_anf"](spark, sf).collect())
    want = sorted(con.execute(R.STAGED_ORACLE_SQL["g_anf"]).fetchall())
    assert got == want


def test_anf_estimate_tracks_exact_ball_sizes(spark):
    """FM estimate within loose rsd bounds of the exact neighborhood
    function (directed balls via multi_source_bfs) and monotone in h."""
    from linkgraph.algorithms.anf import anf_estimate
    from linkgraph.algorithms.paths import multi_source_bfs

    pairs = [(i, (i + 1) % 20) for i in range(20)] + [(i, (i + 7) % 20) for i in range(20)]
    g = _g(spark, pairs)
    est = anf_estimate(g, max_h=3, trials=16)
    d = multi_source_bfs(g).collect()
    exact = {
        h: sum(1 for r in d if 0 < r["dist"] <= h) + len({r["root"] for r in d})
        for h in (1, 2, 3)
    }
    assert est[1] <= est[2] <= est[3]
    for h in (1, 2, 3):
        assert exact[h] * 0.35 <= est[h] <= exact[h] * 2.8, (h, est[h], exact[h])


def test_staged_salsa_entry_matches_oracle(spark):
    """g_salsa vs the closed-form SQL replay (bipartite-support WCC via
    recursive reachability + integer-ratio scores) at sf0.001."""
    import duckdb

    from linkgraph import queries_r5c as R

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM read_parquet('{sf}/orders.parquet')")
    got = sorted(tuple(r) for r in R.STAGED_QUERIES["g_salsa"](spark, sf).collect())
    want = sorted(con.execute(R.STAGED_ORACLE_SQL["g_salsa"]).fetchall())
    assert got == want


def test_salsa_scores_are_distributions(spark):
    """Each side sums to 1 (within rounding) and a hub-only vertex has
    authority 0 (and vice versa)."""
    from linkgraph.algorithms.salsa import salsa

    g = _g(spark, [(0, 1), (0, 2), (3, 1), (3, 4), (5, 0)])
    rows = {r.vid: (r.hub, r.authority) for r in salsa(g).collect()}
    assert abs(sum(h for h, _ in rows.values()) - 1.0) < 1e-6
    assert abs(sum(a for _, a in rows.values()) - 1.0) < 1e-6
    assert rows[5][1] == 0.0  # 5 has no in-edges
    assert rows[4][0] == 0.0  # 4 has no out-edges
