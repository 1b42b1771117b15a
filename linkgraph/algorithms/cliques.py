"""k-clique percolation communities (k = 3: triangle percolation).

NetworkX-parity surface (nx.community.k_clique_communities(G, 3)): two
triangles belong to the same community iff they are connected through a
chain of triangles sharing an edge; a community's node set is the union
of its triangles' vertices (nodes may belong to several communities, as
nx — the output is (community, vid) membership pairs, community id =
min member vid).

Spark shape — no triangle ids, no clique graph materialized per se: the
percolation components are computed over EDGE nodes instead. Two edges
are linked iff they co-occur in a triangle; a triangle's three edges
form a connected triple, and two edge-sharing triangles connect through
the shared edge, so components of the edge-link graph restricted to
triangle edges ARE the k=3 percolation communities. Each triangle emits
two star links (its min edge ↔ the other two), so the link table is
2·|triangles| rows and the component step is the engine's own
min-propagation WCC on a graph whose nodes are packed edge keys
((lo<<32)|hi on 32-bit vid spaces — the census/wedge-join packed-key
lesson). Triangles themselves come from the degree-oriented wedge join
(triangles.py kernel shape, Σ min-deg(u,v) wedge cost).

k=3 and k=4 are implemented (k=4 percolates 4-cliques through shared
triangle FACES, same packed-node WCC shape one rung up); general k
needs maximal-clique enumeration (Bron–Kerbosch), inherently
sequential/exponential — out of engine scope, loudly rejected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph, packed_pair
from linkgraph.algorithms.triangles import _oriented_edges, _own_cache
from linkgraph.algorithms.wcc import wcc


def triangle_triples(graph: LinkGraph) -> DataFrame:
    """(a, b, c) with a < b < c, one row per triangle — the
    degree-oriented wedge join closed on the undirected edge list.

    The oriented edges feed BOTH wedge sides and the closure, so they are
    persisted via triangles._own_cache (bounded residency, same owner
    slot as triangles()) — otherwise the degree aggregate + orientation
    join re-runs three times per action."""
    oe = _own_cache(_oriented_edges(graph))
    und = graph.simple_undirected_edges()
    w1 = oe.select(F.col("src").alias("v"), F.col("dst").alias("u"))
    w2 = oe.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    wedges = w1.join(w2, "v").where(F.col("u") < F.col("w"))
    closed = wedges.join(
        und.select(F.col("lo").alias("u"), F.col("hi").alias("w")), ["u", "w"]
    )
    lo3 = F.least("v", "u", "w")
    hi3 = F.greatest("v", "u", "w")
    return closed.select(
        lo3.alias("a"),
        (F.col("v") + F.col("u") + F.col("w") - lo3 - hi3).alias("b"),
        hi3.alias("c"),
    )


def k_clique_communities(graph: LinkGraph, k: int = 3) -> DataFrame:
    """(community, vid) membership pairs of the k=3 clique percolation.

    Community id = the component's WCC label over packed edge-key nodes,
    i.e. the packed (lo<<32)|hi key of the lexicographically smallest
    edge in the community — deterministic AND unique per community.  The
    min MEMBER vid is not a valid id: two edge-disjoint triangle
    components sharing only their minimum vertex (e.g. triangles
    {0,1,2} and {0,3,4}) would collapse into one group under it."""
    if k == 4:
        return k_clique_communities_4(graph)
    if k != 3:
        if k < 3:
            raise ValueError("k_clique_communities: k must be ≥ 3")
        # k ≥ 5: completeness tier via maximal-clique enumeration
        # (maxcliques.k_clique_communities_general); k=3/k=4 keep the
        # packed-integer fast paths below. The general form's community
        # ids are sorted member-CSV keys, not packed longs — callers
        # group by the column, never parse it (nx.py does exactly that).
        from linkgraph.algorithms.maxcliques import k_clique_communities_general

        return k_clique_communities_general(graph, k)
    if not graph.pair_key_packable():
        raise ValueError(
            "k_clique_communities: needs vids in [0, 2^31) to pack edge "
            "keys — remap via assign_dense_ids first"
        )
    # u<w and v's position is irrelevant for the key: a triangle's edges
    # sorted-pair keys. e1 = (a,b), e2 = (a,c), e3 = (b,c); star-link the
    # min key to the other two.
    tri = triangle_triples(graph).select(
        packed_pair("a", "b").alias("e1"),
        packed_pair("a", "c").alias("e2"),
        packed_pair("b", "c").alias("e3"),
    )
    links = tri.select(F.col("e1").alias("src"), F.col("e2").alias("dst")).union(
        tri.select(F.col("e1").alias("src"), F.col("e3").alias("dst"))
    )
    nodes = (
        links.select(F.col("src").alias("vid"))
        .union(links.select(F.col("dst").alias("vid")))
        .distinct()
        .select("vid", F.col("vid").cast("string").alias("oid"))
    )
    eg = LinkGraph(vertices=nodes, edges=links)
    comp = wcc(eg)  # (vid = packed edge key, value = component label)
    members = comp.select(
        F.col("value").alias("comp"),
        F.shiftright("vid", 32).cast("long").alias("m"),
    ).union(
        comp.select(
            F.col("value").alias("comp"),
            (F.col("vid") - F.shiftleft(F.shiftright("vid", 32), 32)).alias("m"),
        )
    ).distinct()
    return members.select(
        F.col("comp").alias("community"), F.col("m").alias("vid")
    ).distinct()


_T21 = 1 << 21


def _packed_triple(a, b, c):
    """((a<<21)|b)<<21|c — three vids in one long; needs vids < 2^21."""
    return (F.col(a) * F.lit(_T21) + F.col(b)) * F.lit(_T21) + F.col(c)


def four_clique_quads(graph: LinkGraph) -> DataFrame:
    """(a, b, c, d) with a < b < c < d, one row per 4-clique: the
    triangle stream closed against the undirected edge list three more
    times (d adjacent to all of a, b, c). Cost = the triangle join plus
    three equi-joins on (vertex, d) — each bounded by Σ tri-deg·deg,
    the standard clique-enumeration ladder one rung up."""
    tri = triangle_triples(graph)
    und = graph.simple_undirected_edges()
    return (
        tri.join(und.select(F.col("lo").alias("c"), F.col("hi").alias("d")), "c")
        .join(und.select(F.col("lo").alias("b"), F.col("hi").alias("d")), ["b", "d"])
        .join(und.select(F.col("lo").alias("a"), F.col("hi").alias("d")), ["a", "d"])
        .select("a", "b", "c", "d")
    )


def k_clique_communities_4(graph: LinkGraph) -> DataFrame:
    """(community, vid) membership of the k=4 clique percolation
    (nx.community.k_clique_communities(G, 4)): two 4-cliques belong to
    the same community iff chained through shared triangles.

    Same packed-node shape as k=3 one rung up: nodes are the 4-clique's
    four triangle FACES as packed (a<<42|b<<21|c) keys; each 4-clique
    star-links its min face (a,b,c) to the other three, so two 4-cliques
    sharing a face connect through that face node, and WCC components of
    the face-link graph ARE the percolation communities. Community id =
    the component's min face key (unique per community; min member vid is
    not — the k=3 lesson). Members = the union of unpacked face vids."""
    mx = graph.vertices.agg(F.max("vid"), F.min("vid")).first()
    if mx[1] is not None and (mx[1] < 0 or mx[0] >= _T21):
        raise ValueError(
            "k_clique_communities_4: needs vids in [0, 2^21) to pack "
            "triangle-face keys — remap via assign_dense_ids first"
        )
    q4 = four_clique_quads(graph)
    f1 = _packed_triple("a", "b", "c")  # min face under a<b<c<d
    faces = q4.select(
        f1.alias("src"), _packed_triple("a", "b", "d").alias("dst")
    ).union(
        q4.select(f1.alias("src"), _packed_triple("a", "c", "d").alias("dst"))
    ).union(
        q4.select(f1.alias("src"), _packed_triple("b", "c", "d").alias("dst"))
    )
    nodes = (
        faces.select(F.col("src").alias("vid"))
        .union(faces.select(F.col("dst").alias("vid")))
        .distinct()
        .select("vid", F.col("vid").cast("string").alias("oid"))
    )
    comp = wcc(LinkGraph(vertices=nodes, edges=faces))
    mask = F.lit(_T21 - 1)
    members = (
        comp.select(F.col("value").alias("comp"), F.shiftright("vid", 42).alias("m"))
        .union(
            comp.select(
                F.col("value").alias("comp"),
                F.shiftright("vid", 21).bitwiseAND(mask).alias("m"),
            )
        )
        .union(
            comp.select(F.col("value").alias("comp"), F.col("vid").bitwiseAND(mask).alias("m"))
        )
        .distinct()
    )
    return members.select(F.col("comp").alias("community"), F.col("m").alias("vid"))
