"""Maximal clique enumeration — vertex-ordered Bron–Kerbosch with
pivoting, distributed by per-vertex subproblems.

NetworkX parity: ``nx.find_cliques`` / ``nx.graph_clique_number`` /
``nx.graph_number_of_cliques`` (the reference exposes these through its
NetworkX-compat fallback). Closes the scope note in
algorithms/cliques.py: general-k clique machinery "requires
maximal-clique enumeration" — this is it.

Spark shape (Eppstein–Löffler–Strash decomposition, SEA'11): order
vertices by the (degree, vid) total key; every maximal clique is
reported exactly once by its MINIMUM vertex v under that order, via the
sequential Bron–Kerbosch call ``BK(R={v}, P=N⁺(v), X=N⁻(v))`` — P the
later neighbors, X the earlier (X seeds the exclusion set, so cliques
extendable by an earlier vertex are correctly suppressed as
non-maximal-here). The per-vertex subproblem needs only N(v) and the
edges AMONG N(v): each triangle {x,y,z} contributes one neighbor-pair
row to each of its three corners, so the group payload is exactly the
per-corner triangle list — Σ_v tri(v) = 3·#triangles rows total, the
same budget the clustering-coefficient family already pays. Groups run
Tomita-pivot BK in an Arrow-batched ``applyInPandas`` (pure-python per
group, but each group is one vertex's neighborhood — the ELS bound says
O(d·3^{d/3}) per group with d the later-degree, and real link graphs
keep d small after degree ordering).

Caps (loud, like linkpred/simhash): ``max_group_pairs`` bounds one
vertex's neighbor-pair payload — a hub whose neighborhood is itself
dense is exactly the pathological BK input, and silently truncating
would under-report cliques, so the operator raises instead.

Output: one row per maximal clique, ``members array<long>`` sorted
ascending; singletons (isolated vertices) and maximal edges included,
matching nx.find_cliques semantics.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph


def _bk_pivot(adj: dict, R: list, P: set, X: set, out: list) -> None:
    """Tomita-pivot Bron–Kerbosch; appends sorted member tuples to out."""
    if not P and not X:
        out.append(tuple(sorted(R)))
        return
    pivot_pool = P | X
    u = max(pivot_pool, key=lambda x: (len(P & adj.get(x, set())), -x))
    for v in sorted(P - adj.get(u, set())):
        nv = adj.get(v, set())
        _bk_pivot(adj, R + [v], P & nv, X & nv, out)
        P = P - {v}
        X = X | {v}


def find_cliques(graph: LinkGraph, max_group_pairs: int = 2_000_000) -> DataFrame:
    """One row per maximal clique of the undirected simple view:
    ``(members array<long>)``, members sorted ascending. Deterministic
    (degree-ordered decomposition + sorted iteration)."""
    spark = graph.edges.sparkSession
    und = graph.simple_undirected_edges().persist()
    adj = und.select(F.col("lo").alias("v"), F.col("hi").alias("n")).union(
        und.select(F.col("hi").alias("v"), F.col("lo").alias("n"))
    )
    deg = adj.groupBy("v").agg(F.count("*").alias("d"))
    # total order key: later(v) = (deg, vid) lexicographic
    keyed = adj.join(deg.withColumnRenamed("v", "n").withColumnRenamed("d", "dn"), "n").join(
        deg, "v"
    )
    nbrs = keyed.select(
        "v",
        "n",
        (
            (F.col("dn") > F.col("d"))
            | ((F.col("dn") == F.col("d")) & (F.col("n") > F.col("v")))
        ).alias("later"),
    )
    # neighbor-pair rows: triangle {x,y,z} -> (x,{y,z}), (y,{x,z}), (z,{x,y})
    from linkgraph.algorithms.cliques import triangle_triples

    tri = triangle_triples(graph)
    pairs = (
        tri.select(F.col("a").alias("v"), F.col("b").alias("p"), F.col("c").alias("q"))
        .union(tri.select(F.col("b").alias("v"), F.col("a").alias("p"), F.col("c").alias("q")))
        .union(tri.select(F.col("c").alias("v"), F.col("a").alias("p"), F.col("b").alias("q")))
    )
    big = (
        pairs.groupBy("v").agg(F.count("*").alias("np")).where(
            F.col("np") > max_group_pairs
        )
    ).first()
    if big is not None:
        raise ValueError(
            f"find_cliques: vertex {big['v']} has {big['np']} neighbor pairs "
            f"> max_group_pairs={max_group_pairs} — its neighborhood is the "
            "pathological dense-BK input; raise the cap deliberately"
        )
    n_agg = nbrs.groupBy("v").agg(
        F.collect_list(F.struct("n", "later")).alias("ns")
    )
    p_agg = pairs.groupBy("v").agg(
        F.collect_list(F.struct("p", "q")).alias("ps")
    )
    groups = n_agg.join(p_agg, "v", "left")

    def run_bk(pdf: pd.DataFrame) -> pd.DataFrame:
        # zip over plain lists, not iterrows(): most groups are tiny
        # (one vertex's later-neighborhood), so per-row overhead — not
        # BK itself — dominates; iterrows() is ~5× that overhead
        rows = []
        for v, ns, ps in zip(pdf["v"], pdf["ns"], pdf["ps"]):
            v = int(v)
            P, X = set(), set()
            adj_l: dict = {}
            for s in ns:
                n, later = int(s["n"]), bool(s["later"])
                (P if later else X).add(n)
            if ps is not None:
                for s in ps:
                    p, q = int(s["p"]), int(s["q"])
                    adj_l.setdefault(p, set()).add(q)
                    adj_l.setdefault(q, set()).add(p)
            out: list = []
            _bk_pivot(adj_l, [v], P, X, out)
            rows.extend({"members": list(c)} for c in out)
        return pd.DataFrame(rows, columns=["members"])

    cliques = groups.groupBy("v").applyInPandas(run_bk, "members array<long>")
    singles = (
        graph.vertices.select("vid")
        .join(adj.select(F.col("v").alias("vid")).distinct(), "vid", "left_anti")
        .select(F.array(F.col("vid")).alias("members"))
    )
    out = cliques.unionByName(singles).localCheckpoint(eager=True)
    und.unpersist()
    return out


def clique_number(graph: LinkGraph) -> int:
    """nx.graph_clique_number — size of the largest clique."""
    row = find_cliques(graph).agg(F.max(F.size("members"))).first()
    return int(row[0]) if row[0] is not None else 0


def number_of_cliques(graph: LinkGraph) -> int:
    """nx.graph_number_of_cliques — count of maximal cliques."""
    return find_cliques(graph).count()


def k_clique_communities_general(
    graph: LinkGraph,
    k: int,
    max_subsets_per_clique: int = 100_000,
) -> DataFrame:
    """(community, vid) — k-clique percolation for ARBITRARY k ≥ 3
    (nx.community.k_clique_communities semantics), built on maximal
    cliques: two k-cliques are adjacent iff they share k−1 vertices;
    communities are the connected components of that adjacency, and a
    vertex belongs to every community one of its k-cliques is in.

    Pipeline: ``find_cliques`` → expand each maximal clique of size ≥ k
    into its C(|C|, k) k-member subsets (python ``combinations`` per
    Arrow batch; a LOUD ``max_subsets_per_clique`` cap rejects the
    combinatorial blow-up of giant cliques instead of silently
    sampling) → distinct k-cliques → each emits its k (k−1)-subset keys
    → cliques sharing a key star-link inside the key's bucket → WCC
    over the k-clique graph. Community id = the component's minimum
    k-clique key (the packed/sorted member string — unique per
    community; the k=3/k=4 special-cased kernels in
    algorithms/cliques.py keep their packed-integer fast paths and
    remain the scale tiers; this general form is the completeness
    tier). Keys are the sorted member CSV strings — exact, no hash
    collisions; ids come from one rank over the distinct k-clique
    set."""
    from linkgraph.algorithms.wcc import wcc
    from pyspark.sql import Window as _W

    if k < 3:
        raise ValueError("k_clique_communities_general: k must be ≥ 3")
    mc = find_cliques(graph).where(F.size("members") >= k)
    sizes = mc.select(F.size("members").alias("s")).agg(F.max("s")).first()
    if sizes[0] is not None:
        from math import comb

        worst = comb(int(sizes[0]), k)
        if worst > max_subsets_per_clique:
            raise ValueError(
                f"k_clique_communities_general: a maximal clique of size "
                f"{sizes[0]} expands to C({sizes[0]},{k})={worst} k-subsets "
                f"> max_subsets_per_clique={max_subsets_per_clique}"
            )

    def expand(batch_iter):
        from itertools import combinations

        for pdf in batch_iter:
            rows = []
            for members in pdf["members"]:
                ms = sorted(int(m) for m in members)
                for sub in combinations(ms, k):
                    rows.append({"kc": list(sub)})
            yield pd.DataFrame(rows, columns=["kc"])

    kcliques = (
        mc.mapInPandas(expand, "kc array<long>")
        .distinct()
        .withColumn("key", F.concat_ws(",", F.col("kc")))
    )
    w = _W.orderBy("key")
    ids = kcliques.withColumn("cid", F.row_number().over(w)).persist()
    subkeys = ids.select(
        "cid",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(k - 1)),
                lambda i: F.concat_ws(
                    ",", F.filter(F.col("kc"), lambda _, j: j != i)
                ),
            )
        ).alias("sk"),
    )
    bw = _W.partitionBy("sk")
    links = (
        subkeys.withColumn("m", F.min("cid").over(bw))
        .where(F.col("cid") != F.col("m"))
        .select(F.col("m").alias("src"), F.col("cid").alias("dst"))
        .distinct()
    )
    nodes = ids.select(
        F.col("cid").alias("vid"), F.col("cid").cast("string").alias("oid")
    )
    comp = wcc(LinkGraph(vertices=nodes, edges=links))
    comm_key = (
        comp.select(F.col("vid").alias("cid"), F.col("value").alias("comp"))
        .join(ids.select("cid", "key"), "cid")
        .withColumn("community", F.min("key").over(_W.partitionBy("comp")))
    )
    out = (
        comm_key.join(ids.select("cid", "kc"), "cid")
        .select("community", F.explode("kc").alias("vid"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    ids.unpersist()
    return out
