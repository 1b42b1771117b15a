"""NetworkX-compatible API surface (SURVEY.md §2.6).

Parity target: the reference's ``graphscope.nx`` package — a NetworkX-
style ``Graph``/``DiGraph`` whose builtin algorithms transparently run on
the analytical engine
(/root/reference/python/graphscope/nx/algorithms/builtin.py:91-1000:
``@project_to_simple`` projects the nx graph to a simple fragment,
``@context_to_dict`` collects the result context into a python dict).

Here the same two halves map onto Spark:

- :class:`DiGraph`/:class:`Graph` accumulate nodes/edges driver-side
  (the nx mutation surface is inherently driver-side in the reference
  too — every ``add_edge`` is an RPC) and lazily **project** to a cached
  :class:`linkgraph.graph.LinkGraph` on first algorithm call;
- the module-level functions mirror builtin.py signatures and return
  plain python objects (dicts keyed by the caller's node objects, floats,
  lists) — the ``context_to_dict`` analog.

This surface is for NetworkX-style interactive use on graphs whose
*results* fit on the driver (exactly the reference's nx contract); the
scale path remains the DataFrame API in :mod:`linkgraph.algorithms`.
"""

from __future__ import annotations

from typing import Any, Hashable, Iterable

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from linkgraph import algorithms as A
from linkgraph.graph import LinkGraph, build_graph


class DiGraph:
    """Directed nx-style graph; nodes are arbitrary hashables."""

    directed = True

    def __init__(self, spark: SparkSession | None = None):
        self._spark = spark
        self._nodes: dict[Hashable, dict] = {}
        self._edges: dict[tuple[Hashable, Hashable], dict] = {}
        self._lg: LinkGraph | None = None
        self._vid_of: dict[Hashable, int] | None = None
        self._node_of: dict[int, Hashable] | None = None

    # -- mutation (invalidates the projection) -------------------------
    def add_node(self, n: Hashable, **attrs) -> None:
        self._nodes.setdefault(n, {}).update(attrs)
        self._lg = None

    def add_nodes_from(self, ns: Iterable, **attrs) -> None:
        for n in ns:
            if isinstance(n, tuple) and len(n) == 2 and isinstance(n[1], dict):
                self.add_node(n[0], **{**attrs, **n[1]})
            else:
                self.add_node(n, **attrs)

    def add_edge(self, u: Hashable, v: Hashable, **attrs) -> None:
        self.add_node(u)
        self.add_node(v)
        self._edges.setdefault((u, v), {}).update(attrs)
        self._lg = None

    def add_edges_from(self, es: Iterable, **attrs) -> None:
        for e in es:
            if len(e) == 3:
                u, v, d = e
                self.add_edge(u, v, **{**attrs, **d})
            else:
                self.add_edge(e[0], e[1], **attrs)

    def remove_node(self, n: Hashable) -> None:
        self._nodes.pop(n, None)
        self._edges = {k: d for k, d in self._edges.items() if n not in k}
        self._lg = None

    def remove_edge(self, u: Hashable, v: Hashable) -> None:
        self._edges.pop((u, v), None)
        self._lg = None

    # -- nx read surface ----------------------------------------------
    def number_of_nodes(self) -> int:
        return len(self._nodes)

    def number_of_edges(self) -> int:
        return len(self._edges)

    def nodes(self):
        return list(self._nodes)

    def edges(self):
        return list(self._edges)

    def successors(self, n):
        """Out-neighbors of n (directed); nx DiGraph.successors."""
        if n not in self._nodes:
            raise KeyError(n)
        out = {v for (u, v) in self._edges if u == n}
        if not self.directed:
            out |= {u for (u, v) in self._edges if v == n}
        return iter(sorted(out, key=repr))

    def predecessors(self, n):
        """In-neighbors of n (directed); nx DiGraph.predecessors."""
        if n not in self._nodes:
            raise KeyError(n)
        inn = {u for (u, v) in self._edges if v == n}
        if not self.directed:
            inn |= {v for (u, v) in self._edges if u == n}
        return iter(sorted(inn, key=repr))

    def neighbors(self, n):
        """nx neighbors: successors for DiGraph, all adjacent for Graph."""
        return self.successors(n)

    def degree(self, n=None):
        """nx degree view: total degree (in+out for DiGraph); a single
        int for one node, else a list of (node, degree) pairs."""

        def d(x):
            # nx counts a self-loop twice in BOTH graph types; the
            # directed sum does so naturally (u == x and v == x)
            return sum(1 for (u, v) in self._edges if u == x) + sum(
                1 for (u, v) in self._edges if v == x
            )

        if n is not None:
            if n not in self._nodes:
                raise KeyError(n)
            return d(n)
        return [(x, d(x)) for x in self._nodes]

    def in_degree(self, n=None):
        """nx in_degree view (directed)."""

        def d(x):
            return sum(1 for (u, v) in self._edges if v == x)

        if n is not None:
            if n not in self._nodes:
                raise KeyError(n)
            return d(n)
        return [(x, d(x)) for x in self._nodes]

    def out_degree(self, n=None):
        """nx out_degree view (directed)."""

        def d(x):
            return sum(1 for (u, v) in self._edges if u == x)

        if n is not None:
            if n not in self._nodes:
                raise KeyError(n)
            return d(n)
        return [(x, d(x)) for x in self._nodes]

    def has_edge(self, u, v) -> bool:
        """nx has_edge (orientation-insensitive for Graph)."""
        if self.directed:
            return (u, v) in self._edges
        return (u, v) in self._edges or (v, u) in self._edges

    def has_node(self, n) -> bool:
        return n in self._nodes

    def copy(self) -> "DiGraph":
        """nx copy — independent mutation stores, attributes shallow-copied."""
        H = type(self)(self._spark)
        H._nodes = {n: dict(d) for n, d in self._nodes.items()}
        H._edges = {e: dict(d) for e, d in self._edges.items()}
        return H

    def subgraph(self, nodes) -> "DiGraph":
        """nx subgraph — induced on the given nodes (a detached copy,
        not an nx-style live view)."""
        keep = set(nodes)
        H = type(self)(self._spark)
        H._nodes = {n: dict(d) for n, d in self._nodes.items() if n in keep}
        H._edges = {
            (u, v): dict(d)
            for (u, v), d in self._edges.items()
            if u in keep and v in keep
        }
        return H

    def to_undirected(self) -> "Graph":
        """nx to_undirected — collapse arc pairs onto undirected edges."""
        H = Graph(self._spark)
        for n, d in self._nodes.items():
            H.add_node(n, **d)
        for (u, v), d in self._edges.items():
            H.add_edge(u, v, **d)
        return H

    def to_directed(self) -> "DiGraph":
        """nx to_directed — undirected edges become both arcs."""
        H = DiGraph(self._spark)
        for n, d in self._nodes.items():
            H.add_node(n, **d)
        for (u, v), d in self._edges.items():
            H.add_edge(u, v, **d)
            if not self.directed:
                H.add_edge(v, u, **d)
        return H

    def reverse(self) -> "DiGraph":
        """nx DiGraph.reverse — all arcs flipped (copy)."""
        H = DiGraph(self._spark)
        for n, d in self._nodes.items():
            H.add_node(n, **d)
        for (u, v), d in self._edges.items():
            H.add_edge(v, u, **d)
        return H

    def __contains__(self, n) -> bool:
        return n in self._nodes

    def __len__(self) -> int:
        return len(self._nodes)

    # -- projection (the @project_to_simple analog) --------------------
    def _directed_pairs(self) -> list[tuple[Hashable, Hashable, float]]:
        return [(u, v, float(d.get("weight", 1.0))) for (u, v), d in self._edges.items()]

    def _project(self) -> LinkGraph:
        if self._lg is not None:
            return self._lg
        spark = self._spark or SparkSession.active()
        nodes = sorted(self._nodes, key=repr)
        self._vid_of = {n: i for i, n in enumerate(nodes)}
        self._node_of = {i: n for n, i in self._vid_of.items()}
        v = spark.createDataFrame(
            [(i, repr(n)) for n, i in self._vid_of.items()] or [(0, "∅")],
            "vid long, oid string",
        )
        pairs = self._directed_pairs()
        if not self.directed:
            # undirected: both arcs materialized (kBothOutIn load strategy)
            pairs = pairs + [(v2, u2, w) for (u2, v2, w) in pairs if u2 != v2]
        e = spark.createDataFrame(
            [(self._vid_of[u], self._vid_of[v2], w) for u, v2, w in pairs]
            or [(0, 0, 1.0)],
            "src long, dst long, weight double",
        )
        if not pairs:
            e = e.limit(0)
        if not self._nodes:
            v = v.limit(0)
        self._lg = LinkGraph(vertices=v, edges=e, directed=self.directed)
        return self._lg

    def _to_dict(self, df, key="vid", val="value") -> dict:
        self._project()
        return {self._node_of[r[key]]: r[val] for r in df.collect()}

    def _attr_df(self, attribute: str):
        spark = self._spark or SparkSession.active()
        self._project()
        rows = [
            (self._vid_of[n], d[attribute])
            for n, d in self._nodes.items()
            if attribute in d
        ]
        return spark.createDataFrame(rows, ["vid", "attr"])


class Graph(DiGraph):
    """Undirected nx-style graph (edges materialize in both directions)."""

    directed = False

    def _dedup_key(self, u, v):
        return (u, v) if repr(u) <= repr(v) else (v, u)

    def add_edge(self, u: Hashable, v: Hashable, **attrs) -> None:
        super().add_edge(*self._dedup_key(u, v), **attrs)

    def remove_edge(self, u: Hashable, v: Hashable) -> None:
        super().remove_edge(*self._dedup_key(u, v))


# ---------------------------------------------------------------- builtins
# Signatures mirror graphscope.nx.algorithms.builtin (file:line cited).


def pagerank(G: DiGraph, alpha: float = 0.85, max_iter: int = 100, tol: float = 1e-06) -> dict:
    """builtin.py:94 — dict node → score."""
    return G._to_dict(A.pagerank_nx(G._project(), alpha=alpha, max_iter=max_iter, tol=tol))


def hits(G: DiGraph, max_iter: int = 100, tol: float = 1e-08, normalized: bool = True) -> tuple[dict, dict]:
    """builtin.py:151 — (hubs, authorities) dicts."""
    res = A.hits(G._project(), tolerance=tol, max_round=max_iter, normalized=normalized)
    hubs = G._to_dict(res, val="hub")
    auth = G._to_dict(res, val="auth")
    return hubs, auth


def degree_centrality(G: DiGraph) -> dict:
    """builtin.py:182."""
    return G._to_dict(A.degree_centrality(G._project(), centrality_type="both"))


def in_degree_centrality(G: DiGraph) -> dict:
    """builtin.py:190."""
    return G._to_dict(A.degree_centrality(G._project(), centrality_type="in"))


def out_degree_centrality(G: DiGraph) -> dict:
    """builtin.py:198."""
    return G._to_dict(A.degree_centrality(G._project(), centrality_type="out"))


def eigenvector_centrality(G: DiGraph, max_iter: int = 100, tol: float = 1e-06) -> dict:
    """builtin.py:204."""
    return G._to_dict(A.eigenvector_centrality(G._project(), tolerance=tol, max_round=max_iter))


def katz_centrality(G: DiGraph, alpha: float = 0.1, beta: float = 1.0,
                    max_iter: int = 100, tol: float = 1e-06) -> dict:
    """builtin.py:228."""
    return G._to_dict(
        A.katz_centrality(G._project(), alpha=alpha, beta=beta, tolerance=tol, max_round=max_iter)
    )


def has_path(G: DiGraph, source, target) -> bool:
    """builtin.py:284."""
    G._project()
    return A.sssp_has_path(G._lg, G._vid_of[source], G._vid_of[target])


def shortest_path(G: DiGraph, source, target) -> list:
    """builtin.py:291 — one shortest path as a node list."""
    G._project()
    vids = A.sssp_path(G._lg, G._vid_of[source], G._vid_of[target], weight_col=None)
    return [G._node_of[v] for v in vids]


def single_source_dijkstra_path_length(G: DiGraph, source, weight: str | None = "weight") -> dict:
    """builtin.py:297 — dict node → distance (unreachable omitted).

    The projection bakes only the ``weight`` edge attribute into the
    engine graph, so only ``weight='weight'`` (use it) and ``weight=None``
    (hop counts) are supported — any other attribute name raises instead
    of silently returning unit-weight distances."""
    if weight not in ("weight", None):
        raise ValueError(
            f"single_source_dijkstra_path_length: only the 'weight' edge "
            f"attribute (or None for hop counts) is projected; got {weight!r}"
        )
    d = A.sssp(G._project(), G._vid_of[source], weight_col=weight)
    return {
        n: v for n, v in G._to_dict(d).items() if v >= 0
    }


def average_shortest_path_length(G: DiGraph) -> float:
    """builtin.py:335."""
    return A.average_shortest_path_length(G._project())


def bfs_edges(G: DiGraph, source) -> list[tuple]:
    """builtin.py:359 — BFS tree edges."""
    G._project()
    rows = A.bfs_generic(G._lg, G._vid_of[source], format="edges").collect()
    return [(G._node_of[r["src"]], G._node_of[r["dst"]]) for r in rows]


def bfs_predecessors(G: DiGraph, source) -> list[tuple]:
    """builtin.py:399."""
    G._project()
    rows = A.bfs_generic(G._lg, G._vid_of[source], format="predecessors").collect()
    return [(G._node_of[r["vid"]], G._node_of[r["predecessor"]]) for r in rows]


def bfs_successors(G: DiGraph, source) -> list[tuple]:
    """builtin.py:407 — (node, [successors])."""
    G._project()
    rows = A.bfs_generic(G._lg, G._vid_of[source], format="successors").collect()
    return [
        (G._node_of[r["vid"]], [G._node_of[s] for s in r["successors"]]) for r in rows
    ]


def bfs_tree(G: DiGraph, source) -> "DiGraph":
    """builtin.py:472 — the BFS tree as a new DiGraph."""
    t = DiGraph(G._spark)
    t.add_node(source)
    t.add_edges_from(bfs_edges(G, source))
    return t


def all_pairs_shortest_path_length(G: DiGraph) -> dict:
    """builtin.py:414 — dict source → {node: dist}."""
    G._project()
    out: dict[Any, dict] = {}
    for r in A.all_pairs_shortest_path_length(G._lg).collect():
        out.setdefault(G._node_of[r["root"]], {})[G._node_of[r["vid"]]] = r["dist"]
    return out


def closeness_centrality(G: DiGraph, wf_improved: bool = True) -> dict:
    """builtin.py:457."""
    return G._to_dict(A.closeness_centrality(G._project(), wf_improved=wf_improved))


def _ecc_checked(G: DiGraph) -> dict:
    """NetworkX-faithful eccentricity: raises if any vertex cannot reach
    every other (disconnected / not strongly connected), else node→ecc.
    Bounded collect (|V| rows), like the other nx wrappers."""
    lg = G._project()
    n = lg.vertices.count()
    reach = (
        A.multi_source_bfs(lg)
        .groupBy("root")
        .agg(F.count("*").alias("c"), F.max("dist").alias("ecc"))
    )
    rows = reach.collect()
    if len(rows) < n or any(r["c"] < n for r in rows):
        raise ValueError(
            "Found infinite path length because the graph is not connected"
        )
    return {G._node_of[r["root"]]: int(r["ecc"]) for r in rows}


def eccentricity(G: DiGraph) -> dict:
    """nx.eccentricity — max distance from each node (connected only)."""
    return _ecc_checked(G)


def diameter(G: DiGraph) -> int:
    """nx.diameter — max eccentricity."""
    return max(_ecc_checked(G).values())


def approximate_diameter(G: DiGraph) -> int:
    """nx.approximation.diameter — double-sweep lower bound (2 BFS runs
    instead of all-sources APSP; deterministic start/tie-break here).
    The scale path for diameter estimation; exact on trees."""
    G._project()
    return A.diameter_approx(G._lg)


def radius(G: DiGraph) -> int:
    """nx.radius — min eccentricity."""
    return min(_ecc_checked(G).values())


def center(G: DiGraph) -> list:
    """nx.center — nodes with eccentricity == radius."""
    ecc = _ecc_checked(G)
    r = min(ecc.values())
    return sorted((n for n, e in ecc.items() if e == r), key=repr)


def periphery(G: DiGraph) -> list:
    """nx.periphery — nodes with eccentricity == diameter."""
    ecc = _ecc_checked(G)
    d = max(ecc.values())
    return sorted((n for n, e in ecc.items() if e == d), key=repr)


def harmonic_centrality(G: DiGraph) -> dict:
    """nx.harmonic_centrality — sum of 1/d over incoming distances."""
    return G._to_dict(A.harmonic_centrality(G._project()))


def condensation(G: DiGraph) -> DiGraph:
    """nx.condensation — the DAG of strongly connected components.

    Divergence from NetworkX (documented): component nodes are the
    canonical component representative (the max-vid member, mapped back
    to its original node object), not 0..k-1, and the ``members`` node
    attribute is not materialized — at scale the membership is the
    (vid, comp) DataFrame `linkgraph.algorithms.scc` already returns."""
    G._project()
    c = A.condensation(G._lg)
    rep = {r["vid"]: G._node_of[int(r["oid"])] for r in c.vertices.collect()}
    H = DiGraph(G._spark)
    for n in rep.values():
        H.add_node(n)
    for r in c.edges.collect():
        H.add_edge(rep[r["src"]], rep[r["dst"]])
    c.unpersist()
    return H


def k_core(G: DiGraph, k: int) -> list:
    """builtin.py:509 — nodes of the k-core (membership flag collected)."""
    res = A.k_core(G._project(), k=k)
    return sorted(
        (n for n, v in G._to_dict(res).items() if v), key=repr
    )


def core_number(G: DiGraph) -> dict:
    """networkx.core_number — max k with the node in the k-core (0 for
    isolated nodes), via the canonical iterate-k peel (order-independent,
    unlike nx's sequential Matula–Beck order; values are identical)."""
    return G._to_dict(A.core_number(G._project()))


def s_metric(G: DiGraph) -> float:
    """networkx.s_metric (unnormalized sum form)."""
    if G.directed:
        raise ValueError("s_metric: undirected graphs only")
    row = A.s_metric(G._project()).first()
    return float(row["value"] or 0)


def global_efficiency(G: DiGraph) -> float:
    """networkx.global_efficiency — mean 1/d over ordered pairs."""
    if G.directed:
        raise ValueError("global_efficiency: undirected graphs only")
    row = A.global_efficiency(G._project()).first()
    return float(row["value"] or 0.0)


def rich_club_coefficient(G: DiGraph, normalized: bool = False) -> dict:
    """networkx.rich_club_coefficient (unnormalized form only — the
    normalized variant divides by a randomized rewiring baseline, which
    is out of scope for a deterministic engine)."""
    if normalized:
        raise ValueError("rich_club_coefficient: only normalized=False is supported")
    if G.directed:
        raise ValueError("rich_club_coefficient: undirected graphs only")
    rows = A.rich_club_coefficient(G._project()).collect()
    return {int(r["k"]): r["value"] for r in rows}


def onion_layers(G: DiGraph) -> dict:
    """networkx.onion_layers analog — the 1-based peel layer per node
    (synchronous batch rule, order-independent)."""
    return G._to_dict(A.onion_layers(G._project()))


def k_truss(G: DiGraph, k: int) -> list:
    """networkx.k_truss analog: the surviving edge list (node pairs) of
    the k-truss, from the synchronous peel in algorithms/truss.py."""
    if G.directed:
        raise ValueError("k_truss: not implemented for directed graphs")
    rows = A.k_truss(G._project(), k=k).collect()
    return sorted(
        (G._node_of[r["lo"]], G._node_of[r["hi"]]) for r in rows
    )


def clustering(G: DiGraph, weight: str | None = None) -> dict:
    """builtin.py:538; ``weight='weight'`` adds the nx Onnela weighted
    form (clustering_weighted)."""
    if weight is None:
        return G._to_dict(A.clustering(G._project()))
    if weight != "weight":
        raise ValueError("clustering: only the 'weight' attribute is projected")
    from linkgraph.algorithms.clustering import clustering_weighted

    lg = G._project()
    try:
        # _to_dict materializes, so the normalized-edge cache the kernel
        # parked on lg is safe to release here (graph-owns-cache rule)
        return G._to_dict(clustering_weighted(lg))
    finally:
        lg.unpersist()


def triangles(G: Graph) -> dict:
    """builtin.py:558 (undirected only, as the reference)."""
    if G.directed:
        raise ValueError("triangles() is not defined for directed graphs")
    return G._to_dict(A.triangles(G._project()))


def transitivity(G: DiGraph) -> float:
    """builtin.py:575."""
    return A.transitivity(G._project())


def average_clustering(G: DiGraph) -> float:
    """builtin.py:581."""
    return A.average_clustering(G._project())


def density(G: DiGraph) -> float:
    """nx.density — |E| / (n(n-1)) for directed, 2|E|/(n(n-1)) for
    undirected (the Graph subclass projects each undirected edge once
    per direction, so the directed formula over the projection already
    matches nx's undirected value)."""
    return float(A.density(G._project()).first()["value"])


def reciprocity(G: DiGraph) -> float:
    """nx.overall_reciprocity."""
    return float(A.reciprocity(G._project()).first()["value"])


def average_neighbor_degree(G: DiGraph, source: str = "out", target: str = "out") -> dict:
    """nx.average_neighbor_degree (directed source/target semantics)."""
    return G._to_dict(A.average_neighbor_degree(G._project(), source, target))


def weakly_connected_components(G: DiGraph):
    """builtin.py:600 — yields node sets, as NetworkX does."""
    comp = G._to_dict(A.wcc(G._project()))
    groups: dict[int, set] = {}
    for n, c in comp.items():
        groups.setdefault(c, set()).add(n)
    yield from groups.values()


def degree_assortativity_coefficient(G: DiGraph, x: str = "out", y: str = "in") -> float:
    """builtin.py:618."""
    return A.degree_assortativity_coefficient(G._project(), x=x, y=y)


def attribute_assortativity_coefficient(G: DiGraph, attribute: str) -> float:
    """builtin.py:771."""
    return A.attribute_assortativity_coefficient(G._project(), G._attr_df(attribute))


def numeric_assortativity_coefficient(G: DiGraph, attribute: str) -> float:
    """builtin.py:813."""
    return A.numeric_assortativity_coefficient(G._project(), G._attr_df(attribute))


def average_degree_connectivity(G: DiGraph) -> dict:
    """builtin.py:709 — dict degree → mean neighbor degree."""
    return {
        r["degree"]: r["avg_nbr_degree"]
        for r in A.average_degree_connectivity(G._project()).collect()
    }


def node_boundary(G: DiGraph, nbunch1, nbunch2=None) -> set:
    """builtin.py:671."""
    spark = G._spark or SparkSession.active()
    G._project()
    s = spark.createDataFrame([(G._vid_of[n],) for n in nbunch1], "vid long")
    t = (
        spark.createDataFrame([(G._vid_of[n],) for n in nbunch2], "vid long")
        if nbunch2 is not None
        else None
    )
    return {G._node_of[r["vid"]] for r in A.node_boundary(G._lg, s, t).collect()}


def edge_boundary(G: DiGraph, nbunch1, nbunch2=None) -> list[tuple]:
    """builtin.py:689."""
    spark = G._spark or SparkSession.active()
    G._project()
    s = spark.createDataFrame([(G._vid_of[n],) for n in nbunch1], "vid long")
    t = (
        spark.createDataFrame([(G._vid_of[n],) for n in nbunch2], "vid long")
        if nbunch2 is not None
        else None
    )
    return [
        (G._node_of[r["src"]], G._node_of[r["dst"]])
        for r in A.edge_boundary(G._lg, s, t).collect()
    ]


def is_simple_path(G: DiGraph, nodes: list) -> bool:
    """builtin.py:854."""
    G._project()
    try:
        vids = [G._vid_of[n] for n in nodes]
    except KeyError:
        return False
    return A.is_simple_path(G._lg, vids)


def all_simple_paths(G: DiGraph, source, target, cutoff: int = 5) -> list[list]:
    """builtin.py:889 — list of node-list paths (depth-capped)."""
    G._project()
    rows = A.all_simple_paths(G._lg, G._vid_of[source], G._vid_of[target], cutoff=cutoff).collect()
    return [[G._node_of[v] for v in r["path"]] for r in rows]


def all_simple_edge_paths(G: DiGraph, source, target, cutoff: int = 5) -> list[list]:
    """builtin.py:931 — same walks as all_simple_paths, emitted as edge
    (u, v) tuple lists."""
    return [
        list(zip(p, p[1:])) for p in all_simple_paths(G, source, target, cutoff=cutoff)
    ]


def betweenness_centrality(
    G: DiGraph, normalized: bool = True, endpoints: bool = False, weight: str | None = None
) -> dict:
    """builtin.py:974 (generic variant: endpoints + weight).

    The projection bakes only the ``weight`` edge attribute into the
    engine graph, so only ``weight='weight'`` (use it) and ``weight=None``
    (hop counts) are supported — same guard as
    single_source_dijkstra_path_length, instead of silently substituting
    the ``weight`` column for an arbitrary attribute name."""
    if weight not in ("weight", None):
        raise ValueError(
            f"betweenness_centrality: only the 'weight' edge attribute "
            f"(or None for unweighted) is projected; got {weight!r}"
        )
    return G._to_dict(
        A.betweenness_centrality(
            G._project(),
            normalized=normalized,
            endpoints=endpoints,
            weight="weight" if weight is not None else None,
        )
    )


def edge_betweenness_centrality(
    G: DiGraph, normalized: bool = True, weight: str | None = None
) -> dict:
    """nx.edge_betweenness_centrality — {(u, v): value}; same all-sources
    level-parallel Brandes, contributions keyed per shortest-path-DAG
    edge. Only the projected 'weight' attribute (or None) is supported,
    same guard as betweenness_centrality."""
    if weight not in ("weight", None):
        raise ValueError(
            f"edge_betweenness_centrality: only the 'weight' attribute "
            f"(or None) is projected; got {weight!r}"
        )
    G._project()
    df = A.edge_betweenness_centrality(
        G._lg, normalized=normalized, weight="weight" if weight is not None else None
    )
    return {
        (G._node_of[r["src"]], G._node_of[r["dst"]]): r["value"]
        for r in df.collect()
    }


def minimum_spanning_edges(G, weight: str | None = "weight", data: bool = False):
    """nx.minimum_spanning_edges — the unique minimum spanning forest
    under the strict (w, u, v) total order (equals nx's Kruskal whenever
    weights are unique). Undirected only, like networkx. Only the
    projected 'weight' attribute (or None → unit weights) is supported,
    same guard as betweenness_centrality."""
    if G.directed:
        raise ValueError("minimum_spanning_edges: undirected graphs only")
    if weight not in ("weight", None):
        raise ValueError(
            f"minimum_spanning_edges: only the 'weight' attribute "
            f"(or None) is projected; got {weight!r}"
        )
    G._project()
    f = A.minimum_spanning_forest(G._lg, weight=weight)
    rows = f.collect()
    if data:
        return [
            (G._node_of[r["lo"]], G._node_of[r["hi"]], {"weight": r["w"]})
            for r in rows
        ]
    return [(G._node_of[r["lo"]], G._node_of[r["hi"]]) for r in rows]


# ---- link prediction (reference forwards networkx's suite:
#      nx/algorithms/tests/forward/test_link_prediction.py — undirected
#      only; DiGraph raises, as those tests assert) ---------------------


def _link_prediction(G: DiGraph, ebunch, col: str, fname: str) -> list[tuple]:
    if G.directed:
        raise ValueError(f"{fname}: not implemented for directed graphs")
    lg = G._project()
    spark = G._spark or SparkSession.active()
    if ebunch is None:
        # NetworkX default: all non-edges (driver-side is the nx
        # contract — this surface is for driver-resident graphs; the
        # scale path is algorithms.link_prediction's candidate join)
        nodes = list(G._nodes)
        have = {G._dedup_key(u, v) for (u, v) in G._edges}
        ebunch = [
            (u, v)
            for i, u in enumerate(nodes)
            for v in nodes[i + 1:]
            if G._dedup_key(u, v) not in have
        ]
    ebunch = list(ebunch)
    if not ebunch:
        return []
    pdf = spark.createDataFrame(
        [(G._vid_of[u], G._vid_of[v]) for u, v in ebunch], "u long, v long"
    )
    got = {
        (r["u"], r["v"]): r[col]
        for r in A.link_prediction(lg, pdf).collect()
    }
    return [(u, v, got[(G._vid_of[u], G._vid_of[v])]) for u, v in ebunch]


def jaccard_coefficient(G: DiGraph, ebunch=None) -> list[tuple]:
    """networkx.jaccard_coefficient — [(u, v, p)] over ebunch (default:
    all non-edges)."""
    return _link_prediction(G, ebunch, "jaccard", "jaccard_coefficient")


def adamic_adar_index(G: DiGraph, ebunch=None) -> list[tuple]:
    """networkx.adamic_adar_index — [(u, v, p)]."""
    return _link_prediction(G, ebunch, "adamic_adar", "adamic_adar_index")


def resource_allocation_index(G: DiGraph, ebunch=None) -> list[tuple]:
    """networkx.resource_allocation_index — [(u, v, p)]."""
    return _link_prediction(
        G, ebunch, "resource_allocation", "resource_allocation_index"
    )


def preferential_attachment(G: DiGraph, ebunch=None) -> list[tuple]:
    """networkx.preferential_attachment — [(u, v, p)]."""
    return _link_prediction(
        G, ebunch, "preferential_attachment", "preferential_attachment"
    )


def maximal_independent_set(G: DiGraph, seed: int = 42) -> list:
    """networkx.maximal_independent_set analog: a valid MIS (independence
    and maximality are exact), selected by deterministic Luby rounds with
    md5(vid:seed) priorities rather than nx's mutable-RNG greedy order —
    same contract (SOME maximal independent set), reproducible at any
    parallelism. ``nodes`` pre-seeding is not supported."""
    if G.directed:
        raise ValueError("maximal_independent_set: not implemented for directed graphs")
    rows = A.maximal_independent_set(G._project(), seed=seed).collect()
    return sorted(G._node_of[r["vid"]] for r in rows)


def greedy_color(G: DiGraph, seed: int = 42) -> dict:
    """networkx.greedy_color analog: a proper coloring with ≤ Δ+1 colors
    via deterministic Jones–Plassmann rounds (md5 priorities) instead of
    nx's sequential strategy orders — same contract (proper, greedy-mex),
    reproducible at any parallelism. Strategy arguments are not
    supported."""
    if G.directed:
        raise ValueError("greedy_color: not implemented for directed graphs")
    rows = A.greedy_color(G._project(), seed=seed).collect()
    return {G._node_of[r["vid"]]: r["value"] for r in rows}


def voterank(G: DiGraph, number_of_nodes: int | None = None) -> list:
    """networkx.voterank — ordered influencer list (reference forwards
    nx's voterank tests; ties break by projected vid, a deterministic
    refinement of nx's iteration order)."""
    if G.directed:
        raise ValueError("voterank: not implemented for directed graphs")
    rows = A.voterank(G._project(), number_of_nodes).orderBy("rank").collect()
    return [G._node_of[r["vid"]] for r in rows]


def wiener_index(G: DiGraph) -> float:
    """networkx.wiener_index over the symmetrized graph (inf when
    disconnected, as nx)."""
    if G.directed:
        raise ValueError("wiener_index: undirected graphs only")
    row = A.wiener_index(G._project()).first()
    return float(row["value"])


def local_bridges(G: DiGraph) -> list:
    """networkx.local_bridges(with_span=False) — (u, v) node-key pairs
    of edges whose endpoints share no common neighbor."""
    if G.directed:
        raise ValueError("local_bridges: undirected graphs only")
    lg = G._project()
    return [
        (G._node_of[r["lo"]], G._node_of[r["hi"]])
        for r in A.local_bridges(lg).collect()
    ]


def bridges(G: DiGraph) -> list:
    """networkx.bridges(G) — (u, v) node-key pairs of edges whose removal
    disconnects their endpoints (spanning-forest XOR-cover,
    algorithms/bridges.py)."""
    from linkgraph.algorithms.bridges import bridges as _bridges

    if G.directed:
        raise ValueError("bridges: undirected graphs only")
    lg = G._project()
    return [
        (G._node_of[r["lo"]], G._node_of[r["hi"]])
        for r in _bridges(lg).collect()
    ]


def is_bipartite(G: DiGraph) -> bool:
    """networkx.is_bipartite of the symmetrized graph."""
    row = A.is_bipartite(G._project()).first()
    return bool(row["value"])


def degree_histogram(G: DiGraph) -> list:
    """networkx.degree_histogram — dense count list indexed by degree."""
    if G.directed:
        raise ValueError("degree_histogram: undirected graphs only")
    rows = A.degree_histogram(G._project()).collect()
    return [int(r["count"]) for r in sorted(rows, key=lambda r: r["deg"])]


def effective_size(G: DiGraph) -> dict:
    """networkx.effective_size (unweighted; isolates omitted where nx
    yields NaN)."""
    if G.directed:
        raise ValueError("effective_size: undirected graphs only")
    return G._to_dict(A.effective_size(G._project()))


def constraint(G: DiGraph) -> dict:
    """networkx.constraint (unweighted, undirected; isolates omitted)."""
    if G.directed:
        raise ValueError("constraint: undirected graphs only")
    return G._to_dict(A.constraint(G._project()))


def triadic_census(G: DiGraph) -> dict:
    """networkx.triadic_census — all 16 Holland–Leinhardt MAN classes."""
    if not G.directed:
        raise ValueError("triadic_census: directed graphs only")
    rows = A.triadic_census(G._project()).collect()
    return {r["triad_type"]: int(r["count"]) for r in rows}


def square_clustering(G: DiGraph) -> dict:
    """networkx.square_clustering — C4 coefficient per node."""
    if G.directed:
        raise ValueError("square_clustering: undirected graphs only")
    return G._to_dict(A.square_clustering(G._project()))


def connected_components(G: DiGraph):
    """networkx.connected_components (undirected view) — yields node
    sets; identical grouping to weakly_connected_components."""
    yield from weakly_connected_components(G)


def number_connected_components(G: DiGraph) -> int:
    """networkx.number_connected_components."""
    return sum(1 for _ in weakly_connected_components(G))


def is_connected(G: DiGraph) -> bool:
    """networkx.is_connected; raises on the empty graph as nx does."""
    if len(G) == 0:
        raise ValueError("is_connected: graph has no nodes")
    return number_connected_components(G) == 1


def node_connected_component(G: DiGraph, n) -> set:
    """networkx.node_connected_component — the node set containing n."""
    for comp in weakly_connected_components(G):
        if n in comp:
            return comp
    raise KeyError(n)


def strongly_connected_components(G: DiGraph):
    """networkx.strongly_connected_components — yields node sets
    (forwarded to the distributed coloring-based SCC). Validates at
    CALL time, not first iteration, matching nx."""
    if not G.directed:
        raise ValueError("strongly_connected_components: directed graphs only")

    def _gen():
        comp = G._to_dict(A.scc(G._project()))
        groups: dict[int, set] = {}
        for n, c in comp.items():
            groups.setdefault(c, set()).add(n)
        yield from groups.values()

    return _gen()


def number_strongly_connected_components(G: DiGraph) -> int:
    """networkx.number_strongly_connected_components."""
    return sum(1 for _ in strongly_connected_components(G))


def is_strongly_connected(G: DiGraph) -> bool:
    """networkx.is_strongly_connected."""
    if len(G) == 0:
        raise ValueError("is_strongly_connected: graph has no nodes")
    return number_strongly_connected_components(G) == 1


def is_directed_acyclic_graph(G: DiGraph) -> bool:
    """networkx.is_directed_acyclic_graph — Kahn-peel remainder test."""
    from linkgraph.algorithms.dag import is_directed_acyclic_graph as _impl

    if len(G) == 0:
        return True
    return bool(_impl(G._project()).first()["value"])


def topological_generations(G: DiGraph):
    """networkx.topological_generations — yields node sets per layer;
    raises on cycles (nx NetworkXUnfeasible analog)."""
    from linkgraph.algorithms.dag import topological_generations as _impl

    layer_of = G._to_dict(_impl(G._project()), val="layer")
    groups: dict[int, list] = {}
    for n, l in layer_of.items():
        groups.setdefault(l, []).append(n)
    for l in sorted(groups):
        yield groups[l]


def topological_sort(G: DiGraph):
    """networkx.topological_sort — one valid order (layer-major, node-key
    order inside a layer for determinism)."""
    for gen in topological_generations(G):
        yield from sorted(gen, key=repr)


def dag_longest_path_length(G: DiGraph) -> int:
    """networkx.dag_longest_path_length (unweighted: edge count)."""
    from linkgraph.algorithms.dag import dag_longest_path_length as _impl

    if len(G) == 0:
        return 0
    return int(_impl(G._project()).first()["value"])


def k_clique_communities(G: DiGraph, k: int = 3):
    """networkx.algorithms.community.k_clique_communities — any k ≥ 3
    (k=3/k=4 packed fast paths, k ≥ 5 via maximal-clique expansion —
    algorithms/maxcliques.k_clique_communities_general). Yields
    frozensets of node keys, largest-first then min-member order."""
    from linkgraph.algorithms.cliques import k_clique_communities as _impl

    if G.directed:
        raise ValueError("k_clique_communities: undirected graphs only")
    rows = _impl(G._project(), k=k).collect()
    groups: dict[int, set] = {}
    G._project()
    for r in rows:
        groups.setdefault(r["community"], set()).add(G._node_of[r["vid"]])
    for c in sorted(groups, key=lambda c: (-len(groups[c]), c)):
        yield frozenset(groups[c])


def transitive_reduction(G: DiGraph) -> list:
    """networkx.transitive_reduction — the DAG's unique minimal edge set
    with the same reachability (algorithms/dag.py: iterative-doubling
    closure + one anti-join). Returns (u, v) node-key pairs sorted for
    determinism; raises on cyclic input like nx."""
    from linkgraph.algorithms.dag import transitive_reduction as _impl

    lg = G._project()
    rows = _impl(lg).collect()
    return sorted(
        (G._node_of[r["src"]], G._node_of[r["dst"]]) for r in rows
    )


def is_eulerian(G: DiGraph) -> bool:
    """networkx.is_eulerian — Euler circuit verdict (balance + weak
    connectivity; algorithms/globals.py eulerian_summary docstring
    covers the isolated-vertex convention)."""
    from linkgraph.algorithms.globals import eulerian_summary

    rows = {r["which"]: r["value"] for r in eulerian_summary(G._project()).collect()}
    return bool(rows["is_eulerian"])


def has_eulerian_path(G: DiGraph) -> bool:
    """networkx.has_eulerian_path — Euler path verdict (at most one
    +1/-1 degree pair, weakly connected)."""
    from linkgraph.algorithms.globals import eulerian_summary

    rows = {r["which"]: r["value"] for r in eulerian_summary(G._project()).collect()}
    return bool(rows["has_eulerian_path"])


def effective_diameter(G: DiGraph, q: float = 0.9, n_roots: int = 64) -> int:
    """q-quantile of pairwise BFS distances from a deterministic
    ``n_roots``-root sample (ANF-style; one bit-parallel MSBFS sweep —
    algorithms/paths.py effective_diameter). Not an nx builtin — the
    snap.EffDiam / ANF headline statistic, exposed under the same
    flat-call convention."""
    from linkgraph.algorithms.paths import effective_diameter as _impl

    row = _impl(G._project(), n_roots=n_roots, q=q).first()
    return int(row["effective_diameter"]) if row["n_pairs"] else 0


def harmonic_function(G: DiGraph, max_iter: int = 30, label_name: str = "label") -> list:
    """networkx.algorithms.node_classification.harmonic_function: nodes
    carrying ``G.nodes[n][label_name]`` clamp their class; everyone else
    takes the iterated degree-normalized neighbor average; returns the
    predicted label per node in node order. Labels may be any hashable —
    encoded to dense class ids sorted by repr (deterministic), decoded
    on the way out. Unreached nodes return None (documented divergence:
    nx's argmax silently yields the first class)."""
    from linkgraph.algorithms.nodeclass import harmonic_function as _impl

    lg = G._project()
    spark = lg.edges.sparkSession
    labeled = {n: d[label_name] for n, d in G._nodes.items() if label_name in d}
    if not labeled:
        raise ValueError(f"harmonic_function: no node has attr {label_name!r}")
    classes = sorted({repr(v): v for v in labeled.values()}.items())
    cls_of = {rep: i for i, (rep, _) in enumerate(classes)}
    seeds = spark.createDataFrame(
        [(G._vid_of[n], cls_of[repr(v)]) for n, v in labeled.items()],
        "vid long, cls long",
    )
    out = {r["vid"]: r["label"] for r in _impl(lg, seeds, rounds=max_iter).collect()}
    decode = [v for _, v in classes]
    return [
        None if out.get(G._vid_of[n]) is None else decode[out[G._vid_of[n]]]
        for n in G.nodes()
    ]


def articulation_points(G: DiGraph):
    """networkx.articulation_points — cut vertices of the undirected
    view (Tarjan–Vishkin aux-graph blocks,
    algorithms/biconnectivity.py). Yields node keys in sorted order
    (nx yields in DFS order; set equality is the contract)."""
    from linkgraph.algorithms.biconnectivity import articulation_points as _impl

    if G.directed:
        raise ValueError("articulation_points: undirected graphs only")
    lg = G._project()
    for r in sorted(_impl(lg).collect(), key=lambda r: r["vid"]):
        yield G._node_of[r["vid"]]


def biconnected_components(G: DiGraph):
    """networkx.biconnected_components — yields the node set of each
    block (2-connected component), largest-first then min-node order
    for determinism."""
    from linkgraph.algorithms.biconnectivity import biconnected_components as _impl

    if G.directed:
        raise ValueError("biconnected_components: undirected graphs only")
    lg = G._project()
    rows = _impl(lg).collect()
    G._project()
    groups: dict[int, set] = {}
    for r in rows:
        groups.setdefault(r["block"], set()).update(
            (G._node_of[r["lo"]], G._node_of[r["hi"]])
        )
    for b in sorted(groups, key=lambda b: (-len(groups[b]), b)):
        yield frozenset(groups[b])


def find_cliques(G: DiGraph):
    """networkx.find_cliques — maximal cliques (vertex-ordered
    Bron–Kerbosch, algorithms/maxcliques.py). Yields member lists,
    sorted by (size desc, members) for determinism (nx yields in
    DFS order; set-of-frozensets equality is the contract)."""
    from linkgraph.algorithms.maxcliques import find_cliques as _impl

    if G.directed:
        raise ValueError("find_cliques: undirected graphs only")
    lg = G._project()
    rows = _impl(lg).collect()
    G._project()
    cliques = sorted(
        (tuple(G._node_of[m] for m in r["members"]) for r in rows),
        key=lambda c: (-len(c), repr(c)),
    )
    for c in cliques:
        yield list(c)


def graph_clique_number(G: DiGraph) -> int:
    """networkx.graph_clique_number — size of the largest clique."""
    from linkgraph.algorithms.maxcliques import clique_number

    if G.directed:
        raise ValueError("graph_clique_number: undirected graphs only")
    return clique_number(G._project())


def graph_number_of_cliques(G: DiGraph) -> int:
    """networkx.graph_number_of_cliques — number of maximal cliques."""
    from linkgraph.algorithms.maxcliques import number_of_cliques

    if G.directed:
        raise ValueError("graph_number_of_cliques: undirected graphs only")
    return number_of_cliques(G._project())


def k_corona(G: DiGraph, k: int) -> list:
    """networkx.k_corona — nodes of the k-core with exactly k in-core
    neighbors (returned as a sorted node list; nx returns a subgraph
    view — members are the contract)."""
    from linkgraph.algorithms.cores import k_corona as _impl

    lg = G._project()
    rows = _impl(lg, k).collect()
    return sorted(
        (G._node_of[r["vid"]] for r in rows if r["value"] == 1), key=repr
    )


def is_forest(G: DiGraph) -> bool:
    """networkx.is_forest (undirected semantics on the simple view)."""
    from linkgraph.algorithms.globals import forest_summary

    rows = {r["which"]: r["value"] for r in forest_summary(G._project()).collect()}
    return bool(rows["is_forest"])


def is_tree(G: DiGraph) -> bool:
    """networkx.is_tree (undirected semantics on the simple view)."""
    from linkgraph.algorithms.globals import forest_summary

    rows = {r["which"]: r["value"] for r in forest_summary(G._project()).collect()}
    return bool(rows["is_tree"])


def barycenter(G: DiGraph) -> list:
    """networkx.barycenter — nodes minimizing total distance Σ d(v, u).
    Faithful guard: raises if the graph is not (strongly) connected,
    like nx (reuses the eccentricity check's reachability scan)."""
    _ecc_checked(G)  # raises unless every vertex reaches every other
    rows = A.barycenter(G._lg).collect()
    return sorted((G._node_of[r["vid"]] for r in rows), key=repr)


def dominating_set(G: DiGraph, start_with=None) -> set:
    """networkx.dominating_set analog — a valid dominating set of the
    undirected view (every node in it or adjacent to it), selected as
    the deterministic Luby maximal independent set rather than nx's
    arbitrary-order greedy; same contract (SOME dominating set).
    ``start_with`` pre-seeding is not supported."""
    if start_with is not None:
        raise NotImplementedError("dominating_set: start_with not supported")
    if G.directed:
        raise ValueError("dominating_set: not implemented for directed graphs")
    rows = A.dominating_set(G._project()).collect()
    return {G._node_of[r["vid"]] for r in rows}


def descendants(G: DiGraph, source) -> set:
    """networkx.descendants — nodes reachable from source (source
    excluded)."""
    lg = G._project()
    if source not in G._vid_of:
        raise KeyError(source)
    rows = A.descendants(lg, G._vid_of[source]).collect()
    return {G._node_of[r["vid"]] for r in rows}


def ancestors(G: DiGraph, source) -> set:
    """networkx.ancestors — nodes with a directed path to source."""
    lg = G._project()
    if source not in G._vid_of:
        raise KeyError(source)
    rows = A.ancestors(lg, G._vid_of[source]).collect()
    return {G._node_of[r["vid"]] for r in rows}


def has_bridges(G: DiGraph) -> bool:
    """networkx.has_bridges (undirected only, like nx)."""
    if G.directed:
        raise ValueError("has_bridges: undirected graphs only")
    from linkgraph.algorithms.bridges import bridges as _impl

    return not _impl(G._project()).isEmpty()


def maximal_matching(G: DiGraph) -> set:
    """networkx.maximal_matching analog — a valid maximal matching of
    the undirected simple view (matched pairs as (u, v) tuples),
    selected by deterministic mutual-min proposal rounds rather than
    nx's insertion-order greedy; same contract (SOME maximal
    matching)."""
    if G.directed:
        raise ValueError("maximal_matching: undirected graphs only")
    from linkgraph.algorithms.matching import maximal_matching as _impl

    rows = _impl(G._project()).collect()
    return {(G._node_of[r["lo"]], G._node_of[r["hi"]]) for r in rows}


def k_shell(G: DiGraph, k: int) -> list:
    """networkx.k_shell — nodes in the k-core but not the (k+1)-core
    (sorted node list; nx returns a subgraph view)."""
    from linkgraph.algorithms.cores import k_shell as _impl

    res = _impl(G._project(), k=k)
    return sorted((n for n, v in G._to_dict(res).items() if v), key=repr)


def _label_groups(G: DiGraph, labeled) -> list:
    comm = G._to_dict(labeled)
    groups: dict = {}
    for n, c in comm.items():
        groups.setdefault(c, set()).add(n)
    return sorted(groups.values(), key=lambda s: (-len(s), repr(sorted(s, key=repr))))


def louvain_communities(G: DiGraph, seed=None) -> list:
    """networkx.community.louvain_communities analog — node sets from
    the distributed Louvain labels (deterministic argmax tie-breaks
    instead of nx's seeded shuffle; the partition is A valid
    high-modularity community structure, pytest-bounded in
    tests/test_louvain.py). ``seed`` accepted for signature parity,
    unused (the engine is deterministic)."""
    return _label_groups(G, A.louvain(G._project()))


def label_propagation_communities(G: DiGraph) -> list:
    """networkx.community.label_propagation_communities analog — node
    sets from synchronous min-tie-break CDLP labels over the undirected
    view (nx uses asynchronous sweeps with RNG order; the contract —
    a label-propagation community partition — is the same, and the
    engine's version is deterministic at any parallelism)."""
    if G.directed:
        raise ValueError("label_propagation_communities: undirected graphs only")
    return _label_groups(G, A.cdlp(G._project(), max_round=10))


# deprecated-in-networkx aliases the reference still exports
# (python/graphscope/nx/algorithms/builtin.py: hits_scipy = hits)
hits_scipy = hits
