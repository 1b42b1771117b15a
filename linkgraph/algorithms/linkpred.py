"""Link prediction (NetworkX semantics, undirected).

Reference surface: graphscope.nx forwards NetworkX's link-prediction
suite — jaccard_coefficient, adamic_adar_index, resource_allocation
_index, preferential_attachment (undirected-only; DiGraph raises) —
see /root/reference/python/graphscope/nx/algorithms/tests/forward/
test_link_prediction.py.

Spark-first shape
-----------------
All four indices reduce to one common-neighbor equi-join::

    adj(w, u) ⋈ adj(w, v) on w   →  group by (u, v)

with per-``w`` terms folded map-side (``count``, ``sum(1/ln deg w)``,
``sum(1/deg w)``) — one shuffle for the join, one for the aggregate,
no driver-side iteration.  Degrees join in afterwards for jaccard /
preferential attachment.

Candidate generation: NetworkX's default ebunch (ALL non-edges) is
O(V²) and meaningless at 100 TB; the engine default emits only pairs
with ≥1 common neighbor (every pair NetworkX would score non-zero on
jaccard/AA/RA), each once as (u < v), non-adjacent.  Pass ``pairs``
explicitly to score an arbitrary candidate list (zero-common-neighbor
pairs then score 0, preferential attachment still deg·deg — exact
NetworkX values).

Scale caution: the w-join fans out Σ_w deg(w)²; on hub-heavy graphs
cap it with ``max_neighbor_degree`` (hubs above the cap are skipped as
common neighbors — their AA/RA terms are ~0 anyway; the skip is loud
in the docstring, not silent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph

# Cache ownership (same contract as pipeline.dedup): the returned lazy
# plan references the undirected adjacency from ~6 subtrees (deg, both
# join sides, the anti-join); without a persist each one re-runs the
# edge scan + union-distinct shuffle — the dominant waste at scale.
# Each invocation releases the previous one's blocks.
_CACHED: list[DataFrame] = []


def _own_cache(df: DataFrame) -> DataFrame:
    release_cached()
    _CACHED.append(df.persist())
    return df


def release_cached() -> None:
    """Unpersist the adjacency cached by the most recent call."""
    while _CACHED:
        _CACHED.pop().unpersist()


def _und_adj(graph: LinkGraph) -> DataFrame:
    """Undirected adjacency (src, dst) both directions, no self loops."""
    e = graph.edges.select("src", "dst")
    return (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def link_prediction(
    graph: LinkGraph,
    pairs: DataFrame | None = None,
    max_neighbor_degree: int | None = None,
) -> DataFrame:
    """Score candidate vertex pairs with the four classic indices.

    Returns (u, v, cn, jaccard, adamic_adar, resource_allocation,
    preferential_attachment).  ``pairs`` is any DataFrame whose first
    two columns are the pair endpoints; when None, candidates are all
    non-adjacent pairs with ≥1 common neighbor, emitted once as u < v.
    """
    adj = _own_cache(_und_adj(graph))
    deg = adj.groupBy(F.col("src").alias("vid")).agg(F.count("*").alias("deg"))

    # adjacency keyed by the common neighbor w
    by_w = adj.select(F.col("src").alias("w"), F.col("dst").alias("n"))
    if max_neighbor_degree is not None:
        ok = deg.where(F.col("deg") <= max_neighbor_degree).select(
            F.col("vid").alias("w")
        )
        by_w = by_w.join(ok, "w", "left_semi")
    # fold the per-w AA/RA terms in BEFORE the self-join so they ride
    # the same shuffle (deg is vertex-sized; Catalyst/AQE picks the
    # join strategy)
    by_w = by_w.join(
        deg.select(
            F.col("vid").alias("w"),
            # deg(w) >= 2 whenever w really is a common neighbor of a
            # distinct pair; the guard only silences ANSI div-by-zero on
            # deg-1 rows the join drops anyway
            F.when(F.col("deg") > 1, 1.0 / F.log("deg")).otherwise(0.0).alias("aa_term"),
            (1.0 / F.col("deg")).alias("ra_term"),
        ),
        "w",
    )

    a = by_w.select("w", F.col("n").alias("u"), "aa_term", "ra_term")
    b = by_w.select("w", F.col("n").alias("v"))

    if pairs is None:
        cand = a.join(b, "w").where(F.col("u") < F.col("v"))
        if graph.pair_key_packable():
            # the Σ deg(w)² candidate stream exchanges on the pair key —
            # pack it into one long (census lesson) and unpack after
            from linkgraph.graph import packed_pair

            scored = (
                cand.groupBy(packed_pair("u", "v").alias("uv"))
                .agg(
                    F.count("*").alias("cn"),
                    F.sum("aa_term").alias("adamic_adar"),
                    F.sum("ra_term").alias("resource_allocation"),
                )
                .select(
                    F.shiftright("uv", 32).alias("u"),
                    F.col("uv").bitwiseAND(F.lit(4294967295)).alias("v"),
                    "cn", "adamic_adar", "resource_allocation",
                )
            )
        else:
            scored = cand.groupBy("u", "v").agg(
                F.count("*").alias("cn"),
                F.sum("aa_term").alias("adamic_adar"),
                F.sum("ra_term").alias("resource_allocation"),
            )
        # drop adjacent pairs (NetworkX scores non-edges); adj holds both
        # orientations, so src < dst picks each undirected edge once —
        # straight from the cached adjacency, no fresh distinct shuffle
        existing = adj.where(F.col("src") < F.col("dst")).select(
            F.col("src").alias("u"), F.col("dst").alias("v")
        )
        scored = scored.join(existing, ["u", "v"], "left_anti")
    else:
        c0, c1 = pairs.columns[0], pairs.columns[1]
        p = pairs.select(
            F.col(c0).cast("long").alias("u"), F.col(c1).cast("long").alias("v")
        ).distinct()
        # pairs → u-side adjacency on u, then v-side on (w, v)
        hits = p.join(a, "u").join(b, ["w", "v"])
        agg = hits.groupBy("u", "v").agg(
            F.count("*").alias("cn"),
            F.sum("aa_term").alias("adamic_adar"),
            F.sum("ra_term").alias("resource_allocation"),
        )
        scored = p.join(agg, ["u", "v"], "left").fillna(
            {"cn": 0, "adamic_adar": 0.0, "resource_allocation": 0.0}
        )

    du = deg.select(F.col("vid").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("vid").alias("v"), F.col("deg").alias("dv"))
    out = (
        scored.join(du, "u", "left")
        .join(dv, "v", "left")
        .fillna({"du": 0, "dv": 0})
        .select(
            "u",
            "v",
            F.col("cn").cast("long").alias("cn"),
            F.when(
                F.col("du") + F.col("dv") - F.col("cn") > 0,
                F.col("cn") / (F.col("du") + F.col("dv") - F.col("cn")),
            )
            .otherwise(F.lit(0.0))
            .alias("jaccard"),
            F.col("adamic_adar").cast("double").alias("adamic_adar"),
            F.col("resource_allocation").cast("double").alias("resource_allocation"),
            (F.col("du") * F.col("dv")).cast("long").alias("preferential_attachment"),
        )
    )
    return out


def jaccard_coefficient(graph: LinkGraph, pairs: DataFrame | None = None) -> DataFrame:
    """(u, v, value) — |Γ(u)∩Γ(v)| / |Γ(u)∪Γ(v)|."""
    return link_prediction(graph, pairs).select("u", "v", F.col("jaccard").alias("value"))


def adamic_adar_index(graph: LinkGraph, pairs: DataFrame | None = None) -> DataFrame:
    """(u, v, value) — Σ_{w∈Γ(u)∩Γ(v)} 1/ln(deg w)."""
    return link_prediction(graph, pairs).select(
        "u", "v", F.col("adamic_adar").alias("value")
    )


def resource_allocation_index(
    graph: LinkGraph, pairs: DataFrame | None = None
) -> DataFrame:
    """(u, v, value) — Σ_{w∈Γ(u)∩Γ(v)} 1/deg(w)."""
    return link_prediction(graph, pairs).select(
        "u", "v", F.col("resource_allocation").alias("value")
    )


def preferential_attachment(
    graph: LinkGraph, pairs: DataFrame | None = None
) -> DataFrame:
    """(u, v, value) — deg(u)·deg(v)."""
    return link_prediction(graph, pairs).select(
        "u", "v", F.col("preferential_attachment").alias("value")
    )
