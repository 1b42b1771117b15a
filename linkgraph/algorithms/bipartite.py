"""Bipartite one-mode projection (weighted co-occurrence).

NetworkX-parity surface: ``nx.bipartite.weighted_projected_graph(G,
nodes)`` — project a bipartite (u, item) incidence onto the u side;
projected edge weight = number of shared items (graphscope.nx forwards
the bipartite suite — see /root/reference/python/graphscope/nx/
algorithms/tests/forward/, bipartite module).

Spark shape: ONE self-equi-join on the item key followed by one
``groupBy(u1, u2).count`` — both shuffles hash on their natural keys,
no driver-side iteration, no UDFs.

Scale caution: the join fans out Σ_item deg(item)² — a viral item with
10⁶ holders would emit 10¹² pairs.  ``max_item_degree`` caps it: items
held by more than the cap are DROPPED from the projection (loudly — the
cap is the documented semantic, as in linkpred's hub cap; their pair
sets are all-pairs cliques that carry no signal at that size).  The
default (None) projects everything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def weighted_projection(
    incidence: DataFrame,
    min_weight: int = 1,
    max_item_degree: int | None = None,
) -> DataFrame:
    """(u1, u2, w) with u1 < u2, w = count of shared items ≥ min_weight.

    ``incidence``: first column = projected-side node, second = item.
    Duplicate (u, item) rows are collapsed first (nx graphs are simple).
    """
    u, it = incidence.columns[:2]
    inc = incidence.select(
        F.col(u).alias("u"), F.col(it).alias("item")
    ).distinct()
    if max_item_degree is not None:
        keep = (
            inc.groupBy("item")
            .agg(F.count("*").alias("d"))
            .where(F.col("d") <= max_item_degree)
            .select("item")
        )
        inc = inc.join(keep, "item")
    a = inc.select(F.col("item"), F.col("u").alias("u1"))
    b = inc.select(F.col("item"), F.col("u").alias("u2"))
    return (
        a.join(b, "item")
        .where(F.col("u1") < F.col("u2"))
        .groupBy("u1", "u2")
        .agg(F.count("*").alias("w"))
        .where(F.col("w") >= min_weight)
    )
