"""SALSA — Stochastic Approach for Link-Structure Analysis
(Lempel & Moran, WWW9/TOIT 2001): the random-walk counterpart of HITS.

The authority walk steps backward then forward (a → hub co-citing a →
authority), the hub walk forward then backward. Lempel–Moran's main
theorem gives the stationary distributions in CLOSED FORM — no power
iteration at all:

    authority(i) = (|A_j| / |A|) · (in_deg(i)  / |E_j|)
    hub(i)       = (|H_j| / |H|) · (out_deg(i) / |E_j|)

where j is i's connected component of the BIPARTITE hub–authority
support graph (a hub h and authority a are linked iff edge (h, a)
exists), A_j/H_j its authorities/hubs and E_j its edges. So the whole
operator is one degree aggregation + ONE wcc run over the bipartite
support graph (hub k ↦ node 2k, authority k ↦ node 2k+1 — the packed
two-side trick) + component-size joins: strictly cheaper than HITS'
iteration, and exactly replayable in SQL (all ratios of integers,
evaluated in one double expression).

Reference surface: the reference registry ships HITS
(analytical_engine/apps/hits/, nx.hits forwarding); SALSA is its
standard stochastic sibling (same bipartite support structure) —
flagged beyond-reference like scc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph


def salsa(graph: LinkGraph) -> DataFrame:
    """(vid, hub, authority) — SALSA scores, 0.0 for vertices outside
    the respective side (no out-edges ⇒ hub 0; no in-edges ⇒
    authority 0). Scores sum to 1 per side across the graph."""
    from linkgraph.algorithms.wcc import wcc

    e = graph.edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    e = e.persist()
    # bipartite support graph: hub-side node 2·src, authority-side 2·dst+1
    bip = e.select(
        (F.col("src") * 2).alias("src"), (F.col("dst") * 2 + 1).alias("dst")
    )
    bv = (
        bip.select(F.col("src").alias("vid"))
        .union(bip.select(F.col("dst").alias("vid")))
        .distinct()
        .select("vid", F.col("vid").cast("string").alias("oid"))
    )
    comp = wcc(LinkGraph(vertices=bv, edges=bip)).select(
        "vid", F.col("value").alias("comp")
    ).persist()
    hub_comp = comp.where(F.col("vid") % 2 == 0).select(
        (F.col("vid") / 2).cast("long").alias("src"), "comp"
    )
    auth_comp = comp.where(F.col("vid") % 2 == 1).select(
        ((F.col("vid") - 1) / 2).cast("long").alias("dst"), "comp"
    )
    ec = e.join(hub_comp, "src")  # every edge inherits its component
    comp_edges = ec.groupBy("comp").agg(F.count("*").alias("ce"))
    comp_hubs = hub_comp.groupBy("comp").agg(F.count("*").alias("ch"))
    comp_auths = auth_comp.groupBy("comp").agg(F.count("*").alias("ca"))
    tot = comp.select(
        F.sum((F.col("vid") % 2 == 0).cast("long")).alias("th"),
        F.sum((F.col("vid") % 2 == 1).cast("long")).alias("ta"),
    ).first()
    th, ta = int(tot["th"] or 0), int(tot["ta"] or 0)
    outs = e.groupBy("src").agg(F.count("*").alias("outd"))
    ins = e.groupBy("dst").agg(F.count("*").alias("ind"))
    hub = (
        outs.join(hub_comp, "src")
        .join(comp_edges, "comp")
        .join(comp_hubs, "comp")
        .select(
            F.col("src").alias("vid"),
            F.round(
                (F.col("ch") * F.col("outd"))
                / (F.lit(float(max(th, 1))) * F.col("ce")),
                9,
            ).alias("hub"),
        )
    )
    auth = (
        ins.join(auth_comp, "dst")
        .join(comp_edges, "comp")
        .join(comp_auths, "comp")
        .select(
            F.col("dst").alias("vid"),
            F.round(
                (F.col("ca") * F.col("ind"))
                / (F.lit(float(max(ta, 1))) * F.col("ce")),
                9,
            ).alias("authority"),
        )
    )
    out = (
        graph.vertices.select("vid")
        .join(hub, "vid", "left")
        .join(auth, "vid", "left")
        .select(
            "vid",
            F.coalesce("hub", F.lit(0.0)).alias("hub"),
            F.coalesce("authority", F.lit(0.0)).alias("authority"),
        )
        .localCheckpoint(eager=True)
    )
    e.unpersist()
    comp.unpersist()
    return out
