"""HITS hubs & authorities.

Reference: gs::HITS (/root/reference/analytical_engine/apps/hits/hits.h:46-75;
python sig /root/reference/python/graphscope/analytical/app/hits.py:29-62),
which implements the NetworkX power iteration:

    a(v) = Σ_{u→v} h_last(u);  h(v) = Σ_{v→w} a(w)
    h /= max(h); a /= max(a)
    stop when Σ|h - h_last| < tol  (or max_round)
    if normalized: h /= Σh, a /= Σa at the end

Returns (vid, hub, auth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.superstep import run_supersteps


def hits(
    graph: LinkGraph,
    tolerance: float = 0.01,
    max_round: int = 100,
    normalized: bool = True,
) -> DataFrame:
    edges = graph.edges.select("src", "dst").persist()
    n = graph.vertices.count()
    if n == 0:
        return graph.vertices.sparkSession.createDataFrame(
            [], "vid long, hub double, auth double"
        )
    state0 = graph.vertices.select(
        "vid", F.lit(1.0 / n).alias("hub"), F.lit(1.0 / n).alias("auth")
    )

    def step(state: DataFrame, rnd: int) -> tuple[DataFrame, dict]:
        auth = (
            state.join(edges, state["vid"] == edges["src"])
            .groupBy("dst")
            .agg(F.sum("hub").alias("a_raw"))
        )
        a_df = (
            state.select("vid", "hub")
            .join(auth, state["vid"] == auth["dst"], "left")
            .select("vid", F.col("hub").alias("hub_last"), F.coalesce("a_raw", F.lit(0.0)).alias("a_raw"))
        )
        hub = (
            a_df.join(edges, a_df["vid"] == edges["dst"])
            .groupBy("src")
            .agg(F.sum("a_raw").alias("h_raw"))
        )
        joined = (
            a_df.join(hub, a_df["vid"] == hub["src"], "left")
            .select("vid", "hub_last", "a_raw", F.coalesce("h_raw", F.lit(0.0)).alias("h_raw"))
            .persist()
        )
        m = joined.agg(F.max("h_raw").alias("hm"), F.max("a_raw").alias("am")).first()
        hmax = m["hm"] or 1.0
        amax = m["am"] or 1.0
        hmax = hmax if hmax != 0 else 1.0
        amax = amax if amax != 0 else 1.0
        new_state = joined.select(
            "vid",
            (F.col("h_raw") / hmax).alias("hub"),
            (F.col("a_raw") / amax).alias("auth"),
            "hub_last",
        ).persist()
        err = new_state.agg(F.sum(F.abs(F.col("hub") - F.col("hub_last")))).first()[0] or 0.0
        joined.unpersist()
        return new_state, {"err": err}

    res = run_supersteps(state0, step, lambda s: s["err"] < tolerance, max_rounds=max_round)
    out = res.state
    if normalized:
        s = out.agg(F.sum("hub").alias("hs"), F.sum("auth").alias("as_")).first()
        hs = s["hs"] or 1.0
        as_ = s["as_"] or 1.0
        out = out.select(
            "vid", (F.col("hub") / hs).alias("hub"), (F.col("auth") / as_).alias("auth")
        )
    else:
        out = out.select("vid", "hub", "auth")
    edges.unpersist()
    return out
