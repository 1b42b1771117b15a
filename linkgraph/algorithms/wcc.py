"""Weakly connected components — label min-propagation with a frontier.

Reference: /root/reference/analytical_engine/apps/projected/wcc_projected.h
(init label = gid :76-81; propagate min over out- AND in-edges :83-103;
modified-vertex frontier :138-162; terminate when nothing changed
:112-117). Component id = min vid in the component; with our rank-of-oid
vids that is the index of the lexicographically smallest oid —
parallelism-invariant.

Spark shape: the undirected closure is materialized once and cached; each
superstep joins only the *changed* frontier against it (delta iteration —
the frontier shrinks geometrically on real graphs), then
``groupBy(dst).min(label)`` (algebraic ⇒ map-side combine absorbs hub
skew) and a `least` merge. One scalar action per round counts changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.superstep import run_supersteps


def wcc(
    graph: LinkGraph,
    max_rounds: int = 200,
    checkpoint_dir: str | None = None,
    init_labels: DataFrame | None = None,
) -> DataFrame:
    """``init_labels`` (vid, label) warm-starts min-propagation — used by
    incremental append/streaming resume. Correctness: the fixed point is
    the per-component min of the INITIAL labels; as long as every initial
    label is the vid of some vertex inside the same component (true for
    labels produced by a previous wcc run on a subgraph — the old
    component minimum is still a member after edges are added), that min
    equals the component's min vid, identical to a cold run."""
    spark = graph.edges.sparkSession
    e = graph.edges.select("src", "dst")
    p = spark.sparkContext.defaultParallelism
    und = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(p, "src")  # co-partition on the per-round join key
        .persist()
    )
    if init_labels is None:
        state0 = graph.vertices.select(
            "vid", F.col("vid").alias("label"), F.lit(True).alias("changed")
        )
    else:
        il = init_labels.select("vid", F.col(init_labels.columns[1]).alias("_il"))
        state0 = (
            graph.vertices.join(il, "vid", "left")
            .select(
                "vid",
                F.least(F.col("vid"), F.coalesce("_il", F.col("vid"))).alias("label"),
                F.lit(True).alias("changed"),
            )
        )

    def step(state: DataFrame, rnd: int) -> tuple[DataFrame, dict]:
        frontier = state.where(F.col("changed")).select("vid", "label")
        msgs = (
            frontier.join(und, frontier["vid"] == und["src"])
            .groupBy("dst")
            .agg(F.min("label").alias("mlabel"))
        )
        new_state = (
            state.join(msgs, state["vid"] == msgs["dst"], "left")
            .select(
                state["vid"],
                F.least(state["label"], F.coalesce("mlabel", state["label"])).alias("label"),
                (F.coalesce("mlabel", state["label"]) < state["label"]).alias("changed"),
            )
            .persist()
        )
        # one action per round: materializes the cache AND counts changes
        n_changed = new_state.agg(F.sum(F.col("changed").cast("long"))).first()[0] or 0
        return new_state, {"changed": n_changed}

    result = run_supersteps(
        state0,
        step,
        converged=lambda s: s["changed"] == 0,
        max_rounds=max_rounds,
        checkpoint_dir=checkpoint_dir,
    )
    out = result.state.select("vid", F.col("label").alias("value"))
    und.unpersist()
    _ = spark
    return out
