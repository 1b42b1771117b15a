"""Vertex-centric Pregel-style user API over the superstep engine.

Reference surface being re-expressed:
- /root/reference/analytical_engine/core/app/pregel/pregel_app_base.h —
  user algorithms subclass a vertex-compute base;
- pregel_vertex.h:51-74 — ``set_value`` / ``send_message`` /
  ``vote_to_halt``;
- pregel_compute_context.h:77-106 (``superstep()``), :242-250
  (``aggregate`` / ``get_aggregated_value``);
- aggregators: core/app/pregel/aggregators/aggregator.h (min/max/sum/
  and/or), aggregator_factory.h.

Spark-native shape: a Pregel program is declared as **Column
expressions**, not per-row callbacks, so every superstep stays inside
whole-stage codegen — the engine equivalent of the reference's compiled
C++ compute() body. Per superstep:

1. active vertices emit one message along each out-edge
   (``emit(value, weight)`` — send_message along kAlongEdgeToOuterVertex);
2. messages combine per destination with the algebraic ``combine``
   reducer (the Pregel combiner; map-side partial aggregation absorbs
   hub skew);
3. every vertex updates: ``update(value, combined_msg, round) →
   (new_value, active)`` — a vertex with no incoming message sees NULL
   (the halted-unless-messaged rule is expressed by returning
   ``active=False`` then);
4. named ``aggregators`` evaluate over the new state and feed the
   ``halt`` predicate (get_aggregated_value semantics: values computed
   at superstep k are visible to the halt decision after k).

The loop, lineage-cutting and checkpoint/resume come from
:func:`linkgraph.superstep.run_supersteps`.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.superstep import run_supersteps

# builtin aggregator factory (aggregator.h semantics)
AGGREGATORS: dict[str, Callable[[Column], Column]] = {
    "min": F.min,
    "max": F.max,
    "sum": F.sum,
    "and": lambda c: F.min(c.cast("boolean").cast("int")).cast("boolean"),
    "or": lambda c: F.max(c.cast("boolean").cast("int")).cast("boolean"),
}


@dataclass
class PregelProgram:
    """A vertex program. All callables receive/return Column expressions."""

    # per-vertex initial value; may reference F.col("vid")
    initial_value: Column
    # initial active set (vertices that "receive the start signal")
    initially_active: Column
    # algebraic message reducer, e.g. F.min / F.sum (the Pregel combiner)
    combine: Callable[[Column], Column]
    # (value, combined_msg — NULL if no message, round) -> (new_value, active)
    update: Callable[[Column, Column, int], tuple[Column, Column]]
    # (value, edge_weight) -> message sent along each out-edge of an
    # active vertex; edge_weight is NULL when the graph has no weight col
    emit: Callable[[Column, Column], Column]
    # name -> aggregator fn over the value column, evaluated per superstep
    aggregators: dict[str, Callable[[Column], Column]] = field(default_factory=dict)
    # halt predicate over {"active": n, **aggregator values}; default:
    # every vertex voted to halt and no messages are in flight
    halt: Callable[[dict], bool] | None = None


@dataclass
class PregelResult:
    state: DataFrame  # (vid, value)
    rounds: int
    converged: bool
    history: list[dict]


def run_pregel(
    graph: LinkGraph,
    program: PregelProgram,
    max_rounds: int = 100,
    weight_col: str | None = None,
    checkpoint_dir: str | None = None,
) -> PregelResult:
    e = graph.edges
    if weight_col and weight_col in e.columns:
        edges = e.select("src", "dst", F.col(weight_col).cast("double").alias("w"))
    else:
        edges = e.select("src", "dst", F.lit(None).cast("double").alias("w"))
    edges = edges.persist()

    state0 = graph.vertices.select(
        "vid",
        program.initial_value.alias("value"),
        program.initially_active.alias("active"),
    )

    def step(state: DataFrame, rnd: int) -> tuple[DataFrame, dict]:
        frontier = state.where(F.col("active")).select("vid", "value")
        msgs = (
            frontier.join(edges, frontier["vid"] == edges["src"])
            .select(
                F.col("dst"),
                program.emit(F.col("value"), F.col("w")).alias("msg"),
            )
            .groupBy("dst")
            .agg(program.combine(F.col("msg")).alias("msg"))
        )
        joined = state.join(msgs, state["vid"] == msgs["dst"], "left")
        new_value, active = program.update(state["value"], F.col("msg"), rnd)
        new_state = joined.select(
            state["vid"], new_value.alias("value"), active.alias("active")
        ).persist()
        agg_exprs = [F.sum(F.col("active").cast("long")).alias("active")]
        for name, fn in program.aggregators.items():
            agg_exprs.append(fn(F.col("value")).alias(name))
        row = new_state.agg(*agg_exprs).first()
        stats = {k: row[k] for k in row.asDict()}
        stats["active"] = stats["active"] or 0
        return new_state, stats

    halt = program.halt or (lambda stats: stats["active"] == 0)
    res = run_supersteps(
        state0, step, halt, max_rounds=max_rounds, checkpoint_dir=checkpoint_dir
    )
    edges.unpersist()
    return PregelResult(
        state=res.state.select("vid", "value"),
        rounds=res.rounds,
        converged=res.converged,
        history=res.history,
    )


# ---- reference algorithms re-implemented on the user surface ----------


def pregel_sssp(
    graph: LinkGraph, src: int, weight_col: str | None = "weight", max_rounds: int = 10_000
) -> DataFrame:
    """SSSP written against the Pregel surface (mirrors the reference's
    sssp_pregel.h demo app). Returns (vid, value) with unreached = inf."""
    inf = float("inf")
    program = PregelProgram(
        initial_value=F.when(F.col("vid") == src, F.lit(0.0)).otherwise(F.lit(inf)),
        initially_active=F.col("vid") == src,
        combine=F.min,
        update=lambda value, msg, rnd: (
            F.least(value, F.coalesce(msg, value)),
            F.coalesce(msg, value) < value,
        ),
        emit=lambda value, w: value + F.coalesce(w, F.lit(1.0)),
        aggregators={"reached_min": F.min},
    )
    res = run_pregel(graph, program, max_rounds=max_rounds, weight_col=weight_col)
    return res.state


def pregel_wcc(graph: LinkGraph, max_rounds: int = 10_000) -> DataFrame:
    """WCC (min-label propagation) on the Pregel surface over the
    undirected closure — same fixpoint as linkgraph.algorithms.wcc."""
    und = graph.to_undirected()
    program = PregelProgram(
        initial_value=F.col("vid").cast("double"),
        initially_active=F.lit(True),
        combine=F.min,
        update=lambda value, msg, rnd: (
            F.least(value, F.coalesce(msg, value)),
            F.coalesce(msg, value) < value,
        ),
        emit=lambda value, w: value,
        aggregators={"min_label": F.min, "max_label": F.max},
    )
    res = run_pregel(und, program, max_rounds=max_rounds)
    return res.state.select("vid", F.col("value").cast("long").alias("value"))
