"""Driver-side superstep loop — the engine's execution model.

Replaces the reference's worker loop
(/root/reference/analytical_engine/core/worker/default_worker.h:81-121):
``PEval``; then ``while (!messages.ToTerminate()) IncEval(...)``. Here a
superstep is one Spark job over a *state DataFrame*; "messages" are the
shuffle inside the step function; termination is a scalar aggregate
(convergence stats) returned by the step, mirroring the reference's
message-manager terminate vote + Sum communicator
(/root/reference/analytical_engine/apps/pagerank/pagerank_networkx.h:85,128-141).

Iteration-specific machinery Catalyst does not provide (SURVEY.md §4.2):

- **lineage cutting** — every round the returned state is
  ``localCheckpoint``-ed, so round k+1's plan bottoms out at round k's
  ``LogicalRDD`` leaf. Anything weaker is a trap: if states are merely
  cached and unpersisted as they age, a later materialization (or
  executor loss) recomputes *through* the evicted cache entries —
  recursively re-running the whole history with exponential fan-out from
  shared subplans. The checkpoint scan itself is served from the step's
  cache (the step's stats aggregate already materialized it);
- **durable checkpoint/resume** — every ``checkpoint_every`` rounds the
  state snapshots through :class:`linkgraph.checkpoint.CheckpointStore`
  with per-partition lineage + metrics; ``run`` resumes from the latest
  committed round if the store already has one;
- **per-round metrics** — each round's stats row (plus wall time) is kept
  for BENCH reporting.
"""

from __future__ import annotations

import logging
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from linkgraph.checkpoint import CheckpointStore

# A step takes (state, round) and returns (new_state, stats) where stats is
# a dict of scalars the loop hands to `converged`.
StepFn = Callable[[DataFrame, int], tuple[DataFrame, dict]]

# bench instrumentation: the most recent run_supersteps result (history of
# per-round stats incl. wall_sec), same pattern as csr.LAST_HISTORY
LAST_RESULT: "SuperstepResult | None" = None

# warn once (not per round) if the deterministic block-free path breaks
_FREE_WARNED = False


def _free_local_checkpoint(df: DataFrame) -> None:
    """Release a round's localCheckpoint blocks immediately.

    Old rounds' checkpoint RDDs otherwise linger until a *driver* GC lets
    the ContextCleaner find them — at 10^7-row states that lag accumulates
    GBs of dead blocks and measurably degrades later rounds (observed as
    round times drifting 15 s → 43 s at 10^8 edges). The analyzed plan of
    a localCheckpoint-ed Dataset is a LogicalRDD; unpersisting its RDD
    drops the blocks deterministically. Safe because the *new* state was
    checkpointed eagerly first (its blocks are independent).
    """
    global _FREE_WARNED
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception as exc:  # plan shape changed — GC will catch it, slowly
        if not _FREE_WARNED:
            _FREE_WARNED = True
            logging.getLogger(__name__).warning(
                "localCheckpoint block freeing unavailable (%s: %s) — old "
                "superstep states will linger until driver GC; expect round "
                "times to drift at large state sizes",
                type(exc).__name__, exc,
            )


@dataclass
class SuperstepResult:
    state: DataFrame
    rounds: int
    converged: bool
    history: list[dict] = field(default_factory=list)


def run_supersteps(
    init_state: DataFrame,
    step: StepFn,
    converged: Callable[[dict], bool],
    max_rounds: int,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    resume: bool = True,
) -> SuperstepResult:
    spark = init_state.sparkSession
    start_round = 0
    state = init_state

    store = CheckpointStore(checkpoint_dir) if checkpoint_dir else None
    if store and resume:
        loaded = store.load_latest(spark)
        if loaded is not None:
            state, start_round = loaded[0], loaded[1]

    state = state.localCheckpoint(eager=True)

    history: list[dict] = []
    done = False
    rnd = start_round
    for rnd in range(start_round + 1, max_rounds + 1):
        t0 = time.time()
        returned, stats = step(state, rnd)
        # flat lineage invariant: every round's state is a LogicalRDD leaf
        new_state = returned.localCheckpoint(eager=True)
        if returned.storageLevel.useMemory or returned.storageLevel.useDisk:
            returned.unpersist()
        stats = dict(stats or {})
        stats["round"] = rnd
        stats["wall_sec"] = time.time() - t0
        history.append(stats)
        _free_local_checkpoint(state)
        state = new_state
        if store and rnd % checkpoint_every == 0:
            store.save(state, rnd, metrics=stats)
        if converged(stats):
            done = True
            break

    if store and not (history and history[-1]["round"] % checkpoint_every == 0):
        store.save(state, rnd, metrics=history[-1] if history else {})
    global LAST_RESULT
    LAST_RESULT = SuperstepResult(state=state, rounds=rnd, converged=done, history=history)
    return LAST_RESULT
