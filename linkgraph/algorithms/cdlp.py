"""CDLP / LPA — synchronous community detection by label propagation.

Reference: grape::CDLP (external libgrape-lite, registered at
/root/reference/coordinator/gscoordinator/builtin/app/.gs_conf.yaml:41-43,
exposed as ``graphscope.lpa``,
/root/reference/python/graphscope/analytical/app/lpa.py:29-54), validated
in-tree against LDBC Graphalytics goldens
(/root/reference/analytical_engine/test/app_tests.sh:330-345).

LDBC CDLP semantics (normative): init label(v) = v; for exactly
``max_round`` synchronous rounds every vertex adopts the **most frequent
label in its neighbor multiset** (for directed graphs each edge
contributes in both directions), **ties broken by the smallest label**.
Exact integer output.

Spark shape: the neighbor-label multiset count is the skewed part — a hub
vertex aggregates millions of (dst, label) pairs — so the count goes
through :func:`linkgraph.skew.salted_count_by_label` (two-phase, salted on
src). The per-vertex argmax-with-min-tie-break is a single algebraic
``max(struct(cnt, -label))`` — no window, no sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.skew import salted_count_by_label
from linkgraph.superstep import run_supersteps


def cdlp(
    graph: LinkGraph,
    max_round: int = 10,
    checkpoint_dir: str | None = None,
    num_salts: int = 16,
) -> DataFrame:
    e = graph.edges.select("src", "dst")
    p = e.sparkSession.sparkContext.defaultParallelism
    # neighbor multiset = in-neighbors ∪ out-neighbors (multiplicities kept);
    # co-partitioned on the per-round join key so it never re-shuffles
    bidir = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .repartition(p, "src")
        .persist()
    )

    state0 = graph.vertices.select("vid", F.col("vid").alias("label"))

    def step(state: DataFrame, rnd: int) -> tuple[DataFrame, dict]:
        nbr_labels = bidir.join(
            state.select(F.col("vid").alias("src"), "label"), "src"
        ).select("dst", "label", "src")
        counts = salted_count_by_label(
            nbr_labels, key="dst", label="label", salt_on="src", num_salts=num_salts
        )
        best = counts.groupBy("dst").agg(
            F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("neg"))).alias("top")
        ).select("dst", (-F.col("top.neg")).alias("new_label"))
        new_state = (
            state.join(best, state["vid"] == best["dst"], "left")
            .select(
                state["vid"],
                F.coalesce("new_label", state["label"]).alias("label"),
            )
            .persist()
        )
        new_state.count()  # materialize; fixed-round → no stats needed
        return new_state, {}

    result = run_supersteps(
        state0,
        step,
        converged=lambda s: False,  # LDBC: exactly max_round rounds
        max_rounds=max_round,
        checkpoint_dir=checkpoint_dir,
    )
    out = result.state.select("vid", F.col("label").alias("value"))
    bidir.unpersist()
    return out


def peer_pressure(
    graph: LinkGraph,
    times: int = 10,
    checkpoint_dir: str | None = None,
    num_salts: int = 16,
) -> DataFrame:
    """Peer-pressure clustering — TinkerPop's PeerPressureVertexProgram as
    compiled by the reference's Gremlin step
    (interactive_engine/compiler/src/main/java/com/alibaba/maxgraph/
    compiler/tree/PeerPressureVertexProgramTreeNode.java →
    PROGRAM_GRAPH_PEERPRESSURE).

    Semantics (TinkerPop, default vote strength 1.0): init cluster(v) = v;
    each of exactly ``times`` synchronous rounds every vertex tallies the
    vote energy per cluster over **its own current cluster plus every
    neighbor's cluster** (both edge directions, multiplicities kept) and
    adopts the cluster with the highest energy. TinkerPop breaks energy
    ties in hash-map iteration order (nondeterministic); this
    implementation pins ties to the **smallest cluster id** — the same
    determinization the engine's CDLP uses — so results are exact and
    oracle-checkable. With unit vote strength the dynamics are exactly
    CDLP's count-majority plus the self vote, so the kernel reuses the
    salted two-phase neighbor-label count and adds one union with the
    state itself (no extra shuffle: the self rows are already keyed on
    vid).
    """
    e = graph.edges.select("src", "dst")
    p = e.sparkSession.sparkContext.defaultParallelism
    bidir = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .repartition(p, "src")
        .persist()
    )

    state0 = graph.vertices.select("vid", F.col("vid").alias("label"))

    def step(state: DataFrame, rnd: int) -> tuple[DataFrame, dict]:
        nbr_labels = bidir.join(
            state.select(F.col("vid").alias("src"), "label"), "src"
        ).select("dst", "label", "src")
        # self vote: one (vid, own-label) row per vertex, salted on itself
        self_votes = state.select(
            F.col("vid").alias("dst"), "label", F.col("vid").alias("src")
        )
        counts = salted_count_by_label(
            nbr_labels.unionByName(self_votes),
            key="dst",
            label="label",
            salt_on="src",
            num_salts=num_salts,
        )
        best = counts.groupBy("dst").agg(
            F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("neg"))).alias("top")
        ).select("dst", (-F.col("top.neg")).alias("new_label"))
        new_state = (
            state.join(best, state["vid"] == best["dst"], "left")
            .select(
                state["vid"],
                F.coalesce("new_label", state["label"]).alias("label"),
            )
            .persist()
        )
        new_state.count()
        return new_state, {}

    result = run_supersteps(
        state0,
        step,
        converged=lambda s: False,  # TinkerPop: exactly `times` rounds
        max_rounds=times,
        checkpoint_dir=checkpoint_dir,
    )
    out = result.state.select("vid", F.col("label").alias("cluster"))
    bidir.unpersist()
    return out
