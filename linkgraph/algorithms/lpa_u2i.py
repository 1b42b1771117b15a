"""Bipartite weighted label propagation (u2i) — dominant-label variant.

Reference: /root/reference/coordinator/gscoordinator/builtin/app/.gs_conf.yaml:144-146
(apps/lpa/lpa_u2i.h; python sig app/lpa.py:60-83). **Semantics note:** the
reference app propagates per-vertex property *vectors* via
degree-normalized weighted averaging (lpa_u2i.h:165-239, returning a
labeled_vertex_property context); this module implements the companion
*discrete* dominant-label variant over the same bipartite alternating
schedule — items adopt the single label with the largest total adjacent
user edge-weight, then users likewise from items; ties break to the
smallest label; runs exactly ``max_round`` rounds. One label per vertex,
not a label-distribution vector. The *faithful* reference semantics are
implemented by :func:`lpa_u2i_vector` below.

The weighted per-vertex argmax is the same skew-safe shape as CDLP:
two-phase salted ``sum(weight)`` by (vertex, label) — salted on the
*varying opposite endpoint* so a hot (vertex, label) group actually
splits — then an algebraic ``max(struct(weight, -label))``; no windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph


def _dominant_label(
    nbr_labels: DataFrame, key: str, num_salts: int, salt_on: str
) -> DataFrame:
    """(key, new_label) = label with max total weight, min-label ties.

    Two-phase: (key, label, salt) partial sums absorb hub skew before the
    per-(key, label) merge; the salt hashes the *opposite endpoint*
    (``salt_on``), which varies per row of a hot (key, label) group —
    salting on the label itself would be a no-op (same value on every row
    of the group). The argmax is an algebraic max(struct)."""
    salted = nbr_labels.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_on)), F.lit(num_salts))
    )
    phase1 = salted.groupBy(key, "label", "_salt").agg(F.sum("w").alias("pw"))
    counts = phase1.groupBy(key, "label").agg(F.sum("pw").alias("tw"))
    return counts.groupBy(key).agg(
        F.max(F.struct(F.col("tw"), (-F.col("label")).alias("neg"))).alias("top")
    ).select(key, (-F.col("top.neg")).alias("new_label"))


def lpa_u2i(
    graph: LinkGraph,
    user_set: DataFrame,
    max_round: int = 10,
    weight_col: str | None = "weight",
    num_salts: int = 16,
) -> DataFrame:
    """(vid, value) — final labels after ``max_round`` alternating rounds.

    ``user_set``: one-column DataFrame of user vids; every edge is
    interpreted user→item (edges whose src is not a user are ignored).
    """
    users = user_set.select(F.col(user_set.columns[0]).alias("vid")).distinct()
    e = graph.edges
    if weight_col and weight_col in e.columns:
        ue = e.select("src", "dst", F.col(weight_col).cast("double").alias("w"))
    else:
        ue = e.select("src", "dst", F.lit(1.0).alias("w"))
    ue = ue.join(users.withColumnRenamed("vid", "src"), "src", "left_semi").persist()

    labels = graph.vertices.select("vid", F.col("vid").alias("label")).localCheckpoint(
        eager=True
    )

    for _ in range(max_round):
        # stage 1 (u2i): items adopt dominant user label
        u_labels = labels.join(users, "vid", "left_semi")
        nbr = ue.join(
            u_labels.select(F.col("vid").alias("src"), "label"), "src"
        ).select(F.col("dst"), F.col("src"), "label", "w")
        best_i = _dominant_label(nbr, "dst", num_salts, salt_on="src")
        labels = (
            labels.join(best_i, labels["vid"] == best_i["dst"], "left")
            .select("vid", F.coalesce("new_label", F.col("label")).alias("label"))
            .localCheckpoint(eager=True)
        )
        # stage 2 (i2u): users adopt dominant item label
        i_labels = labels.join(users, "vid", "left_anti")
        nbr2 = ue.join(
            i_labels.select(F.col("vid").alias("dst"), "label"), "dst"
        ).select(F.col("src"), F.col("dst"), "label", "w")
        best_u = _dominant_label(nbr2, "src", num_salts, salt_on="dst")
        labels = (
            labels.join(best_u, labels["vid"] == best_u["src"], "left")
            .select("vid", F.coalesce("new_label", F.col("label")).alias("label"))
            .localCheckpoint(eager=True)
        )

    ue.unpersist()
    return labels.select("vid", F.col("label").alias("value"))


def lpa_u2i_vector(
    graph: LinkGraph,
    user_set: DataFrame,
    features: DataFrame,
    max_round: int = 10,
    weight_col: str | None = "weight",
) -> DataFrame:
    """Faithful gs::LPAU2I semantics — weighted property-*vector*
    propagation (apps/lpa/lpa_u2i.h:120-239):

    - u2i stage: item vector ← Σ over incoming user edges of
      ``user_vec · w`` (items are fully recomputed each stage,
      lpa_u2i.h:172-183);
    - i2u stage: ``tmp(u) = Σ over out edges of item_vec · w``; per prop,
      a user value of exactly 0 or 1 is a **clamped seed** and is kept;
      otherwise ``new = (tmp − out_deg(u)·x) / (nbr_indeg_sum(u) −
      out_deg(u))`` where ``out_deg`` is u's out-edge *count* and
      ``nbr_indeg_sum`` the sum of u's item-neighbors' in-degree counts
      (lpa_u2i.h:188-232; degrees from PEval :70-105). Kept unchanged
      when the denominator is zero.

    ``features``: (vid, props array<double>) seed vectors for users.
    ``max_round`` counts (u2i, i2u) stage *pairs* (the reference's raw
    ``max_round`` steps = 1 init step + 2·pairs stages). Returns the
    final user vectors exploded as (vid, pid, value) — one row per
    vertex×property, the labeled_vertex_property context analog.

    Spark shape: props are exploded once to (vid, pid, x) and every stage
    is a join + ``groupBy(vertex, pid).sum`` — algebraic, map-side
    combined, no windows, no per-row Python.
    """
    users = user_set.select(F.col(user_set.columns[0]).alias("vid")).distinct()
    e = graph.edges
    if weight_col and weight_col in e.columns:
        ue = e.select("src", "dst", F.col(weight_col).cast("double").alias("w"))
    else:
        ue = e.select("src", "dst", F.lit(1.0).alias("w"))
    ue = ue.join(users.withColumnRenamed("vid", "src"), "src", "left_semi").persist()

    out_deg = ue.groupBy("src").agg(F.count("*").alias("d"))
    in_deg = ue.groupBy("dst").agg(F.count("*").alias("ind"))
    nbr_sum = (
        ue.join(in_deg, "dst")
        .groupBy("src")
        .agg(F.sum("ind").alias("s"))
    )
    denom = out_deg.join(nbr_sum, "src").select(
        F.col("src").alias("vid"), "d", "s"
    ).persist()

    uf = (
        features.select(
            F.col(features.columns[0]).alias("vid"),
            F.posexplode(F.col(features.columns[1])).alias("pid", "x"),
        )
        .join(users, "vid", "left_semi")
        .localCheckpoint(eager=True)
    )

    for _ in range(max_round):
        # u2i: item vectors recomputed from scratch
        item = (
            ue.join(uf.withColumnRenamed("vid", "src"), "src")
            .groupBy("dst", "pid")
            .agg(F.sum(F.col("x") * F.col("w")).alias("x"))
        )
        # i2u part 1: pull item vectors back
        tmp = (
            ue.join(item, ["dst"])
            .select("src", "pid", (F.col("x") * F.col("w")).alias("xw"))
            .groupBy("src", "pid")
            .agg(F.sum("xw").alias("tmp"))
            .withColumnRenamed("src", "vid")
        )
        # i2u part 2: clamped-seed update with degree normalization
        joined = uf.join(tmp, ["vid", "pid"], "left").join(denom, "vid", "left")
        keep = (
            (F.col("x") == 0.0)
            | (F.col("x") == 1.0)
            | F.col("d").isNull()
            | (F.col("s") == F.col("d"))
        )
        new_x = F.when(keep, F.col("x")).otherwise(
            (F.coalesce("tmp", F.lit(0.0)) - F.col("d") * F.col("x"))
            / (F.col("s") - F.col("d"))
        )
        uf = joined.select("vid", "pid", new_x.alias("x")).localCheckpoint(eager=True)

    out = uf.select("vid", "pid", F.col("x").alias("value"))
    ue.unpersist()
    denom.unpersist()
    return out
