"""Semi-supervised node classification: harmonic-function label spreading.

NetworkX-parity surface (``nx.node_classification.harmonic_function``,
Zhu/Ghahramani/Lafferty ICML'03): labeled seed vertices clamp a one-hot
class distribution; every other vertex repeatedly takes the
degree-normalized average of its neighbors' distributions; after a fixed
number of rounds the predicted class is the argmax. The reference has no
dedicated GAE app for this family (python/graphscope/nx forwards builtins
and falls back otherwise), so like the other nx-parity families this is
engine-native.

Spark shape: the class distribution is kept SPARSE in long format
``(vid, cls, p)`` — only classes with non-zero mass for a vertex hold a
row, so a round costs one adjacency join + one ``groupBy(vid, cls)``
aggregation, O(E × classes-active-in-neighborhood) shuffle rows rather
than a dense V×C matrix. Seeds re-clamp by replacing their rows with the
one-hot after every round. Fixed round count keeps the operator
deterministic and lets the oracle replay it as unrolled SQL.

Divergence from nx (documented): vertices that no seed reaches within
``rounds`` have an all-zero distribution; nx's ``np.argmax`` silently
yields class index 0 there, this engine returns NULL (no evidence = no
label) — the honest distributed answer, and the one the oracle encodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph


def harmonic_function(
    graph: LinkGraph,
    seeds: DataFrame,
    rounds: int = 4,
) -> DataFrame:
    """(vid, label) for every vertex — seeds keep their class, others get
    the argmax of the ``rounds``-step harmonic spread (NULL if unreached).

    ``seeds``: DataFrame (vid, cls) with one class per seed vertex.
    Ties break toward the smallest class id on probabilities rounded to
    6 decimals (roundoff-stable across summation orders)."""
    seeds = seeds.select("vid", F.col("cls").cast("long").alias("cls")).persist()
    und = graph.simple_undirected_edges()
    adj = und.select(F.col("lo").alias("v"), F.col("hi").alias("nbr")).union(
        und.select(F.col("hi").alias("v"), F.col("lo").alias("nbr"))
    ).persist()
    deg = adj.groupBy("v").agg(F.count("*").alias("deg"))
    one_hot = seeds.select("vid", "cls", F.lit(1.0).alias("p"))
    state = one_hot.localCheckpoint(eager=True)
    for _ in range(rounds):
        spread = (
            adj.join(state.withColumnRenamed("vid", "nbr"), "nbr")
            .groupBy(F.col("v").alias("vid"), "cls")
            .agg(F.sum("p").alias("psum"))
            .join(deg.withColumnRenamed("v", "vid"), "vid")
            .select("vid", "cls", (F.col("psum") / F.col("deg")).alias("p"))
            .join(seeds.select("vid"), "vid", "left_anti")
        )
        state = one_hot.unionByName(spread).localCheckpoint(eager=True)
    w = Window.partitionBy("vid").orderBy(
        F.round("p", 6).desc(), F.col("cls").asc()
    )
    best = (
        state.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("vid", F.col("cls").alias("label"))
    )
    out = (
        graph.vertices.select("vid")
        .join(best, "vid", "left")
        .select("vid", F.col("label").cast("long").alias("label"))
        .localCheckpoint(eager=True)
    )
    seeds.unpersist()
    adj.unpersist()
    return out
