"""VoteRank influential-node election (NetworkX semantics, undirected).

Reference surface: graphscope.nx forwards nx.voterank — see
/root/reference/python/graphscope/nx/algorithms/tests/forward/
centrality/test_voterank.py (undirected election cases).

Algorithm (Zhang et al. 2016, as NetworkX implements it): every vertex
starts with voting ability 1; each round every vertex's score is the sum
of its neighbors' abilities, the highest-scoring not-yet-elected vertex
is elected (ties → min vid, a deterministic refinement of NetworkX's
iteration-order tie-break), its ability drops to 0 and each neighbor's
ability decreases by 1/⟨deg⟩ (floored at 0). Stops early when the best
score is 0.

Spark shape: one equi-join + sum aggregate per round over the
vertex-sized ability table; the winner is a single collected row (the
argmax — same driver-scalar pattern as every convergence check), and
the ability update is a vertex-sized left join against the winner's
neighbor list. k rounds → k tiny jobs; state is localCheckpointed per
round so lineage stays flat. Scores are rounded to 9 decimals before
the argmax so the election is invariant to float summation order
(engine- and partitioning-independent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.superstep import _free_local_checkpoint


def voterank(graph: LinkGraph, num_seeds: int | None = None) -> DataFrame:
    """Elect up to ``num_seeds`` influencers; returns (rank, vid) with
    rank = election order starting at 0."""
    spark = graph.vertices.sparkSession
    e = graph.edges.select("src", "dst")
    und = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    n = graph.vertices.count()
    two_m = und.count()
    if n == 0 or two_m == 0:
        und.unpersist()
        return spark.createDataFrame([], "rank long, vid long")
    avg_deg = two_m / n
    k = n if num_seeds is None else min(num_seeds, n)

    ab = graph.vertices.select("vid", F.lit(1.0).alias("ab")).localCheckpoint(eager=True)
    elected: list[int] = []
    for _ in range(k):
        scores = (
            und.join(ab.withColumnRenamed("vid", "dst"), "dst")
            .groupBy("src")
            .agg(F.round(F.sum("ab"), 9).alias("sc"))
        )
        if elected:
            scores = scores.where(~F.col("src").isin(elected))
        top = scores.orderBy(F.desc("sc"), F.asc("src")).first()
        if top is None or top["sc"] <= 0:
            break
        w = int(top["src"])
        elected.append(w)
        nbrs = und.where(F.col("src") == w).select(F.col("dst").alias("vid"), F.lit(1).alias("hit"))
        new_ab = (
            ab.join(nbrs, "vid", "left")
            .select(
                "vid",
                F.when(F.col("vid") == w, F.lit(0.0))
                .when(F.col("hit").isNotNull(), F.greatest(F.lit(0.0), F.col("ab") - F.lit(1.0 / avg_deg)))
                .otherwise(F.col("ab"))
                .alias("ab"),
            )
            .localCheckpoint(eager=True)
        )
        _free_local_checkpoint(ab)
        ab = new_ab
    und.unpersist()
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(elected)], "rank long, vid long"
    )
