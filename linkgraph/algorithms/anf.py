"""ANF — the approximate neighborhood function N(h) via Flajolet–Martin
sketches (Palmer/Gibbons/Faloutsos KDD'02; the HyperANF lineage swaps
FM for HLL but keeps the same OR-merge superstep).

N(h) = Σ_v |ball_out(v, h)| — how many (source, reachable-within-h)
pairs the graph has per radius. Exact computation is APSP; ANF keeps
``trials`` 32-bit FM sketches per vertex and propagates them along
edges with **bitwise OR** — an idempotent, order-free merge, so one
``groupBy(dst, trial).bit_or`` per round IS the ball union, the same
algebraic-aggregate shape as wcc's min (map-side combine absorbs hubs,
packed partials apply). Rounds = max_h; state = trials·V rows of
(vid, t, sketch:long).

Determinism / oracle: the sketch bit for (v, t) is
``min(31, bit_count((g & -g) - 1))`` where g is the 60-bit integer
prefix of ``md5(v ':' t)`` — the same md5 trick the curation split
uses, so a DuckDB oracle replays the ENTIRE sketch computation
bit-for-bit (md5 + bit_count + bit_or all exist there). The driver
statistic is the pure-integer ``sum_r`` = Σ over (v, t) of R, where R =
position of the lowest ZERO bit of the sketch (``bit_count(((~s) &
(s + 1)) - 1)``) — no floats cross the oracle boundary. The float
estimate ``N(h) ≈ Σ_v 2^(mean_t R) / 0.77351`` lives in
:func:`anf_estimate` for callers (pytest checks it against the exact
64-root MSBFS ball sizes within FM's rsd ≈ 0.78/√trials).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph

FM_PHI = 0.77351


def _sketch_bit(vid_col, t_col):
    """Deterministic FM bit position in [0, 31] from md5 (DuckDB-replayable)."""
    tagged = F.concat_ws(":", vid_col.cast("string"), t_col.cast("string"))
    g = F.conv(F.substring(F.md5(tagged), 1, 15), 16, 10).cast("long")
    pos = F.bit_count((g.bitwiseAND(-g)) - 1)
    return F.least(pos, F.lit(31))


def _rank_of(s):
    """Position of the lowest zero bit of sketch s (the FM R statistic)."""
    nz = F.bitwise_not(s).bitwiseAND(s + 1)
    return F.bit_count(nz - 1)


def anf_sketch_stats(
    graph: LinkGraph, max_h: int = 4, trials: int = 16
) -> DataFrame:
    """(h, sum_r, n_rows) for h = 1..max_h — the integer FM statistic
    after each OR-propagation round (h = 0 ball is every vertex itself
    and is omitted). ``sum_r`` = Σ over (vid, trial) of the lowest-zero-
    bit rank; ``n_rows`` = vertices·trials. Pure integers — the staged
    driver oracle replays them exactly."""
    spark = graph.edges.sparkSession
    edges = graph.edges.select("src", "dst").where(
        F.col("src") != F.col("dst")
    ).distinct().persist()
    t = spark.range(trials).select(F.col("id").cast("int").alias("t"))
    state = (
        graph.vertices.select("vid")
        .crossJoin(F.broadcast(t))
        .select("vid", "t", _sketch_bit(F.col("vid"), F.col("t")).alias("pos"))
        .select(
            "vid", "t", F.expr("shiftleft(CAST(1 AS BIGINT), pos)").alias("s")
        )
        .localCheckpoint(eager=True)
    )
    out_rows = []
    for h in range(1, max_h + 1):
        msgs = edges.join(
            state.select(F.col("vid").alias("src"), "t", "s"), "src"
        ).select(F.col("dst").alias("vid"), "t", "s")
        state = (
            state.unionByName(msgs)
            .groupBy("vid", "t")
            .agg(F.expr("bit_or(s)").alias("s"))
            .localCheckpoint(eager=True)
        )
        agg = state.agg(
            F.sum(_rank_of(F.col("s"))).alias("sum_r"), F.count("*").alias("n")
        ).first()
        out_rows.append((h, int(agg["sum_r"]), int(agg["n"])))
    edges.unpersist()
    return spark.createDataFrame(
        out_rows, "h int, sum_r bigint, n_rows bigint"
    )


def anf_estimate(
    graph: LinkGraph, max_h: int = 4, trials: int = 16
) -> dict[int, float]:
    """{h: N(h) estimate} — Σ_v 2^(mean_t R_v,t) / 0.77351 (the KDD'02
    estimator). Driver-side readout over the per-vertex mean rank; use
    :func:`anf_sketch_stats` for the oracle-grade integer statistic."""
    spark = graph.edges.sparkSession
    edges = graph.edges.select("src", "dst").where(
        F.col("src") != F.col("dst")
    ).distinct().persist()
    t = spark.range(trials).select(F.col("id").cast("int").alias("t"))
    state = (
        graph.vertices.select("vid")
        .crossJoin(F.broadcast(t))
        .select("vid", "t", _sketch_bit(F.col("vid"), F.col("t")).alias("pos"))
        .select(
            "vid", "t", F.expr("shiftleft(CAST(1 AS BIGINT), pos)").alias("s")
        )
        .localCheckpoint(eager=True)
    )
    est = {}
    for h in range(1, max_h + 1):
        msgs = edges.join(
            state.select(F.col("vid").alias("src"), "t", "s"), "src"
        ).select(F.col("dst").alias("vid"), "t", "s")
        state = (
            state.unionByName(msgs)
            .groupBy("vid", "t")
            .agg(F.expr("bit_or(s)").alias("s"))
            .localCheckpoint(eager=True)
        )
        row = (
            state.groupBy("vid")
            .agg(F.avg(_rank_of(F.col("s"))).alias("mr"))
            .agg(F.sum(F.pow(F.lit(2.0), F.col("mr"))).alias("tot"))
            .first()
        )
        est[h] = float(row["tot"]) / FM_PHI
    edges.unpersist()
    return est
