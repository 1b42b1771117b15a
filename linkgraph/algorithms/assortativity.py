"""Degree assortativity and average degree connectivity.

References:
- gs::DegreeAssortativity
  (/root/reference/coordinator/gscoordinator/builtin/app/.gs_conf.yaml:186-188;
  python sig app/degree_assortativity_coefficient.py:31-82): Pearson
  correlation of endpoint degrees across directed edges — x-degree of the
  source (default "out") vs y-degree of the target (default "in").
- gs::AverageDegreeConnectivity (yaml:206-208; python sig
  app/average_degree_connectivity.py:31-95): for each degree class k, the
  mean degree of neighbors of degree-k vertices (undirected default).
- gs::AttributeAssortativity (yaml:214-216; python sig
  app/attribute_assortativity.py:31-108): categorical mixing-matrix
  assortativity ``r = (tr(M) - ||M²||) / (1 - ||M²||)`` and numeric
  assortativity = Pearson correlation of endpoint attribute values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph


def degree_assortativity_coefficient(
    graph: LinkGraph, x: str = "out", y: str = "in"
) -> float:
    dx = graph.degrees(mode=x).withColumnRenamed("degree", "dx").withColumnRenamed("vid", "src")
    dy = graph.degrees(mode=y).withColumnRenamed("degree", "dy").withColumnRenamed("vid", "dst")
    joined = graph.edges.select("src", "dst").join(dx, "src").join(dy, "dst")
    r = joined.agg(F.corr("dx", "dy").alias("r")).first()["r"]
    return float(r) if r is not None else float("nan")


def _edge_attrs(graph: LinkGraph, attrs: DataFrame) -> DataFrame:
    """(xa, ya) — attribute of src and dst per directed edge."""
    a = attrs.select(F.col(attrs.columns[0]).alias("vid"), F.col(attrs.columns[1]).alias("attr"))
    return (
        graph.edges.select("src", "dst")
        .join(a.select(F.col("vid").alias("src"), F.col("attr").alias("xa")), "src")
        .join(a.select(F.col("vid").alias("dst"), F.col("attr").alias("ya")), "dst")
        .select("xa", "ya")
    )


def attribute_assortativity_coefficient(graph: LinkGraph, attrs: DataFrame) -> float:
    """Categorical mixing-matrix assortativity (NetworkX formula):
    r = (Σ_i e_ii − Σ_i a_i b_i) / (1 − Σ_i a_i b_i), where e is the
    row-normalized mixing matrix, a/b its row/column sums.

    ``attrs``: (vid, attribute) DataFrame. The |categories|² mixing
    matrix is never materialized anywhere: tr(M) is one null-safe
    same-category edge count and Σ a_i b_i reduces to
    Σ_i cnt_x[i]·cnt_y[i] / total² — a |categories|-row marginal join
    summed as exact integers, so the result is partition-order
    deterministic and the driver only ever sees three scalars.
    """
    ea = _edge_attrs(graph, attrs)
    row = ea.agg(
        F.count("*").alias("total"),
        F.sum(
            F.when(F.col("xa").eqNullSafe(F.col("ya")), 1).otherwise(0)
        ).alias("diag"),
    ).first()
    total, diag = row["total"], row["diag"]
    if total == 0:
        return float("nan")
    cx = ea.groupBy(F.col("xa").alias("catx")).agg(F.count("*").alias("nx"))
    cy = ea.groupBy(F.col("ya").alias("caty")).agg(F.count("*").alias("ny"))
    s_row = (
        cx.join(cy, cx["catx"].eqNullSafe(cy["caty"]))
        .agg(F.sum(F.col("nx") * F.col("ny")).alias("s"))
        .first()
    )
    s = int(s_row["s"] or 0)
    sum_ab = s / (total * total)
    if sum_ab == 1.0:
        return float("nan")
    return float((diag / total - sum_ab) / (1.0 - sum_ab))


def numeric_assortativity_coefficient(graph: LinkGraph, attrs: DataFrame) -> float:
    """Numeric assortativity = Pearson correlation of endpoint values."""
    ea = _edge_attrs(graph, attrs)
    r = ea.agg(F.corr(F.col("xa").cast("double"), F.col("ya").cast("double")).alias("r")).first()["r"]
    return float(r) if r is not None else float("nan")


def average_degree_connectivity(graph: LinkGraph) -> DataFrame:
    """(degree, avg_nbr_degree) over the undirected simple graph."""
    und_once = graph.simple_undirected_edges()
    bidir = und_once.select(F.col("lo").alias("a"), F.col("hi").alias("b")).union(
        und_once.select(F.col("hi").alias("a"), F.col("lo").alias("b"))
    )
    deg = bidir.groupBy("a").agg(F.count("*").alias("deg"))
    j = (
        bidir.join(deg.withColumnRenamed("a", "a").withColumnRenamed("deg", "deg_a"), "a")
        .join(
            deg.withColumnRenamed("a", "b").withColumnRenamed("deg", "deg_b"),
            "b",
        )
    )
    return (
        j.groupBy(F.col("deg_a").alias("degree"))
        .agg(F.avg("deg_b").alias("avg_nbr_degree"))
        .orderBy("degree")
    )
