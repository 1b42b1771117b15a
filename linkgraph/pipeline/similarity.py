"""Embedding similarity search: brute-force cosine top-k and LSH-bucketed ANN.

The embeddings table is ``(vec_id:long, embedding:array<float>, label)``.
Dot products are computed JVM-side with ``zip_with`` + ``aggregate`` —
double precision, sequential fold, so the result is bit-stable and
matches a DuckDB double-precision oracle.

Scale path: random-hyperplane LSH — H seeded hyperplanes → a 2^H-bucket
code per vector (computed once, JVM-side after a literal broadcast of the
hyperplane matrix); queries probe only their bucket (optionally with
multi-probe neighbors), re-ranking exactly within the bucket. Brute force
is the correctness baseline and the oracle for recall tests.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def with_cosine(df: DataFrame, a: str, b: str, out: str = "cosine") -> DataFrame:
    """Append cosine(a, b) computed JVM-side."""
    return df.withColumn(out, _dot(F.col(a), F.col(b)) / (_norm(F.col(a)) * _norm(F.col(b))))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """(query_id, vec_id, cosine, rank) — exact brute-force top-k.

    The query side is broadcast (queries ≪ corpus); the corpus is scanned
    once; ranking is a per-query window. Deterministic tie-break by
    (cosine desc, vec_id asc).
    """
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("_qvec"))
    joined = embeddings.select(F.col(id_col), F.col(vec_col)).crossJoin(F.broadcast(q))
    scored = joined.where(F.col(id_col) != F.col(query_id_col)).select(
        query_id_col,
        id_col,
        (_dot(F.col(vec_col), F.col("_qvec")) / (_norm(F.col(vec_col)) * _norm(F.col("_qvec")))).alias(
            "cosine"
        ),
    )
    w = W.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket_codes(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 42,
    out: str = "bucket",
) -> DataFrame:
    """Append a random-hyperplane LSH bucket code (0 … 2^n_planes-1).

    The hyperplane matrix is generated once on the driver (seeded) and
    embedded as array literals — at any scale it is n_planes×dim doubles,
    broadcast with the plan itself; the per-row work is JVM-side dots.
    """
    H = _hyperplanes(dim, n_planes, seed)
    code = F.lit(0).cast("long")
    for i in range(n_planes):
        plane = F.array(*[F.lit(float(x)) for x in H[i]])
        bit = (_dot(F.col(vec_col), plane) > 0).cast("long")
        code = code + F.shiftleft(bit, i)
    return df.withColumn(out, code)


def lsh_ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int = 64,
    n_planes: int = 6,
    seed: int = 42,
    multi_probe: bool = True,
) -> DataFrame:
    """Approximate top-k: probe the query's LSH bucket, exact re-rank.

    Recall < 1 by construction; the bucketed join replaces the full scan
    with a (1+n_planes)/2^n_planes-selectivity equi-join — the 100 TB
    path. ``multi_probe`` additionally probes every bucket at Hamming
    distance 1 from the query code (flip each plane bit), the standard
    multi-probe LSH recall boost at the cost of n_planes extra buckets
    per query — still ≪ a full scan.
    """
    emb_b = lsh_bucket_codes(embeddings, vec_col, dim, n_planes, seed)
    q_b = lsh_bucket_codes(
        queries.select(F.col(query_id_col), F.col(vec_col).alias("_qvec")),
        "_qvec",
        dim,
        n_planes,
        seed,
    )
    if multi_probe:
        probes = F.array(
            F.col("bucket"), *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)]
        )
        q_b = q_b.select(
            query_id_col, "_qvec", F.explode(probes).alias("bucket")
        )
    joined = emb_b.join(F.broadcast(q_b), "bucket").where(F.col(id_col) != F.col(query_id_col))
    scored = joined.select(
        query_id_col,
        id_col,
        (_dot(F.col(vec_col), F.col("_qvec")) / (_norm(F.col(vec_col)) * _norm(F.col("_qvec")))).alias(
            "cosine"
        ),
    )
    w = W.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def embedding_near_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 6,
    seed: int = 42,
    exact: bool = False,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """(id_a, id_b, cosine) — pairs with cosine ≥ threshold.

    ``exact=True`` does the O(n²) self-join (correctness baseline /
    oracle); default buckets by LSH code first so only same-bucket pairs
    are compared. ``max_bucket_size`` drops oversized LSH buckets before
    the self-join (a hot bucket — e.g. a spike of zero/duplicate vectors
    — is a quadratic pair generator); drops are recorded in
    ``linkgraph.pipeline.dedup.LAST_METRICS``.
    """
    e = embeddings.select(F.col(id_col), F.col(vec_col))
    if exact:
        a = e.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
        b = e.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
        pairs = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    else:
        eb = lsh_bucket_codes(e, vec_col, dim, n_planes, seed)
        if max_bucket_size is not None:
            from linkgraph.pipeline.dedup import _cap_buckets

            eb = _cap_buckets(eb, ["bucket"], max_bucket_size, op="embedding_lsh")
        a = eb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "bucket")
        b = eb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "bucket")
        pairs = a.join(b, "bucket").where(F.col("id_a") < F.col("id_b"))
    return pairs.select(
        "id_a",
        "id_b",
        (_dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))).alias("cosine"),
    ).where(F.col("cosine") >= threshold)
