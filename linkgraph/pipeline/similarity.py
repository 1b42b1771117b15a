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
import pandas as pd
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


def ivf_seed_ids(n_centroids: int, stride: int = 17) -> list[int]:
    """Deterministic coarse-quantizer seed ids: every ``stride``-th vector.

    IVF trains its coarse quantizer on a bounded sample of the corpus; the
    deterministic stand-in here (fixed ids) makes the quantizer replayable
    by a SQL oracle. Production would sample ids and optionally refine
    with :func:`ivf_lloyd_refine` — the index structure and the probed
    search are identical either way.
    """
    return [i * stride for i in range(n_centroids)]


def ivf_centroids_from_ids(
    embeddings: DataFrame,
    ids: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Collect the seed vectors (one bounded driver fetch of n_centroids
    rows — the coarse quantizer is always tiny relative to the corpus)."""
    rows = (
        embeddings.where(F.col(id_col).isin(ids))
        .select(id_col, vec_col)
        .collect()
    )
    by_id = {r[0]: np.asarray(r[1], dtype=np.float64) for r in rows}
    missing = [i for i in ids if i not in by_id]
    if missing:
        raise ValueError(f"ivf seed ids missing from corpus: {missing}")
    return np.stack([by_id[i] for i in ids])


def ivf_lloyd_refine(
    train: np.ndarray, centroids: np.ndarray, n_iter: int = 5
) -> np.ndarray:
    """Spherical k-means refinement of the coarse quantizer on a training
    sample (driver-side numpy — the standard IVF pattern: train on a
    bounded sample, assign the full corpus distributed). Empty clusters
    keep their previous centroid."""
    c = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    t = train / np.linalg.norm(train, axis=1, keepdims=True)
    for _ in range(n_iter):
        assign = np.argmax(t @ c.T, axis=1)
        for j in range(c.shape[0]):
            members = t[assign == j]
            if len(members):
                m = members.sum(axis=0)
                nrm = np.linalg.norm(m)
                if nrm > 0:
                    c[j] = m / nrm
    return c


def _centroid_scores(vec_col: Column, centroids: np.ndarray) -> list[Column]:
    """cosine(vec, centroid_j) for each centroid, all JVM-side; the
    centroid matrix rides in the plan as literals (n_centroids×dim
    doubles — broadcast with the plan at any corpus scale)."""
    vnorm = _norm(vec_col)
    out = []
    for j in range(centroids.shape[0]):
        c_lit = F.array(*[F.lit(float(x)) for x in centroids[j]])
        c_nrm = float(np.linalg.norm(centroids[j]))
        out.append(_dot(vec_col, c_lit) / (vnorm * F.lit(c_nrm)))
    return out


# Above this many lists the centroid matrix stops being a plan literal.
# Measured crossover (BENCH/run_ivf_probe.py, 500k×64f vectors, local[32]):
# the literal path degrades linearly in n_centroids (16→4.2s, 64→15.8s,
# 256→43.7s of codegen-heavy expression eval) while the Arrow broadcast
# matmul is near-flat (256→5.3s, 1024→8.4s, 4096→10.9s) with identical
# assignments (checksum-asserted). The literal tier is kept only for tiny
# quantizers where an all-JVM plan (no Python workers) is worth more than
# the constant: beyond 32 lists the broadcast matmul always wins.
MAX_PLAN_CENTROIDS = 32

# Arrow-path centroid broadcasts cannot be destroyed eagerly (the
# returned DataFrames are lazy and read them at action time), so they are
# registered here; call release_broadcasts() once the results of prior
# ivf_assign/ivf_ann_topk calls are fully materialized — the same
# explicit-ownership pattern as dedup.release_cached().
_BROADCASTS: list = []


def release_broadcasts() -> None:
    while _BROADCASTS:
        _BROADCASTS.pop().unpersist(blocking=False)


def _ivf_assign_arrow(
    df: DataFrame, centroids: np.ndarray, vec_col: str, out: str
) -> DataFrame:
    """Large-quantizer assignment: ship the (normalized) centroid matrix
    once per executor via a Spark broadcast and compute argmax-cosine as
    ONE numpy matmul per Arrow batch — still a shuffle-free projection,
    independent of n_centroids in plan size. Tie-break matches the
    literal path: np.argmax takes the first (lowest-j) maximum, and
    row-norm division is skipped because it cannot change the argmax."""
    import pandas as pd

    c = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    bc = df.sparkSession.sparkContext.broadcast(c)
    _BROADCASTS.append(bc)

    @F.pandas_udf("int")
    def _assign(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy())
        scores = m.astype(np.float64) @ bc.value.T
        return pd.Series(np.argmax(scores, axis=1).astype(np.int32))

    return df.withColumn(out, _assign(F.col(vec_col)))


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    out: str = "list_id",
) -> DataFrame:
    """Append the IVF list id = argmax_j cosine(vec, centroid_j).

    Up to MAX_PLAN_CENTROIDS lists this is a pure Catalyst projection
    (array-struct max, centroid matrix as plan literals; ties break to
    the lowest centroid id via the (score, -j) struct order). Beyond
    that, the quantizer moves from plan literals to an executor
    broadcast with an Arrow-batched matmul (same assignment, same
    tie-break) so plan size stays flat as n_centroids grows.
    """
    if centroids.shape[0] > MAX_PLAN_CENTROIDS:
        return _ivf_assign_arrow(df, centroids, vec_col, out)
    scores = _centroid_scores(F.col(vec_col), centroids)
    packed = F.array(
        *[F.struct(s.alias("s"), F.lit(-j).alias("negj")) for j, s in enumerate(scores)]
    )
    return df.withColumn(out, (-F.array_max(packed)["negj"]).cast("int"))


def ivf_ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_centroids: int = 8,
    nprobe: int = 2,
    stride: int = 17,
    refine_iters: int = 0,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index: assign every
    corpus vector to its nearest coarse centroid, probe each query's
    ``nprobe`` nearest lists, exact cosine re-rank within the probed
    lists only.

    The scale shape: assignment is a shuffle-free projection; the search
    is an equi-join on ``list_id`` with ~nprobe/n_centroids selectivity
    instead of a full scan; the quantizer (n_centroids×dim doubles) is a
    plan literal. ``refine_iters > 0`` runs spherical-k-means Lloyd
    refinement on the seed sample (production path; the default 0 keeps
    the quantizer SQL-replayable for the oracle gate).
    """
    ids = ivf_seed_ids(n_centroids, stride)
    centroids = ivf_centroids_from_ids(embeddings, ids, id_col, vec_col)
    if refine_iters:
        # Lloyd needs a training sample DISTINCT from the seeds — training
        # the quantizer on its own centroids assigns each seed to itself
        # and the refinement is a guaranteed no-op. Deterministic bounded
        # fetch: hash-ranked top (64·k) corpus vectors (TakeOrdered, one
        # driver collect of a quantizer-sized sample).
        t_rows = (
            embeddings.select(vec_col)
            .orderBy(F.xxhash64(F.col(id_col).cast("string")))
            .limit(64 * n_centroids)
            .collect()
        )
        train = np.stack([np.asarray(r[0], dtype=np.float64) for r in t_rows])
        centroids = ivf_lloyd_refine(train, centroids, refine_iters)
    emb_a = ivf_assign(embeddings.select(id_col, vec_col), centroids, vec_col)

    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("_qvec"))
    if n_centroids > MAX_PLAN_CENTROIDS:
        # large quantizer: probe selection via the same executor-broadcast
        # matmul as assignment (top-nprobe by score, ties → lower j —
        # argsort(-scores, stable) reproduces the struct sort order)
        cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
        bc = q.sparkSession.sparkContext.broadcast(cn)
        _BROADCASTS.append(bc)

        @F.pandas_udf("array<int>")
        def _probe(v: pd.Series) -> pd.Series:
            m = np.stack(v.to_numpy()).astype(np.float64)
            scores = m @ bc.value.T
            order = np.argsort(-scores, axis=1, kind="stable")[:, :nprobe]
            return pd.Series(list(order.astype(np.int32)))

        q_p = q.withColumn("list_id", F.explode(_probe(F.col("_qvec"))))
    else:
        qscores = _centroid_scores(F.col("_qvec"), centroids)
        packed = F.array(
            *[F.struct(s.alias("s"), F.lit(-j).alias("negj")) for j, s in enumerate(qscores)]
        )
        probes = F.slice(F.sort_array(packed, asc=False), 1, nprobe)
        q_p = q.withColumn(
            "list_id", F.explode(F.transform(probes, lambda st: (-st["negj"]).cast("int")))
        )

    joined = emb_a.join(F.broadcast(q_p), "list_id").where(
        F.col(id_col) != F.col(query_id_col)
    )
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


# ---------------- product quantization (PQ) ----------------

def pq_codebooks(
    embeddings: DataFrame,
    m: int = 4,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """``(m, k, dim/m)`` PQ codebooks from the k smallest-id vectors.

    Codebook j of subspace s is the s-th subvector of the j-th
    smallest-id embedding — deterministic and SQL-replayable, the same
    stand-in-for-k-means move as :func:`ivf_seed_ids` (production trains
    per-subspace k-means on a bounded sample; the index structure, the
    encode path, and the ADC search are identical either way). One
    bounded driver fetch of k rows."""
    rows = embeddings.orderBy(id_col).limit(k).select(id_col, vec_col).collect()
    if len(rows) < k:
        raise ValueError(f"pq_codebooks: corpus has {len(rows)} < k={k} vectors")
    mat = np.stack(
        [np.asarray(r[1], dtype=np.float64) for r in sorted(rows, key=lambda r: r[0])]
    )
    dim = mat.shape[1]
    if dim % m:
        raise ValueError(f"pq_codebooks: dim {dim} not divisible by m={m}")
    return mat.reshape(k, m, dim // m).transpose(1, 0, 2).copy()


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    out: str = "pq_code",
) -> DataFrame:
    """Append ``out`` = array<int> of m codeword ids (argmin-L2 per
    subspace, ties → lowest id). One numpy einsum per Arrow batch — the
    codebooks ride an executor broadcast, the corpus never moves
    (shuffle-free projection, 8 bits/subspace of index state at
    k ≤ 256)."""
    import pandas as pd

    m, k, sub = codebooks.shape
    bc = df.sparkSession.sparkContext.broadcast(codebooks)
    _BROADCASTS.append(bc)

    @F.pandas_udf("array<int>")
    def _encode(v: pd.Series) -> pd.Series:
        x = np.stack(v.to_numpy()).astype(np.float64)  # (n, dim)
        xs = x.reshape(len(x), m, sub)  # (n, m, sub)
        cb = bc.value  # (m, k, sub)
        # ||x - c||² per (row, subspace, codeword), argmin over codewords
        d = (
            (xs**2).sum(axis=2)[:, :, None]
            - 2.0 * np.einsum("nms,mks->nmk", xs, cb)
            + (cb**2).sum(axis=2)[None, :, :]
        )
        codes = np.argmin(d, axis=2).astype(np.int32)  # first min = lowest id
        return pd.Series(list(codes))

    return df.withColumn(out, _encode(F.col(vec_col)))


def pq_adc(
    embeddings: DataFrame,
    query: np.ndarray,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """Asymmetric-distance (ADC) scores for every vector: encode the
    corpus, then score each row as ``Σ_s LUT[s, code_s]`` where LUT is
    the (m, k) table of squared L2 distances from the query's subvectors
    to every codeword — the PQ search kernel (Jégou et al., TPAMI 2011).
    The LUT enters the plan as literals (m·k doubles); the scan is a
    shuffle-free projection over the encoded corpus. Returns
    ``(id_col, pq_code, adc)``."""
    m, k, sub = codebooks.shape
    q = np.asarray(query, dtype=np.float64).reshape(m, sub)
    lut = ((q[:, None, :] - codebooks) ** 2).sum(axis=2)  # (m, k)
    enc = pq_encode(embeddings, codebooks, vec_col=vec_col, out=code_col)
    lut_col = F.array(*[
        F.array(*[F.lit(float(lut[s, j])) for j in range(k)]) for s in range(m)
    ])
    adc = F.aggregate(
        F.zip_with(
            lut_col,
            F.col(code_col),
            lambda row, c: F.element_at(row, c + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return enc.select(F.col(id_col), F.col(code_col), adc.alias("adc"))


def pq_ann_topk(
    embeddings: DataFrame,
    query: np.ndarray,
    codebooks: np.ndarray,
    topk: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k nearest by PQ asymmetric distance (ties → smallest id).
    The scale path of brute-force cosine top-k: the ranking scan reads
    m int32 codes per row instead of the full vector."""
    scored = pq_adc(embeddings, query, codebooks, id_col=id_col, vec_col=vec_col)
    return scored.orderBy("adc", id_col).limit(topk).select(id_col, "adc")


def sq8_quantize(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> tuple[DataFrame, list[float], list[float]]:
    """(codes_df, mins, maxs) — symmetric int8 scalar quantization.

    Per-dimension [min, max] over the corpus maps each float to an
    integer code in [0, 255] via ``floor((x - min)·255/(max - min) +
    0.5)`` (explicit floor — identical IEEE double arithmetic in Spark
    and DuckDB, so codes are bit-exact across engines; float32 inputs
    widen to double losslessly). Stats are one global aggregate (2·dim
    doubles driver-side — bounded); the quantizer itself is a single
    Catalyst ``transform`` against literal arrays, so codes never leave
    the JVM. 4× smaller than float32: the memory-resident tier for
    re-rank pipelines (PQ is the 32× tier, emb_pq_adc).
    """
    dim = len(df.select(vec_col).first()[0])
    stats = df.agg(
        *[F.min(F.col(vec_col)[i].cast("double")).alias(f"mn{i}") for i in range(dim)],
        *[F.max(F.col(vec_col)[i].cast("double")).alias(f"mx{i}") for i in range(dim)],
    ).first()
    mins = [float(stats[f"mn{i}"]) for i in range(dim)]
    maxs = [float(stats[f"mx{i}"]) for i in range(dim)]
    mn_lit = F.array(*[F.lit(m) for m in mins])
    rng_lit = F.array(
        *[F.lit((mx - mn) if mx > mn else 1.0) for mn, mx in zip(mins, maxs)]
    )
    idx = F.sequence(F.lit(1), F.lit(dim))
    codes = df.select(
        F.col(id_col),
        F.transform(
            idx,
            lambda i: F.greatest(
                F.lit(0),
                F.least(
                    F.lit(255),
                    F.floor(
                        (
                            F.element_at(F.col(vec_col), i).cast("double")
                            - F.element_at(mn_lit, i)
                        )
                        * F.lit(255.0)
                        / F.element_at(rng_lit, i)
                        + F.lit(0.5)
                    ).cast("int"),
                ),
            ),
        ).alias("code"),
    )
    return codes, mins, maxs


def sq8_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(qid, vec_id, dist, rank) — top-k nearest by SYMMETRIC int8
    scalar-quantized L2: both query and base vectors quantize with the
    same per-dim grid, so the distance ``Σ (cq_i − cb_i)²`` is exact
    64-bit integer arithmetic — bit-identical across engines,
    partitionings and summation orders (no float tie hazards).

    Plan: quantize once (sq8_quantize), broadcast the ≤|query_ids| query
    code rows against the base codes (one broadcast nested-loop over
    int arrays — the brute-force re-rank tier; compose with the LSH/IVF
    bucket routers for the candidate-pruned scale path), distance via
    ``zip_with``+``aggregate`` in longs, ``row_number`` per query.
    Ties break by vec_id. Self-matches are excluded."""
    codes, _, _ = sq8_quantize(df, vec_col=vec_col, id_col=id_col)
    codes = codes.persist()
    q = codes.where(F.col(id_col).isin([int(x) for x in query_ids])).select(
        F.col(id_col).alias("qid"), F.col("code").alias("qcode")
    )
    dist = (
        codes.join(F.broadcast(q))
        .where(F.col(id_col) != F.col("qid"))
        .select(
            "qid",
            id_col,
            F.aggregate(
                F.zip_with(
                    F.col("qcode"),
                    F.col("code"),
                    lambda a, b: (a.cast("long") - b.cast("long"))
                    * (a.cast("long") - b.cast("long")),
                ),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).alias("dist"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.col("dist").asc(), F.col(id_col).asc())
    out = (
        dist.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", id_col, "dist", "rank")
        .localCheckpoint(eager=True)
    )
    codes.unpersist()
    return out
