"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the part that matters at 100 TB):

- **exact** — one hash-groupBy; md5(text) is computed map-side, the
  shuffle carries 16-byte keys, never the documents.
- **MinHash+LSH** — signatures are built with pure Catalyst array exprs
  (``transform``/``array_min`` over xxhash64), banded, and candidate
  pairs are found by an equi-join on (band_idx, band_hash) buckets —
  the only shuffle key is a 16-byte pair. Exact Jaccard verification
  runs only on candidates (an anti-pattern at scale is verifying all
  O(n²) pairs; LSH bounds it to bucket collisions).
- **SimHash** — 64-bit signatures; near-dup = Hamming ≤ k found by
  banding the signature into 16-bit chunks (pigeonhole: any pair within
  Hamming 3 of each other shares at least one of 4 exact chunks) and
  verifying with JVM-side ``bit_count(a XOR b)``.
- **n-gram Jaccard** — inverted-index self-join with a frequent-shingle
  cap (stop-shingles are dropped before the join: a shingle shared by
  10^6 docs would otherwise create 10^12 candidate pairs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------- exact ----------------


def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(dup_hash, n_docs, doc_ids) — groups with more than one document."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("dup_hash"))
        .groupBy("dup_hash")
        .agg(F.count("*").alias("n_docs"), F.sort_array(F.collect_list(id_col)).alias("doc_ids"))
        .where(F.col("n_docs") > 1)
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the smallest-id representative of each exact-duplicate group."""
    h = df.withColumn("_h", F.md5(F.col(text_col)))
    keep = h.groupBy("_h").agg(F.min(id_col).alias(id_col))
    return df.join(keep, id_col, "left_semi")


# ---------------- shingles & MinHash ----------------


def word_shingles(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """(id, shingles: array<string>) — k-word shingles, JVM-side."""
    words = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda w: w != "")
    shingles = F.when(
        F.size(words) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - k),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", words)))
    return df.select(F.col(id_col), F.array_distinct(shingles).alias("shingles"))


def minhash_signatures(
    shingled: DataFrame, id_col: str = "doc_id", num_perm: int = 64
) -> DataFrame:
    """(id, sig: array<long>) — sig[i] = min over shingles of xxhash64(s, i).

    One Catalyst expression; no UDF, no explode — the signature never
    shuffles more than num_perm longs per doc.
    """
    seeds = F.sequence(F.lit(0), F.lit(num_perm - 1))
    sig = F.transform(
        seeds,
        lambda s: F.array_min(
            F.transform(F.col("shingles"), lambda sh: F.xxhash64(sh, s))
        ),
    )
    return shingled.select(F.col(id_col), sig.alias("sig"))


def minhash_lsh_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
) -> DataFrame:
    """(id_a, id_b, jaccard) — near-duplicate pairs with exact verification.

    shingle → minhash → band → bucket-join → verify. Candidates come only
    from bucket collisions; verification computes exact Jaccard on the
    shingle sets via an explode-join (bounded by candidate count).
    """
    assert num_perm % bands == 0
    rows = num_perm // bands
    sh = word_shingles(df, id_col, text_col, k).persist()
    sig = minhash_signatures(sh, id_col, num_perm)

    band_entries = sig.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(F.concat_ws(",", F.slice(F.col("sig"), b * rows + 1, rows)), b).alias(
                        "bh"
                    ),
                ),
            )
        ).alias("e"),
    ).select(id_col, F.col("e.band").alias("band"), F.col("e.bh").alias("bh"))

    a, b = band_entries.alias("a"), band_entries.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )

    # exact verification: jaccard on shingle sets
    ex = sh.select(F.col(id_col), F.size("shingles").alias("n"), F.explode("shingles").alias("s"))
    inter = (
        cand.join(ex.select(F.col(id_col).alias("id_a"), F.col("n").alias("na"), "s"), "id_a")
        .join(ex.select(F.col(id_col).alias("id_b"), F.col("n").alias("nb"), "s"), ["id_b", "s"])
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.count("*").alias("i"))
    )
    out = inter.select(
        "id_a",
        "id_b",
        (F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))).alias("jaccard"),
    ).where(F.col("jaccard") >= threshold)
    return out


# ---------------- SimHash ----------------


def simhash_signatures(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash: long) — 64-bit SimHash over word hashes.

    Word hashing is JVM-side (xxhash64); the 64-lane bit-majority fold is
    a vectorized pandas UDF over the hash array (numpy bit unpack —
    Catalyst has no per-bit fold; this is the documented Arrow slow-path
    exception, batch-shaped, no per-row Python).
    """
    words = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda w: w != "")
    hashes = F.transform(F.array_distinct(words), lambda w: F.xxhash64(w))

    @F.pandas_udf("long")
    def _fold(hs: pd.Series) -> pd.Series:
        out = np.zeros(len(hs), dtype=np.int64)
        for i, arr in enumerate(hs):
            if arr is None or len(arr) == 0:
                continue
            a = np.asarray(arr, dtype=np.int64).astype(np.uint64)
            bits = ((a[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int32)
            votes = bits.sum(axis=0) * 2 - len(a)  # +1/-1 majority
            sig = np.uint64(0)
            for b in np.nonzero(votes > 0)[0]:
                sig |= np.uint64(1) << np.uint64(b)
            out[i] = sig.astype(np.int64)
        return pd.Series(out)

    return df.select(F.col(id_col), _fold(hashes).alias("simhash"))


def simhash_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """(id_a, id_b, hamming) — pairs within Hamming distance ``max_hamming``.

    Banding pigeonhole: with ``c = max_hamming + 1`` chunks, any pair
    with ≤ max_hamming differing bits agrees exactly on ≥1 chunk →
    equi-join per chunk, verify with bit_count(xor). Chunk count capped
    at 16 (4-bit chunks); beyond that the bucket join degenerates.
    """
    sig = simhash_signatures(df, id_col, text_col)
    n_chunks = max(1, min(max_hamming + 1, 16))
    base, extra = divmod(64, n_chunks)
    widths = [base + (1 if i < extra else 0) for i in range(n_chunks)]
    offsets = [sum(widths[:i]) for i in range(n_chunks)]
    # shiftright takes a literal bit count — unroll the chunks in Python
    def _chunk_val(c: int):
        if widths[c] >= 64:  # single-chunk degenerate case: exact-match join
            return F.col("simhash")
        return F.shiftright(F.col("simhash"), offsets[c]).bitwiseAND(
            F.lit((1 << widths[c]) - 1)
        )

    chunk_structs = [
        F.struct(F.lit(c).alias("chunk"), _chunk_val(c).alias("cv")) for c in range(n_chunks)
    ]
    chunks = sig.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(F.array(*chunk_structs)).alias("e"),
    ).select(id_col, "simhash", F.col("e.chunk").alias("chunk"), F.col("e.cv").alias("cv"))
    a, b = chunks.alias("a"), chunks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
    return pairs


# ---------------- n-gram Jaccard ----------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int = 100,
) -> DataFrame:
    """(id_a, id_b, jaccard) via inverted-index self-join.

    Shingles occurring in more than ``max_shingle_freq`` docs are dropped
    before the join (stop-shingle cap — without it one common shingle
    creates a quadratic candidate blowup at scale). Jaccard is computed
    on the *full* shingle sets of surviving candidate pairs.
    """
    sh = word_shingles(df, id_col, text_col, k).persist()
    ex = sh.select(F.col(id_col), F.size("shingles").alias("n"), F.explode("shingles").alias("s"))
    rare = ex.groupBy("s").agg(F.count("*").alias("freq")).where(F.col("freq") <= max_shingle_freq)
    exr = ex.join(rare.select("s"), "s", "left_semi")
    a = exr.select(F.col(id_col).alias("id_a"), F.col("n").alias("na"), "s")
    b = exr.select(F.col(id_col).alias("id_b"), F.col("n").alias("nb"), "s")
    inter = (
        a.join(b, ["s"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.count("*").alias("shared_rare"))
    )
    # recompute exact intersection on full shingle sets for surviving pairs
    full = sh.select(F.col(id_col), F.explode("shingles").alias("s"))
    cand = inter.select("id_a", "id_b", "na", "nb")
    exact = (
        cand.join(full.select(F.col(id_col).alias("id_a"), "s"), "id_a")
        .join(full.select(F.col(id_col).alias("id_b"), "s"), ["id_b", "s"])
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.count("*").alias("i"))
    )
    return exact.select(
        "id_a", "id_b", (F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))).alias("jaccard")
    ).where(F.col("jaccard") >= threshold)
