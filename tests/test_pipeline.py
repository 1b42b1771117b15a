"""Training-data pipeline operator tests over the driver's documents/embeddings."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from linkgraph.pipeline import (
    cosine_topk,
    embedding_near_duplicates,
    exact_dedup,
    exact_duplicates,
    fingerprints,
    language_id,
    lsh_ann_topk,
    minhash_lsh_duplicates,
    minhash_signatures,
    ngram_jaccard_pairs,
    quality_scores,
    simhash_duplicates,
    simhash_signatures,
    token_counts,
    word_shingles,
)
from linkgraph.pipeline.multimodal import extract_features, sample_frames, synth_media

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").persist()


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").persist()


def test_token_counts(spark, docs):
    got = token_counts(docs).orderBy("doc_id").limit(5).collect()
    rows = docs.orderBy("doc_id").limit(5).collect()
    for g, r in zip(got, rows):
        assert g["ws_tokens"] == len(r["text"].split())
        assert g["bpe_tokens"] >= g["ws_tokens"]


def test_quality_scores_bounds(docs):
    q = quality_scores(docs)
    row = q.agg(
        F.min("quality"), F.max("quality"), F.min("punct_ratio"), F.max("stopword_ratio")
    ).first()
    assert 0.0 <= row[0] and row[1] <= 1.0
    assert row[2] >= 0.0 and row[3] <= 1.0
    assert q.count() == docs.count()


def test_language_id_deterministic(docs):
    a = {r["doc_id"]: r["lang_pred"] for r in language_id(docs).collect()}
    b = {r["doc_id"]: r["lang_pred"] for r in language_id(docs.repartition(7)).collect()}
    assert a == b
    assert set(a.values()) <= {"en", "es", "de", "fr", "unknown"}


def test_fingerprints_normalization(spark):
    df = spark.createDataFrame(
        [(0, "Hello,   World!"), (1, "hello world"), (2, "different text")],
        "doc_id long, text string",
    )
    fp = {r["doc_id"]: (r["norm_md5"], r["roll_hash"]) for r in fingerprints(df).collect()}
    assert fp[0][0] == fp[1][0]  # normalization collapses case/punct/ws
    assert fp[0][0] != fp[2][0]
    assert fp[0][1] != fp[2][1]


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(0, "same text"), (1, "same text"), (2, "unique")], "doc_id long, text string"
    )
    dups = exact_duplicates(df).collect()
    assert len(dups) == 1 and dups[0]["doc_ids"] == [0, 1]
    kept = sorted(r["doc_id"] for r in exact_dedup(df).collect())
    assert kept == [0, 2]


def test_minhash_shingles_and_signatures(spark):
    df = spark.createDataFrame(
        [(0, "a b c d e"), (1, "a b c d e"), (2, "x y z w q")], "doc_id long, text string"
    )
    sh = {r["doc_id"]: set(r["shingles"]) for r in word_shingles(df, k=3).collect()}
    assert sh[0] == {"a b c", "b c d", "c d e"}
    sig = {r["doc_id"]: r["sig"] for r in minhash_signatures(word_shingles(df, k=3)).collect()}
    assert sig[0] == sig[1] and sig[0] != sig[2]
    assert len(sig[0]) == 64


def test_minhash_lsh_finds_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again for testing"
    near = base.replace("lazy", "sleepy")
    far = "completely different content with no overlap whatsoever in any shingle"
    df = spark.createDataFrame(
        [(0, base), (1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
             minhash_lsh_duplicates(df, threshold=0.4).collect()}
    assert pairs.get((0, 1)) == 1.0
    assert (0, 3) not in pairs and (1, 3) not in pairs
    assert (0, 2) in pairs  # one-word edit keeps most shingles


def test_simhash(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta eta theta"),
         (1, "alpha beta gamma delta epsilon zeta eta iota"),
         (2, "totally unrelated words here nothing shared at all")],
        "doc_id long, text string",
    )
    sigs = {r["doc_id"]: r["simhash"] for r in simhash_signatures(df).collect()}
    assert sigs[0] != sigs[2]
    ham01 = bin((sigs[0] ^ sigs[1]) & (2**64 - 1)).count("1")
    ham02 = bin((sigs[0] ^ sigs[2]) & (2**64 - 1)).count("1")
    assert ham01 < ham02
    if ham01 <= 7:  # wide-chunk banding serves radii ≤ 7 with full recall
        pairs = simhash_duplicates(df, max_hamming=ham01).collect()
        assert any(r["id_a"] == 0 and r["id_b"] == 1 for r in pairs)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        simhash_duplicates(df, max_hamming=8)


def test_simhash_multiprobe_full_recall(spark):
    """Radius 4-7 uses 1-bit multi-probe over the same wide chunks; recall
    within the radius is 100% by pigeonhole — verify against the exact
    all-pairs Hamming join on a batch of near-identical docs."""
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [(0, base)]
    words = base.split()
    for i in range(1, 12):
        w = list(words)
        w[i % len(w)] = f"tok{i}"
        if i % 3 == 0:
            w[(2 * i) % len(w)] = f"alt{i}"
        rows.append((i, " ".join(w)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = {r["doc_id"]: r["simhash"] for r in simhash_signatures(df).collect()}
    expected = set()
    ids = sorted(sigs)
    for x in ids:
        for y in ids:
            if x < y and bin((sigs[x] ^ sigs[y]) & (2**64 - 1)).count("1") <= 6:
                expected.add((x, y))
    got = {(r["id_a"], r["id_b"]) for r in simhash_duplicates(df, max_hamming=6).collect()}
    assert got == expected
    assert expected  # the fixture must actually produce in-radius pairs


def test_simhash_bucket_cap_bounds_hot_buckets(spark):
    """A corpus with 10% identical boilerplate docs puts them all in one
    bucket per chunk; the cap drops those buckets (metrics reported) and
    the remaining join still finds non-boilerplate near-dups."""
    import linkgraph.pipeline.dedup as dd

    rows = []
    for i in range(40):
        rows.append((i, "standard boilerplate header lorem ipsum dolor sit amet"))
    for i in range(40, 44):
        rows.append((i, f"unique document number {i} with some distinct words payload"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = simhash_duplicates(df, max_hamming=3, max_bucket_size=10).collect()
    m = dd.LAST_METRICS
    assert m is not None and m["op"] == "simhash"
    # the 40-doc boilerplate bucket exceeds the cap in every chunk
    assert m["dropped_buckets"] >= 4
    assert m["dropped_entries"] >= 160
    # boilerplate pairs were dropped with their buckets
    assert not any(r["id_a"] < 40 and r["id_b"] < 40 for r in pairs)


def test_minhash_bucket_cap(spark):
    import linkgraph.pipeline.dedup as dd
    from linkgraph.pipeline import minhash_lsh_duplicates

    rows = [(i, "standard boilerplate header lorem ipsum dolor sit amet") for i in range(30)]
    rows += [(30, "alpha beta gamma delta epsilon zeta"), (31, "alpha beta gamma delta epsilon eta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_lsh_duplicates(df, threshold=0.4, max_bucket_size=8).collect()
    m = dd.LAST_METRICS
    assert m is not None and m["op"] == "minhash_lsh" and m["dropped_buckets"] >= 1
    # the boilerplate mega-buckets are dropped; the small near-dup pair survives
    assert not any(r["id_a"] < 30 and r["id_b"] < 30 for r in pairs)
    assert any(r["id_a"] == 30 and r["id_b"] == 31 for r in pairs)


def test_ngram_jaccard(spark):
    df = spark.createDataFrame(
        [(0, "one two three four five six"), (1, "one two three four five seven"),
         (2, "eight nine ten eleven twelve thirteen")],
        "doc_id long, text string",
    )
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
             ngram_jaccard_pairs(df, threshold=0.3).collect()}
    assert (0, 1) in pairs and (0, 2) not in pairs
    # exact jaccard of 3-shingle sets: docs share 3 of 4+4 distinct → 3/5
    assert abs(pairs[(0, 1)] - 3 / 5) < 1e-12


def test_cosine_topk_matches_numpy(spark, embs):
    queries = embs.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = cosine_topk(embs, queries, k=5).collect()
    pdf = embs.select("vec_id", "embedding").toPandas()
    M = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    ids = pdf["vec_id"].to_numpy()
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    for qid in range(3):
        qv = Mn[ids == qid][0]
        sims = Mn @ qv
        mask = ids != qid
        order = sorted(zip(-sims[mask], ids[mask]))
        want = [int(i) for _, i in order[:5]]
        mine = [r["vec_id"] for r in sorted(got, key=lambda r: r["rank"]) if r["query_id"] == qid]
        assert mine == want


def test_lsh_ann_recall(spark, embs):
    queries = embs.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(embs, queries, k=5)
    approx = lsh_ann_topk(embs, queries, k=5, n_planes=4)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall > 0.2  # 4-plane single-probe on random vectors is lossy but nonzero


def test_ivf_ann_recall_and_coverage(spark, embs):
    from linkgraph.pipeline import ivf_ann_topk
    from linkgraph.pipeline.similarity import ivf_assign, ivf_centroids_from_ids, ivf_seed_ids

    queries = embs.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(embs, queries, k=5)
    approx = ivf_ann_topk(embs, queries, k=5, n_centroids=8, nprobe=2)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    assert len(e & a) / len(e) > 0.2  # 2/8 lists probed on random vectors

    # every corpus vector lands in exactly one list, all lists nonempty-ish
    cents = ivf_centroids_from_ids(embs, ivf_seed_ids(8))
    assigned = ivf_assign(embs, cents)
    counts = {r["list_id"]: r["n"] for r in assigned.groupBy("list_id").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == embs.count()
    assert set(counts) <= set(range(8))


def test_ivf_lloyd_refine_improves_quantization(spark, embs):
    from linkgraph.pipeline.similarity import (
        ivf_centroids_from_ids,
        ivf_lloyd_refine,
        ivf_seed_ids,
    )

    X = np.array(
        [r["embedding"] for r in embs.orderBy("vec_id").limit(256).collect()], dtype=np.float64
    )
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    seed = ivf_centroids_from_ids(embs, ivf_seed_ids(8))
    seed_n = seed / np.linalg.norm(seed, axis=1, keepdims=True)
    refined = ivf_lloyd_refine(X, seed, n_iter=5)
    # mean max-cosine to the quantizer (spherical k-means objective) must not degrade
    before = (Xn @ seed_n.T).max(axis=1).mean()
    after = (Xn @ refined.T).max(axis=1).mean()
    assert after >= before - 1e-12
    assert np.allclose(np.linalg.norm(refined, axis=1), 1.0)


def test_embedding_near_duplicates_exact_vs_lsh(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    ex = embedding_near_duplicates(df, threshold=0.99, dim=4, exact=True).collect()
    assert [(r["id_a"], r["id_b"]) for r in ex] == [(0, 1)]
    lsh = embedding_near_duplicates(df, threshold=0.99, dim=4, n_planes=2).collect()
    assert all((r["id_a"], r["id_b"]) == (0, 1) for r in lsh)


def test_multimodal_plumbing(spark):
    media = synth_media(spark, 50)
    feats = extract_features(media).collect()
    assert len(feats) == 50 and all(len(r["feature"]) == 16 for r in feats)
    # deterministic: same payload → same feature
    again = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    first = {r["media_id"]: r["feature"] for r in feats}
    assert again == first
    frames = sample_frames(media, every_n=30)
    vids = media.where(F.col("modality") == "video").count()
    assert frames.select("media_id").distinct().count() == vids
    with pytest.raises(Exception):
        extract_features(media, decode_stub=False).collect()


def test_multimodal_real_decode_raises(spark):
    math  # silence linters; placeholder for future real-decode gate


def test_ivf_refine_iters_actually_refines(spark, embs):
    """refine_iters>0 must train on a corpus sample, not on the seeds
    themselves (seeds' nearest centroid is always themselves, making the
    Lloyd pass a silent no-op). The refined quantizer must differ from the
    seed quantizer, and the search must stay well-formed."""
    from linkgraph.pipeline.similarity import (
        ivf_ann_topk,
        ivf_centroids_from_ids,
        ivf_seed_ids,
    )

    seed = ivf_centroids_from_ids(embs, ivf_seed_ids(8))
    seed_n = seed / np.linalg.norm(seed, axis=1, keepdims=True)

    q = embs.limit(3).selectExpr("vec_id as query_id", "embedding")
    out = ivf_ann_topk(embs, q, k=5, n_centroids=8, nprobe=2, refine_iters=3)
    rows = out.collect()
    assert len(rows) == 15 and all(r["rank"] <= 5 for r in rows)

    # reproduce the internal refine to assert the quantizer moved
    t_rows = (
        embs.select("embedding")
        .orderBy(F.xxhash64(F.col("vec_id").cast("string")))
        .limit(64 * 8)
        .collect()
    )
    import numpy as _np

    from linkgraph.pipeline.similarity import ivf_lloyd_refine

    train = _np.stack([_np.asarray(r[0], dtype=_np.float64) for r in t_rows])
    refined = ivf_lloyd_refine(train, seed, 3)
    assert not _np.allclose(refined, seed_n, atol=1e-9), "refine was a no-op"
