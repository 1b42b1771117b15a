"""Curation-operator tests: splits, sampling, repetition, contamination,
dedup clustering, PII scrub — each vs a pure-Python oracle."""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from linkgraph.pipeline import (
    contamination_check,
    dedup_clusters,
    deduplicate,
    hash_split,
    pii_scrub,
    repetition_scores,
    stratified_sample,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").persist()


def _md5_bucket(tag: str) -> int:
    return int(hashlib.md5(tag.encode()).hexdigest()[:15], 16) % 1_000_000


def test_hash_split_deterministic_and_complete(spark, docs):
    out = hash_split(docs, hash_mode="md5", seed=7)
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = docs.count()
    assert sum(counts.values()) == n
    # md5 mode replays in pure python
    sample = out.select("doc_id", "split").limit(50).collect()
    for r in sample:
        b = _md5_bucket(f"7:{r['doc_id']}")
        expect = "train" if b < 800000 else ("val" if b < 900000 else "test")
        assert r["split"] == expect
    # ratios roughly honored
    assert counts.get("train", 0) > 0.7 * n


def test_hash_split_stable_under_append(spark, docs):
    before = {r["doc_id"]: r["split"] for r in hash_split(docs.limit(100), hash_mode="md5").select("doc_id", "split").collect()}
    after = {r["doc_id"]: r["split"] for r in hash_split(docs, hash_mode="md5").select("doc_id", "split").collect()}
    for k, v in before.items():
        assert after[k] == v


def test_stratified_sample_rate_and_determinism(spark, docs):
    s1 = stratified_sample(docs, 0.3, hash_mode="md5", seed=5)
    s2 = stratified_sample(docs, 0.3, hash_mode="md5", seed=5)
    ids1 = sorted(r["doc_id"] for r in s1.select("doc_id").collect())
    ids2 = sorted(r["doc_id"] for r in s2.select("doc_id").collect())
    assert ids1 == ids2
    n, k = docs.count(), len(ids1)
    assert 0.2 < k / n < 0.4
    for r in s1.limit(30).collect():
        assert _md5_bucket(f"5:{r['lang']}|{r['doc_id']}") < 300000


def test_repetition_scores_oracle(spark):
    rows = [
        (1, "a b\na b\nc d"),          # line 'a b' duplicated
        (2, "x y z w"),                # no repeats
        (3, "t t t t t"),              # one bigram 't t' * 4
        (4, ""),                       # empty
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in repetition_scores(df).collect()}
    assert got[1]["n_lines"] == 3
    assert got[1]["dup_line_ratio"] == pytest.approx(1 / 3)
    assert got[1]["dup_line_char_ratio"] == pytest.approx(6 / 9)
    assert got[2]["dup_line_ratio"] == 0.0
    # doc 3: bigrams = ['t t'] * 4 -> top ratio 1.0
    assert got[3]["top_bigram_ratio"] == pytest.approx(1.0)
    assert got[4]["n_lines"] == 0 and got[4]["top_bigram_ratio"] == 0.0


def test_repetition_scores_python_oracle_on_corpus(spark, docs):
    got = {r["doc_id"]: r for r in repetition_scores(docs).limit(2000).collect()}
    for r in docs.limit(40).collect():
        lines = [l.strip() for l in r["text"].split("\n") if l.strip()]
        cnt = Counter(lines)
        n_dup = sum(c - 1 for c in cnt.values())
        g = got[r["doc_id"]]
        assert g["n_lines"] == len(lines)
        if lines:
            assert g["dup_line_ratio"] == pytest.approx(n_dup / len(lines))
        words = [w for w in r["text"].strip().lower().split() if w]
        grams = [f"{a} {b}" for a, b in zip(words, words[1:])]
        if grams:
            top = Counter(grams).most_common(1)[0][1]
            assert g["top_bigram_ratio"] == pytest.approx(top / len(grams))


def test_contamination_check(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "totally unrelated words here"), (3, "quick brown fox runs")],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(9, "a quick brown fox appears")], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in contamination_check(docs, bench, n=3, threshold=0.3).collect()}
    # doc1 trigrams: 3; shares 'quick brown fox' -> 1/3
    assert got[1]["n_grams"] == 3 and got[1]["n_contaminated"] == 1
    assert got[1]["contaminated"] is True
    assert got[2]["n_contaminated"] == 0 and got[2]["contaminated"] is False
    assert got[3]["n_contaminated"] == 1


def test_dedup_clusters_and_deduplicate(spark):
    # (10, 9): lexicographic min oid is "10" but numeric canonical must be 9
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 9)], ["id_a", "id_b"]
    )
    got = {r["doc_id"]: r["canonical"] for r in dedup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 9: 9, 10: 9}
    docs = spark.createDataFrame([(i, f"d{i}") for i in (1, 2, 3, 5, 9, 10)], ["doc_id", "text"])
    kept = sorted(r["doc_id"] for r in deduplicate(docs, pairs).collect())
    assert kept == [1, 5, 9]


def test_pii_scrub(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a@b.co or x.y+z@mail.example.org, call 555-123-4567, host 10.0.0.1"),
            (2, "clean text no pii"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert got[1]["n_email"] == 2 and got[1]["n_phone"] == 1 and got[1]["n_ipv4"] == 1
    assert "[EMAIL]" in got[1]["redacted"] and "[PHONE]" in got[1]["redacted"]
    assert "@" not in got[1]["redacted"] and "10.0.0.1" not in got[1]["redacted"]
    assert got[2]["redacted"] == "clean text no pii"


def test_pii_regex_duckdb_parity(spark):
    """The exact patterns must count identically in DuckDB (oracle engine)."""
    import duckdb

    from linkgraph.pipeline.curation import PII_PATTERNS

    texts = [
        "a@b.co c 555-123-4567 10.0.0.1",
        "no pii at all",
        "x@y.org x@y.org 1.2.3.4 999.1.1.1",
    ]
    con = duckdb.connect()
    for t in texts:
        for name, pat in PII_PATTERNS.items():
            d = con.execute(
                "select len(regexp_extract_all(?, ?))", [t, pat]
            ).fetchone()[0]
            s = len(re.findall(pat, t))
            assert d == s, (name, t)


def test_pack_sequences_invariants(spark, docs):
    from linkgraph.pipeline import pack_sequences, token_counts

    out = pack_sequences(docs, budget=512, n_shards=8, seed=0, hash_mode="md5").persist()
    # every (shard, bin) except each shard's last holds exactly the budget
    per_bin = out.groupBy("shard", "bin").agg(F.sum("tok_in_bin").alias("t"))
    last = per_bin.groupBy("shard").agg(F.max("bin").alias("bin")).withColumn("is_last", F.lit(True))
    full = per_bin.join(last, ["shard", "bin"], "left").where(F.col("is_last").isNull())
    assert full.where(F.col("t") != 512).count() == 0
    # total packed tokens == total ws tokens of non-empty docs
    tot = out.agg(F.sum("tok_in_bin")).first()[0]
    want = (
        token_counts(docs).where(F.col("ws_tokens") > 0).agg(F.sum("ws_tokens")).first()[0]
    )
    assert tot == want
    # per-doc packed tokens == its token count (no loss, no duplication)
    per_doc = out.groupBy("doc_id").agg(F.sum("tok_in_bin").alias("t"))
    tk = token_counts(docs).select("doc_id", F.col("ws_tokens").alias("w"))
    bad = per_doc.join(tk, "doc_id").where(F.col("t") != F.col("w")).count()
    assert bad == 0
    out.unpersist()


def test_mixture_sample_hits_target_ratios(spark, docs):
    from linkgraph.pipeline import mixture_sample, token_counts

    targets = {"en": 3, "de": 2, "fr": 1}
    kept = mixture_sample(docs, targets, by="lang", seed=1, hash_mode="md5").persist()
    # only target strata survive
    assert {r["lang"] for r in kept.select("lang").distinct().collect()} <= set(targets)
    tk = token_counts(kept).select("doc_id", F.col("ws_tokens").alias("t"))
    toks = {
        r["lang"]: r["tok"]
        for r in kept.join(tk, "doc_id").groupBy("lang").agg(F.sum("t").alias("tok")).collect()
    }
    tk_all = token_counts(docs).select("doc_id", F.col("ws_tokens").alias("t"))
    orig = {
        r["lang"]: r["tok"]
        for r in docs.join(tk_all, "doc_id").groupBy("lang").agg(F.sum("t").alias("tok")).collect()
    }
    # binding stratum keeps everything
    u = min(sorted(targets), key=lambda s: orig[s] / targets[s])
    assert toks[u] == orig[u]
    # surviving token shares approximate the target weights (hash noise at
    # sf0.001 is coarse — 35% tolerance on each pairwise ratio)
    for a in targets:
        for b in targets:
            want = targets[a] / targets[b]
            got = toks[a] / toks[b]
            assert abs(got - want) / want < 0.35, (a, b, got, want)
    kept.unpersist()
