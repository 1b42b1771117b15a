"""Product quantization: encode argmin, ADC-vs-numpy equality, and the
self-query sanity (a codebook member's ADC to itself is 0)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from linkgraph.pipeline.similarity import pq_adc, pq_ann_topk, pq_codebooks, pq_encode

SF_DIR = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_pq_encode_matches_numpy(spark):
    emb = _emb(spark)
    cb = pq_codebooks(emb, m=4, k=16)
    got = {
        r["vec_id"]: list(r["pq_code"])
        for r in pq_encode(emb, cb).select("vec_id", "pq_code").collect()
    }
    rows = emb.select("vec_id", "embedding").collect()
    for r in rows[:50]:
        x = np.asarray(r["embedding"], dtype=np.float64).reshape(4, -1)
        want = [int(np.argmin(((x[s] - cb[s]) ** 2).sum(axis=1))) for s in range(4)]
        assert got[r["vec_id"]] == want, r["vec_id"]


def test_pq_codebook_member_self_distance_zero(spark):
    emb = _emb(spark)
    cb = pq_codebooks(emb, m=4, k=16)
    # vector #5 is codebook row j=5 in every subspace; ADC(q=#5) at #5 = 0
    q = np.asarray(
        emb.where(F.col("vec_id") == 5).select("embedding").first()[0], dtype=np.float64
    )
    scored = pq_adc(emb, q, cb)
    self_adc = scored.where(F.col("vec_id") == 5).select("adc").first()[0]
    assert abs(self_adc) < 1e-9
    top = pq_ann_topk(emb, q, cb, topk=5).collect()
    assert top[0]["vec_id"] == 5 and abs(top[0]["adc"]) < 1e-9
    assert [r["adc"] for r in top] == sorted(r["adc"] for r in top)
