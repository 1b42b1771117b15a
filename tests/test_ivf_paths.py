"""IVF large-quantizer path: the executor-broadcast Arrow assignment and
probe must reproduce the plan-literal path exactly (same argmax, same
tie-break), and ivf_ann_topk must return identical top-k through either
route."""

from __future__ import annotations

import numpy as np
import pytest

import linkgraph.pipeline.similarity as S

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_arrow_assign_matches_literal(spark, embs):
    ids = S.ivf_seed_ids(16, 17)
    cents = S.ivf_centroids_from_ids(embs, ids)
    lit = {
        r["vec_id"]: r["list_id"]
        for r in S.ivf_assign(embs.select("vec_id", "embedding"), cents).collect()
    }
    arr = {
        r["vec_id"]: r["list_id"]
        for r in S._ivf_assign_arrow(
            embs.select("vec_id", "embedding"), cents, "embedding", "list_id"
        ).collect()
    }
    assert lit == arr


def test_ann_topk_identical_through_both_paths(spark, embs, monkeypatch):
    queries = embs.select(
        embs["vec_id"].alias("query_id"), "embedding"
    ).limit(5)
    kw = dict(k=5, n_centroids=260, nprobe=4, stride=1)

    def run():
        rows = S.ivf_ann_topk(embs, queries, **kw).collect()
        return sorted((r["query_id"], r["rank"], r["vec_id"], round(r["cosine"], 9)) for r in rows)

    # n_centroids=260 > 256 → Arrow path
    arrow = run()
    # raise the ceiling → identical query through plan literals
    monkeypatch.setattr(S, "MAX_PLAN_CENTROIDS", 4096)
    literal = run()
    assert arrow == literal
    # 260 lists over 500 vectors: probed lists may hold < k candidates
    assert 0 < len(arrow) <= 5 * 5


def test_assignment_plan_size_flat(spark, embs):
    """The Arrow path's plan must not grow with n_centroids (the literal
    path's would — that is the reason it exists)."""
    rng = np.random.RandomState(7)
    small = rng.randn(300, 64)
    big = rng.randn(4096, 64)
    df = embs.select("vec_id", "embedding")
    p_small = S.ivf_assign(df, small)._jdf.queryExecution().analyzed().toString()
    p_big = S.ivf_assign(df, big)._jdf.queryExecution().analyzed().toString()
    assert abs(len(p_big) - len(p_small)) < 500
