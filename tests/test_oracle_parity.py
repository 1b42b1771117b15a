"""Spark ↔ DuckDB oracle parity at sf0.001 (the driver gate runs sf0.01;
this exercises the same pairs on the sparser graph where iterative
behavior differs — k-core peeling cascades 4+ rounds instead of 1)."""

from __future__ import annotations

import math
from pathlib import Path

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

PAIRS = [
    "g_eccentricity",
    "g_diameter_radius",
    "g_harmonic",
    "corpus_repo_graph",
    "g_condensation",
    "g_linkpred",
    "g_voterank",
    "g_sample_neighbors",
    "g_khop_sample",
    "g_negative_sample",
    "g_node2vec",
    "g_saveload",
    "g_louvain_p1",
    "g_pagerank_delta",
    "g_pagerank_incr",
    "g_density",
    "g_reciprocity",
    "g_avg_neighbor_degree",
    "stream_pagerank",
    "g_sssp_incr",
    "g_wcc_incr",
    "g_triangles_incr",
    "g_mis",
    "g_coloring",
    "g_ktruss",
    "g_core_number",
    "g_onion",
    "g_rich_club",
    "g_s_metric",
    "g_global_efficiency",
    "g_wiener",
    "g_effective_size",
    "g_constraint",
    "g_local_bridges",
    "g_is_bipartite",
    "g_degree_histogram",
    "g_triadic_census",
    "g_square_clustering",
    "gie_repeat_until",
    "gie_text_until",
    "gie_text_twohop",
    "gie_text_match",
    "gie_text_choose",
    "g_sssp_csr",
    "g_cdlp_csr",
    "g_wcc_csr",
    "g_bfs_csr",
    "doc_repetition",
    "doc_split_counts",
    "g_kcore_20",
    "g_kcore_55",
    "g_kshell_10",
    "g_kshell_55",
    "g_hits_r2",
    "g_betweenness",
    "g_betweenness_ep",
    "g_betweenness_w",
    "g_sampling_paths",
    "doc_minhash_dups",
    "doc_simhash_dups",
    "emb_lsh_ann",
    "g_sssp_has_path",
    "g_is_simple_path",
    "corpus_edges",
    "media_features",
    "media_frames",
    "g_prop_label_counts",
    "g_prop_degree",
    "g_prop_wdegree_building",
    "gie_status_groupcount",
    "gie_building_values",
    "gie_twohop_parts",
    "gie_top_edges",
    "gie_paths",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = Path(SF_DIR) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = "nan" if math.isnan(v) else round(v, 6)
                if v == -0.0:
                    v = 0.0
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return out


@pytest.mark.parametrize("name", PAIRS)
def test_query_matches_oracle_sf0001(spark, duck, name):
    from linkgraph.queries import ORACLE_SQL, QUERIES

    sdf = QUERIES[name](spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(ORACLE_SQL[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows)
    assert _norm(srows, scols) == _norm(orows, ocols)


# ---- r5 window queue: staged entries get the SAME spark-vs-DuckDB check
# before they ever reach the driver window (see queries.py r5-queue note).

def _r5_names():
    from linkgraph.queries import R5_QUEUE_QUERIES

    return sorted(R5_QUEUE_QUERIES)


@pytest.mark.parametrize("name", _r5_names())
def test_r5_queue_matches_oracle_sf0001(spark, duck, name):
    from linkgraph.queries import R5_QUEUE_ORACLE_SQL, R5_QUEUE_QUERIES

    sdf = R5_QUEUE_QUERIES[name](spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(R5_QUEUE_ORACLE_SQL[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows)
    assert _norm(srows, scols) == _norm(orows, ocols)


# ---- r5 NEW entries (implemented during round 5, never driver-verified):
# same gate, parametrized over whatever queries_r5/queries_r5b registered.

def _r5_new_names():
    from linkgraph.queries import R5_NEW_ORACLE_SQL, R5_NEW_QUERIES

    return sorted(k for k in R5_NEW_QUERIES if R5_NEW_ORACLE_SQL.get(k))


@pytest.mark.parametrize("name", _r5_new_names())
def test_r5_new_matches_oracle_sf0001(spark, duck, name):
    from linkgraph.queries import R5_NEW_ORACLE_SQL, R5_NEW_QUERIES

    sdf = R5_NEW_QUERIES[name](spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(R5_NEW_ORACLE_SQL[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows)
    assert _norm(srows, scols) == _norm(orows, ocols)
