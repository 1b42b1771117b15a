"""Local gate for the staged wave-2 post-window entries
(queries_r5c: g_k_corona, g_is_tree, g_maxcliques, g_kclique5) — the
same spark-vs-DuckDB comparison the driver window applies, run at
sf0.001 because the 50-slot window is full (SURVEY §8 hold-out
discipline; tools/check_oracle.py --staged covers sf0.01)."""

from __future__ import annotations

import duckdb
import pytest

from linkgraph import queries_r5c as R

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF}/orders.parquet')"
    )
    return c


def _cmp(spark, con, name, norm):
    got = sorted(norm(tuple(r)) for r in R.STAGED_QUERIES[name](spark, SF).collect())
    want = sorted(norm(tuple(r)) for r in con.execute(R.STAGED_ORACLE_SQL[name]).fetchall())
    assert got == want, name


def test_staged_k_corona_matches_oracle(spark, con):
    _cmp(spark, con, "g_k_corona", lambda t: (int(t[0]), int(t[1])))


def test_staged_forest_verdicts_match_oracle(spark, con):
    _cmp(spark, con, "g_is_tree", lambda t: (t[0], bool(t[1])))


def test_staged_maxcliques_match_oracle(spark, con):
    _cmp(spark, con, "g_maxcliques", lambda t: tuple(int(x) for x in t[0]))


def test_staged_kclique5_matches_oracle(spark, con):
    # empty at sf0.001 (no 5-clique in the sparsified graph) — the
    # nonempty polarity runs at sf0.01 via tools/check_oracle.py --staged
    _cmp(spark, con, "g_kclique5", lambda t: t)


def test_staged_barycenter_matches_oracle(spark, con):
    _cmp(spark, con, "g_barycenter", lambda t: (int(t[0]),))


def test_staged_reach_matches_oracle(spark, con):
    _cmp(spark, con, "g_reach", lambda t: (t[0], int(t[1])))
