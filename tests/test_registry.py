"""Registry-window invariants (SURVEY.md §8, r2 lesson).

The external driver hash-verifies only the FIRST 50 ``queries()``
entries, so every never-driver-verified entry must sit inside that
window.  Round 5's never-verified set = the 9 staged r4 queue entries
plus everything in R5_NEW_QUERIES.
"""

from __future__ import annotations


def test_never_verified_entries_inside_driver_window():
    from linkgraph.queries import QUERIES, R5_NEW_QUERIES, R5_QUEUE_QUERIES

    order = list(QUERIES)
    window = set(order[:50])
    never_verified = set(R5_QUEUE_QUERIES) | set(R5_NEW_QUERIES)
    escaped = sorted(never_verified - window)
    assert not escaped, f"never-driver-verified entries past position 50: {escaped}"


def test_window_entries_all_have_oracles_or_justification():
    from linkgraph.queries import ORACLE_SQL, QUERIES

    # rows-only entries carry a written justification in queries.py's
    # module docstring; everything else in the window needs an oracle.
    justified = {"g_louvain", "g_dfs", "corpus_pagerank", "corpus_wcc"}
    missing = [
        k for k in list(QUERIES)[:50] if k not in ORACLE_SQL and k not in justified
    ]
    assert not missing, f"window entries without oracle SQL: {missing}"


def test_oracle_keys_subset_of_queries():
    from linkgraph.queries import ORACLE_SQL, QUERIES

    orphans = sorted(set(ORACLE_SQL) - set(QUERIES))
    assert not orphans, f"oracle SQL with no matching query: {orphans}"
