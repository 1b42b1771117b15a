"""In-process CLI contract: main() runs a subcommand and prints the
one-line JSON record (the spark-submit deployment surface drives the
same entry; tools/make_pyfiles.py + spark-submit is exercised manually
per the verify recipe — this pins the arg plumbing and output shape)."""

import json

import pytest


def _run(capsys, argv):
    from linkgraph.cli import main

    assert main(argv) == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_cli_pagerank_csr(spark, capsys):
    rec = _run(capsys, ["pagerank", "--corpus-files", "300", "--tier", "csr",
                        "--max-iter", "5"])
    assert rec["algo"] == "pagerank" and rec["rows"] > 0
    assert "skew" in rec and rec["skew"]["max_in_degree"] >= 1


def test_cli_ppr_batch(spark, capsys):
    rec = _run(capsys, ["ppr-batch", "--corpus-files", "300", "--n-seeds", "3",
                        "--max-iter", "4", "--tol", "0"])
    assert rec["algo"] == "ppr-batch"
    # rows = n_vertices × k
    single = _run(capsys, ["wcc", "--corpus-files", "300"])
    assert rec["rows"] == single["rows"] * 3
