"""save_graph/load_graph round-trips (reference Graph.save_to/load_from,
framework/graph.py:975-1060)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from linkgraph.graph import graph_from_edge_vids
from linkgraph.property import PropertyGraph
from linkgraph.serde import (
    load_graph,
    load_property_graph,
    save_graph,
    save_property_graph,
)

EDGES = [(0, 1), (1, 2), (2, 0), (2, 3)]


def test_linkgraph_roundtrip(spark):
    g = graph_from_edge_vids(spark, EDGES)
    d = tempfile.mkdtemp(prefix="lg_serde_")
    save_graph(g, d, mode="overwrite")
    g2 = load_graph(spark, d)
    assert g2.directed == g.directed
    assert sorted((r["src"], r["dst"]) for r in g2.edges.collect()) == sorted(EDGES)
    assert g2.vertices.count() == g.vertices.count()
    assert dict(g2.vertices.dtypes) == dict(g.vertices.dtypes)


def test_linkgraph_roundtrip_file_uri_and_flags(spark):
    g = graph_from_edge_vids(spark, EDGES, directed=False)
    d = tempfile.mkdtemp(prefix="lg_serde_uri_")
    save_graph(g, f"file://{d}", mode="overwrite")
    g2 = load_graph(spark, f"file://{d}")
    assert g2.directed is False


def test_load_graph_missing_meta(spark):
    d = tempfile.mkdtemp(prefix="lg_serde_missing_")
    with pytest.raises(Exception):
        load_graph(spark, d)


def test_property_graph_roundtrip(spark):
    people = spark.createDataFrame(
        [("p1", 29), ("p2", 35)], "pid string, age int"
    )
    knows = spark.createDataFrame(
        [("p1", "p2", 0.7)], "src string, dst string, w double"
    )
    pg = PropertyGraph().add_vertices(people, "person").add_edges(
        knows, "knows", src_label="person", dst_label="person"
    )
    d = tempfile.mkdtemp(prefix="pg_serde_")
    save_property_graph(pg, d, mode="overwrite")
    pg2 = load_property_graph(spark, d)
    assert set(pg2.v_tables) == {"person"}
    assert set(pg2.e_tables) == {"knows"}
    assert pg2.e_tables["knows"].src_label == "person"
    assert pg2.v_tables["person"].count() == 2
