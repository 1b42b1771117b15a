"""PropertyGraph: labels, projection, predicate filtering, flattening."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from linkgraph.property import PropertyGraph


@pytest.fixture()
def pg(spark):
    people = spark.createDataFrame(
        [("p1", 29, "tok"), ("p2", 27, "osa"), ("p3", 32, "tok")],
        "pid string, age int, city string",
    )
    software = spark.createDataFrame(
        [("s1", "java"), ("s2", "py")], "sid string, lang string"
    )
    created = spark.createDataFrame(
        [("p1", "s1", 0.4), ("p2", "s1", 0.6), ("p3", "s2", 1.0)],
        "src string, dst string, share double",
    )
    knows = spark.createDataFrame(
        [("p1", "p2", 3.0), ("p2", "p3", 1.0)], "a string, b string, years double"
    )
    return (
        PropertyGraph()
        .add_vertices(people, label="person", vid_field="pid")
        .add_vertices(software, label="software", vid_field=0)
        .add_edges(created, label="created", src_label="person", dst_label="software")
        .add_edges(knows, label="knows", src_label="person", dst_label="person")
    )


def test_schema_and_counts(pg):
    sch = {(s["kind"], s["label"]): s for s in pg.schema()}
    assert set(sch) == {
        ("vertex", "person"), ("vertex", "software"),
        ("edge", "created"), ("edge", "knows"),
    }
    assert sch[("vertex", "person")]["properties"] == ["age", "city"]
    assert sch[("edge", "knows")]["src_label"] == "person"
    counts = {(r["kind"], r["label"]): r["n"] for r in pg.label_counts().collect()}
    assert counts == {
        ("vertex", "person"): 3, ("vertex", "software"): 2,
        ("edge", "created"): 3, ("edge", "knows"): 2,
    }


def test_duplicate_label_rejected(pg, spark):
    one = spark.createDataFrame([("x",)], "pid string")
    with pytest.raises(ValueError):
        pg.add_vertices(one, label="person")


def test_project_prunes_and_validates(pg):
    proj = pg.project({"person": ["age"]}, {"knows": []})
    assert proj.v_tables["person"].columns == ["oid", "age"]
    assert proj.e_tables["knows"].df.columns == ["src_oid", "dst_oid"]
    with pytest.raises(ValueError):
        pg.project({"person": None}, {"created": None})  # software missing


def test_to_simple_full(pg):
    g = pg.to_simple()
    assert g.vertices.count() == 5  # isolated software kept via its label
    assert g.edges.count() == 5
    # oid round-trip: every edge endpoint resolves back to a known oid
    oids = {r["oid"] for r in g.vertices.collect()}
    assert oids == {"p1", "p2", "p3", "s1", "s2"}


def test_to_simple_weight_from_e_prop(pg):
    proj = pg.project({"person": [], "software": []}, {"created": ["share"]})
    g = proj.to_simple(e_prop="share")
    rows = g.edges.join(g.vertices, g.edges.src == g.vertices.vid).collect()
    assert {round(r["weight"], 1) for r in rows} == {0.4, 0.6, 1.0}


def test_select_vertices_drops_dangling_edges(pg):
    filt = pg.select_vertices("person", F.col("city") == "tok")  # drops p2
    g = filt.to_simple()
    # edges touching p2 vanish: created keeps p1->s1, p3->s2; knows keeps none
    assert g.edges.count() == 2
    oids = {r["oid"] for r in g.vertices.collect()}
    assert "p2" not in oids and {"s1", "s2"} <= oids
