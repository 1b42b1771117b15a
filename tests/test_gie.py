"""Gremlin traversal subset: step semantics on a fixed modern-graph-like
fixture (person/software, knows/created — the reference's own Gremlin test
shape, interactive_engine test fixtures)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from linkgraph.gie import tag, traversal
from linkgraph.property import PropertyGraph


@pytest.fixture()
def g(spark):
    people = spark.createDataFrame(
        [("p1", 29), ("p2", 27), ("p3", 32), ("p4", 35)], "pid string, age int"
    )
    software = spark.createDataFrame([("s1", "java"), ("s2", "py")], "sid string, lang string")
    knows = spark.createDataFrame(
        [("p1", "p2", 0.5), ("p1", "p3", 1.0), ("p4", "p1", 0.2)],
        "a string, b string, w double",
    )
    created = spark.createDataFrame(
        [("p1", "s1", 0.4), ("p3", "s1", 0.6), ("p3", "s2", 1.0), ("p4", "s2", 0.1)],
        "a string, b string, share double",
    )
    pg = (
        PropertyGraph()
        .add_vertices(people, label="person", vid_field="pid")
        .add_vertices(software, label="software")
        .add_edges(knows, label="knows", src_label="person", dst_label="person")
        .add_edges(created, label="created", src_label="person", dst_label="software")
    )
    return traversal(pg)


def _oids(t):
    return sorted(r["oid"] for r in t.df.collect())


def test_v_source_and_haslabel(g):
    assert g.V().df.count() == 6
    assert _oids(g.V("software")) == ["s1", "s2"]
    assert _oids(g.V().hasLabel("person")) == ["p1", "p2", "p3", "p4"]


def test_out_bag_semantics_and_dedup(g):
    # two people created s1 → s1 appears twice before dedup
    outs = g.V("person").out("created")
    assert sorted(r["oid"] for r in outs.df.collect()) == ["s1", "s1", "s2", "s2"]
    assert _oids(outs.dedup()) == ["s1", "s2"]


def test_has_predicate_and_literal(g):
    assert _oids(g.V().has("age", lambda c: c > 28)) == ["p1", "p3", "p4"]
    assert _oids(g.V().has("lang", "py")) == ["s2"]


def test_in_and_both(g):
    assert _oids(g.V("software").hasLabel("software").in_("created")) == ["p1", "p3", "p3", "p4"]
    # both on p1: out knows (p2, p3) + in knows (p4) + out created (s1)
    start = g.V("person").has("age", 29)
    assert _oids(start.both()) == ["p2", "p3", "p4", "s1"]


def test_oute_inv_chain(g):
    # edge frontier carries properties; inV maps back to typed vertices
    e = g.V("person").outE("created").has("share", lambda c: c >= 0.6)
    rows = e.df.collect()
    assert {(r["src_oid"], r["dst_oid"]) for r in rows} == {("p3", "s1"), ("p3", "s2")}
    assert _oids(e.inV()) == ["s1", "s2"]
    assert all(r["label"] == "software" for r in e.inV().df.collect())


def test_values_count_groupcount(g):
    vals = sorted(r["value"] for r in g.V("person").values("age").collect())
    assert vals == [27, 29, 32, 35]
    assert g.V().count().first()["n"] == 6
    gc = {r["key"]: r["n"] for r in g.V("person").out("created").groupCount(by="lang").collect()}
    assert gc == {"java": 2, "py": 2}


def test_order_limit(g):
    top = g.E("created").order("share", ascending=False).limit(2)
    assert sorted(r["value"] for r in top.values("share").collect()) == [0.6, 1.0]


def test_repeat_times(g):
    # p4 -knows-> p1 -knows-> {p2, p3}; plus created hops die out at software
    two = g.V("person").has("age", 35).repeat(lambda t: t.out("knows"), times=2)
    assert _oids(two) == ["p2", "p3"]


def test_with_path_and_simple_path(g):
    t = g.V("person").has("age", 35).withPath().out("knows").out("knows")
    paths = sorted(tuple(r["path"]) for r in t.path().collect())
    assert paths == [("p4", "p1", "p2"), ("p4", "p1", "p3")]
    # simplePath drops revisits: p1 -> p2? no cycle here, so craft one via both()
    cyc = g.V("person").has("age", 29).withPath().both("knows").both("knows")
    all_n = cyc.path().count()
    simple_n = cyc.simplePath().path().count()
    assert simple_n < all_n  # p1 -> x -> p1 revisits are dropped
    for r in cyc.simplePath().path().collect():
        assert len(set(r["path"])) == len(r["path"])


def test_dedup_on_tracked_traversal_ignores_path(g):
    t = g.V("person").withPath().out("created")
    assert t.df.count() == 4  # bag: s1 twice
    assert t.dedup().df.count() == 2  # by element, not by path


def test_kind_guards(g):
    with pytest.raises(ValueError):
        g.V().inV()
    with pytest.raises(ValueError):
        g.E().out()
    with pytest.raises(ValueError):
        g.V().values("nope")


# ---------------- phase 2: select/where/union/group/sample/otherV/subgraph


def test_as_select_and_select_one(g):
    # person -> created software, then back to the tagged person
    t = g.V("person").as_("a").out("created").hasLabel("software")
    back = t.select_("a")
    assert back.kind == "v"
    assert _oids(back) == ["p1", "p3", "p3", "p4"]  # bag: one per traverser
    # select() projects tagged oids as named columns
    pairs = {(r["a"]) for r in t.select("a").collect()}
    assert pairs == {"p1", "p3", "p4"}


def test_as_tags_survive_edge_hops_and_repeat(g):
    t = g.V("person").has("age", 35).as_("root").repeat(lambda x: x.out("knows"), times=2)
    rows = t.select("root").collect()
    assert {r["root"] for r in rows} == {"p4"}


def test_where_cross_step(g):
    from linkgraph.gie import tag

    # people who know someone older than themselves: need age of both ends
    t = (
        g.V("person").has("age", lambda c: c.isNotNull()).as_("a")
        .out("knows")
    )
    # where: target oid differs from source (trivially true here) — cross-step col
    kept = t.where(F.col("oid") != tag("a"))
    assert kept.df.count() == t.df.count()
    none = t.where(F.col("oid") == tag("a"))
    assert none.df.count() == 0


def test_union_branches(g):
    t = g.V("person").has("age", 29).union(
        lambda x: x.out("knows"),
        lambda x: x.out("created"),
    )
    assert _oids(t) == ["p2", "p3", "s1"]
    with pytest.raises(ValueError):
        g.V("person").union(lambda x: x.outE("knows"), lambda x: x.out("knows"))


def test_group_by_agg(g):
    # group().by('lang').by(count) over created targets
    got = {
        r["key"]: r["value"]
        for r in g.V("person").out("created").group_by("lang", "count").collect()
    }
    assert got == {"java": 2, "py": 2}
    # sum of shares per software language on the edge frontier
    got = {
        r["key"]: round(r["value"], 3)
        for r in g.V("person").outE("created").group_by("label", "sum", "share").collect()
    }
    assert got == {"created": 2.1}
    with pytest.raises(ValueError):
        g.V().group_by("age", "median")
    with pytest.raises(ValueError):
        g.V().group_by("age", "sum")  # needs value


def test_sample_deterministic(g):
    s1 = _oids(g.V("person").sample(2, seed=7))
    s2 = _oids(g.V("person").sample(2, seed=7))
    assert s1 == s2 and len(s1) == 2
    all4 = _oids(g.V("person").sample(10, seed=7))
    assert all4 == ["p1", "p2", "p3", "p4"]  # n > frontier: keep all


def test_bothe_otherv(g):
    # p1's incident knows edges: out to p2,p3; in from p4 → otherV = p2,p3,p4
    t = g.V("person").has("age", 29).bothE("knows").otherV()
    assert _oids(t) == ["p2", "p3", "p4"]
    labels = {r["label"] for r in t.df.collect()}
    assert labels == {"person"}
    with pytest.raises(ValueError):
        g.V("person").outE("knows").otherV()  # no bothE upstream


def test_subgraph_sink_to_analytics(g):
    """The reference's GIE→GAE story (README.md:93-100): traversal →
    subgraph → run an analytics kernel on the materialized LinkGraph."""
    from linkgraph.algorithms import wcc

    sub = g.V("person").outE("created").subgraph()
    assert sub.vertices.count() == 5  # p1, p3, p4, s1, s2
    assert sub.edges.count() == 4
    # analytics on the traversal result: one weak component
    comp = wcc(sub)
    assert comp.select("value").distinct().count() == 1
    # duplicate traversed edges collapse
    sub2 = g.V("person").outE("created").union(
        lambda x: x, lambda x: x
    ).subgraph()
    assert sub2.edges.count() == 4


def test_choose_predicate_routing(g):
    # age > 30 → follow created; else stay put (false branch pass-through)
    t = g.V("person").choose(
        lambda df: F.col("oid").isin("p3", "p4"),
        lambda b: b.out("created"),
    )
    assert _oids(t) == ["p1", "p2", "s1", "s2", "s2"]
    # explicit false branch; both routes expand
    t2 = g.V("person").choose(
        lambda df: F.col("oid") == "p1",
        lambda b: b.out("knows"),
        lambda b: b.out("created"),
    )
    assert _oids(t2) == ["p2", "p3", "s1", "s2", "s2"]
    with pytest.raises(ValueError):
        g.V("person").choose(
            F.lit(True), lambda b: b.outE("knows"), lambda b: b.out("knows")
        )


def test_sack_accumulates_edge_props(g):
    # two knows-hops exist only via p4 → p1 → {p2, p3}
    t = (
        g.V("person")
        .withSack(0.0)
        .outE("knows")
        .sackBy("w")
        .inV()
        .outE("knows")
        .sackBy("w")
        .inV()
    )
    vals = sorted(round(r["value"], 6) for r in t.sack().collect())
    assert vals == [0.7, 1.2]  # 0.2+0.5, 0.2+1.0
    # grouped emission: group().by(oid).by(sack().sum())
    grouped = {r["key"]: round(r["value"], 6) for r in t.sack(by="oid").collect()}
    assert grouped == {"p2": 0.7, "p3": 1.2}


def test_sack_ops_and_vertex_props(g):
    # assign from a vertex property
    t = g.V("person").withSack(0).sackBy("age", "assign")
    assert sorted(r["value"] for r in t.sack().collect()) == [27, 29, 32, 35]
    # mult keeps zero sack at zero through the false route of choose
    t2 = (
        g.V("person")
        .withSack(0.0)
        .outE("placed" if False else "knows")
        .choose(
            F.col("w") >= 0.5,
            lambda e: e.sackBy("w", "sum"),
        )
        .inV()
    )
    vals = sorted(round(r["value"], 2) for r in t2.sack().collect())
    assert vals == [0.0, 0.5, 1.0]  # p4->p1 (0.2) routed false, sack stays 0
    with pytest.raises(ValueError):
        g.V("person").sackBy("age")
    with pytest.raises(ValueError):
        g.V("person").withSack(1).sackBy("age", "xor")


def test_sack_survives_tags_and_select(g):
    t = (
        g.V("person")
        .as_("root")
        .withSack(0.0)
        .outE("knows")
        .sackBy("w")
        .inV()
        .select_("root")
    )
    # sack accumulated on the hop survives the jump back to the tag
    grouped = {r["key"]: round(r["value"], 2) for r in t.sack(by="oid").collect()}
    assert grouped == {"p1": 1.5, "p4": 0.2}


def test_bothv_and_selfloop_semantics(g):
    # knows has 3 edges -> 6 endpoint traversers (bag semantics)
    got = sorted(r["oid"] for r in g.E("knows").bothV().df.collect())
    assert got == ["p1", "p1", "p1", "p2", "p3", "p4"]


def test_valuemap_and_properties(g):
    vm = {r["oid"]: r["vmap"] for r in g.V("software").valueMap().collect()}
    assert vm == {"s1": {"lang": "java"}, "s2": {"lang": "py"}}
    rows = g.V("person").has("age", lambda c: c > 30).properties("age").collect()
    assert sorted((r["oid"], r["key"], r["value"]) for r in rows) == [
        ("p3", "age", "32"),
        ("p4", "age", "35"),
    ]


def test_valuemap_on_edges(g):
    vm = {r["oid"]: r["vmap"] for r in g.E("created").valueMap().collect()}
    assert vm["p1->s1"] == {"share": "0.4"}
    assert len(vm) == 4


def test_not_filters_by_subtraversal(g):
    # people with no created edge: p2
    assert _oids(g.V("person").not_(lambda t: t.out("created"))) == ["p2"]
    # people nobody knows: p1? p2,p3 are known; p1 is known (p4->p1). p4 unknown.
    assert _oids(g.V("person").not_(lambda t: t.in_("knows"))) == ["p4"]


def test_not_preserves_bag_multiplicity(g):
    # frontier with duplicates: out('knows') from p1 gives p2,p3; p4->p1.
    t = g.V("person").out("knows")  # p2, p3, p1 (bag)
    kept = t.not_(lambda x: x.out("created"))
    assert _oids(kept) == ["p2"]  # p1,p3 created something; multiplicity kept


def test_global_aggregates_and_fold(g):
    assert g.V("person").sum_("age").collect()[0]["value"] == 29 + 27 + 32 + 35
    assert g.V("person").max_("age").collect()[0]["value"] == 35
    assert g.V("person").min_("age").collect()[0]["value"] == 27
    assert abs(g.V("person").mean("age").collect()[0]["value"] - 30.75) < 1e-9
    assert g.V("software").fold().collect()[0]["value"] == ["s1", "s2"]
    assert g.E("knows").fold("w").collect()[0]["value"] == [0.2, 0.5, 1.0]


def test_range_after_order(g):
    ordered = g.V("person").order("oid")
    assert _oids(ordered.range_(1, 3)) == ["p2", "p3"]
    assert _oids(ordered.range_(2, -1)) == ["p3", "p4"]


def test_match_two_patterns(g):
    # people who know someone who created something
    res = (
        g.V("person")
        .match(
            ("a", lambda t: t.out("knows"), "b"),
            ("b", lambda t: t.out("created"), "c"),
        )
        .select("a", "b", "c")
    )
    rows = sorted((r["a"], r["b"], r["c"]) for r in res.collect())
    assert rows == [("p1", "p3", "s1"), ("p1", "p3", "s2"), ("p4", "p1", "s1")]


def test_match_join_constraint_on_bound_tag(g):
    # co-creation: a and b both created the same software c (a != b)
    res = (
        g.V("person")
        .match(
            ("a", lambda t: t.out("created"), "c"),
            ("a", lambda t: t.both("knows"), "b"),
            ("b", lambda t: t.out("created"), "c"),  # c already bound -> filter
        )
        .where(tag("a") != tag("b"))
        .select("a", "b", "c")
    )
    rows = sorted((r["a"], r["b"], r["c"]) for r in res.collect())
    assert rows == [("p1", "p3", "s1"), ("p3", "p1", "s1")]


def test_match_unbound_start_raises(g):
    # first pattern's start binds the incoming frontier; a LATER pattern
    # starting from a never-bound tag is an ordering error
    with pytest.raises(ValueError, match="unbound"):
        g.V("person").match(
            ("a", lambda t: t.out("knows"), "b"),
            ("z", lambda t: t.out("created"), "w"),
        )


def test_math_step(g):
    from linkgraph.gie import traversal  # noqa: F401

    # sum of ages along a knows edge: a.age + _.age
    t = g.V("person").has("age", 35).as_("a").out("knows")
    vals = sorted(
        r["value"] for r in t.math_("a + _", by={"a": "age", "_": "age"}).collect()
    )
    assert vals == [64.0]  # 35 + 29
    # expression grammar: literals, parens, functions
    v2 = (
        g.V("person").has("age", 29).as_("x").out("knows")
        .math_("(x - _) / 2 + sqrt(4)", by={"x": "age", "_": "age"})
        .collect()
    )
    assert sorted(r["value"] for r in v2) == [0.5, 3.0]  # (29-32)/2+2, (29-27)/2+2


def test_math_parse_errors(g):
    with pytest.raises(ValueError, match="unknown variable"):
        g.V("person").as_("a").math_("a + b", by={"a": "age"}).collect()
    with pytest.raises(ValueError, match="no vertex label has property"):
        g.V("person").as_("a").math_("a", by={"a": "nope"}).collect()


def test_cache_returns_same_rows(g):
    t = g.V("person").out("created").cache()
    assert sorted(r["oid"] for r in t.df.collect()) == ["s1", "s1", "s2", "s2"]
    t.df.unpersist()


def test_local_collection_ops(g):
    from linkgraph.gie import order_local, range_local, unfold

    folded = g.V("person").fold("age")  # one row, sorted array
    desc = order_local(folded, ascending=False).first()["value"]
    assert desc == [35, 32, 29, 27]
    mid = range_local(order_local(folded), 1, 3).first()["value"]
    assert mid == [29, 32]
    assert sorted(r["value"] for r in unfold(folded).collect()) == [27, 29, 32, 35]
