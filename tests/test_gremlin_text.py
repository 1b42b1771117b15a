"""Gremlin text front-end (linkgraph/gremlin.py) + repeat() until/emit
modulation (gie.py). Text queries must produce the same rows as their
fluent twins; parse errors must be loud and typed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from linkgraph.gie import traversal
from linkgraph.gremlin import GremlinParseError, gremlin
from linkgraph.property import PropertyGraph


@pytest.fixture()
def pg(spark):
    people = spark.createDataFrame(
        [("p1", 29), ("p2", 27), ("p3", 32), ("p4", 35)], "pid string, age int"
    )
    software = spark.createDataFrame(
        [("s1", "java"), ("s2", "py")], "sid string, lang string"
    )
    knows = spark.createDataFrame(
        [("p1", "p2", 0.5), ("p1", "p3", 1.0), ("p4", "p1", 0.2)],
        "a string, b string, w double",
    )
    created = spark.createDataFrame(
        [("p1", "s1", 0.4), ("p3", "s1", 0.6), ("p3", "s2", 1.0), ("p4", "s2", 0.1)],
        "a string, b string, share double",
    )
    return (
        PropertyGraph()
        .add_vertices(people, label="person", vid_field="pid")
        .add_vertices(software, label="software")
        .add_edges(knows, label="knows", src_label="person", dst_label="person")
        .add_edges(created, label="created", src_label="person", dst_label="software")
    )


@pytest.fixture()
def chain_pg(spark):
    """Variable-depth chain: c0 -> c1 -> c2 -> c3 -> leaf (only the tail
    reaches a 'leaf'-labeled vertex, at different depths per start)."""
    nodes = spark.createDataFrame(
        [(f"c{i}", i) for i in range(4)], "nid string, depth int"
    )
    leaves = spark.createDataFrame([("l0",)], "lid string")
    e = spark.createDataFrame(
        [("c0", "c1"), ("c1", "c2"), ("c2", "c3")], "a string, b string"
    )
    to_leaf = spark.createDataFrame([("c3", "l0")], "a string, b string")
    return (
        PropertyGraph()
        .add_vertices(nodes, label="node", vid_field="nid")
        .add_vertices(leaves, label="leaf", vid_field="lid")
        .add_edges(e, label="next", src_label="node", dst_label="node")
        .add_edges(to_leaf, label="final", src_label="node", dst_label="leaf")
    )


def _oids(df):
    return sorted(r["oid"] for r in df.collect())


# ---------------------------------------------------------- repeat until/emit


def test_repeat_until_exits_per_traverser(pg):
    g = traversal(pg)
    out = g.V("person").has("age", 35).repeat(
        lambda t: t.out(), until=lambda t: t.hasLabel("software")
    )
    # p4 → {p1, s2}: s2 exits; p1 → {p2, p3, s1}: s1 exits; p3 → {s1, s2}
    # both exit, p2 dead-ends silently.
    assert _oids(out.df) == ["s1", "s1", "s2", "s2"]


def test_repeat_until_multi_round_convergence(chain_pg):
    g = traversal(chain_pg)
    out = g.V("node").has("depth", 0).repeat(
        lambda t: t.out(), until=lambda t: t.hasLabel("leaf")
    )
    assert _oids(out.df) == ["l0"]  # 4 rounds deep


def test_repeat_until_first_while_do(pg):
    g = traversal(pg)
    # s2 satisfies until BEFORE any body application (while-do form)
    out = g.V("software").has("lang", "py").repeat(
        lambda t: t.out(),
        until=lambda t: t.hasLabel("software"),
        until_first=True,
    )
    assert _oids(out.df) == ["s2"]


def test_repeat_emit_times(pg):
    g = traversal(pg)
    out = g.V("person").has("age", 35).repeat(
        lambda t: t.out("knows"), times=3, emit=True
    )
    # depth1: p1; depth2: p2, p3; depth3: ∅ — each emitted exactly once
    assert _oids(out.df) == ["p1", "p2", "p3"]


def test_repeat_emit_first_includes_source(pg):
    g = traversal(pg)
    out = g.V("person").has("age", 35).repeat(
        lambda t: t.out("knows"), times=2, emit=True, emit_first=True
    )
    assert _oids(out.df) == ["p1", "p2", "p3", "p4"]


def test_repeat_until_max_rounds_guard(pg):
    g = traversal(pg)
    with pytest.raises(ValueError, match="did not converge"):
        # knows-cycle p4→p1→... never reaches software via 'knows' only,
        # but p1→p2/p3 dead-end: craft a never-satisfying until on a
        # self-sustaining frontier using both()
        g.V("person").repeat(
            lambda t: t.both("knows"),
            until=lambda t: t.hasLabel("software"),
            max_rounds=5,
        )


def test_repeat_requires_bound(pg):
    g = traversal(pg)
    with pytest.raises(ValueError, match="times=n and/or until"):
        g.V().repeat(lambda t: t.out())


# ------------------------------------------------------------- text parsing


def test_text_matches_fluent_basic(pg):
    q = gremlin(pg)
    text = q.execute("g.V('person').has('age', P.gt(28)).out('created').values('lang')")
    fluent = (
        traversal(pg)
        .V("person")
        .has("age", lambda c: c > 28)
        .out("created")
        .values("lang")
    )
    assert sorted(r["value"] for r in text.collect()) == sorted(
        r["value"] for r in fluent.collect()
    )


def test_text_groupcount_by(pg):
    q = gremlin(pg)
    df = q.execute("g.V('person').out('created').groupCount().by('lang')")
    assert {r["key"]: r["n"] for r in df.collect()} == {"java": 2, "py": 2}


def test_text_repeat_times_and_dedup_count(pg):
    q = gremlin(pg)
    df = q.execute("g.V('person').has('age', 35).repeat(__.out('knows')).times(2).dedup().count()")
    assert df.first()["n"] == 2


def test_text_repeat_until(pg):
    q = gremlin(pg)
    df = q.execute(
        "g.V('person').has('age', 35).repeat(__.out()).until(__.hasLabel('software'))"
    )
    assert _oids(df) == ["s1", "s1", "s2", "s2"]


def test_text_emit_prefix(pg):
    q = gremlin(pg)
    df = q.execute("g.V('person').has('age', 35).emit().repeat(__.out('knows')).times(2)")
    assert _oids(df) == ["p1", "p2", "p3", "p4"]


def test_text_order_by_desc_limit(pg):
    q = gremlin(pg)
    df = q.execute("g.E('created').order().by('share', desc).limit(2).values('share')")
    assert sorted(r["value"] for r in df.collect()) == [0.6, 1.0]


def test_text_as_select_dedup(pg):
    q = gremlin(pg)
    df = q.execute(
        "g.V('person').as('c').out('created').has('lang', 'py').select('c').dedup().count()"
    )
    assert df.first()["n"] == 2  # p3, p4 created s2


def test_text_union(pg):
    q = gremlin(pg)
    df = q.execute("g.V('person').has('age', 29).union(__.out('knows'), __.out('created')).count()")
    assert df.first()["n"] == 3  # p2, p3, s1


def test_text_not(pg):
    q = gremlin(pg)
    df = q.execute("g.V('person').not(__.out('created'))")
    assert _oids(df) == ["p2"]


def test_text_where_tag_neq(pg):
    q = gremlin(pg)
    # friends-of-friends excluding self
    df = q.execute(
        "g.V('person').as('a').out('knows').out('knows').where(P.neq('a'))"
    )
    fluent_n = (
        traversal(pg)
        .V("person")
        .as_("a")
        .out("knows")
        .out("knows")
        .df.count()
    )
    assert df.count() <= fluent_n


def test_text_within_predicate(pg):
    q = gremlin(pg)
    df = q.execute("g.V('person').has('age', within(29, 35))")
    assert _oids(df) == ["p1", "p4"]


def test_text_path(pg):
    q = gremlin(pg)
    df = q.execute("g.V('person').has('age', 35).out('knows').out('knows').path()")
    paths = sorted(tuple(r["path"]) for r in df.collect())
    assert paths == [("p4", "p1", "p2"), ("p4", "p1", "p3")]


def test_text_sample_range(pg):
    q = gremlin(pg)
    assert q.execute("g.V().sample(3)").count() == 3
    assert q.execute("g.V().order().by('oid').range(1, 4)").count() == 3


def test_text_group_by_agg(pg):
    q = gremlin(pg)
    df = q.execute("g.V('person').group().by('age').by('count')")
    assert df.count() == 4


def test_text_mean_sum(pg):
    q = gremlin(pg)
    assert q.execute("g.V('person').mean('age')").first()["value"] == pytest.approx(30.75)
    assert q.execute("g.V('person').sum('age')").first()["value"] == 123


def test_parse_errors(pg):
    q = gremlin(pg)
    for bad in [
        "V().out()",                      # must start with g
        "g.V(",                            # unbalanced
        "g.V().frobnicate()",              # unknown step
        "g.V().count().out()",             # step after terminal
        "g.V().has('age')",                # has arity
        "g.V().order()",                   # order without by
        "g.V().times(2)",                  # orphan modulator
        "g.V().repeat(__.out().count()).times(2)",  # terminal in body
        "g.V().£bad",                      # lexer error
    ]:
        with pytest.raises(GremlinParseError):
            q.execute(bad)


def test_text_plan_identical_to_fluent(pg):
    """The parser is a pure front-end: same logical plan as the fluent twin."""
    q = gremlin(pg)
    text_df = q.execute("g.V('person').out('created').groupCount().by('lang')")
    fluent_df = traversal(pg).V("person").out("created").groupCount(by="lang")
    import re

    def norm(df):  # expression IDs are allocation-order artifacts
        return re.sub(r"#\d+", "#", df._jdf.queryExecution().analyzed().toString())

    assert norm(text_df) == norm(fluent_df)


def test_text_math_by(pg):
    q = gremlin(pg)
    df = q.execute(
        "g.V('person').has('age', 35).as('a').out('knows').math('a + _').by('age').by('age')"
    )
    assert sorted(r["value"] for r in df.collect()) == [64.0]
    with pytest.raises(GremlinParseError, match="by\\(\\) modulators"):
        q.execute("g.V('person').as('a').math('a + b').by('age')")


def test_text_cache(pg):
    q = gremlin(pg)
    df = q.execute("g.V('person').out('created').cache().dedup().count()")
    assert df.first()["n"] == 2


def test_repeat_times_zero_is_identity(pg):
    g = traversal(pg)
    base = g.V("person")
    assert _oids(base.repeat(lambda t: t.out(), times=0).df) == _oids(base.df)
    # emit_first still emits the source when the loop body never runs
    out = base.repeat(lambda t: t.out("knows"), times=0, emit_first=True)
    assert _oids(out.df) == _oids(base.df)


def test_emit_first_implies_emit(pg):
    g = traversal(pg)
    out = g.V("person").has("age", 35).repeat(
        lambda t: t.out("knows"), times=2, emit_first=True
    )
    assert _oids(out.df) == ["p1", "p2", "p3", "p4"]


def test_until_first_requires_until(pg):
    g = traversal(pg)
    with pytest.raises(ValueError, match="until_first"):
        g.V().repeat(lambda t: t.out(), times=2, until_first=True)


def test_math_joins_on_label_not_just_oid(spark):
    """Two vertex labels sharing an oid must not cross-contaminate
    math() property lookups (the _join_vprop (oid, label) key rule)."""
    people = spark.createDataFrame([("x1", 10)], "pid string, score int")
    robots = spark.createDataFrame([("x1", 99)], "rid string, score int")
    likes = spark.createDataFrame([("x1", "x1")], "a string, b string")
    pg2 = (
        PropertyGraph()
        .add_vertices(people, label="person", vid_field="pid")
        .add_vertices(robots, label="robot", vid_field="rid")
        .add_edges(likes, label="likes", src_label="person", dst_label="robot")
    )
    from linkgraph.gie import traversal as trav

    rows = (
        trav(pg2).V("person").as_("a").out("likes")
        .math_("a + _", by={"a": "score", "_": "score"})
        .collect()
    )
    assert [r["value"] for r in rows] == [109.0]  # person 10 + robot 99, once


def test_text_sack(pg):
    q = gremlin(pg)
    df = q.execute(
        "g.V('person').has('age', 35).withSack(0).out('knows').sackBy('age').sack()"
    )
    # p4 -> p1: sack accumulates p1's age (29)
    assert sorted(r["value"] for r in df.collect()) == [29.0]


def _sorted_oids(df):
    return sorted(r["oid"] for r in df.collect())


def test_text_where_subtraversal_filter(pg):
    # existential filter: people who created something = p1, p3, p4
    got = gremlin(pg).execute("g.V().hasLabel('person').where(__.out('created'))")
    assert _sorted_oids(got) == ["p1", "p3", "p4"]
    # fluent twin via filter_
    flu = traversal(pg).V("person").filter_(lambda t: t.out("created"))
    assert sorted(r["oid"] for r in flu.df.collect()) == ["p1", "p3", "p4"]


def test_filter_preserves_bag_multiplicity(pg):
    # out('knows') frontier = p2, p3, p1 (bag); creators among them: p1, p3
    t = traversal(pg).V("person").out("knows")
    kept = t.filter_(lambda x: x.out("created"))
    assert sorted(r["oid"] for r in kept.df.collect()) == ["p1", "p3"]


def test_text_choose_routes_both_branches(pg):
    # creators hop to their software; non-creators stay put
    got = gremlin(pg).execute(
        "g.V().hasLabel('person').choose(__.out('created'), __.out('created'), __.identity())"
    )
    # p1 -> s1; p3 -> s1, s2; p4 -> s2; p2 stays p2
    assert _sorted_oids(got) == ["p2", "s1", "s1", "s2", "s2"]
    # fluent twin
    flu = traversal(pg).V("person").choose_traversal(
        lambda t: t.out("created"), lambda t: t.out("created")
    )
    assert sorted(r["oid"] for r in flu.df.collect()) == ["p2", "s1", "s1", "s2", "s2"]


def test_text_choose_without_false_branch(pg):
    got = gremlin(pg).execute(
        "g.V().hasLabel('person').choose(__.out('knows'), __.out('knows')).count()"
    )
    # p1 -> p2,p3; p4 -> p1; p2,p3 (no out-knows) pass through = 5
    assert got.collect()[0][0] == 5


def test_text_match_matches_fluent(pg):
    got = gremlin(pg).execute(
        "g.V().hasLabel('person')"
        ".match(__.as('a').out('knows').as('b'), __.as('b').out('created').as('c'))"
        ".select('a', 'b', 'c')"
    )
    rows = sorted((r["a"], r["b"], r["c"]) for r in got.collect())
    assert rows == [("p1", "p3", "s1"), ("p1", "p3", "s2"), ("p4", "p1", "s1")]


def test_text_match_bound_tag_is_join_constraint(pg):
    got = gremlin(pg).execute(
        "g.V().hasLabel('person')"
        ".match(__.as('a').out('created').as('c'),"
        " __.as('a').both('knows').as('b'),"
        " __.as('b').out('created').as('c'))"
        ".select('a', 'b', 'c')"
    )
    rows = sorted((r["a"], r["b"], r["c"]) for r in got.collect())
    # includes a==b self rows (no tag-inequality filter in the text form)
    assert ("p1", "p3", "s1") in rows and ("p3", "p1", "s1") in rows


def test_text_match_pattern_shape_errors(pg):
    with pytest.raises(GremlinParseError, match="as"):
        gremlin(pg).execute("g.V().match(__.out('knows').as('b'))")
    with pytest.raises(GremlinParseError, match="sub-traversal"):
        gremlin(pg).execute("g.V().match('nope')")


def test_text_choose_arity_error(pg):
    with pytest.raises(GremlinParseError, match="choose"):
        gremlin(pg).execute("g.V().choose(__.out('knows'))")


def test_text_aggregate_cap_and_store(pg):
    got = gremlin(pg).execute("g.V('person').out('knows').aggregate('x').cap('x')")
    assert [r["value"] for r in got.collect()] == [["p1", "p2", "p3"]]
    # store() is the lazy sibling (StoreTreeNode.java) — same collection
    got2 = gremlin(pg).execute("g.V('person').out('knows').store('x').cap('x')")
    assert got.collect() == got2.collect()


def test_text_aggregate_keeps_traversing(pg):
    # aggregate() is a side-effect step: the main stream continues
    got = gremlin(pg).execute(
        "g.V('person').aggregate('seen').out('created').groupCount()"
    )
    assert {r["key"]: r["n"] for r in got.collect()} == {"s1": 2, "s2": 2}


def test_text_barrier_is_semantics_neutral(pg):
    with_b = gremlin(pg).execute("g.V('person').barrier().out('created')")
    without = gremlin(pg).execute("g.V('person').out('created')")
    assert sorted(map(tuple, with_b.collect())) == sorted(
        map(tuple, without.collect())
    )


def test_text_constant_and_tokens(pg):
    c = gremlin(pg).execute("g.V('software').constant(7)")
    assert [r["value"] for r in c.collect()] == [7, 7]
    ids = gremlin(pg).execute("g.V('person').outE('created').id()")
    assert sorted(r["value"] for r in ids.collect()) == [
        "p1->s1", "p3->s1", "p3->s2", "p4->s2",
    ]
    labs = gremlin(pg).execute("g.V('software').label()")
    assert [r["value"] for r in labs.collect()] == ["software", "software"]


def test_text_sideeffect_parse_errors(pg):
    with pytest.raises(GremlinParseError, match="collection name"):
        gremlin(pg).execute("g.V().aggregate()")
    with pytest.raises(GremlinParseError, match="collection name"):
        gremlin(pg).execute("g.V().cap()")
    with pytest.raises(ValueError, match="no such side-effect"):
        gremlin(pg).execute("g.V().cap('missing')")
