"""Round-5 GIE steps: optional/coalesce/and/or/project (fluent + text)
and the traversal-embedded vertex programs (pageRank / connected
component / label propagation as sugar over subgraph()→GAE)."""

from __future__ import annotations

import pytest

from linkgraph.gie import traversal
from linkgraph.gremlin import GremlinParseError, gremlin
from linkgraph.property import PropertyGraph


@pytest.fixture(scope="module")
def pg(spark):
    people = spark.createDataFrame(
        [("p1", 29), ("p2", 27), ("p3", 32), ("p4", 35)], "pid string, age int"
    )
    software = spark.createDataFrame(
        [("s1", "java"), ("s2", "py")], "sid string, lang string"
    )
    knows = spark.createDataFrame(
        [("p1", "p2"), ("p1", "p3"), ("p4", "p1")], "a string, b string"
    )
    created = spark.createDataFrame(
        [("p1", "s1"), ("p3", "s1"), ("p3", "s2"), ("p4", "s2")],
        "a string, b string",
    )
    return (
        PropertyGraph()
        .add_vertices(people, label="person", vid_field="pid")
        .add_vertices(software, label="software")
        .add_edges(knows, label="knows", src_label="person", dst_label="person")
        .add_edges(created, label="created", src_label="person", dst_label="software")
    )


def _bag(t):
    return sorted(r["oid"] for r in t.df.select("oid").collect())


def test_optional_matches_flow_others_pass_through(pg):
    t = traversal(pg).V("person").optional(lambda t: t.out("created"))
    # p1→s1, p2 passes through, p3→{s1,s2}, p4→s2
    assert _bag(t) == ["p2", "s1", "s1", "s2", "s2"]


def test_optional_text_twin(pg):
    df = gremlin(pg).execute(
        "g.V('person').optional(__.out('created')).groupCount()"
    )
    got = {r["key"]: r["n"] for r in df.collect()}
    assert got == {"p2": 1, "s1": 2, "s2": 2}


def test_coalesce_first_match_wins_empty_dropped(pg):
    t = traversal(pg).V("person").coalesce(
        lambda t: t.out("knows"), lambda t: t.out("created")
    )
    # p1 has knows → p2,p3 (created NOT taken); p2 has neither → dropped;
    # p3 has no knows → created s1,s2; p4 knows → p1
    assert _bag(t) == ["p1", "p2", "p3", "s1", "s2"]


def test_coalesce_identity_fallback_text(pg):
    df = gremlin(pg).execute(
        "g.V('person').coalesce(__.out('created'), __.identity()).groupCount()"
    )
    got = {r["key"]: r["n"] for r in df.collect()}
    assert got == {"s1": 2, "s2": 2, "p2": 1}


def test_and_requires_every_branch(pg):
    t = traversal(pg).V("person").and_(
        lambda t: t.out("knows"), lambda t: t.out("created")
    )
    assert _bag(t) == ["p1", "p4"]


def test_or_requires_any_branch_keeps_multiplicity(pg):
    t = traversal(pg).V("person").or_(
        lambda t: t.out("knows"), lambda t: t.out("created")
    )
    assert _bag(t) == ["p1", "p3", "p4"]
    # bag semantics: duplicate traversers survive the semi-join
    t2 = (
        traversal(pg)
        .V("person")
        .out("knows")  # p2, p3, p1
        .or_(lambda t: t.out("created"))
    )
    assert _bag(t2) == ["p1", "p3"]


def test_or_and_text(pg):
    df = gremlin(pg).execute(
        "g.V('person').or(__.out('knows'), __.out('created')).groupCount()"
    )
    assert {r["key"] for r in df.collect()} == {"p1", "p3", "p4"}
    df = gremlin(pg).execute(
        "g.V('person').and(__.out('knows'), __.out('created')).groupCount()"
    )
    assert {r["key"] for r in df.collect()} == {"p1", "p4"}


def test_project_props_column_and_count(pg):
    from pyspark.sql import functions as F

    df = traversal(pg).V("person").project(
        pid=F.col("oid"), a="age", nc=lambda t: t.out("created")
    )
    rows = {r["pid"]: (r["a"], r["nc"]) for r in df.collect()}
    assert rows == {"p1": (29, 1), "p2": (27, 0), "p3": (32, 2), "p4": (35, 1)}


def test_project_text_twin(pg):
    df = gremlin(pg).execute(
        "g.V('person').project('pid', 'a', 'nc')"
        ".by('oid').by('age').by(__.out('created').count())"
    )
    rows = {r["pid"]: (r["a"], r["nc"]) for r in df.collect()}
    assert rows == {"p1": (29, 1), "p2": (27, 0), "p3": (32, 2), "p4": (35, 1)}


@pytest.mark.parametrize(
    "query, hint",
    [
        ("g.V('person').project('a', 'b').by('age')", "names but"),
        ("g.V('person').project('a').by(__.out('created'))", "count()"),
        ("g.V('person').coalesce()", "at least one"),
        ("g.V('person').optional(__.out('x'), __.out('y'))", "exactly one"),
        ("g.V('person').and()", "at least one"),
        ("g.V('person').or()", "at least one"),
    ],
)
def test_parse_errors_are_loud_and_typed(pg, query, hint):
    with pytest.raises(GremlinParseError, match=hint):
        gremlin(pg).execute(query)


# ---------------------------------------------------- vertex-program steps


def test_pagerank_step_equals_explicit_composition(pg):
    from pyspark.sql import functions as F

    from linkgraph.algorithms import pagerank

    t = traversal(pg).V("person").outE("knows")
    step = {
        r["oid"]: r["value"]
        for r in t.page_rank(times=3)
        .select("oid", F.round("value", 9).alias("value"))
        .collect()
    }
    sub = traversal(pg).V("person").outE("knows").subgraph()
    explicit = {
        r["oid"]: r["value"]
        for r in pagerank(sub, delta=0.85, max_round=3)
        .join(sub.vertices, "vid")
        .select("oid", F.round("value", 9).alias("value"))
        .collect()
    }
    assert step == explicit


def test_connected_component_step(pg):
    cc = traversal(pg).V("person").bothE("knows", "created").connected_component()
    comp = {r["oid"]: r["component_oid"] for r in cc.collect()}
    # everything is one component through p1/p4; representative is the
    # lexicographically smallest member oid
    assert set(comp) == {"p1", "p2", "p3", "p4", "s1", "s2"}
    assert set(comp.values()) == {"p1"}


def test_label_propagation_step_matches_explicit(pg):
    from linkgraph.algorithms import cdlp

    t = traversal(pg).V("person").outE("knows")
    step = {r["oid"]: r["label_oid"] for r in t.label_propagation(times=2).collect()}
    sub = traversal(pg).V("person").outE("knows").subgraph()
    lab = cdlp(sub, max_round=2)
    rep = sub.vertices.selectExpr("vid AS value", "oid AS label_oid")
    explicit = {
        r["oid"]: r["label_oid"]
        for r in lab.join(sub.vertices, "vid").join(rep, "value").collect()
    }
    assert step == explicit


def test_shortest_path_step(pg):
    d = traversal(pg).V("person").outE("knows").shortest_path("p4")
    got = {r["oid"]: r["value"] for r in d.collect()}
    assert got == {"p4": 0, "p1": 1, "p2": 2, "p3": 2}


def test_shortest_path_step_missing_source(pg):
    with pytest.raises(ValueError, match="not in the traversed subgraph"):
        traversal(pg).V("person").outE("knows").shortest_path("nope")


def test_hits_step_equals_explicit_composition(pg):
    from pyspark.sql import functions as F

    from linkgraph.algorithms import hits

    t = traversal(pg).V("person").outE("knows")
    step = {
        r["oid"]: (r["hub"], r["auth"])
        for r in t.hits_step(tolerance=0.0, max_round=2)
        .select("oid", F.round("hub", 9).alias("hub"), F.round("auth", 9).alias("auth"))
        .collect()
    }
    sub = traversal(pg).V("person").outE("knows").subgraph()
    explicit = {
        r["oid"]: (r["hub"], r["auth"])
        for r in hits(sub, tolerance=0.0, max_round=2)
        .join(sub.vertices, "vid")
        .select("oid", F.round("hub", 9).alias("hub"), F.round("auth", 9).alias("auth"))
        .collect()
    }
    assert step == explicit


def test_peer_pressure_step_self_vote_and_min_tie(pg):
    # bidir neighbors: p1↔{p2,p3,p4}; round 1 every vertex tallies its own
    # cluster plus its neighbors': p1 sees {p1,p2,p3,p4} all ×1 → min tie
    # keeps p1 (CDLP *without* the self vote would flip p1 to p2);
    # p2/p3/p4 each see {self, p1} ×1 → min is p1.  Round 2 is stable.
    pp = traversal(pg).V("person").outE("knows").peer_pressure(times=2)
    got = {r["oid"]: r["cluster_oid"] for r in pp.collect()}
    assert got == {"p1": "p1", "p2": "p1", "p3": "p1", "p4": "p1"}


def test_peer_pressure_step_equals_explicit_composition(pg):
    from linkgraph.algorithms import peer_pressure

    t = traversal(pg).V("person").bothE("knows", "created")
    step = {r["oid"]: r["cluster_oid"] for r in t.peer_pressure(times=3).collect()}
    sub = traversal(pg).V("person").bothE("knows", "created").subgraph()
    pp = peer_pressure(sub, times=3)
    rep = sub.vertices.selectExpr("vid AS cluster", "oid AS cluster_oid")
    explicit = {
        r["oid"]: r["cluster_oid"]
        for r in pp.join(sub.vertices, "vid").join(rep, "cluster").collect()
    }
    assert step == explicit


def test_branch_routes_by_token_with_none_catchall(pg):
    t = traversal(pg).V("person").branch(
        "age",
        {
            29: lambda b: b.out("knows"),
            27: lambda b: b,
        },
        none=lambda b: b,
    )
    # age 29 (p1) -> out(knows) = {p2,p3}; age 27 (p2) -> itself;
    # unmatched (p3: 32, p4: 35) -> none branch passes through.
    assert _bag(t) == ["p2", "p2", "p3", "p3", "p4"]


def test_branch_no_none_drops_unmatched(pg):
    t = traversal(pg).V("person").branch("age", {29: lambda b: b.out("knows")})
    assert _bag(t) == ["p2", "p3"]


def test_branch_text_twin(pg):
    df = gremlin(pg).execute(
        "g.V('person')"
        ".branch(__.values('age'))"
        ".option(29, __.out('knows'))"
        ".option(27, __.identity())"
        ".option('none', __.identity())"
        ".groupCount()"
    )
    got = {r["key"]: r["n"] for r in df.collect()}
    assert got == {"p2": 2, "p3": 2, "p4": 1}


def test_branch_text_parse_errors(pg):
    with pytest.raises(GremlinParseError, match="selector"):
        gremlin(pg).execute(
            "g.V('person').branch(__.out('knows').values('age'))"
            ".option(1, __.identity())"
        )
    with pytest.raises(GremlinParseError, match="at least one option"):
        gremlin(pg).execute("g.V('person').branch(__.values('age'))")


def test_all_path_enumerates_simple_paths_within_khop(pg):
    t = traversal(pg).V().outE()
    got = sorted(tuple(r["path"]) for r in t.all_path("p4", "s2", 3).collect())
    # p4 -> s2 direct, and p4 -> p1 -> p3 -> s2; simple, <= 3 hops.
    assert got == [("p4", "p1", "p3", "s2"), ("p4", "s2")]


def test_all_path_khop_caps_length(pg):
    t = traversal(pg).V().outE()
    got = [tuple(r["path"]) for r in t.all_path("p4", "s2", 1).collect()]
    assert got == [("p4", "s2")]


def test_all_path_requires_edge_frontier(pg):
    with pytest.raises(ValueError):
        traversal(pg).V().all_path("p4", "s2", 2)


# ------------------------------------------------- lambda steps + output


def test_lambda_filter_with_props(pg):
    from pyspark.sql import functions as F

    t = traversal(pg).V("person").lambda_filter(
        lambda df: (F.col("age") % 2 == 1) | (F.col("age") > 33), "age"
    )
    assert _bag(t) == ["p1", "p2", "p4"]


def test_lambda_map_value_stream(pg):
    from pyspark.sql import functions as F

    vals = traversal(pg).V("person").lambda_map(
        lambda df: F.col("age") * 2, "age"
    )
    assert sorted(r["value"] for r in vals.collect()) == [54, 58, 64, 70]


def test_lambda_flat_map_explodes(pg):
    from pyspark.sql import functions as F

    vals = traversal(pg).V("person").lambda_flat_map(
        lambda df: F.array(F.col("oid"), F.upper("oid")), 
    )
    got = sorted(r["value"] for r in vals.collect())
    assert got == ["P1", "P2", "P3", "P4", "p1", "p2", "p3", "p4"]


def test_output_roundtrip_vertices(pg, tmp_path):
    out = traversal(pg).V("person").output(str(tmp_path / "people"), "age")
    rows = {r["oid"]: r["age"] for r in out.collect()}
    assert rows == {"p1": 29, "p2": 27, "p3": 32, "p4": 35}
    assert set(out.columns) == {"oid", "label", "age"}


def test_output_edge_frontier_and_bad_format(pg, tmp_path):
    out = traversal(pg).V("person").outE("knows").output(str(tmp_path / "knows"))
    assert out.count() == 3
    with pytest.raises(ValueError, match="unsupported format"):
        traversal(pg).V("person").output(str(tmp_path / "x"), fmt="orcish")


def test_flat_map_is_body_application(pg):
    t = traversal(pg).V("person").flat_map(lambda t: t.out("knows"))
    assert _bag(t) == ["p1", "p2", "p3"]
    with pytest.raises(ValueError, match="traversal step"):
        traversal(pg).V("person").flat_map(lambda t: t.count())


def test_select_keys_values_over_map_streams(pg):
    from linkgraph.gie import select_keys, select_values

    gc = traversal(pg).V("person").out("knows").groupCount()
    keys = sorted(r["value"] for r in select_keys(gc).collect())
    assert keys == ["p1", "p2", "p3"]
    vals = sorted(r["value"] for r in select_values(gc).collect())
    assert vals == [1, 1, 1]

    vm = traversal(pg).V("software").valueMap("lang")
    karr = {tuple(r["value"]) for r in select_keys(vm).collect()}
    assert karr == {("lang",)}
    varr = sorted(tuple(r["value"]) for r in select_values(vm).collect())
    assert varr == [("java",), ("py",)]

    with pytest.raises(ValueError, match="map/entry-valued"):
        select_keys(traversal(pg).V("person").df)


def test_text_vertex_program_steps(pg):
    from pyspark.sql import functions as F

    # text pageRank() ≡ fluent page_rank() on the same edge frontier
    got = gremlin(pg).execute("g.V('person').outE('knows').pageRank(0.85, 3)")
    want = traversal(pg).V("person").outE("knows").page_rank(0.85, 3)
    a = {r["oid"]: round(r["value"], 9) for r in got.collect()}
    b = {r["oid"]: round(r["value"], 9) for r in want.collect()}
    assert a == b

    cc = gremlin(pg).execute(
        "g.V('person').bothE('knows', 'created').connectedComponent()"
    )
    assert {r["component_oid"] for r in cc.collect()} == {"p1"}

    sp = gremlin(pg).execute("g.V('person').outE('knows').shortestPath('p4')")
    assert {r["oid"]: r["value"] for r in sp.collect()} == {
        "p4": 0, "p1": 1, "p2": 2, "p3": 2,
    }

    ap = gremlin(pg).execute("g.V().outE().allPath('p4', 's2', 3)")
    assert sorted(tuple(r["path"]) for r in ap.collect()) == [
        ("p4", "p1", "p3", "s2"), ("p4", "s2"),
    ]

    with pytest.raises(GremlinParseError, match="sid, tid, khop"):
        gremlin(pg).execute("g.V().outE().allPath('p4')")
