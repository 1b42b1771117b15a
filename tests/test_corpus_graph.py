"""Corpus synthesis, edge derivation, dense-id vertex map, graph ops."""

from __future__ import annotations

from pyspark.sql import functions as F

from linkgraph.corpus import content_sha_set, derive_edges, synth_corpus
from linkgraph.graph import assign_dense_ids, build_graph, graph_from_edge_vids


def test_corpus_schema_and_determinism(spark):
    c1 = synth_corpus(spark, 200, seed=42, partitions=2)
    c2 = synth_corpus(spark, 200, seed=42, partitions=7)
    assert c1.columns == ["repo", "path", "commit", "lang", "content"]
    assert c1.count() == 200
    # identical row set regardless of partitioning
    assert c1.exceptAll(c2).count() == 0 and c2.exceptAll(c1).count() == 0
    r = c1.first()
    assert len(r["commit"]) == 40
    assert r["lang"] in ("py", "java", "cpp")


def test_content_sha_invariant_through_pipeline(spark):
    c = synth_corpus(spark, 150, seed=42)
    before = {r["sha"] for r in content_sha_set(c).collect()}
    # a repartition + filter-free projection pipeline must preserve the set
    after_df = c.repartition(5, "repo").select("repo", "path", "commit", "lang", "content")
    after = {r["sha"] for r in content_sha_set(after_df).collect()}
    assert before == after
    assert len(before) == 150  # contents are unique


def test_derive_edges_resolves_to_existing_files(spark):
    c = synth_corpus(spark, 300, seed=42)
    e = derive_edges(c)
    oids = c.select(F.concat("repo", F.lit(":"), "path").alias("oid"))
    dangling = e.join(oids.withColumnRenamed("oid", "dst_oid"), "dst_oid", "left_anti")
    assert dangling.count() == 0
    assert e.where(F.col("src_oid") == F.col("dst_oid")).count() == 0
    assert e.count() > 100  # corpus generates real edges


def test_edge_derivation_partition_invariant(spark):
    c1 = synth_corpus(spark, 200, seed=42, partitions=1)
    c2 = synth_corpus(spark, 200, seed=42, partitions=8)
    e1 = set(map(tuple, derive_edges(c1).collect()))
    e2 = set(map(tuple, derive_edges(c2).collect()))
    assert e1 == e2


def test_assign_dense_ids_is_rank_of_sorted_oid(spark):
    import random

    rng = random.Random(1)
    oids = [f"k{rng.randrange(10_000):05d}" for _ in range(500)]
    df = spark.createDataFrame([(o,) for o in oids], "oid string")
    got = {r["oid"]: r["vid"] for r in assign_dense_ids(df, partitions=4).collect()}
    want = {o: i for i, o in enumerate(sorted(set(oids)))}
    assert got == want


def test_assign_dense_ids_partition_invariant(spark):
    df = spark.createDataFrame([(f"x{i:04d}",) for i in range(777)], "oid string")
    a = {r["oid"]: r["vid"] for r in assign_dense_ids(df, partitions=3).collect()}
    b = {r["oid"]: r["vid"] for r in assign_dense_ids(df.repartition(13), partitions=6).collect()}
    assert a == b


def test_build_graph_end_to_end(spark):
    c = synth_corpus(spark, 120, seed=42)
    g = build_graph(derive_edges(c))
    n, m = g.node_num(), g.edge_num()
    assert n > 0 and m > 0
    # vids dense in [0, n)
    row = g.vertices.agg(F.min("vid"), F.max("vid"), F.count("*")).first()
    assert row[0] == 0 and row[1] == n - 1 and row[2] == n
    # every edge endpoint resolves
    assert g.edges.where(F.col("src").isNull() | F.col("dst").isNull()).count() == 0


def test_graph_views_and_report_ops(spark):
    g = graph_from_edge_vids(spark, [(0, 1), (1, 2), (2, 0), (2, 2)])
    assert g.node_num() == 3
    assert g.has_edge(0, 1) and not g.has_edge(1, 0)
    rg = g.reversed_view()
    assert rg.has_edge(1, 0)
    und = g.to_undirected()
    assert und.edge_num() == 6  # 3 undirected edges, both directions, self-loop dropped
    sub = g.induce_subgraph(spark.createDataFrame([(0,), (1,)], "vid long"))
    assert sub.edge_num() == 1 and sub.node_num() == 2
    deg = {r["vid"]: r["degree"] for r in g.degrees("out").collect()}
    assert deg == {0: 1, 1: 1, 2: 2}


def test_skew_metrics(spark):
    g = graph_from_edge_vids(spark, [(i, 0) for i in range(1, 20)] + [(1, 2)])
    m = g.skew_metrics()
    assert m["max_in_degree"] == 19
    assert m["distinct_dst"] == 2
    assert sum(m["partition_edge_counts"].values()) == 20


def test_csv_loader_roundtrip(spark, tmp_path):
    """e-file + v-file loading with delimiter/header options (reference
    Loader parity); v-file defines the universe incl. isolated vertices,
    dangling edges are dropped."""
    from linkgraph.loader import load_graph_csv

    ef = tmp_path / "e.csv"
    ef.write_text("s;d;w\na;b;1.5\nb;c;2.0\nx;zz;9.0\n")  # zz not in v-file
    vf = tmp_path / "v.csv"
    vf.write_text("id;name\na;A\nb;B\nc;C\nx;X\niso;I\n")
    g = load_graph_csv(
        spark, str(ef), vfile=str(vf), delimiter=";", header_row=True,
        weight_field="w",
    )
    assert g.vertices.count() == 5  # iso kept
    edges = {(r["src"], r["dst"], r["weight"]) for r in g.edges.collect()}
    oid = {r["oid"]: r["vid"] for r in g.vertices.collect()}
    assert edges == {(oid["a"], oid["b"], 1.5), (oid["b"], oid["c"], 2.0)}
    # no v-file: implicit vertices from endpoints, positional fields
    ef2 = tmp_path / "e2.csv"
    ef2.write_text("a,b\nb,c\n")
    g2 = load_graph_csv(spark, str(ef2), header_row=False)
    assert g2.vertices.count() == 3 and g2.edges.count() == 2


def test_loader_uri_passthrough(spark, tmp_path):
    """Remote-protocol pass-through (reference Loader locations): an
    explicit file:// URI runs through the same generic path a remote
    scheme would; s3:// normalizes to the hadoop-aws s3a:// scheme;
    non-fs storage_options reach the CSV reader."""
    from linkgraph.loader import load_graph_csv, normalize_uri

    assert normalize_uri("s3://bucket/k/e.csv") == "s3a://bucket/k/e.csv"
    assert normalize_uri("oss://b/e.csv") == "oss://b/e.csv"
    assert normalize_uri("hdfs://nn:9000/e.csv") == "hdfs://nn:9000/e.csv"

    ef = tmp_path / "e.csv"
    ef.write_text("# a comment line\na,b\nb,c\n")
    g = load_graph_csv(
        spark,
        f"file://{ef}",
        header_row=False,
        storage_options={"comment": "#"},
    )
    assert g.vertices.count() == 3 and g.edges.count() == 2


def test_quotient_graph_contraction(spark):
    """quotient_graph: group rollup sums weights, drops intra-group edges
    by default, keeps them as self-loops when asked."""
    from pyspark.sql import functions as F

    from linkgraph.graph import graph_from_edge_vids, quotient_graph

    # groups: {0,1} -> A, {2,3} -> B; edges A->A x1, A->B x3, B->A x1
    g = graph_from_edge_vids(spark, [(0, 1), (0, 2), (0, 3), (1, 3), (2, 0)])
    labels = g.vertices.select(
        "vid", F.when(F.col("vid") < 2, "A").otherwise("B").alias("grp")
    )
    q = quotient_graph(g, labels)
    vs = {r["oid"]: r["vid"] for r in q.vertices.collect()}
    ew = {(r["src"], r["dst"]): r["weight"] for r in q.edges.collect()}
    assert set(vs) == {"A", "B"}
    assert ew == {(vs["A"], vs["B"]): 3.0, (vs["B"], vs["A"]): 1.0}

    q2 = quotient_graph(g, labels, self_loops=True)
    ew2 = {(r["src"], r["dst"]): r["weight"] for r in q2.edges.collect()}
    vs2 = {r["oid"]: r["vid"] for r in q2.vertices.collect()}
    assert ew2[(vs2["A"], vs2["A"])] == 1.0 and ew2[(vs2["A"], vs2["B"])] == 3.0

    # weighted input: weights sum, not count
    gw = g
    gw = type(g)(vertices=g.vertices,
                 edges=g.edges.withColumn("weight", F.lit(2.0)),
                 directed=g.directed)
    qw = quotient_graph(gw, labels)
    eww = {(r["src"], r["dst"]): r["weight"] for r in qw.edges.collect()}
    vsw = {r["oid"]: r["vid"] for r in qw.vertices.collect()}
    assert eww[(vsw["A"], vsw["B"])] == 6.0
    for x in (q, q2, qw):
        x.unpersist()
