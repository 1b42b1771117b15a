"""Directed triadic census (Holland–Leinhardt 16 MAN classes).

NetworkX-parity extension (networkx.triadic_census; same beyond-
reference status as scc/mis — the reference registry
coordinator/gscoordinator/builtin/app/.gs_conf.yaml stops short of
triad-level statistics, and graphscope.nx forwards this call).

Distributed formulation (the Batagelj–Mrvar 2001 subquadratic scheme,
re-expressed as joins):

1. Reduce edges to *dyads*: one row per unordered vertex pair carrying
   (forward?, backward?) bits — mutual / asym classified for free.
2. Enumerate *connected triples* (≥2 dyads among the 3 pairs) with the
   same wedge equi-join as triangle counting over the dyad graph
   (O(Σ deg²) — the standard scalable shape; hub skew handled by AQE),
   dedup on the sorted triple, left-join the three dyads back, fold the
   six direction bits into a 0–63 code and map it to its isomorphism
   class with a 64-entry literal lookup (whole-stage codegen, no UDF).
3. The two single-dyad classes come from counting corrections
   (#012 = A·(n−2) − Σ_T a(T), #102 = M·(n−2) − Σ_T m(T)) and the empty
   class from the complement #003 = C(n,3) − everything else — no
   O(n³) work anywhere.

The 64→16 table is GENERATED at import by brute-force classification
of all labeled 3-vertex digraphs and verified permutation-invariant
with the canonical orbit sizes — no transcribed magic table.

Cost bound (inherent to any exact census, not a plan artifact): the
connected-triple enumeration is Σ_v C(deg(v), 2) rows — a degree-1M
hub alone contributes 5·10¹¹ wedges. On hub-heavy corpora run the
census on an explicitly degree-capped subgraph
(``graph.induce(...)``-style pre-filter); the join itself partitions
on the wedge center so AQE splits skewed partitions, but it cannot
shrink the combinatorial output.
"""

from __future__ import annotations

from itertools import permutations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph

# dyad slots of the labeled triple (u, v, w); bit i set ⇔ directed edge
_SLOTS = [(0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1)]

TRIAD_NAMES = [
    "003", "012", "102", "021D", "021U", "021C", "111D", "111U",
    "030T", "030C", "201", "120D", "120U", "120C", "210", "300",
]


def _classify(code: int) -> str:
    E = {_SLOTS[i] for i in range(6) if code >> i & 1}
    dy = []
    for x, y in [(0, 1), (0, 2), (1, 2)]:
        f, b = (x, y) in E, (y, x) in E
        dy.append("M" if f and b else ("A" if f or b else "N"))
    m, a, n = dy.count("M"), dy.count("A"), dy.count("N")
    name = f"{m}{a}{n}"
    if name == "021":
        (s1, t1), (s2, t2) = sorted(E)
        return "021D" if s1 == s2 else ("021U" if t1 == t2 else "021C")
    if name == "030":
        outs = sorted(sum(1 for s, _ in E if s == v) for v in range(3))
        return "030C" if outs == [1, 1, 1] else "030T"
    if name == "111":
        mut = {v for s, t in E if (t, s) in E for v in (s, t)}
        asym = next((s, t) for s, t in E if (t, s) not in E)
        z = ({0, 1, 2} - mut).pop()
        # 111D: A<->B<-C (asym out of the third vertex); 111U: A<->B->C
        return "111D" if asym[0] == z else "111U"
    if name == "120":
        mut = {v for s, t in E if (t, s) in E for v in (s, t)}
        z = ({0, 1, 2} - mut).pop()
        asym = [(s, t) for s, t in E if (t, s) not in E]
        if {s for s, _ in asym} == {z}:
            return "120D"  # third vertex is a common source into the pair
        if {t for _, t in asym} == {z}:
            return "120U"
        return "120C"
    return name


def _build_table() -> list[str]:
    def recode(edges, perm):
        e2 = {(perm[a], perm[b]) for a, b in edges}
        return sum(1 << i for i, s in enumerate(_SLOTS) if s in e2)

    table = []
    for code in range(64):
        cls = _classify(code)
        edges = {_SLOTS[i] for i in range(6) if code >> i & 1}
        for p in permutations(range(3)):
            assert _classify(recode(edges, p)) == cls, (code, p)
        table.append(cls)
    from collections import Counter

    sizes = Counter(table)
    expected = {
        "003": 1, "012": 6, "102": 3, "021D": 3, "021U": 3, "021C": 6,
        "111D": 6, "111U": 6, "030T": 6, "030C": 2, "201": 3,
        "120D": 3, "120U": 3, "120C": 6, "210": 6, "300": 1,
    }
    assert dict(sizes) == expected, sizes
    return table


TRIAD_CLASS: list[str] = _build_table()


def triadic_census(graph: LinkGraph) -> DataFrame:
    """(triad_type, count) — all 16 classes, zero-filled, ordered by the
    canonical MAN sequence. Counts are BIGINT; guarded against C(n,3)
    overflow (n must stay < ~3.8M — beyond that the 003/012/102
    complement classes leave int64; the connected classes never do)."""
    e = (
        graph.edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    dy = (
        e.select(
            F.least("src", "dst").alias("lo"),
            F.greatest("src", "dst").alias("hi"),
            (F.col("src") < F.col("dst")).alias("fwd"),
        )
        .groupBy("lo", "hi")
        .agg(
            F.max(F.col("fwd").cast("int")).alias("f"),
            F.max((~F.col("fwd")).cast("int")).alias("b"),
        )
        .persist()
    )
    try:
        return _census_body(graph, dy)
    finally:
        dy.unpersist()


def _census_body(graph: LinkGraph, dy: DataFrame) -> DataFrame:
    spark = graph.edges.sparkSession
    n = graph.vertices.count()
    if n >= 3_810_000:
        raise ValueError(
            "triadic_census: C(n,3) exceeds BIGINT for n >= 3.81e6; "
            "compute the connected classes on a subgraph instead"
        )
    totals = dy.agg(
        F.sum((F.col("f") + F.col("b") == 1).cast("long")).alias("a_tot"),
        F.sum((F.col("f") + F.col("b") == 2).cast("long")).alias("m_tot"),
    ).first()
    a_tot, m_tot = int(totals["a_tot"] or 0), int(totals["m_tot"] or 0)

    adj = dy.select(F.col("lo").alias("x"), F.col("hi").alias("y")).union(
        dy.select(F.col("hi").alias("x"), F.col("lo").alias("y"))
    )
    triples = (
        adj.select("x", F.col("y").alias("p"))
        .join(adj.select("x", F.col("y").alias("q")), "x")
        .where(F.col("p") < F.col("q"))
        .select(F.array_sort(F.array("x", "p", "q")).alias("t"))
        .select(
            F.col("t")[0].alias("u"), F.col("t")[1].alias("v"), F.col("t")[2].alias("w")
        )
        .distinct()
    )

    def dyad_as(lo, hi, f, b):
        return dy.select(
            F.col("lo").alias(lo),
            F.col("hi").alias(hi),
            F.col("f").alias(f),
            F.col("b").alias(b),
        )

    coded = (
        triples.join(dyad_as("u", "v", "f_uv", "b_uv"), ["u", "v"], "left")
        .join(dyad_as("u", "w", "f_uw", "b_uw"), ["u", "w"], "left")
        .join(dyad_as("v", "w", "f_vw", "b_vw"), ["v", "w"], "left")
        .select(
            *[
                F.coalesce(c, F.lit(0)).alias(c)
                for c in ["f_uv", "b_uv", "f_uw", "b_uw", "f_vw", "b_vw"]
            ]
        )
        .select(
            (
                F.col("f_uv")
                + F.col("b_uv") * 2
                + F.col("f_uw") * 4
                + F.col("b_uw") * 8
                + F.col("f_vw") * 16
                + F.col("b_vw") * 32
            ).alias("code"),
            (
                ((F.col("f_uv") + F.col("b_uv")) == 1).cast("long")
                + ((F.col("f_uw") + F.col("b_uw")) == 1).cast("long")
                + ((F.col("f_vw") + F.col("b_vw")) == 1).cast("long")
            ).alias("a_t"),
            (
                ((F.col("f_uv") + F.col("b_uv")) == 2).cast("long")
                + ((F.col("f_uw") + F.col("b_uw")) == 2).cast("long")
                + ((F.col("f_vw") + F.col("b_vw")) == 2).cast("long")
            ).alias("m_t"),
        )
        .select(
            F.element_at(
                F.array(*[F.lit(c) for c in TRIAD_CLASS]), F.col("code") + 1
            ).alias("triad_type"),
            "a_t",
            "m_t",
        )
    )
    rows = (
        coded.groupBy("triad_type")
        .agg(F.count("*").alias("count"), F.sum("a_t").alias("sa"), F.sum("m_t").alias("sm"))
        .collect()
    )
    census = {name: 0 for name in TRIAD_NAMES}
    sum_a = sum_m = 0
    for r in rows:
        census[r["triad_type"]] = int(r["count"])
        sum_a += int(r["sa"])
        sum_m += int(r["sm"])
    census["012"] = a_tot * (n - 2) - sum_a
    census["102"] = m_tot * (n - 2) - sum_m
    census["003"] = n * (n - 1) * (n - 2) // 6 - sum(
        v for k, v in census.items() if k != "003"
    )
    return spark.createDataFrame(
        [(name, census[name]) for name in TRIAD_NAMES],
        "triad_type string, count long",
    )
