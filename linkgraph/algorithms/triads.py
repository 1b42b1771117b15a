"""Directed triadic census (Holland–Leinhardt 16 MAN classes).

NetworkX-parity extension (networkx.triadic_census; same beyond-
reference status as scc/mis — the reference registry
coordinator/gscoordinator/builtin/app/.gs_conf.yaml stops short of
triad-level statistics, and graphscope.nx forwards this call).

Distributed formulation (the Batagelj–Mrvar 2001 subquadratic scheme,
re-expressed as ONE streaming wedge join):

1. Reduce edges to *dyads*: one row per unordered vertex pair carrying
   (forward?, backward?) bits — mutual / asym classified for free.
2. Enumerate *connected triples* with the wedge self-join on the dyad
   graph (O(Σ deg²), the standard scalable shape), with the two
   center-incident dyads' direction bits CARRIED on the adjacency rows
   (no join needed to recover them) and only the third, opposite dyad
   looked up — against a broadcast of the dyad table when it fits
   (default ≤ `broadcast_rows`), else one shuffle join. A triple with
   c qualifying centers is generated exactly c times, and c is a
   function of the 6-bit direction code alone (3 if all three dyads
   present, else 1), so the per-code wedge counts divide exactly by
   their center multiplicity — **no triple materialization, no
   distinct, no per-triple dedup shuffle anywhere**. On the broadcast
   path the Σ deg² wedge stream never leaves its mapper: it flows
   through the hash lookup straight into a 64-group partial aggregate.
3. The two single-dyad classes come from counting corrections
   (#012 = A·(n−2) − Σ_T a(T), #102 = M·(n−2) − Σ_T m(T)) and the empty
   class from the complement #003 = C(n,3) − everything else — both now
   evaluated driver-side from the 64 per-code counts (a(T), m(T) are
   code constants) — no O(n³) work anywhere.

Hub skew: a degree-d hub contributes C(d,2) wedges from one adjacency
partition. Beyond ``salt_cap`` neighbors the hub's adjacency is split
into ⌈d/salt_cap⌉ hash buckets and the self-join key widened to
(center, bucket_i, bucket_j), spreading the hub's wedge enumeration
over C(nb+1,2) independent tasks at a replication cost of nb/2 copies
of its adjacency rows (linear in d, against the quadratic wedge term).
Bucketing is a pure function of the neighbor id, so each unordered
neighbor pair lands in exactly one bucket-pair task — counts are
unchanged (test-asserted vs the unsalted path).

The 64→16 table is GENERATED at import by brute-force classification
of all labeled 3-vertex digraphs and verified permutation-invariant
with the canonical orbit sizes — no transcribed magic table.

Cost bound (inherent to any exact census, not a plan artifact): the
wedge stream is Σ_v C(deg(v), 2) rows — a degree-1M hub alone
contributes 5·10¹¹ wedges. Salting makes that enumerable in parallel,
but cannot shrink the combinatorial term; on hub-heavy corpora where
even the parallel enumeration is too costly, run the census on an
explicitly degree-capped subgraph.
"""

from __future__ import annotations

from itertools import permutations

from pyspark.sql import Column, DataFrame
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


def _code_stats(code: int) -> tuple[int, int, int]:
    """(centers, n_asym, n_mutual) for a 6-bit direction code — all pure
    functions of the code, evaluated driver-side over ≤64 rows."""
    E = {_SLOTS[i] for i in range(6) if code >> i & 1}
    present, n_a, n_m = [], 0, 0
    for x, y in [(0, 1), (0, 2), (1, 2)]:
        f, b = (x, y) in E, (y, x) in E
        present.append(f or b)
        n_a += int(f != b)
        n_m += int(f and b)
    d_uv, d_uw, d_vw = present
    centers = int(d_uv and d_uw) + int(d_uv and d_vw) + int(d_uw and d_vw)
    return centers, n_a, n_m


def triadic_census(
    graph: LinkGraph,
    broadcast_rows: int = 4_000_000,
    salt_cap: int = 250_000,
) -> DataFrame:
    """(triad_type, count) — all 16 classes, zero-filled, ordered by the
    canonical MAN sequence. Counts are BIGINT; guarded against C(n,3)
    overflow (n must stay < ~3.8M — beyond that the 003/012/102
    complement classes leave int64; the connected classes never do).

    ``broadcast_rows``: dyad-table size up to which the third-dyad
    lookup is a broadcast hash join (the wedge stream then never
    shuffles); above it, one shuffle join on the opposite pair.
    ``salt_cap``: neighbors per (center, bucket) before a hub's
    adjacency is split for the wedge self-join (see module doc).
    """
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
        return _census_body(graph, dy, broadcast_rows, salt_cap)
    finally:
        dy.unpersist()


def _wedges(adj: DataFrame, salt_cap: int) -> DataFrame:
    """Self-join the bit-carrying adjacency on the center, hub-salted:
    output one row per connected triple per qualifying center
    (x, p, q, fop/bop, foq/boq) with p < q."""
    degs = adj.groupBy("x").agg(F.count("*").alias("dx"))
    max_deg = degs.agg(F.max("dx")).first()[0] or 0
    left = adj.select("x", F.col("y").alias("p"), F.col("fo").alias("fop"), F.col("bo").alias("bop"))
    right = adj.select("x", F.col("y").alias("q"), F.col("fo").alias("foq"), F.col("bo").alias("boq"))
    if max_deg <= salt_cap:
        return left.join(right, "x").where(F.col("p") < F.col("q"))

    nb = F.ceil(F.col("dx") / F.lit(salt_cap)).cast("int")
    adjb = adj.join(degs, "x").select(
        "x", "y", "fo", "bo", nb.alias("nb"),
        F.pmod(F.xxhash64("y"), nb).cast("int").alias("bk"),
    )
    # bucket-pair replication: the row in bucket bk plays the LEFT role
    # for partners in buckets bk..nb-1 and the RIGHT role for 0..bk;
    # every unordered neighbor pair meets in exactly one (bi, bj) task.
    lb = adjb.select(
        "x", F.col("y").alias("a"), F.col("fo").alias("foa"), F.col("bo").alias("boa"),
        F.col("bk").alias("bi"),
        F.explode(F.sequence(F.col("bk"), F.col("nb") - 1)).alias("bj"),
    )
    rb = adjb.select(
        "x", F.col("y").alias("b"), F.col("fo").alias("fob"), F.col("bo").alias("bob"),
        F.explode(F.sequence(F.lit(0), F.col("bk"))).alias("bi"),
        F.col("bk").alias("bj"),
    )
    pairs = lb.join(rb, ["x", "bi", "bj"]).where(
        (F.col("bi") < F.col("bj")) | (F.col("a") < F.col("b"))
    )
    swap = F.col("a") > F.col("b")

    def pick(t, f):
        return F.when(swap, F.col(t)).otherwise(F.col(f))

    return pairs.select(
        "x",
        pick("b", "a").alias("p"), pick("fob", "foa").alias("fop"), pick("bob", "boa").alias("bop"),
        pick("a", "b").alias("q"), pick("foa", "fob").alias("foq"), pick("boa", "bob").alias("boq"),
    )


def _census_body(
    graph: LinkGraph, dy: DataFrame, broadcast_rows: int, salt_cap: int
) -> DataFrame:
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
        F.count("*").alias("n_dy"),
        F.min("lo").alias("min_v"),
        F.max("hi").alias("max_v"),
    ).first()
    a_tot, m_tot = int(totals["a_tot"] or 0), int(totals["m_tot"] or 0)
    n_dy = int(totals["n_dy"] or 0)
    # 32-bit vid spaces let the opposite-dyad lookup key pack into ONE
    # long (lo<<32 | hi) — Spark then builds a LongHashedRelation, whose
    # probes are several times cheaper than a 2-column unsafe-row key;
    # at Σ deg² probes that is the hot loop. (Same full-value-range
    # gating discipline as csr.py's int32 compaction.)
    packable = totals["max_v"] is not None and 0 <= int(totals["min_v"]) and int(
        totals["max_v"]
    ) < 2**31

    # adjacency with the incident dyad's bits oriented FROM the center:
    # fo = (x -> y exists), bo = (y -> x exists).
    adj = dy.select(
        F.col("lo").alias("x"), F.col("hi").alias("y"),
        F.col("f").alias("fo"), F.col("b").alias("bo"),
    ).union(
        dy.select(
            F.col("hi").alias("x"), F.col("lo").alias("y"),
            F.col("b").alias("fo"), F.col("f").alias("bo"),
        )
    )
    wedges = _wedges(adj, salt_cap)

    # third (opposite) dyad lookup: p < q always, so its (lo, hi) = (p, q)
    if packable:
        third = dy.select(
            (F.shiftleft(F.col("lo").cast("long"), 32) + F.col("hi")).alias("pq"),
            F.col("f").alias("fpq"), F.col("b").alias("bpq"),
        )
        wedges = wedges.withColumn(
            "pq", F.shiftleft(F.col("p").cast("long"), 32) + F.col("q")
        )
        join_key = ["pq"]
    else:
        third = dy.select(
            F.col("lo").alias("p"), F.col("hi").alias("q"),
            F.col("f").alias("fpq"), F.col("b").alias("bpq"),
        )
        join_key = ["p", "q"]
    if n_dy <= broadcast_rows:
        third = F.broadcast(third)
    w = wedges.join(third, join_key, "left").select(
        "x", "p", "q", "fop", "bop", "foq", "boq",
        F.coalesce("fpq", F.lit(0)).alias("fpq"),
        F.coalesce("bpq", F.lit(0)).alias("bpq"),
    )

    # fold the six bits into the canonical code of the SORTED triple
    # (u,v,w): slot weights f_uv=1 b_uv=2 f_uw=4 b_uw=8 f_vw=16 b_vw=32.
    def code_of(f_uv: Column, b_uv: Column, f_uw: Column, b_uw: Column,
                f_vw: Column, b_vw: Column) -> Column:
        return f_uv + b_uv * 2 + f_uw * 4 + b_uw * 8 + f_vw * 16 + b_vw * 32

    c = F.col
    code = (
        # x < p < q → (u,v,w) = (x,p,q)
        F.when(c("x") < c("p"), code_of(c("fop"), c("bop"), c("foq"), c("boq"), c("fpq"), c("bpq")))
        # p < x < q → (u,v,w) = (p,x,q): (u,v)=(p,x) is the p-dyad seen from p
        .when(c("x") < c("q"), code_of(c("bop"), c("fop"), c("fpq"), c("bpq"), c("foq"), c("boq")))
        # p < q < x → (u,v,w) = (p,q,x)
        .otherwise(code_of(c("fpq"), c("bpq"), c("bop"), c("fop"), c("boq"), c("foq")))
    )
    rows = w.select(code.alias("code")).groupBy("code").count().collect()

    census = {name: 0 for name in TRIAD_NAMES}
    sum_a = sum_m = 0
    for r in rows:
        code_v, gen = int(r["code"]), int(r["count"])
        centers, n_a, n_m = _code_stats(code_v)
        if centers == 0 or gen % centers:
            raise AssertionError(
                f"triadic_census: code {code_v} generated {gen} wedges, "
                f"not divisible by its {centers} centers"
            )
        cnt = gen // centers
        census[TRIAD_CLASS[code_v]] += cnt
        sum_a += n_a * cnt
        sum_m += n_m * cnt
    census["012"] = a_tot * (n - 2) - sum_a
    census["102"] = m_tot * (n - 2) - sum_m
    census["003"] = n * (n - 1) * (n - 2) // 6 - sum(
        v for k, v in census.items() if k != "003"
    )
    return spark.createDataFrame(
        [(name, census[name]) for name in TRIAD_NAMES],
        "triad_type string, count long",
    )
