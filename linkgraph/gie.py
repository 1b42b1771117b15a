"""GIE-style Gremlin traversal subset, compiled to Catalyst plans.

The reference's interactive engine compiles Gremlin to a QueryFlow
dataflow executed by a Rust runtime
(/root/reference/interactive_engine/proto/query_flow.proto:59-157;
operators under interactive_engine/executor/runtime/src/operator/).
SURVEY.md §2.7 maps each operator category to a Spark equivalent; this
module implements that mapping as a fluent traversal over
:class:`linkgraph.property.PropertyGraph`:

- V/E source scans           → per-label DataFrame unions   (proto :66-67)
- out/in/both (+E/V forms)   → equi hash joins on the edge tables (:68-76)
- has/hasLabel               → Catalyst filters             (:86,:93)
- values/select              → projections                  (:77,:91)
- count/groupCount           → aggregations                 (:111,:85)
- dedup/order/limit          → dropDuplicates/orderBy/limit (:84,:80,:81)
- repeat(...).times(n)       → driver-side loop             (:87-88)
- withPath/path/simplePath   → array column + guards        (:95,:98)

Traversals carry **bag semantics** (duplicates preserved, as Gremlin
does) until an explicit ``dedup()``; joins preserve multiplicity, so no
extra bookkeeping is needed. ``has``/``values``/``groupCount`` on a
property drop elements whose label lacks the key (Gremlin's has()-step
behavior for absent keys). Everything stays JVM-side — the whole
traversal is one Catalyst plan; no per-row Python anywhere.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from linkgraph.property import PropertyGraph


def _union_all(parts: list[DataFrame]) -> DataFrame:
    if not parts:
        raise ValueError("empty traversal source (no matching labels)")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


@dataclass
class Traversal:
    """Immutable traversal state: a frontier DataFrame + its kind.

    Vertex frontiers have columns ``(oid, label)``; edge frontiers have
    ``(src_oid, dst_oid, label, <edge props...>)``.
    """

    pg: PropertyGraph
    df: DataFrame
    kind: str  # 'v' | 'e'
    tracked: bool = False  # vertex-path tracking on (withPath())

    def _next(self, df: DataFrame, kind: str | None = None) -> "Traversal":
        return Traversal(self.pg, df, kind or self.kind, self.tracked)

    # -- path tracking (PATH_OUT :95 / SIMPLE_PATH :98) ----------------
    def withPath(self) -> "Traversal":
        """Start tracking the vertex path (array<string> of oids, internal
        column ``__path`` so it can't collide with edge properties). Must
        be called on a vertex frontier before expansion steps; edge
        frontiers pass paths through unchanged (vertex-path semantics)."""
        self._require_v("withPath")
        df = self.df.withColumn("__path", F.array(F.col("oid")))
        return Traversal(self.pg, df, self.kind, True)

    def path(self) -> DataFrame:
        """The tracked paths, one row per traverser: ``path: array<string>``."""
        if not self.tracked:
            raise ValueError("path(): call withPath() on the source first")
        return self.df.select(F.col("__path").alias("path"))

    def simplePath(self) -> "Traversal":
        """Drop traversers whose path revisits a vertex (SIMPLE_PATH)."""
        if not self.tracked:
            raise ValueError("simplePath(): call withPath() on the source first")
        return self._next(
            self.df.where(F.size("__path") == F.size(F.array_distinct("__path")))
        )

    # -- filters ------------------------------------------------------
    def hasLabel(self, *labels: str) -> "Traversal":
        return self._next(self.df.where(F.col("label").isin(list(labels))))

    def has(self, prop: str, value) -> "Traversal":
        """Keep elements whose property matches. ``value`` may be a
        literal (equality) or a callable Column → Column predicate
        (the P.gt/P.lt analog): ``has('age', lambda c: c > 29)``."""
        pred = value if callable(value) else (lambda c: c == value)
        if self.kind == "e":
            if prop not in self.df.columns:
                return self._next(self.df.limit(0))
            return self._next(self.df.where(pred(F.col(prop))))
        joined = self._join_vprop(prop)
        return self._next(
            joined.where(pred(F.col(prop))).select("oid", "label", *self._path_cols())
        )

    # -- adjacency expansion (the traversal "joins") -------------------
    def _edge_labels(self, labels: tuple[str, ...]):
        names = labels or tuple(self.pg.e_tables)
        return [(n, self.pg.e_tables[n]) for n in names]

    def _path_cols(self) -> list:
        return [F.col("__path")] if self.tracked else []

    def _append_path(self, new_oid) -> list:
        if not self.tracked:
            return []
        return [F.concat(F.col("__path"), F.array(new_oid)).alias("__path")]

    def out(self, *labels: str) -> "Traversal":
        self._require_v("out")
        parts = [
            self.df.join(el.df.select(F.col("src_oid").alias("oid"), "dst_oid"), "oid")
            .select(
                F.col("dst_oid").alias("oid"),
                F.lit(el.dst_label).alias("label"),
                *self._append_path(F.col("dst_oid")),
            )
            for _, el in self._edge_labels(labels)
        ]
        return self._next(_union_all(parts), "v")

    def in_(self, *labels: str) -> "Traversal":
        self._require_v("in")
        parts = [
            self.df.join(el.df.select(F.col("dst_oid").alias("oid"), "src_oid"), "oid")
            .select(
                F.col("src_oid").alias("oid"),
                F.lit(el.src_label).alias("label"),
                *self._append_path(F.col("src_oid")),
            )
            for _, el in self._edge_labels(labels)
        ]
        return self._next(_union_all(parts), "v")

    def both(self, *labels: str) -> "Traversal":
        o, i = self.out(*labels), self.in_(*labels)
        return self._next(o.df.unionByName(i.df), "v")

    def outE(self, *labels: str) -> "Traversal":
        self._require_v("outE")
        parts = [
            self.df.select(F.col("oid").alias("src_oid"), *self._path_cols())
            .join(el.df, "src_oid")
            .withColumn("label", F.lit(name))
            for name, el in self._edge_labels(labels)
        ]
        return self._next(_union_all(parts), "e")

    def inE(self, *labels: str) -> "Traversal":
        self._require_v("inE")
        parts = [
            self.df.select(F.col("oid").alias("dst_oid"), *self._path_cols())
            .join(el.df, "dst_oid")
            .withColumn("label", F.lit(name))
            for name, el in self._edge_labels(labels)
        ]
        return self._next(_union_all(parts), "e")

    def inV(self) -> "Traversal":
        self._require_e("inV")
        dst_lbl = {n: el.dst_label for n, el in self.pg.e_tables.items()}
        lbl = F.element_at(
            F.create_map(*[x for n, d in dst_lbl.items() for x in (F.lit(n), F.lit(d))]),
            F.col("label"),
        )
        return self._next(
            self.df.select(
                F.col("dst_oid").alias("oid"),
                lbl.alias("label"),
                *self._append_path(F.col("dst_oid")),
            ),
            "v",
        )

    def outV(self) -> "Traversal":
        self._require_e("outV")
        src_lbl = {n: el.src_label for n, el in self.pg.e_tables.items()}
        lbl = F.element_at(
            F.create_map(*[x for n, d in src_lbl.items() for x in (F.lit(n), F.lit(d))]),
            F.col("label"),
        )
        return self._next(
            self.df.select(
                F.col("src_oid").alias("oid"),
                lbl.alias("label"),
                *self._append_path(F.col("src_oid")),
            ),
            "v",
        )

    # -- projections / aggregations ------------------------------------
    def values(self, prop: str) -> DataFrame:
        """PROP_VALUE: one column ``value`` (bag semantics preserved)."""
        if self.kind == "e":
            return self.df.select(F.col(prop).alias("value"))
        return self._join_vprop(prop).select(F.col(prop).alias("value"))

    def count(self) -> DataFrame:
        return self.df.agg(F.count("*").alias("n"))

    def groupCount(self, by: str | None = None) -> DataFrame:
        """GROUP_COUNT: (key, n). ``by`` a property name; None groups by
        the element itself (oid)."""
        if by is None:
            key = self.df.select(F.col("oid").alias("key"))
        elif self.kind == "e":
            key = self.df.select(F.col(by).alias("key"))
        else:
            key = self._join_vprop(by).select(F.col(by).alias("key"))
        return key.groupBy("key").agg(F.count("*").alias("n"))

    # -- dedup / order / limit ----------------------------------------
    def dedup(self) -> "Traversal":
        """DEDUP by element identity (oid/endpoints), not by path —
        Gremlin's dedup() compares the current element only."""
        if self.tracked:
            subset = [c for c in self.df.columns if c != "__path"]
            return self._next(self.df.dropDuplicates(subset))
        return self._next(self.df.dropDuplicates())

    def order(self, by: str | Column, ascending: bool = True) -> "Traversal":
        col = F.col(by) if isinstance(by, str) else by
        return self._next(self.df.orderBy(col.asc() if ascending else col.desc()))

    def limit(self, n: int) -> "Traversal":
        return self._next(self.df.limit(n))

    # -- iteration -----------------------------------------------------
    def repeat(self, body, times: int) -> "Traversal":
        """REPEAT_START/REPEAT with a fixed times() bound — a driver-side
        loop; each application extends the single Catalyst plan."""
        t = self
        for _ in range(times):
            t = body(t)
        return t

    # -- internals -----------------------------------------------------
    def _join_vprop(self, prop: str) -> DataFrame:
        lookup_parts = [
            df.select("oid", F.lit(lbl).alias("label"), F.col(prop))
            for lbl, df in self.pg.v_tables.items()
            if prop in df.columns
        ]
        if not lookup_parts:
            raise ValueError(f"no vertex label has property {prop!r}")
        return self.df.join(_union_all(lookup_parts), ["oid", "label"])

    def _require_v(self, step: str) -> None:
        if self.kind != "v":
            raise ValueError(f"{step}() requires a vertex frontier")

    def _require_e(self, step: str) -> None:
        if self.kind != "e":
            raise ValueError(f"{step}() requires an edge frontier")


def traversal(pg: PropertyGraph) -> "GraphTraversalSource":
    return GraphTraversalSource(pg)


@dataclass
class GraphTraversalSource:
    """``g = traversal(pg); g.V()...`` — the GraphTraversalSource analog."""

    pg: PropertyGraph

    def V(self, *labels: str) -> Traversal:
        names = labels or tuple(self.pg.v_tables)
        parts = [
            self.pg.v_tables[n].select("oid", F.lit(n).alias("label")) for n in names
        ]
        return Traversal(self.pg, _union_all(parts), "v")

    def E(self, *labels: str) -> Traversal:
        names = labels or tuple(self.pg.e_tables)
        parts = [
            self.pg.e_tables[n].df.withColumn("label", F.lit(n)) for n in names
        ]
        return Traversal(self.pg, _union_all(parts), "e")
