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
- bothE/otherV/bothV         → union + came-from column     (:75,:114,:76)
- has/hasLabel/not_          → Catalyst filters / anti-join (:86,:93,:113)
- values/select              → projections                  (:77,:91)
- valueMap/properties        → map column / exploded rows   (:99,:126)
- sum_/max_/min_/mean/fold   → global aggregates            (:115,:120-121,:103)
- range_                     → offset+limit                 (:81)
- as_/select_/select         → tag columns carried on the frontier (:77,:89)
- where                      → cross-step Catalyst filter   (:90)
- union(...)                 → branch traversals + unionByName (:83)
- count/groupCount           → aggregations                 (:111,:85)
- group().by(k).by(agg)      → group_by keyed aggregation   (:107,:115-123)
- sample                     → deterministic hash top-n     (:141)
- choose(P, t, f)            → predicate-routed branches    (:82,:143)
- withSack/sackBy/sack       → per-traverser scratch column (:106)
- dedup/order/limit          → dropDuplicates/orderBy/limit (:84,:80,:81)
- repeat(...).times(n)/until(...)/emit() → driver-side loop (:87-88)
- withPath/path/simplePath   → array column + guards        (:95,:98)
- subgraph()                 → LinkGraph sink (GIE→GAE pipeline, :146-147)
- cache()                    → persist() hint               (:149)
- optional(t)                → choose(t, t, identity) sugar (OptionalTreeNode)
- coalesce(t1, t2, ...)      → first-match semi/anti cascade (CaseWhenTreeNode)
- and_/or_(t1, ...)          → existential semi-join conj/disj (And/OrTreeNode)
- project(...).by(...)       → struct projection + local counts (ProjectTreeNode)
- page_rank/connected_component/label_propagation steps
                             → subgraph()→GAE sugar (PageRankVertexProgramTreeNode
                               et al. under compiler/.../tree/)
- math_(expr, by)            → Catalyst arithmetic expr     (:150)
- unfold/order_local/range_local → explode/sort_array/slice (:94,:105,:104)
- binary JOIN family (:79,:97,:112,:136,:151,:153) — the runtime's
  internal join ops; here every cross-branch construct (match, union,
  choose, not_, where-on-tags) already lowers to Catalyst equi/anti
  joins, so no separate surface exists to expose.
- DFS_SOURCE/DFS_REPEAT/DFS_FINISH (:138-140) — the runtime's internal
  DFS pattern scheduler; depth-first *semantics* are covered by
  linkgraph.algorithms.dfs, and Catalyst schedules pattern joins itself.
- WRITE_ODPS (:127) — proprietary sink, intentionally not implemented.

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

from linkgraph.graph import LinkGraph, assign_dense_ids
from linkgraph.property import PropertyGraph


def tag(name: str) -> Column:
    """Column reference to an ``as_(name)`` step label, for ``where``:
    ``t.where(F.col('oid') != tag('a'))`` — the WHERE cross-step
    predicate (query_flow.proto:90)."""
    return F.col(f"__as_{name}")


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
    # named side-effect collections (aggregate()/store(), read by cap())
    side_effects: dict | None = None

    def _next(self, df: DataFrame, kind: str | None = None) -> "Traversal":
        return Traversal(
            self.pg, df, kind or self.kind, self.tracked, self.side_effects
        )

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

    def _tag_cols(self) -> list:
        """``as_()`` tag + sack columns carried through every expansion."""
        return [
            F.col(c)
            for c in self.df.columns
            if c.startswith("__as_") or c == "__sack"
        ]

    def _path_cols(self) -> list:
        cols = [F.col("__path")] if self.tracked else []
        return cols + self._tag_cols()

    def _append_path(self, new_oid) -> list:
        if not self.tracked:
            return self._tag_cols()
        return [F.concat(F.col("__path"), F.array(new_oid)).alias("__path")] + self._tag_cols()

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

    def valueMap(self, *props: str) -> DataFrame:
        """PROP_MAP_VALUE (query_flow.proto:99): one row per traverser with
        ``(oid, vmap: map<string,string>)`` — values cast to string so
        heterogeneous property types fit one Catalyst map column (the
        runtime's PropertyMap is similarly type-erased). No args → every
        property the element's label defines."""
        if self.kind == "e":
            keys = list(props) or [
                c for c in self.df.columns
                if c not in ("src_oid", "dst_oid", "label") and not c.startswith("__")
            ]
            m = F.create_map(*[x for k in keys for x in (F.lit(k), F.col(k).cast("string"))])
            return self.df.select(
                F.concat_ws("->", "src_oid", "dst_oid").alias("oid"), m.alias("vmap")
            )
        parts = []
        for lbl, vt in self.pg.v_tables.items():
            keys = [p for p in (props or vt.columns) if p != "oid" and p in vt.columns]
            m = F.create_map(*[x for k in keys for x in (F.lit(k), F.col(k).cast("string"))])
            parts.append(
                self.df.where(F.col("label") == lbl).join(vt, "oid").select("oid", m.alias("vmap"))
            )
        return _union_all(parts)

    def properties(self, *props: str) -> DataFrame:
        """PROPERTIES (:126): flatten to ``(oid, key, value)`` rows, one per
        present property (bag semantics; absent keys emit no row, as the
        runtime's property iterator does)."""
        vm = self.valueMap(*props)
        return vm.select("oid", F.explode("vmap").alias("key", "value"))

    def count(self) -> DataFrame:
        return self.df.agg(F.count("*").alias("n"))

    def sum_(self, prop: str) -> DataFrame:
        """SUM (:115): global fold of a property — 1-row ``value``."""
        return self.values(prop).agg(F.sum("value").alias("value"))

    def max_(self, prop: str) -> DataFrame:
        """MAX (:120)."""
        return self.values(prop).agg(F.max("value").alias("value"))

    def min_(self, prop: str) -> DataFrame:
        """MIN (:121)."""
        return self.values(prop).agg(F.min("value").alias("value"))

    def mean(self, prop: str) -> DataFrame:
        """Gremlin mean() (FOLDMAP-family :125): global average."""
        return self.values(prop).agg(F.avg("value").alias("value"))

    def fold(self, prop: str | None = None) -> DataFrame:
        """FOLD (:103): collect the stream into one array row (column
        ``value``). ``prop=None`` folds vertex oids; else that property.
        Sorted — Gremlin's list order is stream order, undefined across
        partitions, so we pin the deterministic one."""
        if prop is None:
            self._require_v("fold")
            vals = self.df.select(F.col("oid").alias("value"))
        else:
            vals = self.values(prop)
        return vals.agg(F.array_sort(F.collect_list("value")).alias("value"))

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

    # -- step labels: as_/select (SELECT :77 / SELECT_ONE :89) ---------
    def as_(self, name: str) -> "Traversal":
        """Tag the current vertex frontier; later steps can jump back with
        ``select_`` or reference it in ``where`` via :func:`tag`."""
        self._require_v("as_")
        df = self.df.withColumn(f"__as_{name}", F.col("oid")).withColumn(
            f"__as_{name}_lbl", F.col("label")
        )
        return self._next(df)

    def select_(self, name: str) -> "Traversal":
        """SELECT_ONE: continue the traversal from the tagged vertex
        (multiplicity of the current frontier is preserved — each
        traverser jumps back to *its* tagged element)."""
        col = f"__as_{name}"
        if col not in self.df.columns:
            raise ValueError(f"select_({name!r}): no as_({name!r}) upstream")
        keep = [
            c
            for c in self.df.columns
            if c.startswith("__as_") or c in ("__path", "__sack")
        ]
        df = self.df.select(
            F.col(col).alias("oid"), F.col(f"{col}_lbl").alias("label"),
            *[F.col(c) for c in keep],
        )
        return self._next(df, "v")

    def select(self, *names: str) -> DataFrame:
        """SELECT: one output column per step label (tagged oids)."""
        cols = []
        for n in names:
            c = f"__as_{n}"
            if c not in self.df.columns:
                raise ValueError(f"select({n!r}): no as_({n!r}) upstream")
            cols.append(F.col(c).alias(n))
        return self.df.select(*cols)

    def where(self, cond) -> "Traversal":
        """WHERE (:90): cross-step predicate. ``cond`` is a Column (use
        :func:`tag` to reference as_ labels) or a callable df → Column."""
        c = cond(self.df) if callable(cond) else cond
        return self._next(self.df.where(c))

    # -- match (conjunctive pattern join) -------------------------------
    def match(self, *patterns) -> "Traversal":
        """Gremlin ``match()``: conjunctive graph-pattern matching. Each
        pattern is ``(start_tag, body, end_tag)`` — the analog of
        ``__.as_(start).<body>.as_(end)``. Patterns are solved left to
        right (the reference's runtime also serializes match traversers
        through its join operators, query_flow.proto:136 JOIN_*): the
        first pattern binds the incoming frontier to its start tag; a
        pattern whose end tag is already bound becomes an equality filter
        (a join constraint) instead of a new binding. The result frontier
        carries every binding — read them out with ``select(*tags)``.

        Compiles to a chain of equi hash joins + filters in ONE Catalyst
        plan; with bindings riding the frontier as columns there is no
        per-pattern materialization, so Catalyst/AQE reorders and
        broadcast-converts the joins exactly as it would for hand-written
        SQL. Example::

            g.V('customer').match(
                ('c', lambda t: t.out('placed'),   'o'),
                ('o', lambda t: t.out('contains'), 'p'),
            ).select('c', 'p')
        """
        if not patterns:
            raise ValueError("match(): need at least one pattern")
        t = self
        first_start = patterns[0][0]
        if f"__as_{first_start}" not in t.df.columns:
            t = t.as_(first_start)
        for start, body, end in patterns:
            if f"__as_{start}" not in t.df.columns:
                raise ValueError(
                    f"match(): start tag {start!r} unbound — order patterns so "
                    "each starts from a bound tag"
                )
            t = body(t.select_(start))
            if f"__as_{end}" in t.df.columns:
                t = t.where(F.col("oid") == tag(end))
            else:
                t = t.as_(end)
        return t

    # -- union (:83) ---------------------------------------------------
    def union(self, *branches) -> "Traversal":
        """UNION: apply each branch traversal to this frontier and merge
        the results (bag semantics). All branches must end in the same
        frontier kind."""
        outs = [b(self) for b in branches]
        kinds = {t.kind for t in outs}
        if len(kinds) != 1:
            raise ValueError(f"union(): branches end in mixed kinds {kinds}")
        dfs = [t.df for t in outs]
        merged = dfs[0]
        for d in dfs[1:]:
            merged = merged.unionByName(d, allowMissingColumns=True)
        out = self._next(merged, outs[0].kind)
        out.tracked = all(t.tracked for t in outs)
        return out

    # -- branch (BRANCH :82 / BRANCH_OPTION :143) ----------------------
    def branch(self, selector, options: dict, none=None) -> "Traversal":
        """General BRANCH — BranchTreeNode.java (interactive_engine/
        compiler/.../tree/) over the runtime's BRANCH + BRANCH_OPTION
        operator pair (query_flow.proto:82,:143): compute a per-traverser
        token with ``selector`` and route the traverser to the option
        whose key equals it; ``none`` (Gremlin's Pick.none) catches
        unmatched traversers, and traversers matching nothing are
        dropped. ``selector`` is a property key (string), a Column, or a
        callable df → Column; tokens compare on their string form (the
        runtime's PropertyMap is likewise type-erased). A NULL token —
        e.g. a vertex label lacking the property — routes to ``none``.
        Lowering: one filter per option over the shared token-extended
        subplan + unionByName; still a single Catalyst plan."""
        if isinstance(selector, str):
            if self.kind == "v":
                base = self._join_vprop(selector).select(
                    "oid",
                    "label",
                    *self._path_cols(),
                    F.col(selector).cast("string").alias("__branch_tok"),
                )
            else:
                if selector not in self.df.columns:
                    raise ValueError(f"branch(): edge property {selector!r} unknown")
                base = self.df.withColumn(
                    "__branch_tok", F.col(selector).cast("string")
                )
        else:
            c = selector(self.df) if callable(selector) else selector
            base = self.df.withColumn("__branch_tok", c.cast("string"))
        outs: list[Traversal] = []
        keys = [str(k) for k in options]
        for k, br in options.items():
            sub = base.where(F.col("__branch_tok") == str(k)).drop("__branch_tok")
            outs.append(br(self._next(sub)))
        if none is not None:
            unmatched = base.where(
                ~F.coalesce(F.col("__branch_tok").isin(keys), F.lit(False))
            ).drop("__branch_tok")
            outs.append(none(self._next(unmatched)))
        kinds = {t.kind for t in outs}
        if len(kinds) != 1:
            raise ValueError(f"branch(): options end in mixed kinds {kinds}")
        merged = outs[0].df
        for t in outs[1:]:
            merged = merged.unionByName(t.df, allowMissingColumns=True)
        out = self._next(merged, outs[0].kind)
        out.tracked = all(t.tracked for t in outs)
        return out

    def choose(self, predicate, true_branch, false_branch=None) -> "Traversal":
        """choose(): route each traverser into exactly one branch by a
        per-traverser predicate (Gremlin's choose(P, t, f); the runtime's
        BRANCH operator with two BRANCH_OPTIONs). ``predicate`` is a
        Column or a callable df → Column; a NULL predicate (e.g. a
        missing property) routes to the false branch, as Gremlin's
        filter-failure does. ``false_branch=None`` passes non-matching
        traversers through unchanged. Both branch outputs must end in the
        same frontier kind; the result is their bag union — still one
        Catalyst plan (two filters over a shared subplan + unionByName).
        """
        c = predicate(self.df) if callable(predicate) else predicate
        c = F.coalesce(c, F.lit(False))
        t_out = true_branch(self._next(self.df.where(c)))
        f_in = self._next(self.df.where(~c))
        f_out = false_branch(f_in) if false_branch is not None else f_in
        if t_out.kind != f_out.kind:
            raise ValueError(
                f"choose(): branches end in mixed kinds ({t_out.kind!r} vs {f_out.kind!r})"
            )
        merged = t_out.df.unionByName(f_out.df, allowMissingColumns=True)
        out = self._next(merged, t_out.kind)
        out.tracked = t_out.tracked and f_out.tracked
        return out

    def choose_traversal(self, predicate, true_branch, false_branch=None) -> "Traversal":
        """Gremlin's native ``choose(traversal, t, f)`` form: the
        predicate is an existential sub-traversal (≥1 result routes the
        traverser to the true branch). Routing = one :meth:`filter_`
        semi-join and one :meth:`not_` anti-join over the shared deduped
        predicate result, then the same bag-union merge as
        :meth:`choose`."""
        t_out = true_branch(self.filter_(predicate))
        f_in = self.not_(predicate)
        f_out = false_branch(f_in) if false_branch is not None else f_in
        if t_out.kind != f_out.kind:
            raise ValueError(
                f"choose(): branches end in mixed kinds ({t_out.kind!r} vs {f_out.kind!r})"
            )
        merged = t_out.df.unionByName(f_out.df, allowMissingColumns=True)
        out = self._next(merged, t_out.kind)
        out.tracked = t_out.tracked and f_out.tracked
        return out

    def optional(self, branch) -> "Traversal":
        """OPTIONAL — reference tree node OptionalTreeNode.java
        (interactive_engine/compiler/src/main/java/com/alibaba/maxgraph/
        compiler/tree/): emit the branch's results for traversers whose
        branch yields ≥1 result, the incoming traverser unchanged
        otherwise — Gremlin's ``optional(t)`` ≡ ``choose(t, t,
        identity)``. Lowers to the choose_traversal pair of identity-
        keyed semi/anti hash joins over the shared deduped element set;
        still one Catalyst plan."""
        return self.choose_traversal(branch, branch, None)

    def coalesce(self, *branches) -> "Traversal":
        """COALESCE — CaseWhenTreeNode.java-family branch routing: per
        traverser, emit the results of the FIRST branch that yields
        any; traversers where every branch is empty are dropped.
        Lowering: a cascade of existential semi/anti joins — branch i
        runs over the residue that failed branches 0..i-1, each over
        the residue's deduped element set."""
        if not branches:
            raise ValueError("coalesce(): needs at least one branch")
        outs: list[Traversal] = []
        remaining = self
        for b in branches:
            outs.append(b(remaining.filter_(b)))
            remaining = remaining.not_(b)
        kinds = {t.kind for t in outs}
        if len(kinds) != 1:
            raise ValueError(f"coalesce(): branches end in mixed kinds {kinds}")
        merged = outs[0].df
        for t in outs[1:]:
            merged = merged.unionByName(t.df, allowMissingColumns=True)
        out = self._next(merged, outs[0].kind)
        out.tracked = all(t.tracked for t in outs)
        return out

    def and_(self, *branches) -> "Traversal":
        """AND — AndTreeNode.java: keep traversers for which EVERY
        sub-traversal yields ≥1 result. A chain of existential
        semi-joins (filter_), each over the deduped element set."""
        if not branches:
            raise ValueError("and_(): needs at least one branch")
        t = self
        for b in branches:
            t = t.filter_(b)
        return t

    def or_(self, *branches) -> "Traversal":
        """OR — OrTreeNode.java: keep traversers for which ANY
        sub-traversal yields ≥1 result. All branches run once over the
        SHARED deduped element set; survivor keys union (deduped) and
        one left-semi hash join restores the frontier's bag
        multiplicity."""
        if not branches:
            raise ValueError("or_(): needs at least one branch")
        self._require_v("or_")
        src = (
            self.df.select("oid", "label")
            .dropDuplicates(["oid", "label"])
            .withColumn("__as___or", F.col("oid"))
            .withColumn("__as___or_lbl", F.col("label"))
        )
        produced = [
            b(Traversal(self.pg, src, "v", False)).df.select(
                F.col("__as___or").alias("oid"),
                F.col("__as___or_lbl").alias("label"),
            )
            for b in branches
        ]
        keys = produced[0]
        for p in produced[1:]:
            keys = keys.union(p)
        keys = keys.dropDuplicates(["oid", "label"])
        return self._next(self.df.join(keys, ["oid", "label"], "left_semi"))

    def project(self, **by) -> DataFrame:
        """PROJECT — ProjectTreeNode-family struct projection: one
        output row per traverser, one column per keyword (terminal
        step). Each spec is a property name (per-label lookup join,
        absent → NULL — project is not a filter), a Catalyst Column
        over the frontier, or a callable sub-traversal whose
        per-element RESULT COUNT becomes the value (the
        ``project('x').by(out().count())`` local-count form). Counts
        reuse the identity-keyed dedup shape of not_() so a
        high-multiplicity bag runs each branch once per distinct
        element."""
        self._require_v("project")
        if not by:
            raise ValueError("project(): needs at least one name=spec pair")
        df = self.df
        for name, spec in by.items():
            if isinstance(spec, Column):
                df = df.withColumn(name, spec)
            elif callable(spec):
                src = (
                    self.df.select("oid", "label")
                    .dropDuplicates(["oid", "label"])
                    .withColumn("__as___prj", F.col("oid"))
                    .withColumn("__as___prj_lbl", F.col("label"))
                )
                cnt = (
                    spec(Traversal(self.pg, src, "v", False))
                    .df.groupBy(
                        F.col("__as___prj").alias("oid"),
                        F.col("__as___prj_lbl").alias("label"),
                    )
                    .agg(F.count("*").alias(name))
                )
                df = df.join(cnt, ["oid", "label"], "left").withColumn(
                    name, F.coalesce(F.col(name), F.lit(0))
                )
            else:
                lookup_parts = [
                    vt.select(
                        "oid", F.lit(lbl).alias("label"), F.col(spec).alias(name)
                    )
                    for lbl, vt in self.pg.v_tables.items()
                    if spec in vt.columns
                ]
                if not lookup_parts:
                    raise ValueError(
                        f"project(): no vertex label has property {spec!r}"
                    )
                df = df.join(_union_all(lookup_parts), ["oid", "label"], "left")
        return df.select(*by.keys())

    # -- sack (per-traverser scratch value; SACK_OUT :106) -------------
    def withSack(self, init) -> "Traversal":
        """Attach a per-traverser sack (Gremlin withSack): ``init`` is a
        literal or a Column over the current frontier. The sack rides the
        frontier as a plain Catalyst column through every expansion —
        zero extra shuffles."""
        col = init if isinstance(init, Column) else F.lit(init)
        return self._next(self.df.withColumn("__sack", col))

    def sackBy(self, prop: str, op: str = "sum") -> "Traversal":
        """Merge a property of the current element into the sack
        (sack(Operator.X).by(prop)): ``op`` ∈ {sum, mult, min, max,
        assign}. Properties resolve as in has(): edge columns on an edge
        frontier, per-label vertex property joins on a vertex frontier —
        e.g. ``withSack(0.0).outE().sackBy('weight').inV()`` accumulates
        path cost."""
        if "__sack" not in self.df.columns:
            raise ValueError("sackBy(): call withSack() first")
        ops = {
            "sum": lambda s, v: s + v,
            "mult": lambda s, v: s * v,
            "min": F.least,
            "max": F.greatest,
            "assign": lambda s, v: v,
        }
        if op not in ops:
            raise ValueError(f"sackBy: unknown op {op!r} (use {sorted(ops)})")
        if self.kind == "e":
            if prop not in self.df.columns:
                raise ValueError(f"sackBy({prop!r}): not an edge property")
            df = self.df
        else:
            df = self._join_vprop(prop).select(
                "oid", "label", F.col(prop), *self._path_cols()
            )
        merged = ops[op](F.col("__sack"), F.col(prop))
        out = df.withColumn("__sack", merged)
        if self.kind == "v":
            out = out.drop(prop)
        return self._next(out)

    def sack(self, by: str | None = None, agg: str = "sum") -> DataFrame:
        """SACK_OUT: emit the sack value. ``by=None`` gives one row per
        traverser (column ``value``); ``by=key`` gives the Gremlin
        ``group().by(key).by(sack().agg())`` form — a keyed (key, value)
        DataFrame, with the key resolving like group_by()."""
        if "__sack" not in self.df.columns:
            raise ValueError("sack(): call withSack() first")
        if by is None:
            return self.df.select(F.col("__sack").alias("value"))
        return self.group_by(by, agg, "__sack")

    # -- keyed aggregation (GROUP :107, SUM/MAX/MIN/COUNT by key :115-123)
    def group_by(self, key: str, agg: str = "count", value: str | None = None) -> DataFrame:
        """group().by(key).by(agg(value)) → (key, value) DataFrame.

        ``agg`` ∈ {count, sum, min, max, avg}; ``value`` names the
        aggregated property (unused for count). Properties resolve like
        has()/values(): edge columns on an edge frontier, per-label
        vertex property joins on a vertex frontier.
        """
        aggs = {"count": F.count, "sum": F.sum, "min": F.min, "max": F.max, "avg": F.avg}
        if agg not in aggs:
            raise ValueError(f"group_by: unknown agg {agg!r} (use {sorted(aggs)})")
        if agg != "count" and value is None:
            raise ValueError(f"group_by: agg {agg!r} needs a value property")
        need = [key] + ([value] if value and value != key else [])
        if self.kind == "e":
            df = self.df
        else:
            df = self.df
            for prop in need:
                if prop not in df.columns:
                    t = Traversal(self.pg, df, "v", self.tracked)
                    df = t._join_vprop(prop)
        expr = F.count("*") if agg == "count" else aggs[agg](F.col(value))
        return df.groupBy(F.col(key).alias("key")).agg(expr.alias("value"))

    # -- sample (:141) -------------------------------------------------
    def sample(self, n: int, seed: int = 42) -> "Traversal":
        """Deterministic hash-sample of ``n`` traversers: order by
        md5(seed ‖ element identity), take n. Engine-portable (the
        DuckDB oracle replays the same ranking) and scale-safe (TakeOrdered
        keeps n rows per partition, never a global sort)."""
        ident = (
            [F.col("oid")] if self.kind == "v" else [F.col("src_oid"), F.col("dst_oid"), F.col("label")]
        )
        rank = F.md5(F.concat_ws("|", F.lit(str(seed)), *ident))
        return self._next(
            self.df.withColumn("__rk", rank).orderBy("__rk").limit(n).drop("__rk")
        )

    # -- bothE / otherV (:75, :114) ------------------------------------
    def bothE(self, *labels: str) -> "Traversal":
        """Incident edges in either direction; remembers the visited
        endpoint so ``otherV`` can leave through the opposite one."""
        self._require_v("bothE")
        o = self.outE(*labels)
        i = self.inE(*labels)
        odf = o.df.withColumn("__from", F.col("src_oid"))
        idf = i.df.withColumn("__from", F.col("dst_oid"))
        return self._next(odf.unionByName(idf, allowMissingColumns=True), "e")

    def bothV(self) -> "Traversal":
        """BOTH_V (:76): both endpoints of each edge — two traversers per
        edge, bag semantics (a self-loop yields its vertex twice)."""
        self._require_e("bothV")
        return self._next(
            self.outV().df.unionByName(self.inV().df, allowMissingColumns=True), "v"
        )

    def otherV(self) -> "Traversal":
        """OTHER_V: the endpoint the traverser did *not* arrive from."""
        self._require_e("otherV")
        if "__from" not in self.df.columns:
            raise ValueError("otherV(): use after bothE() (direction is known "
                             "after outE/inE — use inV()/outV() there)")
        src_lbl = {n: el.src_label for n, el in self.pg.e_tables.items()}
        dst_lbl = {n: el.dst_label for n, el in self.pg.e_tables.items()}

        def _lblmap(m):
            return F.element_at(
                F.create_map(*[x for k, v in m.items() for x in (F.lit(k), F.lit(v))]),
                F.col("label"),
            )

        came_from_src = F.col("__from") == F.col("src_oid")
        oid = F.when(came_from_src, F.col("dst_oid")).otherwise(F.col("src_oid"))
        lbl = F.when(came_from_src, _lblmap(dst_lbl)).otherwise(_lblmap(src_lbl))
        return self._next(
            self.df.select(oid.alias("oid"), lbl.alias("label"), *self._append_path(oid)),
            "v",
        )

    # -- subgraph sink (:146-147) — the GIE→GAE pipeline ---------------
    def subgraph(self, partitions: int | None = None) -> LinkGraph:
        """Materialize the traversed edges as a :class:`LinkGraph` so GAE
        analytics (pagerank/kcore/triangles/...) run on the traversal
        result — the reference's flagship gremlin → subgraph → analytics
        story (/root/reference/README.md:93-100; minitest
        test/test_min.py:76-110). Call on an edge frontier; duplicate
        traversed edges collapse (a subgraph is a set of edges)."""
        self._require_e("subgraph")
        e_oid = self.df.select("src_oid", "dst_oid").distinct()
        oids = (
            e_oid.select(F.col("src_oid").alias("oid"))
            .union(e_oid.select(F.col("dst_oid").alias("oid")))
            .distinct()
        )
        vmap = assign_dense_ids(oids, partitions=partitions)
        e = (
            e_oid.join(vmap.select(F.col("oid").alias("src_oid"), F.col("vid").alias("src")), "src_oid")
            .join(vmap.select(F.col("oid").alias("dst_oid"), F.col("vid").alias("dst")), "dst_oid")
            .select("src", "dst")
        )
        g = LinkGraph(vertices=vmap, edges=e)
        g._cached = [vmap]  # assign_dense_ids pins it; g.unpersist() frees it
        return g

    # -- traversal-embedded vertex programs -----------------------------
    # Gremlin's pageRank()/connectedComponent()/peerPressure() steps — the
    # reference compiles them as tree nodes wrapping the analytical
    # engine (PageRankVertexProgramTreeNode.java / ConnectedComponent- /
    # LpaVertexProgramTreeNode.java under interactive_engine/compiler/
    # .../tree/). Here each is pure sugar over the existing
    # subgraph()→GAE pipeline: materialize the traversed edges as a
    # LinkGraph, run the algorithm, translate dense vids back to oids.
    # Must be called on an edge frontier (the edges define the program's
    # graph, exactly like subgraph()).

    def _subgraph_result(self, values: DataFrame, g: LinkGraph) -> DataFrame:
        out = values.join(g.vertices, "vid").select("oid", "value")
        # result is lazily consumed by the caller; localCheckpoint would
        # fight the session's plan-length cap less, but the vmap cache is
        # tiny and freed with g — keep ownership with the caller via g.
        return out

    def page_rank(
        self,
        alpha: float = 0.85,
        times: int | None = None,
        tol: float = 1e-06,
        max_iter: int = 100,
    ) -> DataFrame:
        """pageRank() step → (oid, value). ``times`` set runs the
        fixed-round LDBC kernel (Gremlin's with(PageRank.times, n));
        otherwise the L1-converged NetworkX kernel."""
        from linkgraph.algorithms import pagerank, pagerank_nx

        g = self.subgraph()
        if times is not None:
            r = pagerank(g, delta=alpha, max_round=times)
        else:
            r = pagerank_nx(g, alpha=alpha, max_iter=max_iter, tol=tol)
        return self._subgraph_result(r, g)

    def connected_component(self) -> DataFrame:
        """connectedComponent() step → (oid, component_oid): WCC over the
        traversed edges; the component label is translated back to the
        oid of its representative (the dense-min vid, i.e. the
        lexicographically smallest member oid — assign_dense_ids ranks by
        oid)."""
        from linkgraph.algorithms import wcc

        g = self.subgraph()
        comp = wcc(g)
        rep = g.vertices.select(
            F.col("vid").alias("value"), F.col("oid").alias("component_oid")
        )
        return (
            comp.join(g.vertices, "vid")
            .join(rep, "value")
            .select("oid", "component_oid")
        )

    def label_propagation(self, times: int = 10) -> DataFrame:
        """peerPressure()/label-propagation step → (oid, label_oid):
        fixed-round CDLP over the traversed edges, final labels
        translated back to their vertex oids. CDLP's dynamics depend
        only on label equality and order, and dense ids preserve oid
        order, so the result is remap-invariant for order-isomorphic
        oid encodings."""
        from linkgraph.algorithms import cdlp

        g = self.subgraph()
        lab = cdlp(g, max_round=times)
        rep = g.vertices.select(
            F.col("vid").alias("value"), F.col("oid").alias("label_oid")
        )
        return (
            lab.join(g.vertices, "vid").join(rep, "value").select("oid", "label_oid")
        )

    def peer_pressure(self, times: int = 10) -> DataFrame:
        """peerPressure() step (PeerPressureVertexProgramTreeNode.java →
        PROGRAM_GRAPH_PEERPRESSURE): TinkerPop peer-pressure clustering
        over the traversed edges → (oid, cluster_oid). Unit vote
        strength; energy ties pinned to the smallest cluster id (the
        engine's deterministic stand-in for TinkerPop's hash-order
        pick — see linkgraph.algorithms.peer_pressure). Cluster ids
        translate back to the oid of the cluster's representative
        vertex. Distinct from :meth:`label_propagation`: the vertex's
        own current cluster votes too, which damps oscillation on
        bipartite-ish regions."""
        from linkgraph.algorithms import peer_pressure

        g = self.subgraph()
        pp = peer_pressure(g, times=times)
        rep = g.vertices.select(
            F.col("vid").alias("cluster"), F.col("oid").alias("cluster_oid")
        )
        return (
            pp.join(g.vertices, "vid").join(rep, "cluster").select("oid", "cluster_oid")
        )

    def shortest_path(self, source_oid: str) -> DataFrame:
        """shortestPath() step (ShortestPathVertexProgramTreeNode.java /
        ShortestPathTreeNode.java): hop distances from ``source_oid``
        over the traversed edges → (oid, value); unreachable vertices
        carry -1 (the GAE BFS convention). The reference's default VP is
        likewise unweighted hop distance."""
        from linkgraph.algorithms import bfs

        g = self.subgraph()
        src = g.vertices.where(F.col("oid") == source_oid).select("vid").first()
        if src is None:
            g.unpersist()
            raise ValueError(
                f"shortest_path({source_oid!r}): source not in the traversed subgraph"
            )
        return self._subgraph_result(bfs(g, src=src["vid"]), g)

    def all_path(self, source_oid: str, target_oid: str, khop: int) -> DataFrame:
        """allPath() step (AllPathTreeNode.java / tinkerpop/steps/
        AllPathStep.java; runtime op PROGRAM_GRAPH_ALLPATH with
        ProgramAllPathArg{sid, tid, loop_limit=khop}): every simple path
        ``source_oid`` → ``target_oid`` over the traversed edges using at
        most ``khop`` hops → one row per path, ``path: array<string>``.
        Paths are simple (no revisits) — the enumeration otherwise
        diverges on any cycle; khop is the reference's loop_limit. Spark
        shape mirrors algorithms.all_simple_paths: a (cur, path) frontier
        expanded one hop per round, level-parallel, revisits rejected
        with array_contains; a path that reaches the target is emitted
        and never extended. Must be called on an edge frontier (the
        traversed edges define the program's graph, like subgraph())."""
        self._require_e("all_path")
        edges = self.df.select("src_oid", "dst_oid").distinct().localCheckpoint(eager=True)
        spark = edges.sparkSession
        state = spark.createDataFrame(
            [(source_oid, [source_oid])], "cur string, path array<string>"
        )
        done = state.where(F.col("cur") == target_oid).select("path")
        state = state.where(F.col("cur") != target_oid).localCheckpoint(eager=True)
        for _ in range(khop):
            expand = (
                state.join(edges, state["cur"] == edges["src_oid"])
                .where(~F.array_contains(F.col("path"), F.col("dst_oid")))
                .select(
                    F.col("dst_oid").alias("cur"),
                    F.array_append("path", F.col("dst_oid")).alias("path"),
                )
            )
            done = done.union(
                expand.where(F.col("cur") == target_oid).select("path")
            ).localCheckpoint(eager=True)
            state = expand.where(F.col("cur") != target_oid).localCheckpoint(eager=True)
            if state.limit(1).count() == 0:
                break
        edges.unpersist()
        return done

    def hits_step(self, max_round: int = 100, tolerance: float = 0.01) -> DataFrame:
        """hits() step (HitsVertexProgramTreeNode.java /
        HitsTreeNode.java): hub/authority scores over the traversed
        edges → (oid, hub, auth)."""
        from linkgraph.algorithms import hits

        g = self.subgraph()
        h = hits(g, tolerance=tolerance, max_round=max_round)
        return h.join(g.vertices, "vid").select("oid", "hub", "auth")

    # -- side-effect collections / barriers -----------------------------
    # aggregate()/store()/cap() — the reference compiles these through
    # AggregationListTreeNode.java / StoreTreeNode.java (interactive_
    # engine/compiler/.../tree/); barrier() via BarrierTreeNode.java.

    def aggregate(self, name: str) -> "Traversal":
        """aggregate(name): snapshot the current vertex frontier's oids
        (with duplicates — one per traverser) into the named side-effect
        collection, then continue traversing. Gremlin's aggregate() is
        the EAGER collecting barrier; in this batch dataflow every step
        is already frontier-synchronous, so the eager part that remains
        meaningful is pinning the snapshot — localCheckpoint cuts its
        lineage so later steps can't re-derive it differently."""
        self._require_v("aggregate")
        snap = self.df.select("oid").localCheckpoint(eager=True)
        out = self._next(self.df)
        out.side_effects = {**(self.side_effects or {}), name: snap}
        return out

    def store(self, name: str) -> "Traversal":
        """store(name) (StoreTreeNode.java): the LAZY sibling of
        aggregate() — records the collection as a plan reference without
        materializing; it resolves when cap() is consumed. Same result,
        different evaluation time (exactly the Gremlin lazy/eager
        split)."""
        self._require_v("store")
        out = self._next(self.df)
        out.side_effects = {
            **(self.side_effects or {}),
            name: self.df.select("oid"),
        }
        return out

    def cap(self, name: str) -> DataFrame:
        """cap(name): emit the named side-effect collection as one row —
        ``value: array<string>``, sorted (Gremlin's bulk-set order is
        stream order, undefined across partitions; we pin the
        deterministic one, as fold() does)."""
        if not self.side_effects or name not in self.side_effects:
            raise ValueError(f"cap({name!r}): no such side-effect collection")
        return self.side_effects[name].agg(
            F.array_sort(F.collect_list("oid")).alias("value")
        )

    def barrier(self) -> "Traversal":
        """barrier() (BarrierTreeNode.java): a full-frontier
        synchronization point. Every step here is already one, so the
        surviving effect is the materialization/lineage cut — which is
        also the practical use mid-long-chain (caps the plan the next
        join sees)."""
        return self._next(self.df.localCheckpoint(eager=True))

    # -- token / constant map steps --------------------------------------
    def constant(self, value) -> DataFrame:
        """constant(v) (ConstantTreeNode.java): map every traverser to
        the literal — one ``value`` row per traverser."""
        return self.df.select(F.lit(value).alias("value"))

    def id_(self) -> DataFrame:
        """T.id token (TokenTreeNode.java): element identity — the oid
        for vertices, ``src->dst`` for edges."""
        if self.kind == "v":
            return self.df.select(F.col("oid").alias("value"))
        return self.df.select(
            F.concat_ws("->", "src_oid", "dst_oid").alias("value")
        )

    def label(self) -> DataFrame:
        """T.label token: the element's label."""
        return self.df.select(F.col("label").alias("value"))

    # -- dedup / order / limit ----------------------------------------
    def dedup(self) -> "Traversal":
        """DEDUP by element identity (oid/endpoints), not by path or step
        tags — Gremlin's dedup() compares the current element only (an
        arbitrary surviving traverser keeps its history, as in Gremlin)."""
        subset = [c for c in self.df.columns if not c.startswith("__")]
        if len(subset) < len(self.df.columns):
            return self._next(self.df.dropDuplicates(subset))
        return self._next(self.df.dropDuplicates())

    def order(self, by: str | Column, ascending: bool = True) -> "Traversal":
        col = F.col(by) if isinstance(by, str) else by
        return self._next(self.df.orderBy(col.asc() if ascending else col.desc()))

    def limit(self, n: int) -> "Traversal":
        return self._next(self.df.limit(n))

    def range_(self, low: int, high: int) -> "Traversal":
        """RANGE (:81): traversers ``[low, high)`` of the stream —
        meaningful after ``order()`` (stream order is otherwise partition
        order). ``high=-1`` means unbounded, as Gremlin's range does.
        Compiles to Catalyst offset+limit — still one plan, and at scale
        the offset/limit pair prunes partitions instead of materializing
        the head on the driver."""
        if high == -1:
            return self._next(self.df.offset(low))
        return self._next(self.df.offset(low).limit(high - low))

    def not_(self, branch) -> "Traversal":
        """NOT (:113): keep traversers whose sub-traversal produces no
        result — ``g.V().not_(lambda t: t.out('created'))`` is Gremlin's
        ``where(__.not(out('created')))``. The filter is keyed by current
        element identity (the runtime's NOT also joins on entry id): the
        branch runs once over the *deduped* element set with an identity
        tag riding the frontier, and survivors are anti-joined out — so a
        10M-traverser bag over 1M distinct vertices runs the branch on 1M
        rows, and the anti-join is a hash join on the (oid,label) key."""
        self._require_v("not_")
        src = (
            self.df.select("oid", "label")
            .dropDuplicates(["oid", "label"])
            .withColumn("__as___not", F.col("oid"))
            .withColumn("__as___not_lbl", F.col("label"))
        )
        produced = (
            branch(Traversal(self.pg, src, "v", False))
            .df.select(
                F.col("__as___not").alias("oid"), F.col("__as___not_lbl").alias("label")
            )
            .dropDuplicates(["oid", "label"])
        )
        return self._next(self.df.join(produced, ["oid", "label"], "left_anti"))

    def filter_(self, branch) -> "Traversal":
        """Existential filter — Gremlin's ``where(__.out('x'))``: keep
        traversers whose sub-traversal produces ≥1 result. The positive
        twin of :meth:`not_` (the runtime routes both through the same
        keyed join, query_flow.proto:113): the branch runs once over the
        deduped (oid, label) element set and survivors are kept with a
        left-semi hash join, preserving the frontier's multiplicity."""
        self._require_v("filter_")
        src = (
            self.df.select("oid", "label")
            .dropDuplicates(["oid", "label"])
            .withColumn("__as___flt", F.col("oid"))
            .withColumn("__as___flt_lbl", F.col("label"))
        )
        produced = (
            branch(Traversal(self.pg, src, "v", False))
            .df.select(
                F.col("__as___flt").alias("oid"), F.col("__as___flt_lbl").alias("label")
            )
            .dropDuplicates(["oid", "label"])
        )
        return self._next(self.df.join(produced, ["oid", "label"], "left_semi"))

    # -- iteration -----------------------------------------------------
    def _until_split(self, branch) -> tuple[DataFrame, DataFrame]:
        """Partition the frontier by an existential sub-traversal: a
        traverser satisfies ``until`` when the branch yields ≥1 result
        from its element. Same identity-keyed dedup-then-join shape as
        not_(): the branch runs once per DISTINCT (oid, label), and the
        semi/anti joins preserve bag multiplicity."""
        src = (
            self.df.select("oid", "label")
            .dropDuplicates(["oid", "label"])
            .withColumn("__as___u", F.col("oid"))
            .withColumn("__as___u_lbl", F.col("label"))
        )
        produced = (
            branch(Traversal(self.pg, src, "v", False))
            .df.select(
                F.col("__as___u").alias("oid"), F.col("__as___u_lbl").alias("label")
            )
            .dropDuplicates(["oid", "label"])
            # materialize once: done and rest both consume this (and the
            # body's frontier feeds it) — without the cut, the round's
            # body + branch would re-execute when the loop output is read
            .localCheckpoint(eager=True)
        )
        done = self.df.join(produced, ["oid", "label"], "left_semi")
        rest = self.df.join(produced, ["oid", "label"], "left_anti")
        return done, rest

    def repeat(
        self,
        body,
        times: int | None = None,
        until=None,
        emit: bool = False,
        emit_first: bool = False,
        until_first: bool = False,
        max_rounds: int = 64,
    ) -> "Traversal":
        """REPEAT with until()/emit() modulation (query_flow.proto:87-88;
        the runtime's LoopOp carries the same until/emit feedback edges).

        - ``times=n``: fixed bound — pure plan composition, no actions
          (the r1-r3 behavior, unchanged).
        - ``until=branch``: do-while convergence — after each body
          application, traversers whose ``branch`` (Traversal →
          Traversal) yields ≥1 result LEAVE the loop and join the output;
          the rest iterate. Gremlin's ``repeat(X).until(P)``. Pass
          ``until_first=True`` for the while-do form
          (``until(P).repeat(X)`` — the predicate also screens the input
          frontier before round 1). A driver-side emptiness check per
          round (one count on the localCheckpointed frontier, the
          superstep pattern) bounds the loop; ``max_rounds`` guards
          non-converging traversals with a loud error.
        - ``emit=True``: every post-body frontier joins the output too
          (``repeat(X).emit()``); ``emit_first=True`` additionally emits
          the pre-loop frontier (``emit().repeat(X)``).

        Output order/multiplicity is bag-union of all exits, like the
        runtime's loop output stream. ``until`` requires a vertex
        frontier (loop exit identity is keyed on (oid, label))."""
        if times is None and until is None:
            raise ValueError("repeat(): need times=n and/or until=branch")
        if until_first and until is None:
            raise ValueError("repeat(): until_first=True requires until=branch")
        emit = emit or emit_first  # emit().repeat(X) implies emission
        if until is not None:
            self._require_v("repeat(until=...)")
        if times is not None and times <= 0:
            # zero iterations: the source frontier passes through untouched
            # (the r1-r3 `for _ in range(times)` behavior)
            return self
        outs: list[DataFrame] = []
        t = self
        if emit and emit_first:
            outs.append(t.df)
        if until is not None and until_first:
            done, rest = t._until_split(until)
            outs.append(done)
            rest = rest.localCheckpoint(eager=True)
            t = t._next(rest)
            if rest.limit(1).count() == 0:
                return self._next(_union_all(outs))
        rounds = 0
        while True:
            t = body(t)
            rounds += 1
            exhausted = times is not None and rounds >= times
            if until is not None:
                # materialize the round's frontier: done and rest are both
                # filters over it, and the loop tail re-reads done later
                t = t._next(t.df.localCheckpoint(eager=True))
                # exit check FIRST: a traverser leaving via until is output
                # exactly once (emit applies only to those that continue)
                done, rest = t._until_split(until)
                outs.append(done)
                rest = rest.localCheckpoint(eager=True)
                t = t._next(rest)
                if rest.limit(1).count() == 0:
                    break
                if exhausted:
                    outs.append(t.df)  # loop budget spent: survivors exit
                    break
                if rounds >= max_rounds:
                    raise ValueError(
                        f"repeat(until=...) did not converge in {max_rounds} rounds"
                    )
                if emit:
                    outs.append(t.df)
            else:
                if exhausted:
                    if not emit:
                        return t  # plain fixed-times: final frontier IS the output
                    outs.append(t.df)  # final emission coincides with loop exit
                    break
                if emit:
                    outs.append(t.df)
        return self._next(_union_all(outs) if outs else t.df.limit(0))

    # -- physical-op tail (proto :104-105, :149-150, :95/:103 locals) --
    def cache(self) -> "Traversal":
        """CACHE (query_flow.proto:149): materialization hint — persist
        the frontier so branches fanning out from this point (union /
        match / repeat bodies over the same prefix) reuse one computed
        result instead of re-running the prefix per branch. The Spark
        analog is exactly ``persist()`` on the frontier DataFrame; the
        caller owns the residency — ``t.df.unpersist()`` when done (a
        traversal is usually consumed once, so the default path never
        persists anything)."""
        return self._next(self.df.persist())

    def math_(self, expr: str, by: dict[str, str]) -> DataFrame:
        """MATH (query_flow.proto:150) — Gremlin's ``math()`` step:
        evaluate an arithmetic expression over numeric properties of
        tagged elements. Variables name ``as_()`` tags (``_`` = the
        current element); ``by`` maps each variable to the vertex
        property supplying its number (the by() modulator). Lowers to a
        single Catalyst arithmetic expression after one property-lookup
        join per variable — grammar: ``+ - * /``, parentheses, numeric
        literals, and unary functions sqrt/abs/exp/log/ceil/floor.
        Returns a one-column ``value`` DataFrame (Gremlin's double
        stream)."""
        self._require_v("math_")
        df = self.df
        cols: dict[str, Column] = {}
        for var, prop in by.items():
            lookup_parts = [
                t.select(
                    F.col("oid").alias(f"__math_oid_{var}"),
                    F.lit(lbl).alias(f"__math_lbl_{var}"),
                    F.col(prop).cast("double").alias(f"__math_{var}"),
                )
                for lbl, t in self.pg.v_tables.items()
                if prop in t.columns
            ]
            if not lookup_parts:
                raise ValueError(f"math_: no vertex label has property {prop!r}")
            if var != "_" and f"__as_{var}" not in df.columns:
                raise ValueError(f"math_: no as_({var!r}) upstream")
            lk = _union_all(lookup_parts)
            # join on (oid, label), as _join_vprop does — oid values may
            # collide across vertex labels
            okey = F.col("oid") if var == "_" else tag(var)
            lkey = F.col("label") if var == "_" else F.col(f"__as_{var}_lbl")
            df = df.join(
                lk,
                (okey == F.col(f"__math_oid_{var}"))
                & (lkey == F.col(f"__math_lbl_{var}")),
            )
            cols[var] = F.col(f"__math_{var}")
        return df.select(_parse_math(expr, cols).alias("value"))

    # -- internals -----------------------------------------------------
    # -- lambda steps (LambdaMapTreeNode.java / LambdaFilterTreeNode.java
    # / LambdaFlatMapTreeNode.java under interactive_engine/compiler/
    # .../tree/; TraversalMapTreeNode / TraversalFlatMapTreeNode are
    # their __-traversal twins, both NodeType.FLATMAP). The reference
    # ships the user's closure to the executor and calls it per
    # traverser; here the contract is deliberately a *Catalyst Column*
    # function (df → Column) so the lambda lowers into the same
    # whole-stage-codegen'd plan as every other step — never a per-row
    # Python call. ``props`` pre-joins the named vertex properties so
    # the lambda can reference them as plain columns (inner-join
    # semantics: traversers whose label lacks the property drop,
    # matching has()'s existential contract).

    def _with_props(self, props: tuple[str, ...]) -> DataFrame:
        df = self.df
        if props:
            self._require_v("lambda step with props")
        for p in props:
            df = Traversal(self.pg, df, self.kind, self.tracked)._join_vprop(p)
        return df

    def lambda_filter(self, fn, *props: str) -> "Traversal":
        """LAMBDA_FILTER: keep traversers where ``fn(df)`` (a boolean
        Column) holds; frontier kind and path tracking pass through."""
        df = self._with_props(props)
        kept = df.where(fn(df))
        if props:
            kept = kept.select(self.df.columns)
        return self._next(kept)

    def lambda_map(self, fn, *props: str) -> DataFrame:
        """LAMBDA_MAP: one computed ``value`` per traverser."""
        df = self._with_props(props)
        return df.select(fn(df).alias("value"))

    def lambda_flat_map(self, fn, *props: str) -> DataFrame:
        """LAMBDA_FLAT_MAP: ``fn`` returns an array Column; every
        traverser fans out to one ``value`` row per element (explode —
        empty arrays yield nothing, the reference's iterator contract)."""
        df = self._with_props(props)
        return df.select(F.explode(fn(df)).alias("value"))

    def flat_map(self, body) -> "Traversal":
        """flatMap(__…) (TraversalFlatMapTreeNode.java): run the
        sub-traversal from every traverser and concatenate the outputs.
        In this frontier dataflow that is exactly applying the body to
        the frontier — each traverser's derived rows are independent and
        bag multiplicity is preserved — so the step is pure sugar that
        keeps the Gremlin spelling. (map(__…) with per-traverser
        first-element semantics is covered by project()/lambda_map;
        the reference routes both through the same FLATMAP node type.)"""
        out = body(self)
        if not isinstance(out, Traversal):
            raise ValueError("flat_map(): body must end in a traversal step")
        return out

    # -- output sink (OutputTreeNode.java / OutputVineyardTreeNode.java) -

    def output(self, path: str, *props: str, fmt: str = "parquet") -> DataFrame:
        """output(): persist the traverser frontier's elements with the
        named properties to ``path`` and return what was written.

        The reference's OutputTreeNode writes exclusively to the
        proprietary ODPS tunnel (``tunnel://`` — deliberately NOT
        implemented here, matching the repo-wide exclusion of the
        WRITE_ODPS sink); OutputVineyardTreeNode materializes into the
        vineyard store for cross-engine handoff. The Spark-first
        equivalent of both capabilities is a columnar write: vertex oid
        + label + requested properties → parquet (or csv/json), which
        any downstream engine reads back. One shuffle-free projection +
        property joins; the write parallelism is the frontier's."""
        if fmt not in ("parquet", "csv", "json"):
            raise ValueError(f"output(): unsupported format {fmt!r}")
        if self.kind == "v":
            df = self._with_props(props).select("oid", "label", *props)
        else:
            missing = [p for p in props if p not in self.df.columns]
            if missing:
                raise ValueError(f"output(): edge properties {missing} unknown")
            df = self.df.select("src_oid", "dst_oid", "label", *props)
        df.write.mode("overwrite").format(fmt).option("header", True).save(path)
        return df.sparkSession.read.format(fmt).option("header", True).load(path)

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


def _parse_math(expr: str, variables: dict[str, Column]) -> Column:
    """Tiny arithmetic parser for math_(): + - * / parens, numeric
    literals, variables, unary fns. Recursive descent, lowers straight
    to Catalyst Column arithmetic — no eval, no Python at runtime."""
    import re as _re

    toks = _re.findall(r"\d+\.\d+|\d+|[A-Za-z_][A-Za-z0-9_]*|[()+\-*/]", expr)
    if "".join(toks).replace(" ", "") != expr.replace(" ", ""):
        raise ValueError(f"math_: cannot tokenize {expr!r}")
    fns = {
        "sqrt": F.sqrt, "abs": F.abs, "exp": F.exp, "log": F.log,
        "ceil": F.ceil, "floor": F.floor,
    }
    pos = [0]

    def peek():
        return toks[pos[0]] if pos[0] < len(toks) else None

    def eat():
        t = peek()
        pos[0] += 1
        return t

    def atom() -> Column:
        t = eat()
        if t is None:
            raise ValueError(f"math_: unexpected end of {expr!r}")
        if t == "(":
            c = add_sub()
            if eat() != ")":
                raise ValueError(f"math_: missing ')' in {expr!r}")
            return c
        if t == "-":
            return -atom()
        if _re.fullmatch(r"\d+\.\d+|\d+", t):
            return F.lit(float(t))
        if t in fns:
            if eat() != "(":
                raise ValueError(f"math_: {t} needs '(' in {expr!r}")
            c = add_sub()
            if eat() != ")":
                raise ValueError(f"math_: missing ')' in {expr!r}")
            return fns[t](c)
        if t in variables:
            return variables[t]
        raise ValueError(f"math_: unknown variable {t!r} (no by() mapping)")

    def mul_div() -> Column:
        c = atom()
        while peek() in ("*", "/"):
            if eat() == "*":
                c = c * atom()
            else:
                c = c / atom()
        return c

    def add_sub() -> Column:
        c = mul_div()
        while peek() in ("+", "-"):
            if eat() == "+":
                c = c + mul_div()
            else:
                c = c - mul_div()
        return c

    out = add_sub()
    if peek() is not None:
        raise ValueError(f"math_: trailing tokens in {expr!r}")
    return out


def unfold(df: DataFrame, col: str = "value") -> DataFrame:
    """UNFOLD (query_flow.proto:94): explode a collection column (a
    fold()/path() output) back into one row per element."""
    return df.select(F.explode(F.col(col)).alias(col))


def order_local(df: DataFrame, col: str = "value", ascending: bool = True) -> DataFrame:
    """ORDER_LOCAL (query_flow.proto:105): sort WITHIN each traverser's
    collection (Gremlin Scope.local) — one ``sort_array`` per row, no
    shuffle, unlike the global ORDER."""
    return df.withColumn(col, F.sort_array(F.col(col), asc=ascending))


def range_local(df: DataFrame, low: int, high: int, col: str = "value") -> DataFrame:
    """RANGE_LOCAL (query_flow.proto:104): keep elements [low, high) of
    each traverser's collection — per-row ``slice``, no shuffle."""
    return df.withColumn(col, F.slice(F.col(col), low + 1, high - low))


def count_local(df: DataFrame, col: str = "value") -> DataFrame:
    """count(Scope.local) (CountLocalTreeNode.java): the size of each
    traverser's collection — per-row ``size``, no shuffle (vs the global
    COUNT barrier)."""
    return df.withColumn(col, F.size(F.col(col)).cast("long"))


def select_keys(df: DataFrame) -> DataFrame:
    """select(Column.keys) (ColumnTreeNode.java): project the key side
    of a map-valued stream — valueMap rows become per-traverser key
    arrays (the reference's ListValueType(key)), groupCount / property
    entry rows project their entry key. Per-row map_keys / rename only —
    no shuffle."""
    if "vmap" in df.columns:
        return df.select(F.map_keys("vmap").alias("value"))
    if "key" in df.columns:
        return df.select(F.col("key").alias("value"))
    raise ValueError("select_keys: input is not a map/entry-valued stream")


def select_values(df: DataFrame) -> DataFrame:
    """select(Column.values) (ColumnTreeNode.java): the value side of a
    map-valued stream — valueMap rows → per-traverser value arrays,
    groupCount entries → their counts, properties() entries → the
    property value (PropertyKeyValueTreeNode's value() collapses to the
    same projection; key() is select_keys)."""
    if "vmap" in df.columns:
        return df.select(F.map_values("vmap").alias("value"))
    if "n" in df.columns and "key" in df.columns:
        return df.select(F.col("n").alias("value"))
    if "value" in df.columns:
        return df.select("value")
    raise ValueError("select_values: input is not a map/entry-valued stream")


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
