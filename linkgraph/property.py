"""Multi-label property graph + projection to the simple LinkGraph.

Spark-first analog of the reference's ArrowFragment property graph and its
Python builder surface
(/root/reference/python/graphscope/framework/graph.py:382-470 add_vertices/
add_edges label semantics; :614-640 project) and the C++ projection that
feeds GAE apps
(/root/reference/analytical_engine/core/fragment/arrow_projected_fragment.h:339-508).

Design: each label is simply a DataFrame — vertices ``(oid, props...)``
keyed by a label name, edges ``(src_oid, dst_oid, props...)`` with
(src_label, dst_label) endpoints. The property graph is an immutable
catalog of these DataFrames; nothing is materialized until a projection
is executed, so label/property selection prunes columns and Catalyst
pushes predicates into the per-label scans (the reference achieves the
same with selective column mmap of its Arrow tables).

Projection → :class:`linkgraph.graph.LinkGraph`:

- the projected vertex set is the union of the selected labels' oid
  columns (isolated vertices survive, as in ArrowProjectedFragment);
- edges whose endpoint vanishes (its label or row was not selected) are
  dropped — the reference's invalid-vertex filtering
  (arrow_projected_fragment.h:390-508);
- an optional numeric edge property becomes the simple graph's
  ``weight`` (EDATA_T of the projection).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph, assign_dense_ids


@dataclass
class EdgeLabel:
    df: DataFrame  # (src_oid string, dst_oid string, props...)
    src_label: str
    dst_label: str


@dataclass
class PropertyGraph:
    """Immutable multi-label property graph (ArrowFragment analog)."""

    v_tables: dict[str, DataFrame] = field(default_factory=dict)
    e_tables: dict[str, EdgeLabel] = field(default_factory=dict)
    directed: bool = True

    # -- builder surface (graph.py:382-470 semantics) ------------------
    def add_vertices(
        self,
        vertices: DataFrame,
        label: str = "_",
        properties: list[str] | None = None,
        vid_field: str | int = 0,
    ) -> "PropertyGraph":
        """Register a vertex label; ``vid_field`` names the oid column."""
        if label in self.v_tables:
            raise ValueError(f"vertex label {label!r} already exists")
        cols = vertices.columns
        oid_col = cols[vid_field] if isinstance(vid_field, int) else vid_field
        props = properties if properties is not None else [c for c in cols if c != oid_col]
        df = vertices.select(
            F.col(oid_col).cast("string").alias("oid"), *[F.col(p) for p in props]
        )
        return replace(self, v_tables={**self.v_tables, label: df})

    def add_edges(
        self,
        edges: DataFrame,
        label: str = "_e",
        properties: list[str] | None = None,
        src_label: str = "_",
        dst_label: str = "_",
        src_field: str | int = 0,
        dst_field: str | int = 1,
    ) -> "PropertyGraph":
        if label in self.e_tables:
            raise ValueError(f"edge label {label!r} already exists")
        cols = edges.columns
        sc = cols[src_field] if isinstance(src_field, int) else src_field
        dc = cols[dst_field] if isinstance(dst_field, int) else dst_field
        props = properties if properties is not None else [c for c in cols if c not in (sc, dc)]
        df = edges.select(
            F.col(sc).cast("string").alias("src_oid"),
            F.col(dc).cast("string").alias("dst_oid"),
            *[F.col(p) for p in props],
        )
        return replace(
            self,
            e_tables={**self.e_tables, label: EdgeLabel(df, src_label, dst_label)},
        )

    # -- REPORT analog -------------------------------------------------
    def schema(self) -> list[dict]:
        """Label catalog: kind, label, properties (graph_def schema analog)."""
        out = []
        for lbl, df in sorted(self.v_tables.items()):
            out.append({"kind": "vertex", "label": lbl,
                        "properties": [c for c in df.columns if c != "oid"]})
        for lbl, el in sorted(self.e_tables.items()):
            out.append({"kind": "edge", "label": lbl,
                        "src_label": el.src_label, "dst_label": el.dst_label,
                        "properties": [c for c in el.df.columns
                                       if c not in ("src_oid", "dst_oid")]})
        return out

    def label_counts(self) -> DataFrame:
        """(kind, label, n) row counts per label — one DataFrame report."""
        parts = []
        for lbl, df in self.v_tables.items():
            parts.append(df.agg(F.count("*").alias("n")).select(
                F.lit("vertex").alias("kind"), F.lit(lbl).alias("label"), "n"))
        for lbl, el in self.e_tables.items():
            parts.append(el.df.agg(F.count("*").alias("n")).select(
                F.lit("edge").alias("kind"), F.lit(lbl).alias("label"), "n"))
        if not parts:
            raise ValueError("empty property graph")
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # -- project (graph.py:614-640; arrow_projected_fragment.h) --------
    def project(
        self,
        vertices: dict[str, list[str] | None],
        edges: dict[str, list[str] | None],
    ) -> "PropertyGraph":
        """Label/property selection; returns a smaller PropertyGraph.

        ``{label: None}`` keeps all properties, ``{label: [...]}`` prunes
        to the named ones — column pruning reaches the source scans.
        """
        vt = {}
        for lbl, props in vertices.items():
            df = self.v_tables[lbl]
            if props is not None:
                df = df.select("oid", *[F.col(p) for p in props])
            vt[lbl] = df
        et = {}
        for lbl, props in edges.items():
            el = self.e_tables[lbl]
            if el.src_label not in vt or el.dst_label not in vt:
                raise ValueError(
                    f"edge label {lbl!r} endpoints ({el.src_label}, {el.dst_label}) "
                    "must be in the projected vertex labels"
                )
            df = el.df
            if props is not None:
                df = df.select("src_oid", "dst_oid", *[F.col(p) for p in props])
            et[lbl] = EdgeLabel(df, el.src_label, el.dst_label)
        return replace(self, v_tables=vt, e_tables=et)

    def select_vertices(self, label: str, predicate) -> "PropertyGraph":
        """Property predicate on one vertex label (pushed to its scan);
        downstream projection drops edges whose endpoint is filtered out."""
        df = self.v_tables[label].where(predicate)
        return replace(self, v_tables={**self.v_tables, label: df})

    # -- flatten to the simple graph (ArrowFlattenedFragment analog) ---
    def to_simple(self, e_prop: str | None = None, partitions: int | None = None) -> LinkGraph:
        """Union all labels into one LinkGraph with dense vids.

        Vertex set = union of every selected label's oids (isolated
        vertices kept). Edges inner-join the vertex map on both
        endpoints, dropping dangling references. ``e_prop`` (numeric
        edge property) becomes ``weight``.
        """
        if not self.v_tables or not self.e_tables:
            raise ValueError("need at least one vertex and one edge label")
        oids = None
        for df in self.v_tables.values():
            part = df.select("oid")
            oids = part if oids is None else oids.union(part)
        vmap = assign_dense_ids(oids, partitions=partitions)
        e_all = None
        for el in self.e_tables.values():
            cols = [F.col("src_oid"), F.col("dst_oid")]
            if e_prop:
                cols.append(F.col(e_prop).cast("double").alias("weight"))
            part = el.df.select(*cols)
            e_all = part if e_all is None else e_all.unionByName(part)
        e = (
            e_all.join(vmap.select(F.col("oid").alias("src_oid"), F.col("vid").alias("src")), "src_oid")
            .join(vmap.select(F.col("oid").alias("dst_oid"), F.col("vid").alias("dst")), "dst_oid")
            .select("src", "dst", *(["weight"] if e_prop else []))
        )
        return LinkGraph(vertices=vmap, edges=e, directed=self.directed)
