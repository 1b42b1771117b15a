"""Graph serialization — the reference's ``Graph.save_to`` /
``Graph.load_from`` analog (python/graphscope/framework/graph.py:975-1060:
vineyard.io.serialize dumps per-worker meta + data files to
local/hdfs/oss/s3; deserialize restores an identical graph).

Spark-first shape: data lands as parquet (per-partition part files — the
"each worker writes its chunk" layout for free, on any
Hadoop-registered filesystem via :func:`linkgraph.loader.normalize_uri`),
and the meta (format version, directedness, partition key, labels) is a
one-row JSON dataset next to it. No driver-side materialization at any
size — both halves are straight ``DataFrameWriter``/``DataFrameReader``
plans, so a 100-TB graph round-trips through the same code as the test
fixtures.

Layout::

    {path}/meta/        one-row JSON: {version, directed, partition_key}
    {path}/vertices/    parquet (vid long, oid string)
    {path}/edges/       parquet (src long, dst long[, props...])

PropertyGraph adds per-label subdirs ``v_{label}/`` / ``e_{label}/`` and
records src/dst labels in the meta row.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.loader import normalize_uri
from linkgraph.property import EdgeLabel, PropertyGraph

FORMAT_VERSION = 1


def save_graph(graph: LinkGraph, path: str, mode: str = "error") -> None:
    """Serialize a LinkGraph under ``path`` (any Spark-writable URI)."""
    base = normalize_uri(path)
    spark = graph.vertices.sparkSession
    graph.vertices.write.mode(mode).parquet(f"{base}/vertices")
    graph.edges.write.mode(mode).parquet(f"{base}/edges")
    meta = spark.createDataFrame(
        [(FORMAT_VERSION, graph.directed, graph.partition_key)],
        "version int, directed boolean, partition_key string",
    )
    meta.coalesce(1).write.mode(mode).json(f"{base}/meta")


def load_graph(spark: SparkSession, path: str) -> LinkGraph:
    """Restore a LinkGraph written by :func:`save_graph` — schema and
    data identical to the saved graph (the load_from contract)."""
    base = normalize_uri(path)
    # explicit schema: JSON omits null fields (partition_key=None would
    # otherwise vanish from the inferred schema)
    meta = spark.read.schema("version int, directed boolean, partition_key string").json(
        f"{base}/meta"
    ).first()
    if meta is None or meta["version"] is None or int(meta["version"]) > FORMAT_VERSION:
        raise ValueError(
            f"load_graph: unreadable or future-format meta at {base}/meta"
        )
    return LinkGraph(
        vertices=spark.read.parquet(f"{base}/vertices"),
        edges=spark.read.parquet(f"{base}/edges"),
        directed=bool(meta["directed"]),
        partition_key=meta["partition_key"],
    )


def save_property_graph(pg: PropertyGraph, path: str, mode: str = "error") -> None:
    """Serialize a PropertyGraph: one parquet dataset per label."""
    base = normalize_uri(path)
    some_df = next(iter(pg.v_tables.values()), None)
    if some_df is None:
        raise ValueError("save_property_graph: graph has no vertex labels")
    spark = some_df.sparkSession
    for label, df in pg.v_tables.items():
        df.write.mode(mode).parquet(f"{base}/v_{label}")
    for label, el in pg.e_tables.items():
        el.df.write.mode(mode).parquet(f"{base}/e_{label}")
    meta = spark.createDataFrame(
        [
            (
                FORMAT_VERSION,
                pg.directed,
                sorted(pg.v_tables),
                json.dumps(
                    {l: [el.src_label, el.dst_label] for l, el in sorted(pg.e_tables.items())}
                ),
            )
        ],
        "version int, directed boolean, v_labels array<string>, e_labels string",
    )
    meta.coalesce(1).write.mode(mode).json(f"{base}/meta")


def load_property_graph(spark: SparkSession, path: str) -> PropertyGraph:
    base = normalize_uri(path)
    meta = spark.read.schema(
        "version int, directed boolean, v_labels array<string>, e_labels string"
    ).json(f"{base}/meta").first()
    if meta is None or meta["version"] is None or int(meta["version"]) > FORMAT_VERSION:
        raise ValueError(
            f"load_property_graph: unreadable or future-format meta at {base}/meta"
        )
    e_meta = json.loads(meta["e_labels"])
    return PropertyGraph(
        v_tables={l: spark.read.parquet(f"{base}/v_{l}") for l in meta["v_labels"]},
        e_tables={
            l: EdgeLabel(
                df=spark.read.parquet(f"{base}/e_{l}"),
                src_label=sl,
                dst_label=dl,
            )
            for l, (sl, dl) in e_meta.items()
        },
        directed=bool(meta["directed"]),
    )
