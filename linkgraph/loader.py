"""CSV e/v-file loading — the reference Loader surface, Spark-first.

Parity target: ``python/graphscope/framework/loader.py:44-132`` — the
reference's ``Loader`` wraps a location (file/oss/hdfs/s3) plus CSV
options (``header_row``, ``delimiter``) and feeds ``add_vertices`` /
``add_edges``. Here the same options map 1:1 onto Spark's distributed
CSV reader (``spark.read.csv``), so any Hadoop-compatible URI the
cluster knows (``file://``, ``hdfs://``, ``s3a://``, ...) works
unchanged, the scan is partitioned/parallel from the start, and schema
options (column pruning, predicate pushdown on later filters) come free
from the DataFrame source.

Field selection mirrors the Loader protocol: positional index or column
name for src/dst/vid, remaining columns become properties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph, assign_dense_ids, build_graph


def normalize_uri(path: str) -> str:
    """Remote-protocol pass-through (reference Loader locations,
    python/graphscope/framework/loader.py:92-132: file/oss/hdfs/s3).

    Spark reads any Hadoop-registered filesystem scheme directly, so URIs
    go to ``spark.read`` unchanged except ``s3://`` → ``s3a://`` (the
    hadoop-aws connector's scheme). ``oss://`` needs hadoop-aliyun on the
    cluster classpath; ``hdfs://`` / ``file://`` are built in. This
    sandbox has no object store or HDFS to exercise remote schemes —
    unit tests drive the same code path with ``file://`` URIs."""
    if path.startswith("s3://"):
        return "s3a://" + path[len("s3://"):]
    return path


def _read_csv(
    spark: SparkSession,
    path: str,
    delimiter: str,
    header_row: bool,
    storage_options: dict[str, str] | None = None,
) -> DataFrame:
    """``storage_options``: ``fs.*`` keys (credentials/endpoints, e.g.
    ``fs.s3a.access.key``) land in the Hadoop configuration — Spark
    resolves filesystems there, not from reader options; anything else
    is passed to the CSV reader unchanged (``comment``, ``quote``, …)."""
    reader = (
        spark.read.option("sep", delimiter)
        .option("header", str(bool(header_row)).lower())
        .option("inferSchema", "false")  # oids stay strings; no sampling pass
    )
    for k, v in (storage_options or {}).items():
        if k.startswith("fs."):
            spark.sparkContext._jsc.hadoopConfiguration().set(k, str(v))
        else:
            reader = reader.option(k, v)
    return reader.csv(normalize_uri(path))


def _pick(df: DataFrame, field: str | int) -> str:
    if isinstance(field, int):
        return df.columns[field]
    if field not in df.columns:
        raise ValueError(f"column {field!r} not in CSV header {df.columns}")
    return field


def load_edges_csv(
    spark: SparkSession,
    path: str,
    delimiter: str = ",",
    header_row: bool = True,
    src_field: str | int = 0,
    dst_field: str | int = 1,
    weight_field: str | int | None = None,
    storage_options: dict[str, str] | None = None,
) -> DataFrame:
    """CSV e-file → ``(src_oid, dst_oid[, weight])`` DataFrame."""
    df = _read_csv(spark, path, delimiter, header_row, storage_options)
    sc, dc = _pick(df, src_field), _pick(df, dst_field)
    cols = [
        F.col(sc).cast("string").alias("src_oid"),
        F.col(dc).cast("string").alias("dst_oid"),
    ]
    if weight_field is not None:
        cols.append(F.col(_pick(df, weight_field)).cast("double").alias("weight"))
    return df.select(*cols)


def load_vertices_csv(
    spark: SparkSession,
    path: str,
    delimiter: str = ",",
    header_row: bool = True,
    vid_field: str | int = 0,
    storage_options: dict[str, str] | None = None,
) -> DataFrame:
    """CSV v-file → ``(oid, <props...>)`` DataFrame."""
    df = _read_csv(spark, path, delimiter, header_row, storage_options)
    vc = _pick(df, vid_field)
    props = [c for c in df.columns if c != vc]
    return df.select(F.col(vc).cast("string").alias("oid"), *[F.col(p) for p in props])


def load_graph_csv(
    spark: SparkSession,
    efile: str,
    vfile: str | None = None,
    delimiter: str = ",",
    header_row: bool = True,
    src_field: str | int = 0,
    dst_field: str | int = 1,
    weight_field: str | int | None = None,
    vid_field: str | int = 0,
    partitions: int | None = None,
    storage_options: dict[str, str] | None = None,
) -> LinkGraph:
    """CSV e-file (+ optional v-file) → :class:`LinkGraph`.

    Without a v-file the vertex set is the edge-endpoint union (the
    Loader's implicit-vertex behavior); with one, the v-file defines the
    vertex universe and dense ids cover it even for isolated vertices —
    edges referencing unknown oids are dropped (the reference's
    invalid-vertex filtering on load).
    """
    e = load_edges_csv(
        spark, efile, delimiter, header_row, src_field, dst_field, weight_field,
        storage_options,
    )
    if vfile is None:
        return build_graph(
            e, weight_col="weight" if weight_field is not None else None,
            partitions=partitions,
        )
    v = load_vertices_csv(
        spark, vfile, delimiter, header_row, vid_field, storage_options
    )
    vmap = assign_dense_ids(v.select("oid"), partitions=partitions)
    cols = ["src", "dst"] + (["weight"] if weight_field is not None else [])
    edges = (
        e.join(vmap.select(F.col("oid").alias("src_oid"), F.col("vid").alias("src")), "src_oid")
        .join(vmap.select(F.col("oid").alias("dst_oid"), F.col("vid").alias("dst")), "dst_oid")
        .select(*cols)
    )
    g = LinkGraph(vertices=vmap, edges=edges)
    g._cached = [vmap]  # assign_dense_ids pins it; let g.unpersist() free it
    return g
