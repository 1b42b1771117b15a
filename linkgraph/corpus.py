"""Synthetic source-code corpus + dependency-edge derivation.

The engine's only external-shaped input is an Iceberg-layout table of
source files ``(repo, path, commit, lang, content)`` (BASELINE.json
``input_hint``). This module synthesizes that table **deterministically and
fully JVM-side** — every column is a Catalyst expression over
``spark.range(n)``, so the same ``(n, seed)`` produces the identical row
set at any partition count and the generator itself scales linearly to
arbitrarily large ``n`` (``spark.range`` is an embarrassingly parallel
source; at 10^12 files it is the same plan, just more splits).

Edge derivation mirrors the reference's CREATE_GRAPH load path
(/root/reference/analytical_engine/core/loader/arrow_fragment_loader.h:54-398):
there, vertex/edge tables are parsed and hash-partitioned; here, import
references embedded in ``content`` are extracted with a single JVM-side
``regexp_extract_all`` (no per-row Python) and resolved to ``(src_oid,
dst_oid)`` string pairs.

Determinism / skew design:

- pseudo-randomness = ``xxhash64(fid, seed_k)`` (Catalyst built-in, stable
  across Spark versions and partitionings);
- a configurable fraction of import targets point at a small set of *hub*
  files, giving the power-law in-degree the north rule's skew handling is
  exercised against;
- the per-row invariant is ``sha256(content)``: every pipeline stage must
  preserve the sha256 row-set (checked by :func:`content_sha_set` in
  tests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

FILES_PER_REPO = 32
N_HUBS = 16
HUB_PCT = 30  # % of import slots redirected to hub files
MAX_IMPORTS = 3
LANGS = ("py", "java", "cpp")

# Import statements are lang-specific, but every reference encloses the
# target oid in double quotes — one regex extracts all of them.
_REF_RE = r'"([^"]+)"'


def _h(fid: Column, k: int, mode: str) -> Column:
    """Non-negative pseudo-random 60/64-bit hash of ``(fid, k)``.

    ``xxhash64`` (default) is the fastest JVM-side hash; ``md5`` is
    engine-portable — DuckDB reproduces it verbatim as
    ``('0x' || substring(md5('corpus:<k>:' || fid), 1, 15))::BIGINT``,
    which is what the ``corpus_edges`` correctness oracle replays.
    """
    if mode == "md5":
        hx = F.md5(F.concat(F.lit(f"corpus:{k}:"), fid.cast("string")))
        return F.conv(F.substring(hx, 1, 15), 16, 10).cast("long")
    return F.xxhash64(fid, F.lit(k))


def _repo(fid: Column) -> Column:
    return F.concat(
        F.lit("repo-"),
        F.lpad(F.floor(fid / FILES_PER_REPO).cast("long").cast("string"), 6, "0"),
    )


def _lang(fid: Column, seed: int, mode: str = "xxhash64") -> Column:
    return F.element_at(
        F.array(*[F.lit(x) for x in LANGS]),
        (F.pmod(_h(fid, seed, mode), F.lit(len(LANGS))) + 1).cast("int"),
    )


def _ext(lang: Column) -> Column:
    return F.when(lang == "py", "py").when(lang == "java", "java").otherwise("cc")


def _path(fid: Column, seed: int, mode: str = "xxhash64") -> Column:
    lang = _lang(fid, seed, mode)
    return F.concat(
        F.lit("src/pkg_"),
        F.pmod(_h(fid, seed + 1, mode), F.lit(5)).cast("string"),
        F.lit("/mod_"),
        F.pmod(fid, F.lit(FILES_PER_REPO)).cast("string"),
        F.lit("."),
        _ext(lang),
    )


def _oid(fid: Column, seed: int, mode: str = "xxhash64") -> Column:
    """Canonical vertex oid = ``repo + ':' + path`` (FIXTURES.md §2)."""
    return F.concat(_repo(fid), F.lit(":"), _path(fid, seed, mode))


def synth_corpus(
    spark: SparkSession,
    n_files: int,
    seed: int = 42,
    partitions: int | None = None,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Deterministic corpus table ``(repo, path, commit, lang, content)``."""
    rng = spark.range(0, n_files, 1, partitions) if partitions else spark.range(n_files)
    fid = F.col("id")
    mode = hash_mode
    lang = _lang(fid, seed, mode)

    # Per-slot import target: ~HUB_PCT% of slots hit one of N_HUBS hub files
    # (heavy in-degree hitters), the rest a uniform file. Self-imports are
    # nulled out; slot j exists iff j < n_imports.
    n_imports = F.pmod(_h(fid, seed + 2, mode), F.lit(MAX_IMPORTS + 1))
    import_lines = []
    for j in range(MAX_IMPORTS):
        is_hub = F.pmod(_h(fid, seed + 10 + j, mode), F.lit(100)) < HUB_PCT
        tgt = F.when(
            is_hub,
            F.pmod(_h(fid, seed + 20 + j, mode), F.lit(min(N_HUBS, n_files))),
        ).otherwise(F.pmod(_h(fid, seed + 30 + j, mode), F.lit(n_files)))
        stmt = (
            F.when(lang == "py", F.concat(F.lit('import "'), _oid(tgt, seed, mode), F.lit('"')))
            .when(lang == "java", F.concat(F.lit('import "'), _oid(tgt, seed, mode), F.lit('";')))
            .otherwise(F.concat(F.lit('#include "'), _oid(tgt, seed, mode), F.lit('"')))
        )
        import_lines.append(F.when((F.lit(j) < n_imports) & (tgt != fid), stmt))

    header = F.format_string("// file %s of %s", _path(fid, seed, mode), _repo(fid))
    body = F.concat(
        F.lit("def main():\n    return "),
        F.pmod(_h(fid, seed + 3, mode), F.lit(1000)).cast("string"),
        F.lit("\n"),
        F.repeat(
            F.lit("# filler line of deterministic source text\n"),
            (F.pmod(_h(fid, seed + 4, mode), F.lit(5)) + 1).cast("int"),
        ),
    )
    content = F.concat_ws("\n", header, *import_lines, body)

    return rng.select(
        _repo(fid).alias("repo"),
        _path(fid, seed, mode).alias("path"),
        # 40-hex deterministic commit id from (repo, path)
        F.concat(
            F.md5(F.concat(_repo(fid), F.lit("@"), _path(fid, seed, mode))),
            F.substring(F.md5(_path(fid, seed, mode)), 1, 8),
        ).alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
    )


def derive_edges(corpus: DataFrame) -> DataFrame:
    """Directed dependency edges ``(src_oid, dst_oid)`` from import refs.

    Pure Catalyst: regexp_extract_all → explode → distinct. Dangling
    references (targets not present as files) are kept only if they
    resolve to an existing oid — enforced by the caller joining against
    the vertex set, or here via semi-join when ``resolve=True`` is not
    needed because the generator only emits existing oids.
    Self-loops are dropped (projection-to-simple semantics,
    /root/reference/analytical_engine/core/fragment/arrow_projected_fragment.h:390-508).
    """
    src_oid = F.concat(F.col("repo"), F.lit(":"), F.col("path"))
    refs = F.regexp_extract_all(F.col("content"), F.lit(_REF_RE), F.lit(1))
    return (
        corpus.select(src_oid.alias("src_oid"), F.explode(refs).alias("dst_oid"))
        .where(F.col("src_oid") != F.col("dst_oid"))
        .distinct()
    )


def content_sha_set(corpus: DataFrame) -> DataFrame:
    """sha256(content) row-set — the per-row invariant every stage preserves."""
    return corpus.select(F.sha2(F.col("content"), 256).alias("sha"))


def synth_edge_graph(
    spark: SparkSession,
    n_vertices: int,
    avg_out_degree: int = 8,
    seed: int = 42,
    hub_pct: int = 20,
    n_hubs: int = 1000,
    partitions: int | None = None,
):
    """Deterministic vid-level edge graph for large-scale benchmarks.

    Skips the corpus-text round trip (generating 10^8-edge graphs through
    regex extraction is pure generator cost, not engine cost) while
    keeping the same shape the corpus derivation produces: power-skewed
    in-degree (``hub_pct``% of edges land on ``n_hubs`` hub vertices),
    fully JVM-side (``spark.range`` + xxhash64 Catalyst expressions —
    identical row set at any parallelism), no per-row Python. Returns a
    :class:`linkgraph.graph.LinkGraph`. Multi-edges are possible but
    vanishingly rare (~deg/|V|); both execution tiers treat them
    identically.
    """
    from linkgraph.graph import LinkGraph

    rng = spark.range(0, n_vertices, 1, partitions) if partitions else spark.range(n_vertices)
    src = F.col("id")
    deg = F.pmod(F.xxhash64(src, F.lit(seed)), F.lit(2 * avg_out_degree + 1))
    slots = F.when(deg > 0, F.sequence(F.lit(0), (deg - 1).cast("int"))).otherwise(
        F.array().cast("array<int>")
    )
    exploded = rng.select(src.alias("src"), F.explode(slots).alias("j"))
    is_hub = F.pmod(F.xxhash64("src", "j", F.lit(seed + 1)), F.lit(100)) < hub_pct
    dst = F.when(
        is_hub, F.pmod(F.xxhash64("src", "j", F.lit(seed + 2)), F.lit(min(n_hubs, n_vertices)))
    ).otherwise(F.pmod(F.xxhash64("src", "j", F.lit(seed + 3)), F.lit(n_vertices)))
    edges = exploded.select("src", dst.alias("dst")).where(F.col("src") != F.col("dst"))
    vertices = rng.select(F.col("id").alias("vid"), F.col("id").cast("string").alias("oid"))
    return LinkGraph(vertices=vertices, edges=edges)
