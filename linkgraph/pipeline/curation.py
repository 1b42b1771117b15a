"""Corpus-curation operators: the decisions a training-data pipeline
makes AFTER measuring (dedup clustering, splits, sampling,
contamination screening, repetition/boilerplate scoring, PII scrubbing).

Everything is Catalyst-expressible (no Python in any hot path) and
deterministic, with a DuckDB-portable ``hash_mode="md5"`` twin for every
randomized decision so the driver's oracle can replay it bit-for-bit
(Spark ``conv(substring(md5(x),1,15),16,10)`` == DuckDB
``('0x'||substring(md5(x),1,15))::BIGINT``).

At 100 TB every operator here is a scan plus at most one keyed shuffle:
splits/sampling are stateless hash arithmetic, repetition scores shuffle
(doc_id, line)-sized rows (never documents), contamination joins hashed
n-grams against a broadcastable benchmark set, and dedup clustering runs
the oracle-verified WCC kernel over the (tiny) near-dup pair graph —
documents themselves are only touched by one final semi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def _hash_bucket(col, seed: int, hash_mode: str):
    """Deterministic uniform bucket in [0, 1e6) from a column + seed.

    md5 mode uses the 60-bit prefix trick shared with the corpus
    generator so DuckDB replays it exactly; xxhash64 is the production
    path (one JVM hash vs an md5 + string conv per row).
    """
    tagged = F.concat_ws(":", F.lit(str(seed)), col.cast("string"))
    if hash_mode == "md5":
        h = F.conv(F.substring(F.md5(tagged), 1, 15), 16, 10).cast("long")
    else:
        h = F.xxhash64(tagged)
    return F.pmod(h, F.lit(_BUCKETS))


def hash_split(
    df: DataFrame,
    weights=(0.8, 0.1, 0.1),
    names=("train", "val", "test"),
    id_col: str = "doc_id",
    seed: int = 42,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Deterministic train/val/test assignment by id hash.

    Adds a ``split`` column. Stateless per-row arithmetic — no shuffle,
    no sampling state, stable under re-runs and appends (a doc's split
    never changes when the corpus grows, the property that matters for
    decontaminating later training runs).
    """
    if len(weights) != len(names):
        raise ValueError("weights and names must align")
    total = float(sum(weights))
    bucket = _hash_bucket(F.col(id_col), seed, hash_mode)
    acc = 0.0
    expr = F.lit(names[-1])
    cuts = []
    for w, n in zip(weights[:-1], names[:-1]):
        acc += w / total
        cuts.append((int(acc * _BUCKETS), n))
    for cut, name in reversed(cuts):
        expr = F.when(bucket < cut, F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def pack_sequences(
    df: DataFrame,
    budget: int = 2048,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 0,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """(shard, bin, doc_id, tok_in_bin) — deterministic concat-and-chunk
    sequence packing: every training bin holds exactly ``budget`` tokens
    (GPT-style pretraining sample packing; documents may straddle bin
    boundaries, emitting one row per (doc, bin) overlap).

    Shape at 100 TB: docs shard by a seeded id hash (each shard packs
    independently — the parallel unit), order inside the shard by id,
    and the bin spans fall out of ONE window cumsum:
    bin ∈ [start/budget, (end−1)/budget]. One hash exchange, one
    in-partition sort, a local explode — pure Catalyst, zero UDFs, and
    re-runs/appends keep every existing doc's shard stable (same
    property hash_split guarantees). Empty docs are dropped (they carry
    no tokens). md5 hash_mode + whitespace tokens replay exactly in
    DuckDB (driver entry doc_pack)."""
    from pyspark.sql import Window

    from linkgraph.pipeline.text import token_counts

    tk = token_counts(df, id_col, text_col).select(
        id_col, F.col("ws_tokens").alias("tokens")
    )
    sh = tk.where(F.col("tokens") > 0).withColumn(
        "shard",
        F.pmod(_hash_bucket(F.col(id_col), seed, hash_mode), F.lit(n_shards)).cast(
            "int"
        ),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    x = sh.withColumn("e", F.sum("tokens").over(w)).withColumn(
        "s", F.col("e") - F.col("tokens")
    )
    z = x.withColumn(
        "bin",
        F.explode(
            F.sequence(
                F.floor(F.col("s") / budget), F.floor((F.col("e") - 1) / budget)
            )
        ),
    )
    return z.select(
        "shard",
        F.col("bin").cast("long").alias("bin"),
        F.col(id_col),
        (
            F.least(F.col("e"), (F.col("bin") + 1) * budget)
            - F.greatest(F.col("s"), F.col("bin") * budget)
        )
        .cast("long")
        .alias("tok_in_bin"),
    )


def mixture_sample(
    df: DataFrame,
    targets: dict[str, int],
    by: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 0,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Deterministic data-mixing downsample: keep a per-stratum fraction
    of documents so the surviving TOKEN distribution over ``by`` matches
    the ``targets`` weights in expectation, discarding as little data as
    possible.

    The standard pretraining mixture step. With integer target weights
    w_s and current token counts c_s, the binding stratum
    u = argmin c_s/w_s (most under-represented relative to its target,
    ties by stratum value) keeps everything; every other stratum keeps
    r_s = (c_u·w_s)/(w_u·c_s) — the normalizations cancel, so the keep
    cutoffs are EXACT integer arithmetic (floor at the _BUCKETS grain)
    and the DuckDB oracle replays them bit-for-bit. Selection is the
    same stable id-hash rule as hash_split (per-doc decisions never
    flip when other strata grow... the cutoff itself shifts with the
    corpus, as any mixture must). Strata absent from ``targets`` drop.
    One (stratum, tokens) aggregation → |strata| driver scalars → one
    literal CASE cutoff — nothing heavier than the token count moves.
    """
    from linkgraph.pipeline.text import token_counts

    tk = token_counts(df, id_col, text_col).select(
        id_col, F.col("ws_tokens").alias("__mix_tokens")
    )
    d = df.join(tk, id_col)
    shares = {
        r[by]: int(r["tok"])
        for r in d.groupBy(by).agg(F.sum("__mix_tokens").alias("tok")).collect()
        if r[by] in targets and r["tok"]
    }
    if not shares:
        return d.drop("__mix_tokens").limit(0)
    u = min(sorted(shares), key=lambda s: shares[s] / targets[s])
    cuts = {
        s: min(
            _BUCKETS, (_BUCKETS * shares[u] * targets[s]) // (targets[u] * shares[s])
        )
        for s in shares
    }
    expr = F.lit(-1).cast("long")
    for s, cut in cuts.items():
        expr = F.when(F.col(by) == s, F.lit(cut)).otherwise(expr)
    bucket = _hash_bucket(
        F.concat_ws("|", F.col(by), F.col(id_col).cast("string")), seed, hash_mode
    )
    return d.withColumn("__mix_cut", expr).where(bucket < F.col("__mix_cut")).drop(
        "__mix_cut", "__mix_tokens"
    )


def stratified_sample(
    df: DataFrame,
    fraction: float,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 42,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Deterministic ~``fraction`` sample within every stratum.

    Hash-threshold (Bernoulli per row, keyed by stratum+id) rather than
    Spark's ``sampleBy``: reproducible across runs/partitionings, and
    the per-stratum rate is exact in expectation regardless of skew.
    """
    bucket = _hash_bucket(
        F.concat_ws("|", F.col(strata_col).cast("string"), F.col(id_col).cast("string")),
        seed,
        hash_mode,
    )
    return df.where(bucket < int(fraction * _BUCKETS))


def repetition_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style within-document repetition signals.

    (id, n_lines, dup_line_ratio, dup_line_char_ratio, top_bigram_ratio):
    fraction of lines that are repeats of an earlier line, fraction of
    line characters inside duplicated lines, and the share of the most
    frequent word bigram among all bigrams. High values mark boilerplate
    / template / scraped-nav documents.

    Shape: explode to (doc_id, line) / (doc_id, bigram), two keyed
    aggregations with map-side combine — row width is a line, never a
    document, so skewed giant docs only cost their own key.
    """
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    base = df.select(F.col(id_col), lines.alias("lines"))
    per_line = (
        base.select(F.col(id_col), F.explode("lines").alias("line"))
        .groupBy(id_col, "line")
        .agg(F.count("*").alias("cnt"))
    )
    line_stats = per_line.groupBy(id_col).agg(
        F.sum("cnt").cast("long").alias("n_lines"),
        (F.sum("cnt") - F.count("*")).cast("long").alias("n_dup_lines"),
        F.sum(F.length("line") * F.col("cnt")).cast("long").alias("line_chars"),
        F.sum(F.when(F.col("cnt") > 1, F.length("line") * F.col("cnt")).otherwise(F.lit(0)))
        .cast("long")
        .alias("dup_line_chars"),
    )
    words = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda w: w != "")
    grams = df.select(
        F.col(id_col),
        F.when(
            F.size(words) >= 2,
            F.zip_with(
                F.slice(words, 1, F.greatest(F.size(words) - 1, F.lit(1))),
                F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(1))),
                lambda a, b: F.concat_ws(" ", a, b),
            ),
        )
        .otherwise(F.array())
        .alias("grams"),
    )
    top_bigram = (
        grams.select(F.col(id_col), F.explode("grams").alias("g"))
        .groupBy(id_col, "g")
        .agg(F.count("*").alias("cnt"))
        .groupBy(id_col)
        .agg(
            F.max("cnt").alias("top_cnt"),
            F.sum("cnt").alias("n_grams"),
        )
    )
    ids = df.select(F.col(id_col))
    out = (
        ids.join(line_stats, id_col, "left")
        .join(top_bigram, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            F.when(
                F.coalesce("n_lines", F.lit(0)) > 0,
                F.col("n_dup_lines") / F.col("n_lines"),
            )
            .otherwise(F.lit(0.0))
            .cast("double")
            .alias("dup_line_ratio"),
            F.when(
                F.coalesce("line_chars", F.lit(0)) > 0,
                F.col("dup_line_chars") / F.col("line_chars"),
            )
            .otherwise(F.lit(0.0))
            .cast("double")
            .alias("dup_line_char_ratio"),
            F.when(
                F.coalesce("n_grams", F.lit(0)) > 0, F.col("top_cnt") / F.col("n_grams")
            )
            .otherwise(F.lit(0.0))
            .cast("double")
            .alias("top_bigram_ratio"),
        )
    )
    return out


def contamination_check(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.1,
) -> DataFrame:
    """Benchmark-overlap screening: which training docs share word
    n-grams with an eval set (the standard pre-training decontamination
    pass; public recipe per GPT-3/PaLM appendices: 8-13-gram collision).

    Returns (id, n_grams, n_contaminated, contamination_ratio,
    contaminated). The benchmark side is reduced to a DISTINCT n-gram
    set — small by construction, so Catalyst broadcasts the join; the
    docs side streams. n=3 suits the tiny synthetic docs; production
    would use 8+.
    """

    def _grams(frame, keep_id):
        words = F.filter(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda w: w != ""
        )
        g = F.when(
            F.size(words) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(words) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(words, i, n)),
            ),
        ).otherwise(F.array(F.concat_ws(" ", words)))
        cols = [F.col(id_col)] if keep_id else []
        return frame.select(*cols, F.explode(F.array_distinct(g)).alias("g"))

    bench_grams = _grams(benchmark, keep_id=False).distinct()
    doc_grams = _grams(docs, keep_id=True)
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "g", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_contaminated"))
    )
    totals = doc_grams.groupBy(id_col).agg(F.count("*").cast("long").alias("n_grams"))
    ratio = F.coalesce("n_contaminated", F.lit(0)) / F.col("n_grams")
    return (
        totals.join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_grams"),
            F.coalesce("n_contaminated", F.lit(0)).cast("long").alias("n_contaminated"),
            ratio.cast("double").alias("contamination_ratio"),
            (ratio >= threshold).alias("contaminated"),
        )
    )


def dedup_clusters(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Near-duplicate pairs → duplicate clusters via the graph engine.

    Runs the oracle-verified WCC kernel (label min-propagation,
    linkgraph/algorithms/wcc.py) over the pair graph and returns
    (doc_id, canonical) where canonical is the smallest doc id in the
    connected cluster — the member a dedup pass keeps. Only ids that
    appear in some pair are returned (singletons are trivially their own
    canonical; callers use ``deduplicate`` for the full-corpus view).

    The pair graph is orders of magnitude smaller than the corpus
    (near-dup rate × docs), so the iterative part never touches
    documents — the same GIE→GAE shape as subgraph()+wcc.
    """
    from linkgraph.algorithms import wcc
    from linkgraph.graph import build_graph

    edges = pairs.select(
        F.col(id_a).cast("long").alias("src_oid"), F.col(id_b).cast("long").alias("dst_oid")
    )
    g = build_graph(edges)
    comp = wcc(g)  # (vid, value=min vid in component)
    # the vertex map keeps oids as strings, where lexicographic min is
    # NOT numeric min ("10" < "9") — take the numeric min per component
    # explicitly (one agg over the pair-vertex set, which is tiny).
    labeled = comp.join(g.vertices, "vid").select(
        F.col("oid").cast("long").alias("doc_id"), F.col("value").alias("comp")
    )
    rep = labeled.groupBy("comp").agg(F.min("doc_id").alias("canonical"))
    # Cache ownership stays LOCAL to this graph (r3 reached into dedup's
    # private _CACHED, freeing caches a concurrent near-dup pipeline still
    # owned). The output is pair-graph sized, so materialize it eagerly
    # (cuts lineage back to the caches), then free this graph's blocks.
    out = labeled.join(rep, "comp").select("doc_id", "canonical").localCheckpoint(eager=True)
    for df in g._cached:
        df.unpersist()
    g._cached = []
    return out


def deduplicate(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Drop every doc that near-dup-clusters to a smaller canonical id.

    One anti-join of the corpus against the (tiny) non-canonical member
    list; documents are never shuffled.
    """
    clusters = dedup_clusters(pairs)
    losers = clusters.where(F.col("doc_id") != F.col("canonical")).select(
        F.col("doc_id").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")


# public, intentionally simple patterns (same spirit as the reference
# public scrubbing recipes); RE2/Java-compatible subset so the DuckDB
# oracle matches byte-for-byte.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def pii_scrub(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_email, n_phone, n_ipv4, redacted) — count and mask PII.

    Pure regexp Catalyst expressions; the original text column is left
    untouched (the scrubbed text is a NEW column, preserving the
    sha256(content) row invariant of the input table). Order of
    redaction is fixed (email, phone, ipv4) so the output is
    deterministic even where patterns could overlap.
    """
    red = F.col(text_col)
    counts = []
    for name, pat in PII_PATTERNS.items():
        counts.append(
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
            .cast("long")
            .alias(f"n_{name}")
        )
        red = F.regexp_replace(red, pat, f"[{name.upper()}]")
    return df.select(F.col(id_col), *counts, red.alias("redacted"))


def cross_doc_ngram_dup(
    df: DataFrame,
    n: int = 3,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_mode: str = "md5",
) -> DataFrame:
    """CROSS-document duplicated n-gram share per document.

    (doc_id, n_grams, dup_grams, dup_frac): of a document's DISTINCT
    word n-grams, how many occur in ≥ ``min_docs`` distinct documents —
    the corpus-level complement of :func:`repetition_scores`'s
    within-document signals. High dup_frac marks boilerplate that exact
    and MinHash dedup both miss (templates sharing phrases across
    otherwise-distinct pages) and is the standard cheap filter before
    near-dedup at web scale (CCNet/RefinedWeb-style shared-shingle
    pruning).

    Shape: n-grams are built by one Catalyst ``transform(sequence)``
    (no explode of overlapping copies — one array op per doc), then the
    only shuffle carries ``md5(gram)`` 32-hex keys, never gram text or
    documents: distinct per doc, a doc-count per gram key, one semi-join
    back. ``hash_mode="md5"`` (default) keeps the DuckDB oracle exact;
    ``"xxhash64"`` is the production path — one JVM hash per gram and
    8-byte shuffle keys instead of 32-hex, same plan shape (the
    minhash_lsh_duplicates discipline).
    """
    if n < 2:
        raise ValueError("cross_doc_ngram_dup: n must be ≥ 2")
    words = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda w: w != ""
    )
    gram_at = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(F.col("w"), i + F.lit(k)) for k in range(n)]
    )
    key = (
        (lambda g: F.md5(g.cast("binary")))
        if hash_mode == "md5"
        else (lambda g: F.xxhash64(g))
    )
    grams = (
        df.select(F.col(id_col), words.alias("w"))
        .where(F.size("w") >= n)
        .select(
            id_col,
            F.transform(
                F.sequence(F.lit(1), F.size("w") - (n - 1)), gram_at
            ).alias("grams"),
        )
        .select(id_col, F.explode("grams").alias("gram"))
        .select(id_col, key(F.col("gram")).alias("gk"))
        .distinct()
    )
    gram_docs = grams.groupBy("gk").agg(F.countDistinct(id_col).alias("nd"))
    dup = gram_docs.where(F.col("nd") >= min_docs).select("gk")
    per_doc = grams.join(dup.hint("broadcast"), "gk", "left_semi").groupBy(
        id_col
    ).agg(F.count("*").alias("dup_grams"))
    totals = grams.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    return (
        df.select(id_col)
        .distinct()
        .join(totals, id_col, "left")
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("ng"),
            F.coalesce("dup_grams", F.lit(0)).cast("long").alias("dg"),
        )
        .select(
            id_col,
            F.col("ng").alias("n_grams"),
            F.col("dg").alias("dup_grams"),
            F.round(
                F.when(F.col("ng") > 0, F.col("dg") / F.col("ng")).otherwise(
                    F.lit(0.0)
                ),
                6,
            ).alias("dup_frac"),
        )
    )
