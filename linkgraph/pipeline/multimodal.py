"""Multimodal column plumbing: binary payloads + typed metadata.

Image/audio/video are opaque ``binary`` columns with a typed metadata
struct. Decode/feature-extraction runs as Arrow-batched ``mapInPandas``
stages — the Spark-side contract (schema, partitioning, batch shape) is
real and tested; the actual codec call is stubbed (the container ships no
image/audio libraries): ``decode_stub=True`` produces a deterministic
fake decode keyed on the payload hash, ``decode_stub=False`` raises
``NotImplementedError`` at the point a real codec would be invoked.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image | audio | video
        T.StructField("data", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16


def _md5_mod(col, tag: str, seed: int, m: int):
    """Engine-portable pseudo-random in [0, m): md5 of ``tag:seed:id``.

    Same value in DuckDB via
    ``('0x' || substring(md5('<tag>:<seed>:' || id), 1, 15))::BIGINT % m``
    (15 hex chars = 60 bits, fits a signed 64-bit int in both engines).
    """
    h = F.md5(F.concat(F.lit(f"{tag}:{seed}:"), col.cast("string")))
    return F.pmod(F.conv(F.substring(h, 1, 15), 16, 10).cast("long"), F.lit(m))


def synth_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payload = seeded bytes).

    All pseudo-randomness is md5-based (:func:`_md5_mod`) so the table —
    and everything derived from it — replays bit-identically in the
    DuckDB correctness oracles.
    """
    base = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (_md5_mod(F.col("id"), "modality", seed, 3) + 1).cast("int"),
        ).alias("modality"),
        F.sha2(F.concat(F.lit("payload"), F.col("id").cast("string")), 256).cast("binary").alias("data"),
    )
    return base.select(
        "media_id",
        "modality",
        "data",
        F.struct(
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(16000).alias("sample_rate"),
            (_md5_mod(F.col("media_id"), "frames", seed, 240) + 1).cast("int").alias("n_frames"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )


def _fake_feature(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic pseudo-feature from the payload hash."""
    h = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32)


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """(media_id, modality, feature: array<float>) via Arrow-batched mapInPandas.

    The fake decode is keyed on sha256(payload), which is computed
    **JVM-side** (codegen'd ``F.sha2``) so only 32-byte digests cross the
    Arrow boundary — never the payloads — and the Python stage is a pure
    batch-vectorized numpy reshape (no per-row Python, per the engine's
    vectorization invariant). A real codec would replace the reshape with
    a per-batch decode over ``data`` instead of ``digest``.
    """
    dim = FEATURE_DIM

    hashed = media.select(
        "media_id",
        "modality",
        F.unhex(F.sha2(F.coalesce(F.col("data"), F.lit(b"")), 256)).alias("digest"),
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real image/audio decode requires codec libraries not present "
                    "in this environment; run with decode_stub=True"
                )
            n = len(pdf)
            if n == 0:
                yield pd.DataFrame({"media_id": [], "modality": [], "feature": []})
                continue
            digests = np.frombuffer(b"".join(pdf["digest"]), dtype=np.uint8).reshape(n, 32)
            reps = (dim * 4 + 31) // 32
            raw = np.ascontiguousarray(np.tile(digests, reps)[:, : dim * 4]).view(np.uint32)
            feats = (raw.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "modality": pdf["modality"],
                 "feature": list(feats)}
            )

    return hashed.mapInPandas(
        op, schema="media_id long, modality string, feature array<float>"
    )


def sample_frames(media: DataFrame, every_n: int = 30) -> DataFrame:
    """(media_id, frame_idx) — frame sampling plan for video rows, JVM-side.

    Produces the (row → frames) fan-out a real decoder would fill; the
    per-frame decode itself is the stubbed step.
    """
    vids = media.where(F.col("modality") == "video")
    return vids.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))).alias(
            "frame_idx"
        ),
    )


def resize_plan(media: DataFrame, width: int, height: int) -> DataFrame:
    """Typed resize stage: metadata transform now, decode stubbed."""
    return media.select(
        "media_id",
        "modality",
        "data",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.sample_rate").alias("sample_rate"),
            F.col("meta.n_frames").alias("n_frames"),
            F.col("meta.codec").alias("codec"),
        ).alias("meta"),
    )
