"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with decode / feature-extract plumbing as Arrow-batched pandas
UDFs over ``mapInPandas``.

The decode step itself is STUBBED (this container has no image/audio
codecs): :func:`decode_media` raises ``NotImplementedError`` unless
``deterministic_fake=True``, in which case metadata is derived from the
bytes deterministically. Everything Spark-side — schema, partitioning,
UDF signature, Arrow batch shape — is real and tested; swapping the fake
for PIL/torchaudio is a one-function change inside the UDF.

Scale notes: binary payloads ride in Arrow buffers; ``mapInPandas``
processes whole record batches (no per-row Python), and the metadata
projection drops the binary column as early as possible so downstream
stages never shuffle blobs.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_TYPES = ["image", "audio", "video"]

MEDIA_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("content", T.BinaryType()),
])

META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
])


def attach_media(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Deterministic media table from a text table: the text's UTF-8 bytes
    stand in for an encoded payload; media_type cycles by id. (In
    production this is `spark.read` over the real binary files /
    Iceberg `binary` column — this adapter exists so the pipeline is
    testable without codecs.)"""
    mt = F.element_at(
        F.array(*[F.lit(m) for m in MEDIA_TYPES]),
        (F.col(id_col) % len(MEDIA_TYPES) + 1).cast("int"))
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        mt.alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
    )


def decode_media(content: bytes, media_type: str, *,
                 deterministic_fake: bool = False) -> dict:
    """Decode one payload → metadata dict. REAL decoding is not available
    in this environment; the deterministic fake derives plausible metadata
    purely from the byte length so tests and oracles can verify the
    plumbing end-to-end."""
    if not deterministic_fake:
        raise NotImplementedError(
            "media codecs (PIL/av/torchaudio) are not installed in this "
            "container; pass deterministic_fake=True or plug a decoder in")
    n = len(content)
    if media_type == "image":
        return {"width": 320 + n % 1280, "height": 240 + n % 720,
                "duration_ms": 0}
    if media_type == "audio":
        return {"width": 0, "height": 0, "duration_ms": 1000 + (n % 600) * 100}
    return {"width": 640, "height": 360, "duration_ms": 2000 + (n % 3600) * 50}


def extract_media_meta(media: DataFrame, *,
                       deterministic_fake: bool = True) -> DataFrame:
    """``mapInPandas`` metadata extraction over the binary column —
    the real 100 TB shape: one Arrow batch in, one metadata batch out,
    binary dropped from the output."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                decode_media(c, m, deterministic_fake=deterministic_fake)
                for c, m in zip(pdf["content"], pdf["media_type"])
            ]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": [len(c) for c in pdf["content"]],
                "width": [m["width"] for m in metas],
                "height": [m["height"] for m in metas],
                "duration_ms": [m["duration_ms"] for m in metas],
            })

    return media.mapInPandas(run, schema=META_SCHEMA)


def media_size_stats(media: DataFrame, *,
                     type_col: str = "media_type",
                     content_col: str = "content",
                     round_digits: int = 6) -> DataFrame:
    """Storage/ingest dashboard over a binary media column — per media
    type ``(media_type, n_items, n_null, total_bytes, avg_bytes,
    max_bytes)`` ordered by type — the capacity-planning numbers a
    100 TB multimodal ingest is budgeted against (and the first place a
    corrupted export shows: a type whose avg_bytes collapses to 3 bytes
    is writing placeholders, visible long before any decode).

    No decode anywhere: ``length(binary)`` is JVM-side byte length, so
    the whole operator is ONE map-side-combined hash aggregate on the
    type key — payload bytes never shuffle, nothing touches Python.
    ``avg_bytes`` is one exact-int IEEE division rounded; NULL payloads
    count in ``n_items``/``n_null`` but contribute no bytes."""
    ln = F.length(F.col(content_col))
    agg = media.groupBy(type_col).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col(content_col).isNull().cast("long")).alias("n_null"),
        F.coalesce(F.sum(ln), F.lit(0)).cast("bigint")
         .alias("total_bytes"),
        F.max(ln).alias("max_bytes"),
        F.sum(ln.isNotNull().cast("long")).alias("_nnn"))
    return (agg.select(
                type_col, "n_items", "n_null", "total_bytes",
                F.round(F.col("total_bytes")
                        / F.nullif(F.col("_nnn"), F.lit(0)),
                        round_digits).alias("avg_bytes"),
                F.coalesce("max_bytes", F.lit(0)).alias("max_bytes"))
            .orderBy(type_col))


def frame_sample_plan(media: DataFrame, *, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits one planned
    ``(doc_id, frame_idx, offset_ms)`` row per sampled frame from the
    (fake-decoded) duration — the distributed fan-out a real frame
    extractor would feed. Uses ``explode(sequence(...))``, stays JVM-side."""
    meta = extract_media_meta(media).filter(F.col("media_type") == "video")
    return meta.select(
        "doc_id",
        F.posexplode(
            F.sequence(F.lit(0), (F.col("duration_ms") / every_ms).cast("long"))
        ).alias("frame_idx", "_step"),
    ).select("doc_id", "frame_idx",
             (F.col("_step") * every_ms).alias("offset_ms"))
