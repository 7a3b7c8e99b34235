"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference carries media as file references (``forge.attach`` ->
distribution.contentUrl, kgforge/core/forge.py:798-809; download at
read_only_store.py:98-183).  At 100 TB scale media ride IN the table as
opaque ``binary`` columns with typed metadata, and every decode /
feature-extract / resize / frame-sample step is an Arrow-batched pandas
stage over ``mapInPandas`` — never per-row Python.

The actual byte decoding is STUBBED (image/audio libraries are not in this
container): ``_decode_image_bytes`` & co. produce deterministic fake outputs
derived from the payload hash, clearly marked with ``DECODE_IS_STUBBED``.
Everything Spark-side — schemas, partitioning, the mapInPandas batch
contract, null handling — is real and tested; swapping in PIL/ffmpeg later
changes only the stub bodies.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODE_IS_STUBBED = True  # flip when real codecs are wired in

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("media_type", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "metadata",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def media_from_documents(documents: DataFrame) -> DataFrame:
    """kind='media' spans -> media rows with a deterministic synthetic binary
    payload (stands in for the fetched bytes; production fills ``content``
    from the object store keyed by media_ref)."""
    spans = documents.select("doc_id", F.explode("spans").alias("span")).where(
        F.col("span.kind") == "media"
    )
    ref = F.col("span.media_ref")
    fake_bytes = F.unhex(F.md5(ref))  # 16 deterministic bytes per ref
    media_type = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64(ref), F.lit(3)) + 1).cast("int"),
    )
    return spans.select(
        "doc_id",
        ref.alias("media_ref"),
        media_type.alias("media_type"),
        fake_bytes.alias("content"),
        F.struct(
            F.lit("synthetic").alias("format"),
            (F.pmod(F.xxhash64(ref, F.lit(1)), F.lit(1920)) + 1).cast("int").alias("width"),
            (F.pmod(F.xxhash64(ref, F.lit(2)), F.lit(1080)) + 1).cast("int").alias("height"),
            (F.pmod(F.xxhash64(ref, F.lit(3)), F.lit(60000)) + 1).cast("int").alias("duration_ms"),
            F.lit(16000).alias("sample_rate"),
        ).alias("metadata"),
    )


# ---------------------------------------------------------------- stubs

def _decode_image_bytes(content: bytes | None, dim: int = 8) -> list[float]:
    """STUB decode: deterministic pseudo-embedding from the payload hash.
    Real impl: PIL.Image.open -> resize -> normalize -> model forward."""
    if content is None:
        raise NotImplementedError("media content missing; fetch stage not wired")
    h = hashlib.sha256(bytes(content)).digest()
    return [((h[i % len(h)] / 255.0) * 2 - 1) for i in range(dim)]


def _sample_frame_bytes(content: bytes, idx: int) -> bytes:
    """STUB frame extraction: real impl seeks the container via ffmpeg."""
    return hashlib.sha256(bytes(content) + idx.to_bytes(4, "big")).digest()


# ----------------------------------------------------- mapInPandas stages

def extract_image_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction for image rows.

    mapInPandas contract: iterator of pandas batches in, iterator out — the
    decode runs once per Arrow batch (vectorized transfer), executors stream
    batches without materializing a partition in memory.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            meta = pdf["metadata"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "width": [m["width"] for m in meta],
                    "height": [m["height"] for m in meta],
                    "channels": 3,
                    "embedding": [_decode_image_bytes(c, dim) for c in pdf["content"]],
                }
            )

    return media.where(F.col("media_type") == "image").mapInPandas(
        batches, IMAGE_FEATURES_SCHEMA
    )


def sample_video_frames(media: DataFrame, every_ms: int = 10000) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame
    (pandas-side explode keeps the batch contract)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                duration = r["metadata"]["duration_ms"] or 0
                for i, ts in enumerate(range(0, int(duration), every_ms)):
                    rows.append(
                        (r["doc_id"], r["media_ref"], i, ts, _sample_frame_bytes(r["content"], i))
                    )
            if rows:
                yield pd.DataFrame(rows, columns=["doc_id", "media_ref", "frame_idx", "ts_ms", "frame"])

    return media.where(F.col("media_type") == "video").mapInPandas(batches, FRAME_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stage: metadata rewrite is real; byte transform is stubbed
    (sha256 re-keying stands in for the resampled payload)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            pdf = pdf.copy()
            pdf["content"] = [
                hashlib.sha256(bytes(c) + f"{width}x{height}".encode()).digest()
                for c in pdf["content"]
            ]
            pdf["metadata"] = [
                {**m, "width": width, "height": height} for m in pdf["metadata"]
            ]
            yield pdf

    return media.where(F.col("media_type") == "image").mapInPandas(batches, media.schema)
