"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side machinery (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the actual media decode is STUBBED — the
image/audio libraries are not in this container. `decode_image_meta` raises
NotImplementedError unless `fake=True`, which substitutes a deterministic
fake decoder (byte-derived dimensions) so the pipeline shape is testable.

Pattern: mapInPandas over an iterator of Arrow batches — constant memory per
task regardless of blob sizes; binary columns never pass through Python row
objects. At 100 TB: store blobs in their own column family / parquet file
group (Iceberg column-level encryption/pruning keeps metadata scans from
touching bytes), partition by content-date, and size
spark.sql.files.maxPartitionBytes so one task holds a handful of blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.functions import col as F_col
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
)

IMAGE_META_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("n_bytes", LongType()),
    StructField("format", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
])


def _fake_decode(blob: bytes) -> tuple[str, int, int]:
    """Deterministic stand-in for a real image decoder."""
    if len(blob) >= 2 and blob[:2] == b"\xff\xd8":
        fmt = "jpeg"
    elif blob[:4] == b"\x89PNG":
        fmt = "png"
    else:
        fmt = "unknown"
    w = 16 + (blob[0] if blob else 0)
    h = 16 + (blob[-1] if blob else 0)
    return fmt, int(w), int(h)


def decode_image_meta(df: DataFrame, blob_col: str = "blob",
                      url_col: str = "url", fake: bool = False) -> DataFrame:
    """binary blobs → typed metadata rows via mapInPandas (iterator form)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image decode requires PIL/libvips — not in this "
                    "container; pass fake=True for the deterministic stub")
            metas = [_fake_decode(bytes(b) if b is not None else b"")
                     for b in pdf[blob_col]]
            yield pd.DataFrame({
                "url": pdf[url_col].astype(str),
                "n_bytes": [len(bytes(b)) if b is not None else 0
                            for b in pdf[blob_col]],
                "format": [m[0] for m in metas],
                "width": [m[1] for m in metas],
                "height": [m[2] for m in metas],
            })

    return df.select(url_col, blob_col).mapInPandas(gen, IMAGE_META_SCHEMA)


COMPATIBLE_MIME_RE = r"^image/(jpeg|png|gif|bmp|webp)"


def mime_gate(df: DataFrame, content_type_col: str,
              pattern: str = COMPATIBLE_MIME_RE) -> DataFrame:
    """Content-Type gate for media enrichment — the reference's NSFW
    classifier only runs on images matching a MIME regex
    (/root/reference/components/extractor/nsfw/extractor.go:56-77). JVM-side
    rlike so Catalyst can push it before any Python stage."""
    return df.filter(F_col(content_type_col).rlike(pattern))


def classify_nsfw_stub(df: DataFrame, blob_col: str = "blob",
                       url_col: str = "url") -> DataFrame:
    """NSFW classification plumbing (reference nsfw/extractor.go:81-118):
    deterministic fake scores derived from blob bytes — the real model hook
    replaces `_fake_scores`. Output mirrors the reference's NSFW struct
    (classes drawing/hentai/neutral/porn/sexy, types/nfsw.go:4-17)."""
    from pyspark.sql.types import DoubleType

    schema = StructType([
        StructField("url", StringType()),
        StructField("drawing", DoubleType()),
        StructField("hentai", DoubleType()),
        StructField("neutral", DoubleType()),
        StructField("porn", DoubleType()),
        StructField("sexy", DoubleType()),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"url": pdf[url_col].astype(str), "drawing": [],
                    "hentai": [], "neutral": [], "porn": [], "sexy": []}
            for b in pdf[blob_col]:
                b = bytes(b) if b is not None else b""
                h = sum(b[:64]) % 1000 / 1000.0
                rows["drawing"].append(round(h * 0.1, 6))
                rows["hentai"].append(round(h * 0.05, 6))
                rows["neutral"].append(round(1.0 - h * 0.3, 6))
                rows["porn"].append(round(h * 0.1, 6))
                rows["sexy"].append(round(h * 0.05, 6))
            yield pd.DataFrame(rows)

    return df.select(url_col, blob_col).mapInPandas(gen, schema)


def frame_sample_plan(df: DataFrame, blob_col: str = "blob",
                      url_col: str = "url", every_n: int = 30) -> DataFrame:
    """Video frame-sampling plumbing: emits (url, frame_idx) fan-out rows via
    mapInPandas — the decode itself is stubbed (NotImplementedError path is
    the real decoder hook). Fan-out inside mapInPandas keeps the blob on one
    task while multiplying metadata rows."""
    schema = StructType([StructField("url", StringType()),
                         StructField("frame_idx", IntegerType())])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, idxs = [], []
            for u, b in zip(pdf[url_col], pdf[blob_col]):
                n_frames = (len(bytes(b)) if b is not None else 0) // 64 + 1
                for i in range(0, n_frames, every_n):
                    urls.append(str(u))
                    idxs.append(i)
            yield pd.DataFrame({"url": urls, "frame_idx": idxs})

    return df.select(url_col, blob_col).mapInPandas(gen, schema)
