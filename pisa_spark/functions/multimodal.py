"""Multimodal column plumbing: opaque binary media + typed metadata.

Design (the part that must be right at 100 TB):
* media rides as an opaque ``binary`` column next to typed metadata
  (``media_type``, ``n_bytes``) — never materialized driver-side,
  never stringified;
* decode / feature-extraction runs in ``mapInPandas`` over Arrow
  batches — bytes move JVM->Python zero-copy per batch, the kernel is
  NumPy over ``np.frombuffer`` views;
* heavy media libs (PIL/torchaudio/av) are NOT in this container, so
  the codec-dependent steps (image decode, resize, audio resample,
  video frame-sample) are stubbed behind clearly-marked
  ``NotImplementedError`` raisers with an import-try — the Spark-side
  plumbing (schema, partitioning, batch shape, UDF signature) is real
  and tested;
* byte-level features (length, crc-ish hash, byte histogram) are
  computed for real — they exercise the exact same plumbing the
  decoders would.

The synthetic media column derives deterministically from document
text (UTF-8 bytes), so tests and oracles are reproducible.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = "doc_id long, media_type string, n_bytes int, media binary"
FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes int, "
    "byte_entropy double, head_hash long, histogram16 array<int>"
)

try:  # media decoders are optional; absent in this container
    import PIL.Image  # type: ignore  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media table: media bytes = UTF-8 text, type cycles
    through image/audio/video by doc_id — the plumbing fixture."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    mt = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    media = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        mt.alias("media_type"),
        F.octet_length(media).cast("int").alias("n_bytes"),
        media.alias("media"),
    )


def decode_image(data: bytes):
    """STUB: real image decode needs PIL, absent here."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode requires PIL; container ships without media libs"
        )
    raise NotImplementedError("wire PIL.Image.open here when available")


def resize_image(data: bytes, w: int, h: int):
    """STUB: see decode_image."""
    raise NotImplementedError(
        "resize requires an image decoder; container ships without media libs"
    )


def sample_video_frames(data: bytes, every_n: int = 30):
    """STUB: video frame sampling requires av/ffmpeg, absent here."""
    raise NotImplementedError(
        "frame sampling requires PyAV/ffmpeg; container ships without media libs"
    )


def _byte_features(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: byte-level features vectorized ACROSS the
    whole Arrow batch, not per blob — blobs are concatenated once and
    every statistic is a segment-indexed bincount (one C-level pass per
    feature, no Python loop over rows). The decode seam is the
    segmented concat view — a real decoder drops in here."""
    for pdf in pdf_iter:
        if pdf.empty:
            continue
        blobs = pdf["media"].tolist()
        n = len(blobs)
        lens = np.fromiter((len(b) for b in blobs), dtype=np.int64, count=n)
        concat = np.frombuffer(b"".join(blobs), dtype=np.uint8)
        seg = np.repeat(np.arange(n, dtype=np.int64), lens)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        pos = np.arange(concat.size, dtype=np.int64) - np.repeat(starts, lens)
        # 16-bucket nibble histogram per blob: one flat bincount over
        # seg*16 + bucket, reshaped (n, 16)
        hist = np.bincount(
            seg * 16 + (concat >> 4).astype(np.int64), minlength=n * 16
        ).reshape(n, 16)
        p = hist / np.maximum(lens, 1)[:, None]
        logs = np.zeros_like(p)
        np.log2(p, out=logs, where=p > 0)
        ent = -(p * logs).sum(axis=1) + 0.0  # +0.0 normalizes -0.0
        head_mask = pos < 8
        hh = np.bincount(
            seg[head_mask], weights=concat[head_mask].astype(np.float64),
            minlength=n,
        ).astype(np.int64)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["n_bytes"],
                "byte_entropy": ent,
                "head_hash": hh,
                "histogram16": list(hist.astype(np.int32)),
            }
        )


def extract_media_features(media: DataFrame) -> DataFrame:
    """media table -> per-blob byte features via Arrow-batched kernel."""
    return media.mapInPandas(_byte_features, schema=FEATURE_SCHEMA)
