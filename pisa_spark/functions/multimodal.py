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
    """mapInPandas kernel: per media blob, compute real byte-level
    features vectorized over the batch. The decode seam is the
    per-blob np.frombuffer view — a real decoder drops in here."""
    for pdf in pdf_iter:
        if pdf.empty:
            continue
        ent, hh, hists = [], [], []
        for blob in pdf["media"]:
            arr = np.frombuffer(blob, dtype=np.uint8)
            if arr.size == 0:
                ent.append(0.0)
                hh.append(0)
                hists.append([0] * 16)
                continue
            counts = np.bincount(arr >> 4, minlength=16)
            p = counts / arr.size
            nz = p[p > 0]
            ent.append(float(-(nz * np.log2(nz)).sum()))
            head = arr[:8]
            hh.append(int(head.astype(np.int64).sum()))
            hists.append(counts.astype(int).tolist())
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["n_bytes"],
                "byte_entropy": ent,
                "head_hash": hh,
                "histogram16": hists,
            }
        )


def extract_media_features(media: DataFrame) -> DataFrame:
    """media table -> per-blob byte features via Arrow-batched kernel."""
    return media.mapInPandas(_byte_features, schema=FEATURE_SCHEMA)
