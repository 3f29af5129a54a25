"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design: image/audio/video payloads are opaque BINARY columns with typed
metadata alongside; decode / feature-extract / resize / frame-sample run
as Arrow-batched pandas functions over ``mapInPandas`` so each executor
processes columnar batches, never Python-per-row.

The decode step is STUBBED (no image/audio libraries in this
environment): ``decode_image`` raises NotImplementedError, and
``binary_meta`` uses a deterministic metadata extraction (byte length,
md5, derived fake dimensions) so the Spark-side plumbing — schema,
batch iteration, partitioning — is real and oracle-checkable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BINARY_META_SCHEMA = (
    "doc_id bigint, n_bytes bigint, content_md5 string, fake_width bigint, fake_height bigint"
)


def decode_image(payload: bytes):  # pragma: no cover - stub
    """STUB: real image decode requires PIL/opencv, not present here."""
    raise NotImplementedError(
        "image decode is stubbed in this environment; binary_meta() provides "
        "the deterministic metadata path"
    )


def _meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payloads = pdf["content"]
        n_bytes = payloads.map(len)
        md5s = payloads.map(lambda b: hashlib.md5(b).hexdigest())
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes.astype("int64"),
                "content_md5": md5s,
                # stand-in for decoded media dimensions — deterministic
                "fake_width": (n_bytes % 64).astype("int64"),
                "fake_height": (n_bytes % 48).astype("int64"),
            }
        )


def binary_meta(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Treat a text column as an opaque binary payload and extract typed
    metadata via Arrow-batched mapInPandas (the multimodal decode path)."""
    payload = df.select(
        F.col(id_col).alias("doc_id"), F.encode(F.col(text_col), "UTF-8").alias("content")
    )
    return payload.mapInPandas(_meta_batches, BINARY_META_SCHEMA)
