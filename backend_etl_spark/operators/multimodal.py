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


def decode_audio(payload: bytes):  # pragma: no cover - stub
    """STUB: real audio decode requires soundfile/librosa, not present here."""
    raise NotImplementedError(
        "audio decode is stubbed in this environment; extract_features() "
        "provides the deterministic feature path"
    )


def decode_video(payload: bytes):  # pragma: no cover - stub
    """STUB: real video decode requires ffmpeg/opencv, not present here."""
    raise NotImplementedError(
        "video decode is stubbed in this environment; frame_sample() provides "
        "the deterministic frame-chunking path"
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
    payload = _as_payload(df, id_col, text_col)
    return payload.mapInPandas(_meta_batches, BINARY_META_SCHEMA)


def _as_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, BINARY content) projection — the opaque-media column shape.

    Deliberately NOT repartitioned: these stand-in decoders are
    byte-cheap, so Python-worker spawn would dominate any parallelism
    win. A real codec (ms-per-payload) should wrap this in
    ``partitioning.spread`` so one batch stream runs per core."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
    )


FRAME_SCHEMA = "doc_id bigint, frame_idx bigint, frame_len bigint, frame_md5 string"


def frame_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    frame_bytes: int = 64,
    every: int = 4,
) -> DataFrame:
    """Video-style frame sampling over an opaque binary payload: chunk
    into fixed-size frames, keep every k-th (1 payload row → N frame
    rows, the UDTF/flatMap shape of the reference's page→reviews parse,
    SURVEY §2.12 D4).

    The "decode" is a deterministic byte-chunking stand-in (real codecs
    absent — see decode_video); the Spark plumbing is real: Arrow-batched
    mapInPandas, per-partition fan-out with no shuffle. At 100 TB the
    payload column never leaves the executor and output is pruned to
    frame digests, not frame bytes.
    """

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            lens: list[int] = []
            md5s: list[str] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                for i in range(0, (len(payload) + frame_bytes - 1) // frame_bytes, every):
                    frame = payload[i * frame_bytes : (i + 1) * frame_bytes]
                    ids.append(doc_id)
                    idxs.append(i)
                    lens.append(len(frame))
                    md5s.append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_len": pd.Series(lens, dtype="int64"),
                    "frame_md5": pd.Series(md5s, dtype="object"),
                }
            )

    return _as_payload(df, id_col, text_col).mapInPandas(_frames, FRAME_SCHEMA)


FEATURE_SCHEMA = "doc_id bigint, feat_idx bigint, feat_q bigint"


def extract_features(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", dim: int = 4
) -> DataFrame:
    """Decode-and-embed stand-in: a deterministic `dim`-wide feature
    vector per payload, quantized to 16-bit ints (feature k = the k-th
    4-hex-digit window of the payload md5).

    Integers, not floats, so the DuckDB oracle matches hash-exact with
    no rounding hazard. Shape-wise this is exactly the real path (opaque
    binary in → fixed-width vector out, Arrow both ways); swapping the
    md5 for a model forward pass changes nothing in the plan.
    """

    def _feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            vals: list[int] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                h = hashlib.md5(payload).hexdigest()
                for k in range(dim):
                    ids.append(doc_id)
                    idxs.append(k)
                    vals.append(int(h[4 * k : 4 * k + 4], 16))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "feat_idx": pd.Series(idxs, dtype="int64"),
                    "feat_q": pd.Series(vals, dtype="int64"),
                }
            )

    return _as_payload(df, id_col, text_col).mapInPandas(_feats, FEATURE_SCHEMA)


RESIZE_SCHEMA = "doc_id bigint, resized_len bigint, resized_md5 string"


def resize_payload(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", target_bytes: int = 100
) -> DataFrame:
    """Resize/downscale stand-in: truncate the payload to `target_bytes`
    and re-digest (real image resize absent — see decode_image). Same
    mapInPandas batch shape as a real thumbnailer."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf["content"].map(lambda b: b[:target_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "resized_len": resized.map(len).astype("int64"),
                    "resized_md5": resized.map(lambda b: hashlib.md5(b).hexdigest()),
                }
            )

    return _as_payload(df, id_col, text_col).mapInPandas(_resize, RESIZE_SCHEMA)
