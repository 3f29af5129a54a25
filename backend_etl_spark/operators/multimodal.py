"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design: image/audio/video payloads are opaque BINARY columns with typed
metadata alongside; decode / feature-extract / resize / frame-sample run
as Arrow-batched pandas functions over ``mapInPandas`` so each executor
processes columnar batches, never Python-per-row.

Decode coverage is honest about the environment: ``decode_image``
REALLY parses binary PPM (P6), ``decode_audio`` REALLY parses PCM
WAV, and ``decode_video`` REALLY walks RIFF/AVI with uncompressed DIB
frames (stdlib only — the codec-free format of each modality),
exercised end-to-end by ``decode_image_meta`` / ``decode_audio_meta``
/ ``decode_video_meta``; JPEG/PNG/mp4/MJPEG need libraries absent
here, so compressed payloads raise, and ``binary_meta`` keeps the
deterministic stand-in path for arbitrary payloads. Swapping a real
codec in changes no plan shape.
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


def decode_image(payload: bytes) -> dict:
    """Real image decode for binary PPM (P6) — pure Python, no codec
    libraries. Parses the ASCII header (width/height/maxval tokens,
    ``#`` comments allowed) and returns the raw RGB pixel bytes.

    PPM is the codec-free exercise of the decode path: swap this for
    PIL/opencv for JPEG/PNG and nothing else in the plan changes
    (``decode_image_meta`` below is the operator). Raises ValueError on
    non-PPM input — JPEG/PNG need the real libraries (absent here)."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload; real codecs absent here")
    pos, tokens = 2, []
    while len(tokens) < 3:
        # skip whitespace and '#' comment lines between header tokens
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then raw data
    width, height, maxval = tokens
    n = width * height * 3
    pixels = payload[pos : pos + n]
    if len(pixels) != n:
        raise ValueError(f"truncated PPM: want {n} pixel bytes, got {len(pixels)}")
    return {"width": width, "height": height, "maxval": maxval, "pixels": pixels}


def decode_audio(payload: bytes) -> dict:
    """Real audio decode for PCM WAV — stdlib ``wave`` over the RIFF
    container, no external libraries. Returns params + signed 16-bit
    samples. Compressed formats (mp3/ogg) need absent libraries; this is
    the honest decodable subset, and the operator shape is identical."""
    import io
    import struct
    import wave

    with wave.open(io.BytesIO(payload)) as w:
        n = w.getnframes()
        frames = w.readframes(n)
        sampwidth = w.getsampwidth()
        if sampwidth != 2:
            raise ValueError("only 16-bit PCM supported by this decoder")
        samples = struct.unpack(f"<{n * w.getnchannels()}h", frames)
        return {
            "n_channels": w.getnchannels(),
            "sample_rate": w.getframerate(),
            "sample_width": sampwidth,
            "n_samples": n,
            "samples": samples,
        }


def decode_video(payload: bytes) -> dict:
    """Real video decode for AVI 1.0 (RIFF) carrying UNCOMPRESSED DIB
    frames ('00db' chunks) — pure Python over the public container
    spec, no codec libraries: walks the RIFF chunk tree, reads the
    main header (avih: total frames, width, height) and collects every
    raw frame's bytes from the movi list.

    This is the codec-free exercise of the video path, same honesty
    contract as decode_image (PPM) / decode_audio (PCM WAV): compressed
    streams ('00dc' — MJPEG/h264/...) raise, because their per-frame
    decode needs libraries absent here; swapping ffmpeg/opencv in
    changes only this function, never the plan shape."""
    import struct

    if payload[0:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")

    width = height = n_frames = None
    frames: list[bytes] = []

    def walk(buf: bytes, pos: int, end: int) -> None:
        nonlocal width, height, n_frames
        while pos + 8 <= end:
            cid = buf[pos : pos + 4]
            (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            data_start = pos + 8
            if cid == b"LIST":
                walk(buf, data_start + 4, data_start + size)  # skip list type
            elif cid == b"avih":
                # dwTotalFrames @ +16, dwWidth @ +32, dwHeight @ +36
                (n_frames,) = struct.unpack(
                    "<I", buf[data_start + 16 : data_start + 20]
                )
                width, height = struct.unpack(
                    "<II", buf[data_start + 32 : data_start + 40]
                )
            elif cid[2:4] == b"db":  # uncompressed DIB frame
                frames.append(buf[data_start : data_start + size])
            elif cid[2:4] == b"dc":  # compressed frame
                raise ValueError(
                    "compressed AVI stream (00dc); codec libraries absent here"
                )
            pos = data_start + size + (size & 1)  # chunks pad to even

    walk(payload, 12, len(payload))
    if width is None or n_frames is None:
        raise ValueError("AVI main header (avih) missing")
    if len(frames) != n_frames:
        raise ValueError(
            f"frame count mismatch: avih says {n_frames}, movi has {len(frames)}"
        )
    return {
        "width": width,
        "height": height,
        "n_frames": n_frames,
        "frames": frames,
    }


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


PPM_META_SCHEMA = (
    "doc_id bigint, width bigint, height bigint, maxval bigint, "
    "n_pixel_bytes bigint, sum_pixel_bytes bigint, pixel_md5 string"
)


def decode_image_meta(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched image decode: BINARY PPM payloads in, typed image
    metadata + pixel statistics out. Unlike ``binary_meta`` (stand-in),
    every output value here depends on ACTUALLY parsing the payload —
    header fields from the ASCII preamble, stats from the raw RGB bytes.
    Map-only: no shuffle, payload bytes never leave the executor."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                img = decode_image(bytes(payload))
                px = img["pixels"]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": img["width"],
                        "height": img["height"],
                        "maxval": img["maxval"],
                        "n_pixel_bytes": len(px),
                        "sum_pixel_bytes": sum(px),
                        "pixel_md5": hashlib.md5(px.hex().encode()).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows, columns=[
                "doc_id", "width", "height", "maxval",
                "n_pixel_bytes", "sum_pixel_bytes", "pixel_md5",
            ])

    return df.mapInPandas(_decode, PPM_META_SCHEMA)


AVI_META_SCHEMA = (
    "doc_id bigint, width bigint, height bigint, n_frames bigint, "
    "n_frame_bytes bigint, sum_frame_bytes bigint, frames_md5 string"
)


def decode_video_meta(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched video decode: BINARY AVI payloads in, typed video
    metadata + raw-frame statistics out. Every output value depends on
    ACTUALLY walking the RIFF tree — dimensions/frame count from the
    avih header, stats from the concatenated raw DIB frame bytes.
    Map-only: no shuffle, payload bytes never leave the executor."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                vid = decode_video(bytes(payload))
                raw = b"".join(vid["frames"])
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": vid["width"],
                        "height": vid["height"],
                        "n_frames": vid["n_frames"],
                        "n_frame_bytes": len(raw),
                        "sum_frame_bytes": sum(raw),
                        "frames_md5": hashlib.md5(raw.hex().encode()).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows, columns=[
                "doc_id", "width", "height", "n_frames",
                "n_frame_bytes", "sum_frame_bytes", "frames_md5",
            ])

    return df.mapInPandas(_decode, AVI_META_SCHEMA)


WAV_META_SCHEMA = (
    "doc_id bigint, n_channels bigint, sample_rate bigint, sample_width bigint, "
    "n_samples bigint, sum_abs bigint, first_sample bigint, last_sample bigint"
)


def encode_wav_fixture(
    df: DataFrame, id_col: str = "doc_id", sample_rate: int = 8000
) -> DataFrame:
    """Deterministic WAV fixture encoder: per doc, a mono 16-bit PCM
    file whose k-th sample is ((doc_id*31 + k*7) % 65536) - 32768 with
    (doc_id % 50) + 10 samples — written through the stdlib ``wave``
    RIFF writer, so the downstream decode parses a REAL container, not
    bytes it produced itself (separate Arrow stage)."""

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import struct
        import wave

        for pdf in batches:
            payloads = []
            for doc_id in pdf[id_col]:
                n = int(doc_id) % 50 + 10
                samples = [
                    ((int(doc_id) * 31 + k * 7) % 65536) - 32768 for k in range(n)
                ]
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(sample_rate)
                    w.writeframes(struct.pack(f"<{n}h", *samples))
                payloads.append(buf.getvalue())
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return df.select(id_col).mapInPandas(_encode, "doc_id bigint, payload binary")


def decode_audio_meta(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched audio decode: WAV payloads in, params + sample
    statistics out. Every value depends on really parsing the RIFF
    container and PCM frames (stdlib wave + struct)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                a = decode_audio(bytes(payload))
                s = a["samples"]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_channels": a["n_channels"],
                        "sample_rate": a["sample_rate"],
                        "sample_width": a["sample_width"],
                        "n_samples": a["n_samples"],
                        "sum_abs": sum(abs(v) for v in s),
                        "first_sample": s[0] if s else None,
                        "last_sample": s[-1] if s else None,
                    }
                )
            yield pd.DataFrame(rows, columns=[
                "doc_id", "n_channels", "sample_rate", "sample_width",
                "n_samples", "sum_abs", "first_sample", "last_sample",
            ])

    return df.mapInPandas(_decode, WAV_META_SCHEMA)


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
