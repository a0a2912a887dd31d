"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the decode step is a
deterministic fake behind the real Spark plumbing (schema, Arrow batch
shape, partitioning) — swap ``_decode_payload`` for a real decoder
(PIL/ffmpeg) on a cluster with the libs installed.  Everything else
(binary columns, mapInPandas batching, metadata struct) is production
shape and is tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8


def attach_binary_payload(docs: DataFrame, *, text: str = "text") -> DataFrame:
    """Stand-in ingest: treat the utf-8 bytes of ``text`` as the opaque
    media payload + typed metadata (mime, n_bytes)."""
    return docs.withColumn("payload", F.encode(F.col(text), "utf-8")).withColumn(
        "media_meta",
        F.struct(
            F.lit("application/x-fake").alias("mime"),
            F.length(F.col("payload")).alias("n_bytes"),
        ),
    )


def _decode_payload(payload: bytes) -> np.ndarray:
    """STUB decoder: a real deployment replaces this with image/audio
    decode + model features.  Deterministic fake: FEATURE_DIM bytes of
    sha256, scaled to [0,1]."""
    if payload is None:
        raise NotImplementedError("real media decode requires codec libs")
    h = hashlib.sha256(bytes(payload)).digest()
    return np.frombuffer(h[:FEATURE_DIM], dtype=np.uint8).astype(np.float64) / 255.0


def resize_payload(
    media: DataFrame,
    target_bytes: int = 64,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Resize plumbing: (id, payload, media_meta) -> (id, resized
    binary, updated meta).  A real deployment decodes + resamples
    (PIL/ffmpeg — absent here); the deterministic stand-in truncates /
    zero-pads to ``target_bytes`` so the schema, Arrow batching and
    metadata update are the production shape and testable."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            resized = pdf[payload_col].map(
                lambda b: bytes(b)[:target_bytes].ljust(target_bytes, b"\x00")
            )
            yield pd.DataFrame({
                id_col: pdf[id_col],
                payload_col: resized,
                "n_bytes": resized.map(len),
            })

    return media.select(id_col, payload_col).mapInPandas(
        fn, f"{id_col} long, {payload_col} binary, n_bytes long"
    ).withColumn(
        "media_meta",
        F.struct(
            F.lit("application/x-fake-resized").alias("mime"),
            F.col("n_bytes").alias("n_bytes"),
        ),
    )


def sample_frames(
    media: DataFrame,
    frame_bytes: int = 16,
    every_n: int = 2,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled frame
    (id, frame_idx, frame binary).  The stand-in treats the payload as
    a stream of fixed-size ``frame_bytes`` frames and keeps every
    ``every_n``-th — a real deployment swaps in a video demuxer; the
    fan-out shape (one input row -> many frame rows, Arrow-batched,
    order-stable frame_idx) is exactly what downstream per-frame
    feature extraction consumes."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, idxs, frames = [], [], []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(b)
                # ceil: the trailing partial frame is emitted (short),
                # not silently dropped; an empty payload still yields
                # one empty frame — consistent edge behavior
                n_frames = max(1, -(-len(raw) // frame_bytes))
                for j in range(0, n_frames, every_n):
                    ids.append(i)
                    idxs.append(j)
                    frames.append(raw[j * frame_bytes:(j + 1) * frame_bytes])
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return media.select(id_col, payload_col).mapInPandas(
        fn, f"{id_col} long, frame_idx int, frame binary"
    )


def extract_features(
    media: DataFrame, *, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """(id, n_bytes, payload_sha256, features array<double>) via
    Arrow-batched mapInPandas — the real multimodal feature-extraction
    shape (decode stays inside the batch loop, vectorizable)."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = pdf[payload_col]
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "n_bytes": payloads.map(len),
                "payload_sha256": payloads.map(lambda b: hashlib.sha256(bytes(b)).hexdigest()),
                "features": payloads.map(lambda b: _decode_payload(b).tolist()),
            })

    return media.select(id_col, payload_col).mapInPandas(
        fn, f"{id_col} long, n_bytes long, payload_sha256 string, features array<double>"
    )
