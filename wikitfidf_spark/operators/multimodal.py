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
