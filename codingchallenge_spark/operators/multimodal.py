"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a typed
metadata struct. The Spark-side plumbing — schemas, Arrow batch shapes,
mapInPandas signatures, partitioning — is real and tested; the actual codec
step is STUBBED (no image/audio libraries exist in this container): decode
raises NotImplementedError unless ``fake=True``, which substitutes a
deterministic structural fake so the downstream pipeline (feature join,
dedup-by-content-hash, ANN over extracted vectors) can be exercised.
"""

from __future__ import annotations

from collections.abc import Iterator

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, modality string, payload binary, "
    "meta struct<mime:string, width:int, height:int, duration_ms:int>"
)

FEATURES_SCHEMA = (
    "media_id string, payload_sha string, byte_len long, feature array<float>"
)

FEATURE_DIM = 8


def _fake_decode_features(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a codec+encoder: 8 floats derived from the
    payload digest. Structure-preserving (equal payloads → equal features)."""
    dig = hashlib.sha256(payload).digest()
    raw = np.frombuffer(dig[: FEATURE_DIM * 4], dtype=np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


def extract_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Real pipeline shape: Arrow batches of (media_id, payload) → per-batch
    decode → fixed-dim float vectors. ``fake=False`` raises (codec libs not
    installed here); ``fake=True`` runs the deterministic fake.
    """

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "media decode requires codec libraries not present in "
                    "this environment; pass fake=True for the structural stub"
                )
            feats, shas, lens = [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                shas.append(hashlib.sha256(b).hexdigest())
                lens.append(len(b))
                feats.append(_fake_decode_features(b).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload_sha": shas,
                    "byte_len": pd.Series(lens, dtype="int64"),
                    "feature": feats,
                }
            )

    return df.select("media_id", "payload").mapInPandas(fn, FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expands per-media sample timestamps
    JVM-side (sequence/explode); the decode of each sampled frame is the
    stubbed step above. Demonstrates the partitioning shape: explode happens
    BEFORE the expensive decode so Arrow batches stay balanced."""
    return (
        df.select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("sample_ms"),
        )
    )
