"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode/feature-extract step is STUBBED (no image/audio libraries in
this container): `decode_stub` raises NotImplementedError unless
``fake=True``, in which case it produces a deterministic fake feature
vector from the payload bytes. Everything Spark-side — schema, batch
shape, partitioning, UDF signatures — is real and tested, so swapping in
a real decoder (PIL/torchaudio/ffmpeg) is a one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 8

METADATA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload_sha256", T.StringType()),
        T.StructField("mime", T.StringType()),
    ]
)


def payload_metadata(df: DataFrame) -> DataFrame:
    """Typed metadata over an opaque binary column — pure Catalyst
    (octet length + sha), no Python."""
    return df.select(
        "doc_id",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.lower(F.sha2(F.col("payload"), 256)).alias("payload_sha256"),
        "mime",
    )


def decode_stub(payload: bytes, mime: str, fake: bool = False) -> np.ndarray:
    """Decode a media payload into a feature vector.

    Real decoders (PIL / torchaudio / cv2) are not available in this
    container — the Spark plumbing around this stub is the deliverable.
    """
    if not fake:
        raise NotImplementedError(
            f"no media decoder available for {mime}; install PIL/torchaudio "
            "or pass fake=True for the deterministic test double"
        )
    h = hashlib.sha256(payload).digest()
    return np.frombuffer(h[: FEATURE_DIM * 4], dtype=np.uint32).astype(np.float64) / 2**32


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads. Arrow moves
    the bytes in batches; the per-batch loop is numpy-level, and the
    stage is a narrow map (no shuffle)."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                decode_stub(p, m, fake=fake).tolist()
                for p, m in zip(pdf["payload"], pdf["mime"])
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return df.select("doc_id", "payload", "mime").mapInPandas(batches, schema=schema)


def frame_sample(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' over opaque payloads: take every Nth byte slice as
    a frame stub — demonstrates the explode/slice shape of real video
    frame sampling with deterministic output."""
    n_frames = (F.octet_length("payload") / every_n_bytes).cast("int")
    return df.select(
        "doc_id",
        F.posexplode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))).alias(
            "frame_idx", "_"
        ),
        F.col("payload"),
    ).select(
        "doc_id",
        "frame_idx",
        F.substring(
            F.col("payload"), (F.col("frame_idx") * every_n_bytes + 1).cast("int"), every_n_bytes
        ).alias("frame_bytes"),
    )
