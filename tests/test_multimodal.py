"""Multimodal plumbing: binary payload metadata, Arrow feature
extraction (stubbed decode), frame sampling."""

import pytest
from pyspark.sql import functions as F

from atlassian_sampling_processor_spark.functions.multimodal import (
    FEATURE_DIM,
    decode_stub,
    extract_features,
    frame_sample,
    payload_metadata,
)


@pytest.fixture
def payloads(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return docs.select(
        "doc_id", F.encode("text", "utf-8").alias("payload"), F.lit("image/fake").alias("mime")
    )


def test_decode_stub_raises_without_library():
    with pytest.raises(NotImplementedError):
        decode_stub(b"abc", "image/png")


def test_decode_stub_fake_deterministic():
    a = decode_stub(b"hello", "image/png", fake=True)
    b = decode_stub(b"hello", "image/png", fake=True)
    assert (a == b).all() and len(a) == FEATURE_DIM
    assert (0 <= a).all() and (a < 1).all()


def test_payload_metadata(spark, payloads):
    meta = payload_metadata(payloads).collect()
    assert len(meta) == 500
    import hashlib

    docs = {r.doc_id: r.text for r in spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").collect()}
    for r in meta[:10]:
        raw = docs[r.doc_id].encode()
        assert r.n_bytes == len(raw)
        assert r.payload_sha256 == hashlib.sha256(raw).hexdigest()


def test_extract_features_batched(spark, payloads):
    feats = extract_features(payloads, fake=True)
    rows = feats.collect()
    assert len(rows) == 500
    assert all(len(r.features) == FEATURE_DIM for r in rows[:20])
    # deterministic across runs
    again = {r.doc_id: r.features for r in extract_features(payloads, fake=True).collect()}
    for r in rows[:20]:
        assert again[r.doc_id] == r.features


def test_frame_sample_shapes(spark, payloads):
    frames = frame_sample(payloads.limit(5), every_n_bytes=32)
    rows = frames.collect()
    assert rows
    for r in rows:
        assert 1 <= len(r.frame_bytes) <= 32
        assert r.frame_idx >= 0
