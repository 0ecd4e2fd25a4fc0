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


# ---- round 5: REAL stdlib decoders (WAV via wave, BMP via numpy) ----------


def make_wav(freq=440.0, rate=8000, seconds=0.5, amp=0.5, nch=1):
    import io
    import struct
    import wave

    import numpy as np

    n = int(rate * seconds)
    t = np.arange(n) / rate
    x = (amp * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)
    if nch == 2:
        x = np.repeat(x, 2)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{len(x)}h", *x))
    return buf.getvalue()


def make_bmp(width, height, rgb):
    """Minimal uncompressed 24-bit bottom-up BMP of a solid color."""
    import struct

    stride = (width * 3 + 3) & ~3
    img = bytes(bytearray([rgb[2], rgb[1], rgb[0]]) * width
                + b"\x00" * (stride - width * 3)) * height
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(img), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       len(img), 2835, 2835, 0, 0)
    return header + info + img


def test_decode_wav_real():
    from atlassian_sampling_processor_spark.functions.multimodal import decode_wav

    feats = decode_wav(make_wav(freq=440.0, rate=8000, seconds=0.5, amp=0.5))
    rate, nch, nframes, dur_ms, rms, peak, zcr, mean_abs = feats
    assert rate == 8000 and nch == 1 and nframes == 4000
    assert abs(dur_ms - 500.0) < 1e-9
    assert abs(rms - 0.5 / 2**0.5) < 0.01  # sine RMS = A/sqrt(2)
    assert abs(peak - 0.5) < 0.01
    # 440 Hz at 8 kHz: 2 crossings per cycle -> zcr ~ 2*440/8000 = 0.11
    assert abs(zcr - 0.11) < 0.01
    assert abs(mean_abs - 2 * 0.5 / 3.141592653589793) < 0.01  # sine mean |x| = 2A/pi


def test_decode_bmp_real():
    from atlassian_sampling_processor_spark.functions.multimodal import decode_bmp

    feats = decode_bmp(make_bmp(7, 5, (200, 100, 50)))
    w, h, mr, mg, mb, gstd, gmin, gmax = feats
    assert (w, h) == (7.0, 5.0)
    assert (mr, mg, mb) == (200.0, 100.0, 50.0)
    assert gstd < 1e-9 and gmin == gmax  # solid color (mean is 1 ulp off)


def test_extract_features_real_decoders(spark):
    """The real decoders run through the same Arrow mapInPandas plumbing
    as the stub, mixed mimes in one batch."""
    rows = [
        (1, bytearray(make_wav(freq=1000.0, rate=16000, seconds=0.25, amp=0.25)),
         "audio/wav"),
        (2, bytearray(make_bmp(4, 4, (10, 20, 30))), "image/bmp"),
        (3, bytearray(b"opaque-blob"), "video/fake"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary, mime string")
    feats = {r.doc_id: r.features for r in extract_features(df, fake=True).collect()}
    assert feats[1][0] == 16000.0 and feats[1][2] == 4000.0
    assert abs(feats[1][4] - 0.25 / 2**0.5) < 0.01
    assert feats[2][:5] == [4.0, 4.0, 10.0, 20.0, 30.0]
    assert len(feats[3]) == FEATURE_DIM and all(0 <= v < 1 for v in feats[3])


def test_decode_stub_still_raises_for_codec_formats():
    with pytest.raises(NotImplementedError):
        decode_stub(b"\xff\xd8\xff", "image/jpeg")
