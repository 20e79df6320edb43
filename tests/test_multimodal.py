"""Tests for multimodal binary-column plumbing (stubbed decode, real
Spark plumbing — schema, mapInPandas batching, funnel shape)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_the_clojure_way_spark.operators.multimodal import (
    FEATURE_DIM,
    _decode_stub,
    decode_assets,
    extract_features,
    wrap_binary_assets,
)


def _assets(spark, payloads, mime="image/png"):
    df = spark.createDataFrame(
        [{"doc_id": i, "payload": p} for i, p in enumerate(payloads)]
    ).withColumn("payload", F.col("payload").cast("binary"))
    return wrap_binary_assets(df, "payload", mime)


def test_asset_struct_schema(spark):
    df = _assets(spark, [b"abc"])
    names = [f.name for f in df.schema["asset"].dataType.fields]
    assert names == ["bytes", "mime", "width", "height", "n_frames", "sample_rate"]


def test_decode_metadata_deterministic(spark):
    payload = b"x" * 130  # width = 130%64+1 = 3, height = (130//64)%64+1 = 3
    out = decode_assets(_assets(spark, [payload])).collect()[0]
    assert (out.n_bytes, out.width, out.height) == (130, 3, 3)
    assert out.n_frames == 1 and out.sample_rate == -1


def test_decode_stub_rejects_unknown_mime():
    with pytest.raises(NotImplementedError, match="no decoder"):
        _decode_stub(b"", "application/pdf")


def test_audio_mime_gets_sample_rate(spark):
    out = decode_assets(_assets(spark, [b"12345"], mime="audio/wav")).collect()[0]
    assert out.sample_rate == 16_000


def test_feature_histogram_normalized(spark):
    out = extract_features(_assets(spark, [bytes(range(16))])).collect()[0]
    assert len(out.features) == FEATURE_DIM
    assert abs(sum(out.features) - 1.0) < 1e-9
    # bytes 0..15 mod 8 -> uniform histogram
    assert all(abs(f - 1 / FEATURE_DIM) < 1e-9 for f in out.features)
