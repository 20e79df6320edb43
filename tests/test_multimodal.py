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
    resize_assets,
    sample_frames,
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


def test_resize_truncates_and_pads(spark):
    out = resize_assets(_assets(spark, [b"abcdefgh", b"xy"]), 2, 3).collect()
    by_id = {r.doc_id: r.asset for r in out}
    assert bytes(by_id[0].bytes) == b"abcdef"          # truncated to 2*3
    assert bytes(by_id[1].bytes) == b"xy\x00\x00\x00\x00"  # zero-padded
    assert by_id[0].width == 2 and by_id[0].height == 3
    # chains: decode of resized asset sees the new payload size
    resized = resize_assets(_assets(spark, [b"abcdefgh"]), 2, 3)
    assert decode_assets(resized).collect()[0].n_bytes == 6


def test_sample_frames_expansion_and_reassembly(spark):
    payload = bytes(range(64))  # n=64 -> n_frames = 64%30+1 = 5, chunk = 13
    rows = sample_frames(_assets(spark, [payload], mime="video/mp4"), stride=1).collect()
    assert [r.frame_idx for r in sorted(rows, key=lambda r: r.frame_idx)] == [0, 1, 2, 3, 4]
    # frames partition the payload exactly: concatenation round-trips
    joined = b"".join(bytes(r.frame_bytes) for r in sorted(rows, key=lambda r: r.frame_idx))
    assert joined == payload
    # stride sampling keeps every 5th frame only
    strided = sample_frames(_assets(spark, [payload], mime="video/mp4"), stride=5).collect()
    assert sorted(r.frame_idx for r in strided) == [0]


def test_feature_histogram_normalized(spark):
    out = extract_features(_assets(spark, [bytes(range(16))])).collect()[0]
    assert len(out.features) == FEATURE_DIM
    assert abs(sum(out.features) - 1.0) < 1e-9
    # bytes 0..15 mod 8 -> uniform histogram
    assert all(abs(f - 1 / FEATURE_DIM) < 1e-9 for f in out.features)


def test_map_in_arrow_matches_jvm_vector_math(spark):
    """mapInArrow (Spark 4 Arrow-native batch UDF): per-vector L2 norm
    computed in numpy over Arrow record batches must match the JVM-side
    sequential-fold expression bit-for-bit (same left-to-right summation
    order — numpy's pairwise np.sum would NOT match; that discipline is
    the whole cross-engine determinism story)."""
    import pyarrow as pa

    from pyspark.sql import functions as F

    from kafka_streams_the_clojure_way_spark.sources.files import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")

    def norms(batches):
        for batch in batches:
            ids = batch.column("vec_id")
            vecs = batch.column("embedding").to_pylist()
            out = []
            for v in vecs:
                acc = 0.0
                for x in v:  # sequential fold == F.aggregate order
                    acc += float(x) * float(x)
                out.append(acc)
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(out, type=pa.float64())], ["vec_id", "sq_norm"]
            )

    arrow_side = {
        r.vec_id: r.sq_norm
        for r in emb.mapInArrow(norms, "vec_id long, sq_norm double").collect()
    }

    vec_d = F.col("embedding").cast("array<double>")
    jvm = emb.select(
        "vec_id",
        F.aggregate(
            vec_d, F.lit(0.0), lambda acc, x: acc + x * x
        ).alias("sq_norm"),
    )
    jvm_side = {r.vec_id: r.sq_norm for r in jvm.collect()}
    assert arrow_side == jvm_side and len(arrow_side) == 500


# --------------------------------------------------------------------------
# round 5: import-gated real decoder + vectorization guard
# --------------------------------------------------------------------------


def test_pillow_decoder_gated_loudly(spark):
    """decoder='pillow' must either decode for real (Pillow present) or
    raise a loud ImportError — never silently serve stub geometry."""
    from kafka_streams_the_clojure_way_spark.operators.multimodal import HAS_PIL

    if not HAS_PIL:
        with pytest.raises(ImportError, match="Pillow"):
            decode_assets(_assets(spark, [b"x" * 130]), decoder="pillow")
    else:  # pragma: no cover - runs only where Pillow is installed
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (12, 7)).save(buf, format="PNG")
        out = decode_assets(
            _assets(spark, [buf.getvalue()]), decoder="pillow"
        ).collect()[0]
        assert (out.width, out.height, out.n_frames) == (12, 7, 1)


def test_decode_rejects_unknown_decoder(spark):
    with pytest.raises(ValueError, match="decoder"):
        decode_assets(_assets(spark, [b"x"]), decoder="ffmpeg")


def test_no_iterrows_in_multimodal_kernels():
    """Regression guard for the round-4 verdict: pdf.iterrows() is the
    slowest pandas idiom (a Series per row); the only per-row Python in
    this module must be genuine per-payload work over .values."""
    import inspect

    from kafka_streams_the_clojure_way_spark.operators import multimodal

    assert "iterrows" not in inspect.getsource(multimodal)


def test_extract_features_batch_vectorization_matches_per_row(spark):
    """The segment-offset bincount (whole batch in one numpy call) must
    equal the obvious per-row histogram, including empty payloads."""
    import numpy as np

    payloads = [b"abc", b"", b"\x00\xff" * 9, bytes(range(256))]
    got = {
        r.doc_id: r.features
        for r in extract_features(_assets(spark, payloads)).collect()
    }
    for i, p in enumerate(payloads):
        buf = np.frombuffer(p, dtype=np.uint8)
        hist = np.bincount(buf % FEATURE_DIM, minlength=FEATURE_DIM).astype("float64")
        want = (hist / (hist.sum() or 1.0)).tolist()
        assert got[i] == pytest.approx(want), i


# --------------------------------------------------------------------------
# Permissive / quarantine decode mode (VERDICT r8 #1)
# --------------------------------------------------------------------------

def _png_assets(spark, texts):
    """Real PNG assets from text payloads, doc_id = index."""
    from kafka_streams_the_clojure_way_spark.operators.multimodal import (
        encode_text_assets,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return encode_text_assets(df, "png")


def test_permissive_checksum_clean_assets_bit_identical(spark):
    """Clean assets must produce bit-identical checksum values in strict
    and permissive mode — permissive only ADDS the verdict columns."""
    from kafka_streams_the_clojure_way_spark.operators.multimodal import (
        asset_pixel_checksum,
    )

    assets = _png_assets(spark, ["hello world", "", "abc" * 50])
    strict = {
        r.doc_id: (r.n_pix, r.pix_sum, r.pix_head, r.pix_tail)
        for r in asset_pixel_checksum(assets, decode="png").collect()
    }
    perm = {
        r.doc_id: (r.n_pix, r.pix_sum, r.pix_head, r.pix_tail, r.status, r.error_kind)
        for r in asset_pixel_checksum(
            assets, decode="png", mode="permissive"
        ).collect()
    }
    assert set(strict) == set(perm)
    for k, (n, s, h, t) in strict.items():
        assert perm[k] == (n, s, h, t, "ok", "ok")


def test_permissive_checksum_quarantines_seeded_corruptions(spark):
    """corrupt_assets' three corruption classes land on their predicted
    error kinds; clean rows survive with real values; strict mode dies
    on the same frame."""
    from kafka_streams_the_clojure_way_spark.operators.multimodal import (
        asset_pixel_checksum,
        corrupt_assets,
    )

    texts = [f"document number {i} " + "x" * i for i in range(8)]
    assets = corrupt_assets(_png_assets(spark, texts))
    rows = {
        r.doc_id: r
        for r in asset_pixel_checksum(
            assets, decode="png", mode="permissive"
        ).collect()
    }
    want_kind = {0: "ok", 1: "crc_mismatch", 2: "truncated", 3: "bad_magic"}
    for i in range(8):
        r = rows[i]
        assert r.error_kind == want_kind[i % 4], i
        if i % 4 == 0:
            assert r.status == "ok" and r.n_pix > 0 and r.pix_sum > 0
        else:
            assert r.status == "quarantined"
            assert (r.n_pix, r.pix_sum, r.pix_head, r.pix_tail) == (-1, -1, -1, -1)

    # strict mode on the same corrupted frame fails the job (the r8
    # contract this mode exists to fix)
    import pytest as _pytest

    with _pytest.raises(Exception, match="CRC mismatch|PNG"):
        asset_pixel_checksum(assets, decode="png").collect()


def test_permissive_phash_parity_and_quarantine(spark):
    """phash_assets: clean hashes bit-identical across modes; corrupt
    assets get phash=-1 (unreachable for real 63-bit signatures)."""
    from kafka_streams_the_clojure_way_spark.operators.imagehash import phash_assets
    from kafka_streams_the_clojure_way_spark.operators.multimodal import (
        corrupt_assets,
    )

    texts = [f"img {i} " + "qwerty" * (i + 1) for i in range(8)]
    clean = _png_assets(spark, texts)
    strict = {r.doc_id: r.phash for r in phash_assets(clean, decode="png").collect()}
    perm = {
        r.doc_id: (r.phash, r.status)
        for r in phash_assets(clean, decode="png", mode="permissive").collect()
    }
    for k, ph in strict.items():
        assert perm[k] == (ph, "ok")
        assert 0 <= ph < (1 << 63)

    corrupted = {
        r.doc_id: r
        for r in phash_assets(
            corrupt_assets(clean), decode="png", mode="permissive"
        ).collect()
    }
    for i in range(8):
        if i % 4 == 0:
            assert corrupted[i].phash == strict[i]
        else:
            assert corrupted[i].phash == -1
            assert corrupted[i].status == "quarantined"


def test_permissive_sample_frames_quarantines_bad_container(spark):
    """A container that fails demux yields ONE quarantine row; clean
    containers sample identically in both modes."""
    from kafka_streams_the_clojure_way_spark.operators.multimodal import (
        encode_text_assets,
        sample_frames,
    )

    df = spark.createDataFrame(
        [(0, "a" * 200), (1, "b" * 130)], "doc_id long, text string"
    )
    assets = encode_text_assets(df, "pgm")

    strict = sorted(
        (r.doc_id, r.frame_idx, r.frame_len)
        for r in sample_frames(assets, container="pgm").collect()
    )
    perm_rows = sample_frames(assets, container="pgm", mode="permissive").collect()
    assert sorted((r.doc_id, r.frame_idx, r.frame_len) for r in perm_rows) == strict
    assert all(r.status == "ok" and r.error_kind == "ok" for r in perm_rows)

    # corrupt doc 1's container magic -> one quarantine row for doc 1
    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as FF

    bad = assets.withColumn(
        "asset",
        FF.when(
            FF.col("doc_id") == 1,
            FF.struct(
                FF.concat(
                    FF.lit(b"XX"), FF.expr("substring(asset.bytes, 3)")
                ).alias("bytes"),
                FF.col("asset.mime").alias("mime"),
                FF.col("asset.width").alias("width"),
                FF.col("asset.height").alias("height"),
                FF.col("asset.n_frames").alias("n_frames"),
                FF.col("asset.sample_rate").alias("sample_rate"),
            ),
        ).otherwise(FF.col("asset")),
    )
    got = sample_frames(bad, container="pgm", mode="permissive").collect()
    doc1 = [r for r in got if r.doc_id == 1]
    assert len(doc1) == 1
    assert doc1[0].status == "quarantined"
    assert doc1[0].error_kind == "bad_magic"
    assert (doc1[0].frame_idx, doc1[0].frame_len) == (-1, -1)
    doc0 = sorted((r.frame_idx, r.frame_len) for r in got if r.doc_id == 0)
    assert doc0 == sorted(
        (fi, fl) for d, fi, fl in strict if d == 0
    )


def test_permissive_decode_assets_header_parse(spark):
    """decode_assets(decoder='stdlib', mode='permissive'): bad magic is
    caught at the header parse; clean geometry matches strict mode.
    (Header-only parsing cannot see IDAT CRC flips or a missing IEND —
    that's the full-decode path's job; kinds here are what headers can
    prove.)"""
    from kafka_streams_the_clojure_way_spark.operators.multimodal import (
        corrupt_assets,
        decode_assets,
    )

    texts = [f"t{i} " + "z" * (10 * i) for i in range(8)]
    clean = _png_assets(spark, texts)
    strict = {
        r.doc_id: (r.width, r.height, r.n_frames)
        for r in decode_assets(clean, decoder="stdlib").collect()
    }
    got = {
        r.doc_id: r
        for r in decode_assets(
            corrupt_assets(clean), decoder="stdlib", mode="permissive"
        ).collect()
    }
    for i in range(8):
        r = got[i]
        if i % 4 == 3:  # magic zeroed: header parse catches it
            assert r.status == "quarantined" and r.error_kind == "bad_magic"
            assert (r.width, r.height, r.n_frames) == (-1, -1, -1)
        elif i % 4 == 0:  # clean: geometry identical to strict
            assert r.status == "ok" and r.error_kind == "ok"
            assert (r.width, r.height, r.n_frames) == strict[i]


def test_permissive_decode_assets_unknown_mime(spark):
    """Unknown mime quarantines as 'unsupported' instead of raising."""
    from kafka_streams_the_clojure_way_spark.operators.multimodal import (
        decode_assets,
    )

    df = _assets(spark, [b"abc"], mime="application/pdf")
    rows = decode_assets(df, mode="permissive").collect()
    assert len(rows) == 1
    assert rows[0].status == "quarantined"
    assert rows[0].error_kind == "unsupported"


def test_sample_frames_auto_dispatches_by_mime(spark):
    """container='auto' routes each asset to its mime's demuxer — a
    mixed PGM + Y4M frame must demux both correctly in one pass."""
    from kafka_streams_the_clojure_way_spark.operators.multimodal import (
        encode_text_assets,
        sample_frames,
    )

    df = spark.createDataFrame(
        [(0, "p" * 130), (1, "y" * 130)], "doc_id long, text string"
    )
    mixed = encode_text_assets(df.filter("doc_id = 0"), "pgm").unionByName(
        encode_text_assets(df.filter("doc_id = 1"), "y4m")
    )
    rows = sorted(
        (r.doc_id, r.frame_idx, r.frame_len)
        for r in sample_frames(mixed, container="auto", stride=1).collect()
    )
    # PGM: final frame narrower (130 = 64+64+2); Y4M: fixed 64 (padded)
    assert rows == [
        (0, 0, 64), (0, 1, 64), (0, 2, 2),
        (1, 0, 64), (1, 1, 64), (1, 2, 64),
    ]

    # unknown video mime raises loud in strict, quarantines in permissive
    from kafka_streams_the_clojure_way_spark.operators.multimodal import (
        wrap_binary_assets,
    )
    import pytest as _pytest
    from pyspark.sql import functions as FF

    odd = wrap_binary_assets(
        spark.createDataFrame([(9, b"zz")], "doc_id long, payload binary"),
        "payload",
        "video/x-matroska",
    )
    with _pytest.raises(Exception, match="unsupported video container mime"):
        sample_frames(odd, container="auto").collect()
    q = sample_frames(odd, container="auto", mode="permissive").collect()
    assert len(q) == 1 and q[0].status == "quarantined"
    assert q[0].error_kind == "unsupported"
