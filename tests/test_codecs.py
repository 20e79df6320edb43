"""Stdlib media codecs (functions/codecs.py): exact round-trips under
hypothesis-generated payloads across every PNG filter type, corruption
detection (CRC, truncation, bad magic, unsupported geometry), and the
decode-seam contract — the pHash of a REAL decoded PNG equals the pHash
of the (padded) raw bytes, so swapping the stub for the real decoder
changes values only via the documented pad, never via the plan."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_streams_the_clojure_way_spark.functions.codecs import (
    PGM_FRAME_LEN,
    PNG_WIDTH,
    pgm_decode_frames,
    pgm_encode_video,
    png_decode_gray,
    png_encode_gray,
    wav_decode_pcm8,
    wav_encode_pcm8,
)

payloads = st.binary(min_size=0, max_size=600)


@settings(max_examples=60, deadline=None)
@given(payloads, st.sampled_from([(0,), (1,), (2,), (3,), (4,), (0, 1, 2), (0, 1, 2, 3, 4), (4, 3, 2, 1, 0)]))
def test_png_roundtrip_all_filters(data, cycle):
    dec = png_decode_gray(png_encode_gray(data, filter_cycle=cycle))
    pad = (-len(data)) % PNG_WIDTH
    want = data + b" " * pad if data else b" " * PNG_WIDTH
    assert dec == want


@settings(max_examples=60, deadline=None)
@given(payloads)
def test_wav_and_pgm_roundtrip(data):
    assert wav_decode_pcm8(wav_encode_pcm8(data)) == data
    assert b"".join(pgm_decode_frames(pgm_encode_video(data))) == data
    # frame geometry: all full-width frames except possibly the last
    frames = pgm_decode_frames(pgm_encode_video(data))
    assert all(len(f) == PGM_FRAME_LEN for f in frames[:-1])
    assert len(frames) == (len(data) + PGM_FRAME_LEN - 1) // PGM_FRAME_LEN


def test_png_corruption_detected():
    png = png_encode_gray(b"the quick brown fox" * 9, filter_cycle=(0, 1, 2, 3, 4))
    flipped = bytearray(png)
    flipped[len(png) // 2] ^= 0x40
    with pytest.raises(ValueError, match="CRC|filter|payload"):
        png_decode_gray(bytes(flipped))
    with pytest.raises(ValueError, match="magic"):
        png_decode_gray(b"\x89PNX" + png[4:])
    with pytest.raises(ValueError, match="truncated|missing"):
        png_decode_gray(png[: len(png) - 20])


def test_wav_and_pgm_corruption_detected():
    with pytest.raises(ValueError, match="WAV"):
        wav_decode_pcm8(b"not RIFF data at all")
    with pytest.raises(ValueError, match="magic"):
        pgm_decode_frames(b"P6 2 1 255\nxy")
    with pytest.raises(ValueError, match="truncated"):
        pgm_decode_frames(b"P5 64 1 255\nshort")


def test_phash_real_decode_equals_padded_stub(spark):
    """The decode-seam contract the registry queries rely on: pHash over
    REAL-decoded PNG pixels == pHash over the space-padded raw bytes
    (the oracle's rpad). Run through the actual Spark kernels."""
    from pyspark.sql import functions as F

    from kafka_streams_the_clojure_way_spark.operators.imagehash import phash_assets
    from kafka_streams_the_clojure_way_spark.operators.multimodal import (
        encode_text_assets,
        wrap_binary_assets,
    )
    from kafka_streams_the_clojure_way_spark.sources.files import load_table

    docs = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text")
        .limit(40)
    )
    real = {
        r.doc_id: r.phash
        for r in phash_assets(encode_text_assets(docs, "png"), decode="png").collect()
    }
    pad_len = (
        F.ceil(F.octet_length("text") / PNG_WIDTH).cast("long") * PNG_WIDTH
    )
    padded = docs.select(
        "doc_id", F.encode(F.rpad("text", pad_len.cast("int"), " "), "UTF-8").alias("p")
    )
    stub = {
        r.doc_id: r.phash
        for r in phash_assets(wrap_binary_assets(padded, "p", "image/png")).collect()
    }
    assert real == stub and len(real) == 40


def test_resize_png_real_transcode(spark):
    """resize(codec='png') must emit VALID PNGs of the target geometry
    whose decoded pixels are exactly the nearest-neighbor samples of
    the source's decoded stream — the full decode->resample->re-encode
    loop checked pixel-for-pixel against a pure-Python replay."""
    from kafka_streams_the_clojure_way_spark.functions.codecs import (
        png_decode_gray,
        png_encode_gray,
        png_parse_ihdr,
    )
    from kafka_streams_the_clojure_way_spark.operators.multimodal import (
        resize_assets,
        wrap_binary_assets,
    )
    import pyspark.sql.functions as F

    texts = ["short", "x" * 100, "the quick brown fox " * 31]
    df = spark.createDataFrame(
        [(i, png_encode_gray(t.encode())) for i, t in enumerate(texts)],
        "doc_id long, payload binary",
    )
    assets = wrap_binary_assets(df, "payload", "image/png")
    out = {
        r.doc_id: bytes(r.asset.bytes)
        for r in resize_assets(assets, 16, 16, codec="png").collect()
    }
    for i, t in enumerate(texts):
        png = out[i]
        assert png_parse_ihdr(png) == (16, 16)
        got = png_decode_gray(png)
        src = png_decode_gray(png_encode_gray(t.encode()))
        n = len(src)
        want = bytes(src[(k * n) // 256] for k in range(256))
        assert got == want


def test_resample_wav_real_transcode(spark):
    """resample_audio_assets must emit VALID WAVs at the reduced rate
    whose decoded samples are exactly every factor-th input sample."""
    from kafka_streams_the_clojure_way_spark.functions.codecs import (
        WAV_RATE,
        wav_decode_pcm8,
        wav_encode_pcm8,
        wav_parse_meta,
    )
    from kafka_streams_the_clojure_way_spark.operators.audiofp import (
        resample_audio_assets,
    )
    from kafka_streams_the_clojure_way_spark.operators.multimodal import (
        wrap_binary_assets,
    )

    texts = ["short", "y" * 101, "pcm sample stream " * 37]
    df = spark.createDataFrame(
        [(i, wav_encode_pcm8(t.encode())) for i, t in enumerate(texts)],
        "doc_id long, payload binary",
    )
    assets = wrap_binary_assets(df, "payload", "audio/wav")
    out = {
        r.doc_id: bytes(r.asset.bytes)
        for r in resample_audio_assets(assets, 4).collect()
    }
    for i, t in enumerate(texts):
        wav = out[i]
        n_frames, rate = wav_parse_meta(wav)
        want = t.encode()[::4]
        assert rate == WAV_RATE // 4 and n_frames == len(want)
        assert wav_decode_pcm8(wav) == want


# --------------------------------------------------------------------------
# Truecolor (color type 2) PNG + luma
# --------------------------------------------------------------------------

@settings(max_examples=60, deadline=None)
@given(payloads, st.sampled_from([(0,), (1,), (2,), (3,), (4,), (0, 1, 2), (0, 1, 2, 3, 4), (4, 3, 2, 1, 0)]))
def test_png_rgb_roundtrip_all_filters(data, cycle):
    """RGB decode inverts all five filters at bpp=3: the Sub/Average/
    Paeth predictors must step by 3 bytes (channel-wise), which a bpp=1
    implementation would corrupt for any payload with cross-channel
    structure."""
    from kafka_streams_the_clojure_way_spark.functions.codecs import (
        png_decode_rgb,
        png_encode_rgb,
    )

    row = 3 * PNG_WIDTH
    dec = png_decode_rgb(png_encode_rgb(data, filter_cycle=cycle))
    pad = (-len(data)) % row
    want = data + b" " * pad if data else b" " * row
    assert dec == want


def test_png_rgb_rejects_gray_and_vice_versa():
    """Color type is validated: a truecolor decoder must not silently
    consume a grayscale container (wrong bpp would mis-defilter), and
    vice versa."""
    from kafka_streams_the_clojure_way_spark.functions.codecs import (
        png_decode_rgb,
        png_encode_rgb,
    )

    gray = png_encode_gray(b"some gray pixels here")
    rgb = png_encode_rgb(b"some rgb pixel triples")
    with pytest.raises(ValueError, match="color type"):
        png_decode_rgb(gray)
    with pytest.raises(ValueError, match="color type"):
        png_decode_gray(rgb)


# --------------------------------------------------------------------------
# Adam7-interlaced grayscale PNG — r10
# --------------------------------------------------------------------------

@settings(max_examples=60, deadline=None)
@given(payloads, st.sampled_from([(0,), (1,), (2,), (3,), (4,), (0, 1, 2), (0, 1, 2, 3, 4)]))
def test_png_adam7_decodes_identically_to_sequential(data, cycle):
    """Interlacing reorders wire bytes, never the image: the Adam7
    encoder's output must decode (through the SAME png_decode_gray
    entry) to exactly the sequential encoder's pixel stream, for every
    filter type — each pass unfilters independently at bpp=1."""
    from kafka_streams_the_clojure_way_spark.functions.codecs import (
        png_encode_gray_interlaced,
    )

    seq = png_decode_gray(png_encode_gray(data, filter_cycle=cycle))
    inter = png_decode_gray(png_encode_gray_interlaced(data, filter_cycle=cycle))
    assert inter == seq


def test_png_adam7_small_widths_and_rejections():
    """Widths below the 8-pixel pass grid exercise EMPTY passes (zero
    scanlines, not even filter bytes — per spec); truecolor/paletted
    decoders keep rejecting interlaced containers with a classified
    kind; a truncated interlaced payload classifies 'truncated'."""
    from kafka_streams_the_clojure_way_spark.functions.codecs import (
        classify_codec_error,
        png_decode_rgb,
        png_encode_gray_interlaced,
    )

    d = bytes(range(40))
    for w in (1, 2, 3, 5, 7, 8, 9):
        assert png_decode_gray(
            png_encode_gray_interlaced(d, width=w)
        ) == png_decode_gray(png_encode_gray(d, width=w)), w
    inter = png_encode_gray_interlaced(b"interlaced grayscale bytes")
    with pytest.raises(ValueError, match="color type"):
        png_decode_rgb(inter)
    try:
        png_decode_rgb(inter)
    except ValueError as exc:
        assert classify_codec_error(str(exc)) == "unsupported"
    with pytest.raises(ValueError, match="missing IEND"):
        png_decode_gray(inter[:-12])


# --------------------------------------------------------------------------
# Paletted (color type 3) PNG — r10
# --------------------------------------------------------------------------

def _palette_rgb(idx: bytes) -> bytes:
    return bytes(b for i in idx for b in (i, 255 - i, (7 * i + 13) % 256))


@settings(max_examples=60, deadline=None)
@given(payloads, st.sampled_from([(0,), (1,), (2,), (3,), (4,), (0, 1, 2), (0, 1, 2, 3, 4)]))
def test_png_palette_roundtrip_all_filters(data, cycle):
    """Paletted decode = bpp=1 unfiltering of the INDEX stream (indexes
    predict from their left neighbor index per the spec) followed by a
    PLTE lookup — the output is the palette-mapped RGB of the padded
    payload, across all five filters."""
    from kafka_streams_the_clojure_way_spark.functions.codecs import (
        png_decode_palette,
        png_encode_palette,
    )

    dec = png_decode_palette(png_encode_palette(data, filter_cycle=cycle))
    pad = (-len(data)) % PNG_WIDTH
    idx = data + b" " * pad if data else b" " * PNG_WIDTH
    assert dec == _palette_rgb(idx)


def test_png_palette_corruptions_classified():
    """PLTE structural corruption has deterministic quarantine kinds:
    bad PLTE length, missing PLTE, and out-of-range indexes all raise
    classified ValueErrors; gray/rgb decoders reject color type 3."""
    import struct
    import zlib as _zlib

    from kafka_streams_the_clojure_way_spark.functions.codecs import (
        _fixture_palette,
        classify_codec_error,
        png_decode_gray,
        png_decode_palette,
        png_encode_palette,
    )

    png = png_encode_palette(bytes(range(256)))

    def rewrite_plte(newbody):
        pos, out = 8, bytearray(png[:8])
        while pos < len(png):
            (length,) = struct.unpack(">I", png[pos : pos + 4])
            tag = png[pos + 4 : pos + 8]
            body = png[pos + 8 : pos + 8 + length]
            pos += 12 + length
            if tag == b"PLTE":
                if newbody is None:
                    continue  # drop the chunk entirely
                body = newbody
            out += (
                struct.pack(">I", len(body))
                + tag
                + body
                + struct.pack(">I", _zlib.crc32(tag + body) & 0xFFFFFFFF)
            )
        return bytes(out)

    with pytest.raises(ValueError, match="PLTE length"):
        png_decode_palette(rewrite_plte(b"\x01\x02"))
    with pytest.raises(ValueError, match="missing PLTE"):
        png_decode_palette(rewrite_plte(None))
    with pytest.raises(ValueError, match="palette index"):
        png_decode_palette(rewrite_plte(_fixture_palette()[:48]))
    for broken in (rewrite_plte(b"\x01\x02"), rewrite_plte(None),
                   rewrite_plte(_fixture_palette()[:48])):
        try:
            png_decode_palette(broken)
        except ValueError as exc:
            assert classify_codec_error(str(exc)) == "decode_error"
    with pytest.raises(ValueError, match="color type"):
        png_decode_gray(png)


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_rgb_luma_matches_python_reference(data):
    from kafka_streams_the_clojure_way_spark.functions.codecs import (
        LUMA_B,
        LUMA_G,
        LUMA_R,
        rgb_to_luma,
    )

    rgb = data + b" " * ((-len(data)) % 3)
    got = rgb_to_luma(rgb)
    want = bytes(
        (LUMA_R * rgb[3 * j] + LUMA_G * rgb[3 * j + 1] + LUMA_B * rgb[3 * j + 2])
        >> 8
        for j in range(len(rgb) // 3)
    )
    assert got == want
    assert rgb_to_luma(bytes([200, 200, 200]) ) == bytes([200])  # weights sum to 256


# --------------------------------------------------------------------------
# 16-bit / stereo WAV profile (VERDICT r8 #2)
# --------------------------------------------------------------------------

from hypothesis import given as _given, settings as _settings
from hypothesis import strategies as _st

from kafka_streams_the_clojure_way_spark.functions.codecs import (
    wav_decode_pcm,
    wav_encode_pcm16,
)


@_settings(max_examples=40, deadline=None)
@_given(_st.binary(max_size=300))
def test_wav_pcm16_mono_roundtrip_exact(data):
    """16-bit mono: each byte b -> sample (b<<8)-32768 -> requantize
    recovers b exactly — decode(encode(data)) == data."""
    assert wav_decode_pcm(wav_encode_pcm16(data, channels=1)) == data


@_settings(max_examples=40, deadline=None)
@_given(_st.binary(max_size=300))
def test_wav_pcm16_stereo_decodes_to_pairwise_average(data):
    """16-bit stereo: downmix-then-requantize yields the pairwise byte
    average of the space-padded payload — the documented reduction the
    oracle reproduces with substring arithmetic."""
    padded = data + b" " * (len(data) % 2)
    want = bytes(
        (padded[2 * j] + padded[2 * j + 1]) >> 1 for j in range(len(padded) // 2)
    )
    assert wav_decode_pcm(wav_encode_pcm16(data, channels=2)) == want


def test_wav_pcm_accepts_8bit_mono():
    """The general decoder is byte-identical to wav_decode_pcm8 on the
    legacy 8-bit mono profile."""
    data = b"compat profile check \x00\xff\x80"
    assert wav_decode_pcm(wav_encode_pcm8(data)) == data


def test_wav_pcm_corruption_and_unsupported_loud():
    """Garbage bytes and unsupported geometry raise ValueError with the
    classified phrasings (the quarantine contract)."""
    import io
    import wave

    import pytest as _pytest

    from kafka_streams_the_clojure_way_spark.functions.codecs import (
        classify_codec_error,
    )

    with _pytest.raises(ValueError, match="not a decodable WAV"):
        wav_decode_pcm(b"not RIFF data at all")
    try:
        wav_decode_pcm(b"RIFFxxxx")
    except ValueError as exc:
        assert classify_codec_error(str(exc)) == "bad_magic"

    # 16-bit THREE-channel: parseable container, rejected geometry
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(3)
        w.setsampwidth(2)
        w.setframerate(16_000)
        w.writeframes(b"\x00\x01" * 9)
    with _pytest.raises(ValueError, match="unsupported WAV geometry"):
        wav_decode_pcm(buf.getvalue())
    try:
        wav_decode_pcm(buf.getvalue())
    except ValueError as exc:
        assert classify_codec_error(str(exc)) == "unsupported"

    # 24-bit mono DECODES since r11 (high-byte requantization); 32-bit
    # stays a loud rejection
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(3)
        w.setframerate(16_000)
        w.writeframes(b"\x00\x01\x02" * 4)
    assert len(wav_decode_pcm(buf.getvalue())) == 4
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(4)
        w.setframerate(16_000)
        w.writeframes(b"\x00\x01\x02\x03" * 4)
    with _pytest.raises(ValueError, match="unsupported WAV geometry"):
        wav_decode_pcm(buf.getvalue())


def test_wav_pcm16_truncated_frames():
    """A 16-bit stereo file with its payload cut mid-frame: the std
    wave reader surfaces what it can; our decoder must either raise
    ValueError or return only COMPLETE frames (never a torn sample)."""
    wav = wav_encode_pcm16(b"0123456789", channels=2)
    cut = wav[:-3]  # slice mid-sample
    try:
        out = wav_decode_pcm(cut)
    except ValueError:
        return
    # if the parser tolerates it, output length must be whole frames
    assert len(out) <= 5


# --------------------------------------------------------------------------
# Y4M (YUV4MPEG2) container (VERDICT r8 #3)
# --------------------------------------------------------------------------

from kafka_streams_the_clojure_way_spark.functions.codecs import (
    Y4M_FRAME_LEN,
    y4m_decode_frames,
    y4m_encode_video,
    y4m_parse_meta,
)


@_settings(max_examples=40, deadline=None)
@_given(_st.binary(max_size=400))
def test_y4m_roundtrip_concatenates_to_padded_payload(data):
    """Demuxed frames concatenate to the payload space-padded to a
    frame multiple (Y4M frames are fixed-size per the stream header);
    zero-byte payloads give a header-only stream with zero frames."""
    frames = y4m_decode_frames(y4m_encode_video(data))
    assert all(len(f) == Y4M_FRAME_LEN for f in frames)
    assert b"".join(frames) == data + b" " * (-len(data) % Y4M_FRAME_LEN)
    w, h, nf = y4m_parse_meta(y4m_encode_video(data))
    assert (w, h) == (Y4M_FRAME_LEN, 1)
    assert nf == len(frames) == (len(data) + Y4M_FRAME_LEN - 1) // Y4M_FRAME_LEN


@_settings(max_examples=40, deadline=None)
@_given(_st.binary(max_size=400))
def test_y4m_c420_luma_matches_mono(data):
    """The C420 fixture encoder (r10) carries the same luma payload per
    frame as Cmono — decode returns the luma plane only, so frames are
    IDENTICAL across colorspaces; geometry halves W, doubles H; the
    siting variants (jpeg/mpeg2/paldv) share the layout; a frame
    missing its chroma tail is truncated."""
    mono = y4m_encode_video(data)
    c420 = y4m_encode_video(data, cspace="420")
    assert y4m_decode_frames(c420) == y4m_decode_frames(mono)
    w, h, nf = y4m_parse_meta(c420)
    assert (w, h) == (Y4M_FRAME_LEN // 2, 2)
    assert nf == (len(data) + Y4M_FRAME_LEN - 1) // Y4M_FRAME_LEN
    for tag in (b"C420jpeg", b"C420mpeg2", b"C420paldv"):
        variant = c420.replace(b"C420", tag, 1)
        assert y4m_decode_frames(variant) == y4m_decode_frames(c420)
    if nf:
        import pytest as _pytest

        with _pytest.raises(ValueError, match="truncated Y4M frame"):
            y4m_decode_frames(c420[:-1])


def test_y4m_corruption_detected():
    """Bad magic, non-mono colorspace, bad FRAME marker, truncation —
    each raises ValueError with a classified kind."""
    import pytest as _pytest

    from kafka_streams_the_clojure_way_spark.functions.codecs import (
        classify_codec_error,
    )

    good = y4m_encode_video(b"x" * 100)

    with _pytest.raises(ValueError, match="bad magic"):
        y4m_decode_frames(b"NOT4MPEG2" + good[9:])
    # chroma-subsampled colorspaces: the C420 family (r10) and
    # C422/C444 (r11) DECODE (luma plane only); other layouts like
    # C411 stay unsupported, and a C420 tag with odd geometry is
    # rejected (both classified).
    c411 = good.replace(b"Cmono", b"C411 ", 1)
    with _pytest.raises(ValueError, match="unsupported Y4M colorspace"):
        y4m_decode_frames(c411)
    try:
        y4m_decode_frames(c411)
    except ValueError as exc:
        assert classify_codec_error(str(exc)) == "unsupported"
    odd420 = good.replace(b"Cmono", b"C420 ", 1)  # keeps W64 H1: odd H
    with _pytest.raises(ValueError, match="unsupported Y4M C420 geometry"):
        y4m_decode_frames(odd420)
    try:
        y4m_decode_frames(odd420)
    except ValueError as exc:
        assert classify_codec_error(str(exc)) == "unsupported"
    # corrupt a FRAME marker
    with _pytest.raises(ValueError, match="bad Y4M FRAME marker"):
        y4m_decode_frames(good.replace(b"FRAME\n", b"FLAME\n", 1))
    # truncate mid-frame
    with _pytest.raises(ValueError, match="truncated Y4M frame"):
        y4m_decode_frames(good[:-10])
    try:
        y4m_decode_frames(good[:-10])
    except ValueError as exc:
        assert classify_codec_error(str(exc)) == "truncated"
    # header-only parse hits the same guards without touching pixels
    with _pytest.raises(ValueError):
        y4m_parse_meta(good[:-10])


def test_y4m_tolerates_frame_parameters():
    """The spec allows parameters on FRAME lines; the demuxer must
    parse to the newline, not assume 'FRAME\\n' literally."""
    raw = y4m_encode_video(b"a" * Y4M_FRAME_LEN)
    patched = raw.replace(b"FRAME\n", b"FRAME Xparam=1\n", 1)
    frames = y4m_decode_frames(patched)
    assert frames == [b"a" * Y4M_FRAME_LEN]
