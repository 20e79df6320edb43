"""Multimodal column plumbing (SURVEY.md §7 M5): image/audio/video as
opaque ``binary`` columns with typed metadata, processed by Arrow-batched
Pandas UDFs over ``mapInPandas``.

Since r8 the decode paths are REAL where the std library can carry them
(``functions/codecs``): grayscale PNG (zlib inflate, CRC validation, all
five scanline filters), RIFF/WAVE 8-bit PCM, and a concatenated-P5 frame
container — ``decoder="stdlib"`` here, ``decode="png"``/``"wav"`` in the
pHash/fingerprint kernels, ``container="pgm"`` in the frame sampler. The
deterministic stub remains the default for plumbing tests, and the
Pillow/ffmpeg seam stays import-gated for builds that have real codec
libraries; swapping decoders changes no plan shape.

Schema convention for a multimodal asset column::

    asset: struct<
        bytes:      binary,      -- opaque payload
        mime:       string,      -- 'image/png', 'audio/wav', ...
        width:      int,         -- -1 when unknown/not applicable
        height:     int,
        n_frames:   int,
        sample_rate:int
    >

Scale notes: binary payloads dominate row size — keep
``spark.sql.files.maxPartitionBytes`` at 128-256 MiB so a partition of
assets fits executor memory; never collect() assets; feature extraction
emits small fixed-size vectors so the *output* of this stage is orders of
magnitude smaller than the input (the classic funnel shape).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASSET_SCHEMA = (
    "bytes binary, mime string, width int, height int, n_frames int, sample_rate int"
)

FEATURE_DIM = 8

# Import-gated real image decoder (mirrors sources/kafka.py's broker-lib
# gating): Pillow is not in this container, so the flag is False here and
# every decode runs the deterministic stub — but a build WITH Pillow gets
# real image geometry by passing decoder="pillow", with zero plan change.
try:  # pragma: no cover - exercised only where Pillow is installed
    from PIL import Image as _PILImage

    HAS_PIL = True
except ImportError:  # pragma: no cover
    _PILImage = None
    HAS_PIL = False


def _decode_stub(payload: bytes, mime: str) -> dict:
    """Deterministic fake decoder. A real build replaces this with
    Pillow/ffmpeg; the Spark plumbing around it is identical. Raises for
    unknown mime types exactly as a real decoder would."""
    if not mime.startswith(("image/", "audio/", "video/")):
        raise NotImplementedError(f"no decoder for mime {mime!r}")
    # fake dimensions derived from content so tests are deterministic.
    n = len(payload)
    return {
        "width": (n % 64) + 1,
        "height": ((n // 64) % 64) + 1,
        "n_frames": 1 if mime.startswith("image/") else (n % 30) + 1,
        "sample_rate": 16_000 if mime.startswith("audio/") else -1,
    }


def wrap_binary_assets(df: DataFrame, bytes_col: str, mime: str) -> DataFrame:
    """Lift a raw binary column into the asset struct convention."""
    return df.withColumn(
        "asset",
        F.struct(
            F.col(bytes_col).alias("bytes"),
            F.lit(mime).alias("mime"),
            F.lit(-1).alias("width"),
            F.lit(-1).alias("height"),
            F.lit(-1).alias("n_frames"),
            F.lit(-1).alias("sample_rate"),
        ),
    )


#: mime per fixture codec (module-level: shared by the single-codec and
#: per-row-dispatch encoders).
_CODEC_MIME = {
    "png": "image/png",
    "png_rgb": "image/png",
    "png_palette": "image/png",
    "png_adam7": "image/png",
    "wav": "audio/wav",
    "wav16": "audio/wav",
    "wav24": "audio/wav",
    "pgm": "video/x-pgm-frames",
    "y4m": "video/x-yuv4mpeg",
    "y4m420": "video/x-yuv4mpeg",
    "y4m422": "video/x-yuv4mpeg",
    "y4m444": "video/x-yuv4mpeg",
}


def _codec_batch_encoders():
    """list[bytes] -> list[container bytes] encoder per fixture codec
    (worker-side). The PNG family routes through the r12 BATCH encoders
    (one stacked scanline-filter pass per Arrow batch — guide §4.2);
    the cheap container muxes (WAV via the std ``wave`` writer, PGM/Y4M
    header concatenation) stay per-payload inside a list comprehension.
    Byte-identical per element to :func:`_codec_encoders`."""
    from kafka_streams_the_clojure_way_spark.functions import codecs as CC

    batch = {
        "png": CC.png_encode_gray_batch,
        "png_rgb": CC.png_encode_rgb_batch,
        "png_palette": CC.png_encode_palette_batch,
        "png_adam7": CC.png_encode_gray_interlaced_batch,
    }
    out = dict(batch)
    for codec, enc in _codec_encoders().items():
        if codec not in out:
            out[codec] = lambda payloads, _e=enc: [_e(p) for p in payloads]
    return out


def _codec_encoders():
    """bytes -> container encoder per fixture codec (worker-side)."""
    from kafka_streams_the_clojure_way_spark.functions import codecs as CC

    return {
        "png": CC.png_encode_gray,
        "png_rgb": CC.png_encode_rgb,
        "png_palette": CC.png_encode_palette,
        # Adam7-interlaced grayscale: same decoded pixel stream as
        # "png" (interlacing reorders wire bytes, never the image)
        "png_adam7": CC.png_encode_gray_interlaced,
        "wav": CC.wav_encode_pcm8,
        "wav16": CC.wav_encode_pcm16,  # 16-bit stereo (channels=2)
        # 24-bit stereo — decodes to the SAME pairwise byte average
        # as wav16, so a mixed 16/24-bit corpus shares one oracle
        "wav24": CC.wav_encode_pcm24,
        "pgm": CC.pgm_encode_video,
        "y4m": CC.y4m_encode_video,
        # real 4:2:0 stream whose LUMA carries the same payload
        # bytes per frame as the Cmono fixture (W halves, H
        # doubles, neutral chroma planes appended) — so mixed
        # Cmono/C420 corpora share one luma-level oracle.
        "y4m420": lambda b: CC.y4m_encode_video(b, cspace="420"),
        # 4:2:2 / 4:4:4 (r11): same frame_len luma payload per
        # frame, wider neutral chroma — luma oracles stay invariant
        "y4m422": lambda b: CC.y4m_encode_video(b, cspace="422"),
        "y4m444": lambda b: CC.y4m_encode_video(b, cspace="444"),
    }


def encode_text_assets(
    df: DataFrame,
    codec: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Manufacture REAL encoded media assets from a text column — the
    fixture side of the stdlib codec seam (``functions/codecs``): each
    row's UTF-8 bytes become the pixel/sample/frame payload of a
    genuine container (``codec`` in {"png", "wav", "pgm"}), wrapped in
    the standard asset struct. A production corpus arrives already
    encoded; this exists so the decode paths are exercised against
    payloads whose decoded stream the DuckDB oracle can reproduce from
    the text (PNG: + the documented space-pad; WAV/PGM: exact).
    Per-row Python is inherent — codecs are per-payload work — but the
    kernel is Arrow-batched and the output stays one asset row per doc."""
    import pandas as pd

    if codec not in (
        "png", "png_rgb", "png_palette", "png_adam7", "wav", "wav16", "wav24",
        "pgm", "y4m", "y4m420", "y4m422", "y4m444",
    ):
        raise ValueError(
            f"codec must be 'png', 'png_rgb', 'png_palette', 'png_adam7', "
            f"'wav', 'wav16', 'wav24', 'pgm', 'y4m', 'y4m420', 'y4m422' or "
            f"'y4m444', got {codec!r}"
        )
    mime = _CODEC_MIME[codec]

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        enc = _codec_batch_encoders()[codec]
        for pdf in batches:
            payloads = enc([t.encode("utf-8") for t in pdf[text_col].values])
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "asset": [
                        {
                            "bytes": p,
                            "mime": mime,
                            "width": -1,
                            "height": -1,
                            "n_frames": -1,
                            "sample_rate": -1,
                        }
                        for p in payloads
                    ],
                }
            )

    # NOTE (r11, measured): no blanket parallelism guard here. An
    # operator-level with_min_parallelism was tried and REGRESSED the
    # family 9.9s -> 16.2s at sf0.1: the per-task Python fan-out (an
    # exchange per fixture leg + ~32 mapInPandas tasks per chained
    # kernel) costs more than the trivial encode kernels save. Only the
    # decode-heavy image chains win; THOSE queries guard their input
    # (see queries/llm_pipeline._image_assets).
    return df.select(id_col, text_col).mapInPandas(
        kernel, schema=f"{id_col} long, asset struct<{ASSET_SCHEMA}>"
    )


#: first IDAT body byte of a PNG from functions/codecs.png_encode_gray:
#: magic (8) + IHDR chunk (4 len + 4 tag + 13 body + 4 crc) + IDAT
#: header (4 len + 4 tag). Flipping THIS byte leaves chunk framing
#: intact and guarantees an IDAT CRC mismatch (a single-byte XOR can
#: never be a CRC-32 codeword).
PNG_IDAT_BODY_OFFSET = 8 + 25 + 8

#: byte length of a zero-payload chunk (PNG IEND): 4 len + 4 tag + 4
#: crc. Dropping this many trailing bytes removes IEND exactly.
PNG_IEND_LEN = 12


def _corrupt_payload(
    doc_id: int, raw: bytes, flip_offset: int, trunc_tail: int
) -> bytes:
    """The id%4-keyed seeded corruption of :func:`corrupt_assets`,
    factored so the fused fixture encoder applies the identical bytes."""
    kind = doc_id % 4
    if kind == 1 and len(raw) > flip_offset:
        return (
            raw[:flip_offset]
            + bytes([raw[flip_offset] ^ 0xFF])
            + raw[flip_offset + 1 :]
        )
    if kind == 2:
        return raw[: max(0, len(raw) - trunc_tail)]
    if kind == 3:
        return b"\x00\x00\x00\x00" + raw[4:]
    return raw


def corrupt_assets(
    df: DataFrame,
    id_col: str = "doc_id",
    *,
    flip_offset: int = PNG_IDAT_BODY_OFFSET,
    trunc_tail: int = PNG_IEND_LEN,
) -> DataFrame:
    """FIXTURE-side seeded corruption for the quarantine path: apply a
    deterministic, id-keyed corruption to each asset payload so a
    permissive decode's per-row verdict is predictable in SQL.

    By ``id % 4``: 0 = clean; 1 = XOR 0xFF one byte at ``flip_offset``
    (inside a PNG's first IDAT body -> chunk CRC mismatch, always —
    CRC-32 is linear, so a single-byte flip cannot be a codeword);
    2 = drop the trailing ``trunc_tail`` bytes (a PNG's IEND chunk
    exactly -> "missing IEND", the truncation class); 3 = zero the
    first 4 bytes (bad magic, always). The corruption classes are the
    tests' corruptor set (tests/test_codecs.py) applied as a corpus
    fixture. Payload-local, Arrow-batched; schema unchanged."""
    import pandas as pd

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for doc_id, asset in zip(pdf[id_col].values, pdf["asset"].values):
                raw = _corrupt_payload(
                    int(doc_id), bytes(asset["bytes"]), flip_offset, trunc_tail
                )
                out.append(
                    {
                        id_col: doc_id,
                        "asset": {
                            "bytes": raw,
                            "mime": asset["mime"],
                            "width": asset["width"],
                            "height": asset["height"],
                            "n_frames": asset["n_frames"],
                            "sample_rate": asset["sample_rate"],
                        },
                    }
                )
            yield pd.DataFrame(out)

    return df.select(id_col, "asset").mapInPandas(
        kernel, schema=f"{id_col} long, asset struct<{ASSET_SCHEMA}>"
    )


def encode_text_assets_by(
    df: DataFrame,
    codec_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    corrupt_png: bool = False,
    flip_offset: int = PNG_IDAT_BODY_OFFSET,
    trunc_tail: int = PNG_IEND_LEN,
) -> DataFrame:
    """Fixture encoder with PER-ROW codec dispatch — ONE mapInPandas
    over a mixed-modality corpus (r11, guide §4: was one
    ``encode_text_assets`` leg per codec + a union tree + an extra
    corruption pass; a 6-leg fixture built 7 Python stages that each
    re-scanned the source). ``codec_col`` names a string column holding
    one of the :func:`encode_text_assets` codec tags per row; rows
    encode through the IDENTICAL per-codec encoders, so the output is
    row-identical to the filter-per-codec union it replaces (pinned in
    tests/test_round11_fixes.py). ``corrupt_png=True`` additionally
    applies :func:`corrupt_assets`' id%4 seeded corruption classes to
    the image/png rows in the same pass (byte-identical helper)."""
    import pandas as pd

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        enc = _codec_batch_encoders()
        for pdf in batches:
            ids = pdf[id_col].values
            texts = pdf[text_col].values
            codec_vals = pdf[codec_col].values
            raws: list = [None] * len(pdf)
            # group rows by codec so the PNG family hits the batch
            # encoders once per codec, not once per row (r12)
            by_codec: dict[str, list[int]] = {}
            for i, c in enumerate(codec_vals):
                by_codec.setdefault(c, []).append(i)
            for codec, idxs in by_codec.items():
                encoder = enc.get(codec)
                if encoder is None:
                    raise ValueError(f"unknown fixture codec {codec!r}")
                encoded = encoder([texts[i].encode("utf-8") for i in idxs])
                for i, raw in zip(idxs, encoded):
                    raws[i] = raw
            out = []
            for i, (doc_id, codec) in enumerate(zip(ids, codec_vals)):
                mime = _CODEC_MIME[codec]
                raw = raws[i]
                if corrupt_png and mime == "image/png":
                    raw = _corrupt_payload(
                        int(doc_id), raw, flip_offset, trunc_tail
                    )
                out.append(
                    {
                        id_col: doc_id,
                        "asset": {
                            "bytes": raw,
                            "mime": mime,
                            "width": -1,
                            "height": -1,
                            "n_frames": -1,
                            "sample_rate": -1,
                        },
                    }
                )
            yield pd.DataFrame(out)

    return df.select(id_col, text_col, codec_col).mapInPandas(
        kernel, schema=f"{id_col} long, asset struct<{ASSET_SCHEMA}>"
    )


def decode_assets(
    df: DataFrame,
    id_col: str = "doc_id",
    decoder: str = "stub",
    *,
    mode: str = "strict",
) -> DataFrame:
    """Decode metadata for every asset via Arrow-batched mapInPandas.
    Output: id + decoded metadata + payload size (payload itself dropped —
    the funnel: big bytes in, small typed rows out).

    ``mode="permissive"`` adds ``status``/``error_kind`` columns and
    quarantines per-asset parse failures (-1 metadata sentinels) instead
    of failing the stage — the contract a 100 TB ingest needs (one
    corrupt container must cost one row, not the job). Strict stays the
    default; clean-asset values are identical in both modes.

    ``decoder="stub"`` (default): NO per-row Python — mime/size come from
    the struct fields and byte lengths, and the stub geometry is a pure
    function of those, so the whole batch is computed with vectorized
    pandas/numpy column ops (and stays DuckDB-oracle-checkable).

    ``decoder="pillow"``: REAL image decoding through Pillow, import-gated
    exactly like the Kafka admin surface (sources/kafka.py) — raises a
    loud ImportError where Pillow is absent instead of silently serving
    stub geometry. image/* payloads are opened per row (a real codec is
    inherently per-payload work — this is the one loop a decoder
    genuinely forces); audio/video fall back to the stub geometry since
    their codecs aren't import-gated here. Plan shape, schema, and batch
    flow are identical to the stub path.

    ``decoder="stdlib"``: REAL header-only container parsing via
    ``functions/codecs`` — PNG IHDR (magic + CRC validated, no
    inflate), WAV through the std RIFF parser, concatenated-P5 frame
    counting by header walking. Geometry comes from the actual
    container bytes; no pixel/sample payload is decompressed on this
    metadata path (the cheap-scan property a catalog-building pass
    needs). Raises loud on any malformed container."""
    import numpy as np
    import pandas as pd

    if decoder not in {"stub", "pillow", "stdlib"}:
        raise ValueError(
            f"decoder must be 'stub', 'pillow' or 'stdlib', got {decoder!r}"
        )
    if mode not in ("strict", "permissive"):
        raise ValueError(f"mode must be 'strict' or 'permissive', got {mode!r}")
    if decoder == "pillow" and not HAS_PIL:
        raise ImportError(
            "decode_assets(decoder='pillow') requires Pillow; install it or "
            "use the deterministic stub decoder (decoder='stub')"
        )
    use_pil = decoder == "pillow"
    use_stdlib = decoder == "stdlib"
    permissive = mode == "permissive"

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import io

        from kafka_streams_the_clojure_way_spark.functions import codecs as CC

        for pdf in batches:
            mimes = pdf["asset"].str.get("mime")
            known = mimes.str.startswith(("image/", "audio/", "video/"))
            kinds: list[str | None] = [None] * len(pdf)
            if not known.all():
                if not permissive:
                    bad = mimes[~known].iloc[0]
                    raise NotImplementedError(f"no decoder for mime {bad!r}")
                for i, ok in enumerate(known.values):
                    if not ok:
                        kinds[i] = "unsupported"
            payloads = pdf["asset"].str.get("bytes")
            n = payloads.str.len().to_numpy(dtype="int64")
            # stub geometry: a pure function of byte length, whole-column
            is_image = mimes.str.startswith("image/").to_numpy()
            is_audio = mimes.str.startswith("audio/").to_numpy()
            width = ((n % 64) + 1).astype("int32")
            height = (((n // 64) % 64) + 1).astype("int32")
            n_frames = np.where(is_image, 1, (n % 30) + 1).astype("int32")
            if use_pil:
                # real decode: per-payload by necessity (codec work)
                for i, (img, payload) in enumerate(zip(is_image, payloads.values)):
                    if not img or kinds[i] is not None:
                        continue
                    with _PILImage.open(io.BytesIO(bytes(payload))) as im:
                        width[i], height[i] = im.width, im.height
                        n_frames[i] = getattr(im, "n_frames", 1)
            if use_stdlib:
                # REAL header parsing per container (functions/codecs):
                # PNG IHDR (CRC-checked, no inflate), WAV via the std
                # RIFF parser, PGM header walking. Per-payload by
                # necessity; header-only, so no pixel/sample bytes are
                # decompressed on the metadata path.
                rates = np.full(len(n), -1, dtype="int32")
                for i, (mime, payload) in enumerate(
                    zip(mimes.values, payloads.values)
                ):
                    if kinds[i] is not None:
                        continue
                    raw = bytes(payload)
                    try:
                        if mime == "image/png":
                            width[i], height[i] = CC.png_parse_ihdr(raw)
                            n_frames[i] = 1
                        elif mime == "audio/wav":
                            n_frames[i], rates[i] = CC.wav_parse_meta(raw)
                            width[i] = height[i] = -1
                        elif mime == "video/x-pgm-frames":
                            n_frames[i] = CC.pgm_parse_n_frames(raw)
                            width[i], height[i] = CC.PGM_FRAME_LEN, 1
                        elif mime == "video/x-yuv4mpeg":
                            width[i], height[i], n_frames[i] = CC.y4m_parse_meta(
                                raw
                            )
                        else:
                            raise NotImplementedError(
                                f"no stdlib header parser for mime {mime!r}"
                            )
                    except (ValueError, NotImplementedError) as exc:
                        if not permissive:
                            raise
                        kinds[i] = CC.classify_codec_error(str(exc))
                cols = {
                    id_col: pdf[id_col],
                    "mime": mimes,
                    "n_bytes": n,
                    "width": width,
                    "height": height,
                    "n_frames": n_frames,
                    "sample_rate": rates,
                }
            else:
                cols = {
                    id_col: pdf[id_col],
                    "mime": mimes,
                    "n_bytes": n,
                    "width": width,
                    "height": height,
                    "n_frames": n_frames,
                    "sample_rate": np.where(is_audio, 16_000, -1).astype("int32"),
                }
            if permissive:
                bad = np.array([k is not None for k in kinds], dtype=bool)
                for c in ("width", "height", "n_frames", "sample_rate"):
                    cols[c] = np.where(bad, -1, cols[c]).astype("int32")
                cols["status"] = np.where(bad, "quarantined", "ok")
                cols["error_kind"] = [k if k is not None else "ok" for k in kinds]
            yield pd.DataFrame(cols)

    schema = (
        f"{id_col} long, mime string, n_bytes long, width int, height int, "
        "n_frames int, sample_rate int"
    )
    if permissive:
        schema += ", status string, error_kind string"
    return df.select(id_col, "asset").mapInPandas(decode, schema=schema)


def resize_assets(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    codec: str | None = None,
) -> DataFrame:
    """Resize every image asset to (width, height). Output keeps the
    asset struct convention so resize chains with decode/featurize.
    Payload in, payload out: this is the one multimodal op WITHOUT the
    funnel shape — budget shuffle/IO for output ~= input.

    ``codec=None`` (stub): payload truncated/zero-padded to exactly
    width*height bytes — plumbing-shape only. ``codec="png"``: the REAL
    transcode loop — decode the PNG through the stdlib parser,
    nearest-neighbor resample the decoded pixel stream to the target
    geometry (``out[k] = pix[(k * n) // target]``, the phash kernel's
    sampling rule so the oracle can reproduce each output pixel with
    substring arithmetic), and RE-ENCODE a valid PNG of the new
    geometry. A real-codec build swaps in Pillow's resampler behind the
    same seam; plan shape identical either way."""
    import numpy as np
    import pandas as pd

    if codec not in (None, "png"):
        raise ValueError(f"codec must be None or 'png', got {codec!r}")
    target = width * height

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        if codec == "png":
            from kafka_streams_the_clojure_way_spark.functions.codecs import (
                png_decode_gray_batch,
                png_encode_gray_batch,
            )

            ks = np.arange(target, dtype=np.int64)

            def kernel_batch(raws: list[bytes]) -> list[bytes]:
                # r12: batch decode -> numpy fancy-index resample
                # (out[k] = pix[(k * n) // target]) -> batch re-encode
                pixs, _ = png_decode_gray_batch(raws, "raise")
                resampled = [
                    np.frombuffer(p, dtype=np.uint8)[
                        (ks * len(p)) // target
                    ].tobytes()
                    for p in pixs
                ]
                return png_encode_gray_batch(resampled, width=width)

        else:

            def kernel_batch(raws: list[bytes]) -> list[bytes]:
                return [
                    raw[:target] + b"\x00" * (target - len(raw[:target]))
                    for raw in raws
                ]

        # zip over .values, not pandas row iteration (which materializes
        # a Series per row, ~5-10x slower per batch); the per-payload
        # transcode itself is the only genuinely per-row work here
        # (variable-length binary has no columnar kernel)
        for pdf in batches:
            assets = pdf["asset"].values
            payloads = kernel_batch([bytes(a["bytes"]) for a in assets])
            out = []
            for doc_id, asset, payload in zip(
                pdf[id_col].values, assets, payloads
            ):
                out.append(
                    {
                        id_col: doc_id,
                        "asset": {
                            "bytes": payload,
                            "mime": asset["mime"],
                            "width": width,
                            "height": height,
                            "n_frames": asset["n_frames"],
                            "sample_rate": asset["sample_rate"],
                        },
                    }
                )
            yield pd.DataFrame(out)

    return df.select(id_col, "asset").mapInPandas(
        resize, schema=f"{id_col} long, asset struct<{ASSET_SCHEMA}>"
    )


def transcode_checksum_assets(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """The full PNG transcode audit in ONE Python pass (r11, guide §4):
    decode -> nearest-neighbor resample -> re-encode -> decode again ->
    checksum, per asset — exactly
    ``asset_pixel_checksum(resize_assets(df, w, h, codec="png"),
    decode="png")`` (same codec kernels called in the same order, same
    output columns), but without shipping every intermediate payload
    across two extra JVM<->Python Arrow hops: the 3-stage chain spawned
    three Python workers per task whose transfer/setup overhead dwarfed
    the codec CPU (whole-corpus encode+decode measures ~0.7 s
    single-core at sf0.1). Parity pinned in
    tests/test_round11_fixes.py."""
    import numpy as np
    import pandas as pd

    target = width * height

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from kafka_streams_the_clojure_way_spark.functions.codecs import (
            png_decode_gray,
            png_encode_gray,
        )

        ks = np.arange(target, dtype=np.int64)
        for pdf in batches:
            pix: list[bytes] = []
            for a in pdf["asset"].values:
                decoded = png_decode_gray(bytes(a["bytes"]))
                # numpy fancy-index twin of the per-pixel genexp
                # resampled[k] = decoded[(k * n) // target] (r12)
                resampled = np.frombuffer(decoded, dtype=np.uint8)[
                    (ks * len(decoded)) // target
                ].tobytes()
                reencoded = png_encode_gray(resampled, width=width)
                pix.append(png_decode_gray(reencoded))
            lens = np.fromiter(
                (len(p) for p in pix), dtype=np.int64, count=len(pix)
            )
            buf = np.frombuffer(b"".join(pix), dtype=np.uint8).astype(np.int64)
            ends = np.cumsum(lens)
            starts = ends - lens
            csum = np.concatenate(([0], np.cumsum(buf)))
            sbuf = buf if buf.size else np.zeros(1, dtype=np.int64)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "n_pix": lens,
                    "pix_sum": csum[ends] - csum[starts],
                    "pix_head": np.where(
                        lens > 0, sbuf[np.minimum(starts, sbuf.size - 1)], -1
                    ),
                    "pix_tail": np.where(
                        lens > 0,
                        sbuf[np.minimum(np.maximum(ends - 1, 0), sbuf.size - 1)],
                        -1,
                    ),
                }
            )

    return df.select(id_col, "asset").mapInPandas(
        kernel,
        schema=(
            f"{id_col} long, n_pix long, pix_sum long, "
            "pix_head long, pix_tail long"
        ),
    )


def asset_pixel_checksum(
    df: DataFrame,
    id_col: str = "doc_id",
    decode: str | None = None,
    *,
    mode: str = "strict",
) -> DataFrame:
    """(id, n_pix, pix_sum, pix_head, pix_tail) per asset — the decoded
    pixel stream's length, byte sum, and first/last byte. The cheap
    content pin an end-to-end transcode audit needs: any mis-decoded,
    mis-sampled, or mis-ordered pixel moves the sum (and the endpoints
    catch symmetric swaps the sum forgives). ``decode="png"`` runs the
    real stdlib PNG decoder (grayscale profile); ``decode="png_any"``
    dispatches by IHDR color type (gray plane / truecolor RGB /
    PLTE-expanded RGB — the permissive ingestion-gate profile, where
    'not grayscale' must not read as 'corrupt'); ``decode="wav"`` the
    std RIFF parser
    (8-bit mono); ``decode="pcm"`` the general WAV profile (8-bit mono
    + 16-bit mono/stereo with documented downmix/requantization);
    ``decode="y4m"`` the YUV4MPEG2 demuxer (concatenated luma planes —
    Cmono and the C420 family, chroma skipped);
    ``decode=None`` checksums raw payload bytes. Vectorized per Arrow
    batch: one concatenated uint8 buffer + a segment-offset add-reduce,
    the extract_features discipline.

    ``mode="strict"`` (default): the first corrupt asset raises and —
    in Spark — fails the stage, the right PER-ASSET contract but the
    wrong JOB contract at corpus scale (one flipped byte in 100 TB kills
    the ingest). ``mode="permissive"``: per-asset codec ``ValueError``s
    are caught INSIDE the kernel and the row is QUARANTINED — two extra
    columns (``status`` 'ok'|'quarantined', ``error_kind`` from the
    closed ``functions/codecs.CODEC_ERROR_KINDS`` vocabulary) and -1
    sentinels for the checksum columns. Clean assets produce
    bit-identical values in both modes (pytest-pinned); the decode work
    stays in the same vectorized batch path — only failed payloads take
    the exception branch."""
    import numpy as np
    import pandas as pd

    if decode not in _CHECKSUM_DECODERS:
        raise ValueError(
            f"decode must be None, 'png', 'png_any', 'wav', 'pcm' or 'y4m', "
            f"got {decode!r}"
        )
    if mode not in ("strict", "permissive"):
        raise ValueError(f"mode must be 'strict' or 'permissive', got {mode!r}")
    permissive = mode == "permissive"

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from kafka_streams_the_clojure_way_spark.functions.codecs import (
            classify_codec_error,
        )

        unwrap_batch = _checksum_unwrap_batch(decode)
        for pdf in batches:
            payloads = [a["bytes"] for a in pdf["asset"].values]
            if permissive:
                streams, errs = unwrap_batch(payloads, errors="capture")
                pix = [s if e is None else b"" for s, e in zip(streams, errs)]
                kinds = [
                    None if e is None else classify_codec_error(str(e))
                    for e in errs
                ]
            else:
                pix, _ = unwrap_batch(payloads, errors="raise")
            lens = np.fromiter((len(p) for p in pix), dtype=np.int64)
            buf = np.frombuffer(b"".join(pix), dtype=np.uint8).astype(np.int64)
            ends = np.cumsum(lens)
            starts = ends - lens
            csum = np.concatenate(([0], np.cumsum(buf)))
            # np.where evaluates both branches: index a 1-elem dummy when
            # the whole batch decoded to zero bytes (empty assets)
            sbuf = buf if buf.size else np.zeros(1, dtype=np.int64)
            cols = {
                id_col: pdf[id_col].values,
                "n_pix": lens,
                "pix_sum": csum[ends] - csum[starts],
                "pix_head": np.where(
                    lens > 0, sbuf[np.minimum(starts, sbuf.size - 1)], -1
                ),
                "pix_tail": np.where(
                    lens > 0, sbuf[np.minimum(np.maximum(ends - 1, 0), sbuf.size - 1)], -1
                ),
            }
            if permissive:
                bad = np.array([k is not None for k in kinds], dtype=bool)
                for c in ("n_pix", "pix_sum", "pix_head", "pix_tail"):
                    cols[c] = np.where(bad, -1, cols[c])
                cols["status"] = np.where(bad, "quarantined", "ok")
                cols["error_kind"] = [k if k is not None else "ok" for k in kinds]
            yield pd.DataFrame(cols)

    schema = f"{id_col} long, n_pix long, pix_sum long, pix_head long, pix_tail long"
    if permissive:
        schema += ", status string, error_kind string"
    return df.select(id_col, "asset").mapInPandas(kernel, schema=schema)


#: decode profiles the checksum kernels accept (None = raw payload).
_CHECKSUM_DECODERS = (None, "png", "png_any", "wav", "pcm", "y4m")


def _checksum_unwrap(decode: str | None):
    """The payload -> decoded-byte-stream callable behind each checksum
    decode profile (worker-side; import inside the task). Shared by
    :func:`asset_pixel_checksum` and the fused decode gate so both run
    the IDENTICAL codec kernel per profile."""
    if decode == "png":
        from kafka_streams_the_clojure_way_spark.functions.codecs import (
            png_decode_gray,
        )

        return lambda raw: png_decode_gray(bytes(raw))
    if decode == "png_any":
        # color-type dispatch (gray/truecolor/palette) — the permissive
        # ingestion gate's profile: a crawl's PNGs are not all
        # grayscale, and 'not grayscale' must not classify as corrupt
        # (ADVICE r10)
        from kafka_streams_the_clojure_way_spark.functions.codecs import (
            png_decode_auto,
        )

        return lambda raw: png_decode_auto(bytes(raw))
    if decode == "wav":
        from kafka_streams_the_clojure_way_spark.functions.codecs import (
            wav_decode_pcm8,
        )

        return lambda raw: wav_decode_pcm8(bytes(raw))
    if decode == "pcm":
        # general profile: 8-bit mono OR 16-bit mono/stereo, reduced to
        # one 8-bit stream (documented downmix + requantization)
        from kafka_streams_the_clojure_way_spark.functions.codecs import (
            wav_decode_pcm,
        )

        return lambda raw: wav_decode_pcm(bytes(raw))
    if decode == "y4m":
        # full demux, concatenated luma planes (Cmono and the C420
        # family — chroma skipped)
        from kafka_streams_the_clojure_way_spark.functions.codecs import (
            y4m_decode_frames,
        )

        return lambda raw: b"".join(y4m_decode_frames(bytes(raw)))
    return bytes


def _checksum_unwrap_batch(decode: str | None):
    """Batch twin of :func:`_checksum_unwrap`:
    ``fn(payloads, errors) -> (streams, errs)`` with per-payload
    ``ValueError`` capture (``errors="capture"``) or fail-fast
    (``"raise"``). The PNG profiles route through the r12 stacked batch
    decoders; WAV/Y4M stay per-payload (std-module parsing / header
    walking — already C-bound) behind the same interface."""
    from kafka_streams_the_clojure_way_spark.functions import codecs as CC

    if decode == "png":
        return lambda payloads, errors="raise": CC.png_decode_gray_batch(
            payloads, errors
        )
    if decode == "png_any":
        return lambda payloads, errors="raise": CC.png_decode_auto_batch(
            payloads, errors
        )
    unwrap = _checksum_unwrap(decode)

    def run(payloads, errors="raise"):
        out: list = [None] * len(payloads)
        errs: list = [None] * len(payloads)
        for i, p in enumerate(payloads):
            try:
                out[i] = unwrap(p)
            except (ValueError, NotImplementedError) as exc:
                if errors == "raise":
                    raise
                errs[i] = exc
        return out, errs

    return run


def asset_decode_gate(
    df: DataFrame,
    mime_decoders: dict[str, str],
    id_col: str = "doc_id",
) -> DataFrame:
    """ONE permissive full-decode pass over a mixed-modality batch — the
    ingestion decode gate FUSED (r11 perf: guide §4, minimize Python
    boundary stages): per-row dispatch by mime to the same codec kernel
    :func:`asset_pixel_checksum` runs for that modality, with the asset
    struct PASSED THROUGH, so the gate needs no per-modality legs, no
    union, and no join back to the batch. Output: survivors only —
    rows whose mime is in ``mime_decoders`` AND whose payload decodes —
    carrying (id, asset, n_pix, pix_sum). Bit-identical to the
    filter-by-mime + asset_pixel_checksum(mode="permissive") +
    inner-join composition it replaces (pinned in
    tests/test_round11_fixes.py): a corrupt payload quarantines (drops)
    exactly where it did, and an unlisted mime drops exactly as a row
    matching no modality leg's filter did."""
    import numpy as np
    import pandas as pd

    for dec in mime_decoders.values():
        if dec not in _CHECKSUM_DECODERS or dec is None:
            raise ValueError(f"unknown checksum decode profile {dec!r}")
    decoders = dict(mime_decoders)

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        unwraps = {m: _checksum_unwrap_batch(d) for m, d in decoders.items()}
        for pdf in batches:
            assets = pdf["asset"].values
            keep = np.zeros(len(pdf), dtype=bool)
            streams: list = [None] * len(pdf)
            # group rows by mime so each modality decodes as one batch
            # (the PNG profiles hit the r12 stacked decoders); a row
            # whose mime is unlisted matched no modality leg, a row
            # whose payload fails its decoder quarantines — one corrupt
            # row, not the job
            by_mime: dict[str, list[int]] = {}
            for i, a in enumerate(assets):
                if a["mime"] in unwraps:
                    by_mime.setdefault(a["mime"], []).append(i)
            for mime, idxs in by_mime.items():
                dec, errs = unwraps[mime](
                    [assets[i]["bytes"] for i in idxs], errors="capture"
                )
                for i, d, e in zip(idxs, dec, errs):
                    if e is None:
                        keep[i] = True
                        streams[i] = d
            pix: list[bytes] = [s for s in streams if s is not None]
            lens = np.fromiter((len(p) for p in pix), dtype=np.int64, count=len(pix))
            buf = np.frombuffer(b"".join(pix), dtype=np.uint8).astype(np.int64)
            ends = np.cumsum(lens)
            csum = np.concatenate(([0], np.cumsum(buf)))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values[keep],
                    "asset": assets[keep],
                    "n_pix": lens,
                    "pix_sum": csum[ends] - csum[ends - lens],
                }
            )

    return df.select(id_col, "asset").mapInPandas(
        kernel,
        schema=(
            f"{id_col} long, asset struct<{ASSET_SCHEMA}>, "
            "n_pix long, pix_sum long"
        ),
    )


FRAME_STRIDE = 5


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    stride: int = FRAME_STRIDE,
    container: str | None = None,
    *,
    mode: str = "strict",
) -> DataFrame:
    """Frame sampling for video assets — the 1->N row expansion shape
    (mapInPandas yielding MORE rows than it reads).

    ``container=None``: split the payload into the stub decoder's
    ``n_frames`` equal chunks (geometry a pure function of byte length,
    SQL-checkable). ``container="pgm"``: DEMUX a real concatenated-P5
    netpbm stream through ``functions/codecs.pgm_decode_frames`` — each
    frame's ASCII header is parsed and validated, and the emitted
    ``frame_bytes`` are the frame's decoded pixels (which round-trip
    the encoder's input chunks exactly, keeping the oracle a
    ``substring``). ``container="y4m"``: demux a real YUV4MPEG2 stream
    (``functions/codecs.y4m_decode_frames`` — stream header fixes the
    geometry, so the last frame arrives space-padded and the oracle
    adds one ``rpad``). ``container="auto"``: dispatch per asset by its
    ``mime`` field — the production shape for mixed-container corpora
    (a demuxer routes on the container type the catalog recorded);
    unknown video mimes raise loud (or quarantine in permissive mode).

    ``mode="permissive"``: a container that fails to demux emits ONE
    quarantine row (frame_idx=-1, frame_bytes NULL, frame_len=-1) with
    ``status``/``error_kind`` columns instead of failing the stage —
    demux is all-or-nothing per container (a bad header poisons every
    subsequent frame offset), so the quarantine unit is the asset, not
    the frame. Clean containers sample identically in both modes."""
    import pandas as pd

    if container not in (None, "pgm", "y4m", "auto"):
        raise ValueError(
            f"container must be None, 'pgm', 'y4m' or 'auto', got {container!r}"
        )
    if mode not in ("strict", "permissive"):
        raise ValueError(f"mode must be 'strict' or 'permissive', got {mode!r}")
    permissive = mode == "permissive"

    def sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from kafka_streams_the_clojure_way_spark.functions.codecs import (
            classify_codec_error,
            pgm_decode_frames,
            y4m_decode_frames,
        )

        _by_mime = {
            "video/x-pgm-frames": pgm_decode_frames,
            "video/x-yuv4mpeg": y4m_decode_frames,
        }

        if container == "pgm":

            def frames_of(payload: bytes, mime: str) -> list[bytes]:
                return pgm_decode_frames(payload)

        elif container == "y4m":

            def frames_of(payload: bytes, mime: str) -> list[bytes]:
                return y4m_decode_frames(payload)

        elif container == "auto":

            def frames_of(payload: bytes, mime: str) -> list[bytes]:
                demux = _by_mime.get(mime)
                if demux is None:
                    raise ValueError(
                        f"unsupported video container mime {mime!r}"
                    )
                return demux(payload)

        else:

            def frames_of(payload: bytes, mime: str) -> list[bytes]:
                n = len(payload)
                n_frames = (n % 30) + 1  # = _decode_stub n_frames for video
                chunk = (n + n_frames - 1) // n_frames if n_frames else 0
                return [
                    payload[i * chunk : (i + 1) * chunk] for i in range(n_frames)
                ]

        # zip over .values (see resize): the frame slicing is per-payload
        # by nature, but nothing else should pay per-row pandas overhead
        for pdf in batches:
            out = []
            for doc_id, asset in zip(pdf[id_col].values, pdf["asset"].values):
                try:
                    frames = frames_of(bytes(asset["bytes"]), asset["mime"])
                except (ValueError, NotImplementedError) as exc:
                    if not permissive:
                        raise
                    row = {
                        id_col: doc_id,
                        "frame_idx": -1,
                        "frame_bytes": None,
                        "frame_len": -1,
                        "status": "quarantined",
                        "error_kind": classify_codec_error(str(exc)),
                    }
                    out.append(row)
                    continue
                for idx in range(0, len(frames), stride):
                    row = {
                        id_col: doc_id,
                        "frame_idx": idx,
                        "frame_bytes": frames[idx],
                        "frame_len": len(frames[idx]),
                    }
                    if permissive:
                        row["status"] = "ok"
                        row["error_kind"] = "ok"
                    out.append(row)
            yield pd.DataFrame(out)

    schema = f"{id_col} long, frame_idx int, frame_bytes binary, frame_len long"
    if permissive:
        schema += ", status string, error_kind string"
    return df.select(id_col, "asset").mapInPandas(sample, schema=schema)


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixed-size feature vector per asset (stub: byte-histogram folded to
    FEATURE_DIM buckets — deterministic, replaceable by a real model).
    Genuinely vectorized across each Arrow batch: all payloads are
    concatenated into ONE uint8 buffer and the per-asset histograms are
    computed with a single segment-offset bincount — the only per-row
    Python is collecting the variable-length payload references."""
    import numpy as np
    import pandas as pd

    def featurize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            payloads = [bytes(a["bytes"]) for a in pdf["asset"].values]
            lens = np.fromiter((len(p) for p in payloads), dtype=np.int64)
            buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            # one bincount over (row_index * DIM + bucket): each asset's
            # histogram occupies its own DIM-wide slot — whole batch at once
            seg = np.repeat(np.arange(len(payloads), dtype=np.int64), lens)
            hist = np.bincount(
                seg * FEATURE_DIM + (buf % FEATURE_DIM),
                minlength=len(payloads) * FEATURE_DIM,
            ).reshape(len(payloads), FEATURE_DIM).astype("float64")
            totals = np.maximum(hist.sum(axis=1, keepdims=True), 1.0)
            feats = (hist / totals).tolist()
            yield pd.DataFrame({id_col: pdf[id_col].values, "features": feats})

    return df.select(id_col, "asset").mapInPandas(
        featurize, schema=f"{id_col} long, features array<double>"
    )


def rgb_luma_stats(
    df: DataFrame, id_col: str = "doc_id", decode: str = "png_rgb"
) -> DataFrame:
    """Decode TRUECOLOR PNG assets and reduce each to luma-plane stats:
    (id, n_luma, luma_sum, luma_poly) where luma_poly is the
    position-weighted sum sum(y_j * (j+1)) — an order-sensitive checksum
    that pins every decoded byte's VALUE AND POSITION, so a wrong filter
    inverse, a channel swap, or a shifted scanline flips the oracle.

    This is the color leg of the real-decode seam: payloads run through
    functions/codecs.png_decode_rgb (chunk CRCs, inflate, all five
    filters at bpp=3) then rgb_to_luma (integer BT.601 weights). One
    Arrow-batched mapInPandas; output is the standard funnel shape (big
    bytes in, 4 small columns out). ``decode="png_palette"`` runs the
    PALETTED decoder instead (color type 3: bpp=1 filters + PLTE
    lookup, the most common crawl PNG class) — the RGB stream then
    takes the identical luma path, so both legs share one checksum
    contract."""
    import numpy as np
    import pandas as pd

    if decode not in ("png_rgb", "png_palette"):
        raise ValueError(f"decode must be 'png_rgb' or 'png_palette', got {decode!r}")

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from kafka_streams_the_clojure_way_spark.functions import codecs as CC

        dec_batch = {
            "png_rgb": CC.png_decode_rgb_batch,
            "png_palette": CC.png_decode_palette_batch,
        }[decode]
        for pdf in batches:
            # r12: one stacked decode for the whole batch, then ONE
            # luma conversion + segment-sum over the concatenated
            # streams (the extract_features discipline) instead of
            # per-asset numpy calls
            rgbs, _ = dec_batch(
                [a["bytes"] for a in pdf["asset"].values], "raise"
            )
            lens = np.fromiter(
                (len(r) // 3 for r in rgbs), dtype=np.int64, count=len(rgbs)
            )
            y = np.frombuffer(
                CC.rgb_to_luma(b"".join(rgbs)), dtype=np.uint8
            ).astype(np.int64)
            ends = np.cumsum(lens)
            starts = ends - lens
            csum = np.concatenate(([0], np.cumsum(y)))
            # position-weighted sum with PER-IMAGE positions (j+1):
            # sum(y_j * (gpos_j + 1 - start)) = polysum - start * segsum
            # over global positions gpos
            gpoly = np.concatenate(
                ([0], np.cumsum(y * np.arange(1, y.size + 1)))
            )
            seg_sum = csum[ends] - csum[starts]
            seg_poly = (gpoly[ends] - gpoly[starts]) - starts * seg_sum
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "n_luma": lens,
                    "luma_sum": seg_sum,
                    "luma_poly": seg_poly,
                }
            )

    return df.select(id_col, "asset").mapInPandas(
        kernel, schema=f"{id_col} long, n_luma long, luma_sum long, luma_poly long"
    )
