"""Pure-stdlib media codecs for the multimodal tier — REAL container
formats with zero non-baked-in dependencies, so the image/audio/video
dedup queries hash genuinely decoded pixels/samples instead of the
deterministic stub geometry (`operators/multimodal._decode_stub`).

Three codecs, each chosen because the std library can implement it
completely and the decode round-trips the payload bytes EXACTLY:

- **PNG** (grayscale, 8-bit): full spec-conformant encode/decode via
  ``zlib`` — chunk framing with CRC-32 validation, IHDR/IDAT/IEND, and
  ALL FIVE scanline filters (None/Sub/Up/Average/Paeth) on both sides.
  The encoder space-pads the last scanline to the fixed width, so
  ``decode(encode(data)) == data + b' ' * pad`` — a padding the DuckDB
  oracle reproduces with one ``rpad``.
- **WAV** (PCM, 8-bit mono) via the std ``wave`` module: 8-bit WAV is
  unsigned bytes, so ``decode(encode(data)) == data`` with no padding
  at all.
- **PGM video container**: a video is a CONCATENATION of binary P5
  (netpbm "portable graymap") frames, each with a real ASCII header
  (``P5 <w> <h> 255\\n``) parsed — not assumed — by the demuxer. Frame
  pixels are the raw chunk bytes, so per-frame decode round-trips
  exactly and the oracle reads frames with ``substring``.

Why exact round-trips matter: the pHash / audio-fingerprint oracles
recompute signatures bit-for-bit from the documents' text in DuckDB.
With these codecs the Spark side encodes text -> REAL container ->
decodes through the REAL parser -> hashes the decoded stream, and the
oracle still only needs the text (plus the documented space-pad) — the
decode path is exercised end to end while the correctness gate stays
bit-exact.

Scale notes: encode here exists to manufacture fixtures (a production
corpus arrives already encoded); decode is the hot path. zlib inflate
and the per-row numpy defilter run at C speed; the per-frame Python is
one loop over scanlines (width 64 default -> len/64 iterations per
image). Real web-scale image decode would swap in a C codec behind the
same `decode=` seam — the Spark plumbing (schema, mapInPandas batch
shape, funnel) is identical, which is the property the queries pin.
"""

from __future__ import annotations

import struct
import zlib

# --------------------------------------------------------------------------
# Error classification (the quarantine contract)
# --------------------------------------------------------------------------

#: closed vocabulary of quarantine kinds, coarse enough that every
#: decoder in this module maps each failure deterministically — the
#: permissive decode paths (operators/multimodal, operators/imagehash)
#: emit these as the ``error_kind`` column, and seeded-corruption
#: fixtures can predict them per asset (bad magic / CRC flip / chunk
#: truncation each land on exactly one kind).
CODEC_ERROR_KINDS = (
    "bad_magic",
    "crc_mismatch",
    "truncated",
    "unsupported",
    "decode_error",
)


def classify_codec_error(msg: str) -> str:
    """Map a codec ``ValueError`` message from this module onto the
    closed :data:`CODEC_ERROR_KINDS` vocabulary. Deterministic by
    construction: every raise site in this module uses one of the
    matched phrasings, so a given corruption always classifies the same
    way (the property the quarantine oracle depends on)."""
    m = msg.lower()
    if "magic" in m or "not a decodable wav" in m or "not a parseable wav" in m:
        return "bad_magic"
    if "crc mismatch" in m:
        return "crc_mismatch"
    if (
        "truncated" in m
        or "missing iend" in m
        or "missing ihdr" in m
        or "unterminated" in m
    ):
        return "truncated"
    if "unsupported" in m or "no decoder" in m or "no stdlib header parser" in m:
        return "unsupported"
    return "decode_error"


# --------------------------------------------------------------------------
# PNG: grayscale 8-bit, all five filters
# --------------------------------------------------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

#: scanline width for encoded fixtures; the last row is padded with
#: PNG_PAD (space) so the oracle's rpad(text, ..., ' ') reproduces the
#: decoded pixel stream exactly.
PNG_WIDTH = 64
PNG_PAD = b" "

#: filters the fixture ENCODER cycles through by default: None/Sub/Up
#: are exactly the filters whose inverse is a vectorized cumsum/add —
#: the hot decode path stays numpy-speed. Average/Paeth are a per-pixel
#: recurrence with a nonlinear step (floor-div / predictor choice), so
#: the general decoder pays a Python loop for them; they're exercised
#: by the round-trip tests via filter_cycle=(0,1,2,3,4). Filter choice
#: is an encoder freedom under the spec — decoders must take all five.
DEFAULT_FILTER_CYCLE = (0, 1, 2)


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _paeth_np(a, b, c):
    """Vectorized Paeth predictor — elementwise twin of :func:`_paeth`
    (same tie-breaking: left wins ties with up, up wins ties with
    up-left, exactly the spec's <= chain)."""
    import numpy as np

    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def _filter_scanlines(
    pixels: bytes, width_bytes: int, bpp: int, filter_cycle: tuple[int, ...]
) -> bytes:
    """Apply PNG scanline filtering (encode side) to a padded pixel
    stream: one filter byte per row, ``a`` = the byte ``bpp`` positions
    left (the spec's per-channel predictor — bpp=1 grayscale, bpp=3
    truecolor).

    Vectorized (r12): every PNG encode filter predicts from the RAW
    pixels of the current and previous scanline — never from filtered
    output — so there is no inter-row recurrence anywhere on the encode
    side and all rows of each filter type compute as one whole-image
    numpy expression (the per-row/per-byte Python of r11 cost ~0.4 s
    per corpus pass at sf0.1; byte-identical output pinned in
    tests/test_round12_opts.py)."""
    import numpy as np

    height = len(pixels) // width_bytes
    arr = (
        np.frombuffer(pixels, dtype=np.uint8, count=height * width_bytes)
        .reshape(height, width_bytes)
        .astype(np.int16)
    )
    prev = np.zeros_like(arr)
    prev[1:] = arr[:-1]
    left = np.zeros_like(arr)
    left[:, bpp:] = arr[:, :-bpp]
    upleft = np.zeros_like(arr)
    upleft[1:, bpp:] = arr[:-1, :-bpp]
    ftypes = np.fromiter(
        (filter_cycle[r % len(filter_cycle)] for r in range(height)),
        dtype=np.int64,
        count=height,
    )
    bad = (ftypes < 0) | (ftypes > 4)
    if bad.any():
        raise ValueError(f"invalid PNG filter type {int(ftypes[np.argmax(bad)])}")
    out = np.empty((height, width_bytes + 1), dtype=np.uint8)
    out[:, 0] = ftypes
    body = out[:, 1:]
    for f in np.unique(ftypes):
        m = ftypes == f
        if f == 0:  # None
            body[m] = arr[m]
        elif f == 1:  # Sub
            body[m] = (arr[m] - left[m]) & 0xFF
        elif f == 2:  # Up
            body[m] = (arr[m] - prev[m]) & 0xFF
        elif f == 3:  # Average
            body[m] = (arr[m] - ((left[m] + prev[m]) >> 1)) & 0xFF
        else:  # Paeth
            body[m] = (arr[m] - _paeth_np(left[m], prev[m], upleft[m])) & 0xFF
    return out.tobytes()


def _filter_scanlines_batch(arr, heights, bpp: int, filter_cycle: tuple[int, ...]):
    """Encode-side scanline filtering over MANY images' rows stacked
    into one matrix (``arr``: (total_rows, width_bytes) int16;
    ``heights``: rows per image). Same whole-matrix vectorization as
    :func:`_filter_scanlines` — encode filters predict from RAW pixels
    only — with the previous-row context zeroed at each image's first
    row and the filter cycle restarting per image. Returns the
    (total_rows, width_bytes + 1) filtered matrix (uint8); slice rows
    per image to get each image's raw IDAT stream."""
    import numpy as np

    total, width_bytes = arr.shape
    starts = np.concatenate(([0], np.cumsum(heights)[:-1]))
    first = np.zeros(total, dtype=bool)
    first[starts] = True
    prev = np.zeros_like(arr)
    prev[1:] = arr[:-1]
    prev[first] = 0
    left = np.zeros_like(arr)
    left[:, bpp:] = arr[:, :-bpp]
    upleft = np.zeros_like(prev)
    upleft[:, bpp:] = prev[:, :-bpp]
    img_of = np.repeat(np.arange(len(heights)), heights)
    j = np.arange(total) - starts[img_of]
    cyc = np.asarray(filter_cycle, dtype=np.int64)
    bad = (cyc < 0) | (cyc > 4)
    if bad.any():
        raise ValueError(f"invalid PNG filter type {int(cyc[np.argmax(bad)])}")
    ftypes = cyc[j % len(cyc)]
    out = np.empty((total, width_bytes + 1), dtype=np.uint8)
    out[:, 0] = ftypes
    body = out[:, 1:]
    for f in np.unique(ftypes):
        m = ftypes == f
        if f == 0:  # None
            body[m] = arr[m]
        elif f == 1:  # Sub
            body[m] = (arr[m] - left[m]) & 0xFF
        elif f == 2:  # Up
            body[m] = (arr[m] - prev[m]) & 0xFF
        elif f == 3:  # Average
            body[m] = (arr[m] - ((left[m] + prev[m]) >> 1)) & 0xFF
        else:  # Paeth
            body[m] = (arr[m] - _paeth_np(left[m], prev[m], upleft[m])) & 0xFF
    return out


def _png_encode_batch(
    datas,
    width: int,
    bpp: int,
    ctype: int,
    filter_cycle: tuple[int, ...],
    plte: bytes | None = None,
) -> list[bytes]:
    """Encode MANY payloads as PNGs with one stacked filtering pass
    (guide §4.2): padding, per-image geometry and chunk assembly stay
    per payload (zlib.compress and crc32 are C-speed and inherently
    per-image), but the scanline filtering — the r11 per-row Python —
    runs once over all images' rows. Byte-identical per element to
    :func:`_png_encode` (tests/test_round12_opts.py)."""
    import numpy as np

    if width < 1:
        raise ValueError(f"width must be >= 1, got {width}")
    width_bytes = width * bpp
    blank = PNG_PAD * width_bytes
    padded = []
    for data in datas:
        data = bytes(data)
        if not data:
            padded.append(blank)  # zero-byte payload -> one blank row
            continue
        padded.append(data + PNG_PAD * (-len(data) % width_bytes))
    heights = np.fromiter(
        (len(p) // width_bytes for p in padded), dtype=np.int64, count=len(padded)
    )
    stacked = (
        np.frombuffer(b"".join(padded), dtype=np.uint8)
        .reshape(-1, width_bytes)
        .astype(np.int16)
    )
    raw = _filter_scanlines_batch(stacked, heights, bpp, filter_cycle)
    bounds = np.concatenate(([0], np.cumsum(heights)))
    pngs: list[bytes] = []
    plte_chunk = _chunk(b"PLTE", plte) if plte is not None else b""
    iend = _chunk(b"IEND", b"")
    for k in range(len(padded)):
        ihdr = struct.pack(
            ">IIBBBBB", width, int(heights[k]), 8, ctype, 0, 0, 0
        )
        body = raw[bounds[k] : bounds[k + 1]].tobytes()
        pngs.append(
            _PNG_MAGIC
            + _chunk(b"IHDR", ihdr)
            + plte_chunk
            + _chunk(b"IDAT", zlib.compress(body))
            + iend
        )
    return pngs


def png_encode_gray_batch(
    datas,
    width: int = PNG_WIDTH,
    filter_cycle: tuple[int, ...] = DEFAULT_FILTER_CYCLE,
) -> list[bytes]:
    """Batch twin of :func:`png_encode_gray` (one stacked filter pass)."""
    return _png_encode_batch(datas, width, 1, 0, filter_cycle)


def png_encode_rgb_batch(
    datas,
    width: int = PNG_WIDTH,
    filter_cycle: tuple[int, ...] = DEFAULT_FILTER_CYCLE,
) -> list[bytes]:
    """Batch twin of :func:`png_encode_rgb`."""
    return _png_encode_batch(datas, width, PNG_RGB_BPP, 2, filter_cycle)


def _png_encode(
    data: bytes,
    width: int,
    bpp: int,
    ctype: int,
    filter_cycle: tuple[int, ...],
) -> bytes:
    if width < 1:
        raise ValueError(f"width must be >= 1, got {width}")
    width_bytes = width * bpp
    pad = -len(data) % width_bytes
    pixels = data + PNG_PAD * pad
    if not data:
        pixels = PNG_PAD * width_bytes  # zero-byte payload -> one blank row
    height = max(1, len(pixels) // width_bytes)
    raw = _filter_scanlines(pixels, width_bytes, bpp, filter_cycle)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    return (
        _PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def png_encode_gray(
    data: bytes,
    width: int = PNG_WIDTH,
    filter_cycle: tuple[int, ...] = DEFAULT_FILTER_CYCLE,
) -> bytes:
    """Encode ``data`` as a spec-conformant 8-bit grayscale PNG: rows of
    ``width`` pixels, last row space-padded, one filter per row chosen
    round-robin from ``filter_cycle`` (so multi-row images exercise
    real prior-row filter context). Exact inverse:
    ``png_decode_gray(png) == data + b' ' * (-len(data) % width)``."""
    return _png_encode(data, width, 1, 0, filter_cycle)


#: bytes per pixel of the truecolor variant (color type 2: R, G, B).
PNG_RGB_BPP = 3


def png_encode_rgb(
    data: bytes,
    width: int = PNG_WIDTH,
    filter_cycle: tuple[int, ...] = DEFAULT_FILTER_CYCLE,
) -> bytes:
    """Encode ``data`` as a spec-conformant 8-bit TRUECOLOR PNG (color
    type 2): consecutive byte triples become (R, G, B) pixels, rows of
    ``width`` pixels (3*width bytes), last row space-padded. The filter
    predictors step by bpp=3 per the spec (channel-wise prediction).
    Exact inverse: ``png_decode_rgb(png) == data + b' ' * (-len(data) %
    (3 * width))``."""
    return _png_encode(data, width, PNG_RGB_BPP, 2, filter_cycle)


#: Adam7 pass grid: (x_start, y_start, x_step, y_step) per pass — the
#: spec's interlace pattern (PNG 1.2 §2.6). Each pass is an independent
#: sub-image with its own filter-byte scanlines; reconstruction places
#: pass pixel (i, j) at (x0 + i*dx, y0 + j*dy).
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _adam7_pass_dims(width: int, height: int) -> list[tuple[int, int]]:
    """(pass_width, pass_height) per Adam7 pass; 0-dimension passes are
    empty (no scanlines, not even filter bytes — per spec)."""
    return [
        (
            max(0, (width - x0 + dx - 1) // dx),
            max(0, (height - y0 + dy - 1) // dy),
        )
        for x0, y0, dx, dy in _ADAM7
    ]


def png_encode_gray_interlaced(
    data: bytes,
    width: int = PNG_WIDTH,
    filter_cycle: tuple[int, ...] = DEFAULT_FILTER_CYCLE,
) -> bytes:
    """Encode ``data`` as a spec-conformant ADAM7-INTERLACED 8-bit
    grayscale PNG: the padded pixel grid is split into the seven pass
    sub-images, each filtered independently (same per-row filter cycle,
    prior-row context WITHIN the pass), concatenated into one IDAT
    stream, and the IHDR interlace byte set to 1. Decodes to exactly
    the same pixel stream as :func:`png_encode_gray` of the same
    payload — interlacing reorders bytes on the wire, never changes the
    image."""
    if width < 1:
        raise ValueError(f"width must be >= 1, got {width}")
    pad = -len(data) % width
    pixels = data + PNG_PAD * pad
    if not data:
        pixels = PNG_PAD * width
    import numpy as np

    height = len(pixels) // width
    grid = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width)
    raw = bytearray()
    for (x0, y0, dx, dy), (pw, ph) in zip(_ADAM7, _adam7_pass_dims(width, height)):
        if pw == 0 or ph == 0:
            continue
        # strided view of the pass sub-image — no per-pixel Python (r12)
        sub = np.ascontiguousarray(grid[y0::dy, x0::dx]).tobytes()
        raw += _filter_scanlines(sub, pw, 1, filter_cycle)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 1)
    return (
        _PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def _png_unfilter(ftypes, data, bpp: int, first=None):
    """Invert PNG scanline filtering (decode side): ``ftypes`` is the
    per-row filter column, ``data`` the (height, width_bytes) filtered
    bytes (integer arrays). ``first`` optionally marks rows whose
    previous scanline is the spec's zero row — row 0 of each image when
    MANY images' scanlines are stacked into one matrix (the batch decode
    path); default: row 0 only. Returns the (height, width_bytes)
    decoded pixel matrix (int16, values 0-255; int16 arithmetic is
    mod-256-exact because numpy wrap-around is mod 2^16 and 256 | 2^16).

    Vectorized (r12): None rows copy and Sub rows are an independent
    per-row per-channel cumsum, so both compute for ALL rows at once;
    Up rows only depend on the previous DECODED row, so they resolve as
    a wavefront — each pass resolves every Up row whose predecessor is
    already decoded (one whole-matrix numpy op per pass; pass count =
    the longest consecutive Up run, 1 for the fixture encoder's 0/1/2
    cycle). Average/Paeth are genuine per-byte recurrences on decode
    (their inputs include the row's own decoded bytes), so a stream
    containing them falls back to the ordered per-row walk — the
    round-trip tests' (0,1,2,3,4) cycle exercises that path.
    Byte-identical to the r11 per-row loop (tests/test_round12_opts.py)."""
    import numpy as np

    height, wb = data.shape
    data = data.astype(np.int16, copy=False)
    bad = (ftypes < 0) | (ftypes > 4)
    if bad.any():
        raise ValueError(f"invalid PNG filter type {int(ftypes[np.argmax(bad)])}")
    if first is None:
        first = np.zeros(height, dtype=bool)
        if height:
            first[0] = True
    out = np.empty((height, wb), dtype=np.int16)
    m0 = ftypes == 0
    if m0.any():
        out[m0] = data[m0]
    m1 = ftypes == 1
    if m1.any():
        sub = data[m1]
        out[m1] = (
            np.cumsum(sub.reshape(sub.shape[0], -1, bpp), axis=1) & 0xFF
        ).reshape(sub.shape[0], -1)
    m2 = ftypes == 2
    if not ((ftypes == 3) | (ftypes == 4)).any():
        resolved = ~m2
        pending = np.nonzero(m2)[0]
        while pending.size:
            prev_resolved = np.empty(height, dtype=bool)
            prev_resolved[0] = True
            prev_resolved[1:] = resolved[:-1]
            prev_ok = (prev_resolved | first)[pending]
            idx = pending[prev_ok]
            prev_rows = np.where(
                first[idx][:, None], 0, out[np.maximum(idx - 1, 0)]
            )
            out[idx] = (data[idx] + prev_rows) & 0xFF
            resolved[idx] = True
            pending = pending[~prev_ok]
        return out
    # Average/Paeth present: ordered walk over the unresolved rows
    # (f0/f1 rows above double as resolved context for their successors)
    prev = np.zeros(wb, dtype=np.int64)
    for r in range(height):
        if first[r]:
            prev = np.zeros(wb, dtype=np.int64)
        f = int(ftypes[r])
        if f <= 1:
            prev = out[r].astype(np.int64)
            continue
        row = data[r].astype(np.int64)
        if f == 2:
            cur = (row + prev) & 0xFF
        elif f == 3:
            cur = np.empty(wb, dtype=np.int64)
            for i in range(wb):
                left = int(cur[i - bpp]) if i >= bpp else 0
                cur[i] = (row[i] + ((left + int(prev[i])) >> 1)) & 0xFF
        else:
            cur = np.empty(wb, dtype=np.int64)
            for i in range(wb):
                left = int(cur[i - bpp]) if i >= bpp else 0
                upleft = int(prev[i - bpp]) if i >= bpp else 0
                cur[i] = (row[i] + _paeth(left, int(prev[i]), upleft)) & 0xFF
        out[r] = cur
        prev = cur
    return out


def png_encode_gray_interlaced_batch(
    datas,
    width: int = PNG_WIDTH,
    filter_cycle: tuple[int, ...] = DEFAULT_FILTER_CYCLE,
) -> list[bytes]:
    """Batch twin of :func:`png_encode_gray_interlaced`: the seven
    Adam7 passes are each extracted and filtered as ONE stacked matrix
    across all images (pass width is a function of the shared scanline
    width; per-image pass heights vary and ride in as the stacked
    filter's per-image boundaries, which also restart the filter cycle
    per (image, pass) exactly like the scalar encoder's per-pass
    :func:`_filter_scanlines` call). Byte-identical per element."""
    import numpy as np

    if width < 1:
        raise ValueError(f"width must be >= 1, got {width}")
    padded = []
    blank = PNG_PAD * width
    for data in datas:
        data = bytes(data)
        padded.append((data + PNG_PAD * (-len(data) % width)) if data else blank)
    n = len(padded)
    heights = np.fromiter(
        (len(p) // width for p in padded), dtype=np.int64, count=n
    )
    grid = np.frombuffer(b"".join(padded), dtype=np.uint8).reshape(-1, width)
    gstarts = np.concatenate(([0], np.cumsum(heights)[:-1]))
    img_of = np.repeat(np.arange(n), heights)
    j = np.arange(grid.shape[0]) - gstarts[img_of]
    # per (pass, image) filtered scanline blocks
    pass_blocks: list[list[bytes]] = [[] for _ in range(n)]
    for x0, y0, dx, dy in _ADAM7:
        pw = max(0, (width - x0 + dx - 1) // dx)
        if pw == 0:
            continue
        ph = np.maximum(0, (heights - y0 + dy - 1) // dy)
        keep = (j >= y0) & ((j - y0) % dy == 0) & (ph[img_of] > 0)
        if not keep.any():
            continue
        sub = grid[keep][:, x0::dx].astype(np.int16)
        live = ph[ph > 0]
        raw = _filter_scanlines_batch(sub, live, 1, filter_cycle)
        bounds = np.concatenate(([0], np.cumsum(live)))
        live_imgs = np.nonzero(ph > 0)[0]
        for k, img in enumerate(live_imgs):
            pass_blocks[img].append(raw[bounds[k] : bounds[k + 1]].tobytes())
    iend = _chunk(b"IEND", b"")
    out: list[bytes] = []
    for i in range(n):
        ihdr = struct.pack(">IIBBBBB", width, int(heights[i]), 8, 0, 0, 0, 1)
        out.append(
            _PNG_MAGIC
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"".join(pass_blocks[i])))
            + iend
        )
    return out


def _adam7_unfilter(inflated: bytes, width: int, height: int):
    """Invert Adam7 interlacing for an 8-bit single-channel image:
    per-pass scanline unfiltering (bpp=1, the shared
    :func:`_png_unfilter` engine) followed by sparse placement into the
    full grid — one fancy-index per pass, no per-scanline Python.
    Returns a numpy uint8 array of width*height pixels; raises
    ValueError on a payload whose length disagrees with the pass
    geometry."""
    import numpy as np

    dims = _adam7_pass_dims(width, height)
    expect = sum(ph * (pw + 1) for pw, ph in dims if pw and ph)
    raw = np.frombuffer(inflated, dtype=np.uint8)
    if raw.size != expect:
        raise ValueError(
            f"PNG Adam7 pixel payload {raw.size} != expected {expect}"
        )
    out = np.empty(height * width, dtype=np.uint8)
    pos = 0
    for (x0, y0, dx, dy), (pw, ph) in zip(_ADAM7, dims):
        if pw == 0 or ph == 0:
            continue
        rows = raw[pos : pos + ph * (pw + 1)].reshape(ph, pw + 1)
        pos += ph * (pw + 1)
        sub = _png_unfilter(
            rows[:, 0].astype(np.int64), rows[:, 1:].astype(np.int64), 1
        )
        idx = (
            (y0 + np.arange(ph) * dy)[:, None] * width
            + x0
            + np.arange(pw)[None, :] * dx
        )
        out[idx.reshape(-1)] = sub.astype(np.uint8).reshape(-1)
    return out


def _fixture_palette() -> bytes:
    """The deterministic 256-entry PLTE the paletted fixture encoder
    writes: entry i = (i, 255-i, (7*i + 13) % 256). Deliberately NOT the
    identity grayscale ramp — a decoder that skips the palette lookup
    (returning raw indexes) or transposes channels produces different
    luma for almost every index, so the oracle catches it. All three
    channel formulas are one-liner integer SQL, so the DuckDB twin
    reproduces the lookup exactly (:func:`png_palette_luma_sql`)."""
    return bytes(
        b for i in range(256) for b in (i, 255 - i, (7 * i + 13) % 256)
    )


def png_encode_palette(
    data: bytes,
    width: int = PNG_WIDTH,
    filter_cycle: tuple[int, ...] = DEFAULT_FILTER_CYCLE,
) -> bytes:
    """Encode ``data`` as a spec-conformant 8-bit PALETTED PNG (color
    type 3 — the most common crawl PNG class): each payload byte is a
    palette index (bpp=1 filtering, same engine as grayscale), and the
    PLTE chunk carries the fixed :func:`_fixture_palette`. Exact
    inverse: ``png_decode_palette(png)`` returns the palette-mapped RGB
    stream of ``data + b' ' * (-len(data) % width)``."""
    if width < 1:
        raise ValueError(f"width must be >= 1, got {width}")
    pad = -len(data) % width
    pixels = data + PNG_PAD * pad
    if not data:
        pixels = PNG_PAD * width
    raw = _filter_scanlines(pixels, width, 1, filter_cycle)
    ihdr = struct.pack(">IIBBBBB", width, max(1, len(pixels) // width), 8, 3, 0, 0, 0)
    return (
        _PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", _fixture_palette())
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _png_parse(png: bytes, expect_ctype: int) -> tuple[int, int, bool, bytes | None, bytes]:
    """Chunk-walk + inflate half of the PNG decode engine: validates the
    magic, every chunk's CRC-32, the IHDR geometry (8-bit, the expected
    color type), PLTE ordering/size for color type 3, concatenates
    multi-IDAT streams and inflates. Returns ``(width, height,
    interlaced, plte, inflated)``; raises ``ValueError`` on any
    corruption. Split out of :func:`_png_decode` (r12) so the batch
    decoder can parse payloads individually and unfilter them stacked."""
    if png[: len(_PNG_MAGIC)] != _PNG_MAGIC:
        raise ValueError("not a PNG: bad magic")
    pos = len(_PNG_MAGIC)
    width = height = -1
    idat = bytearray()
    plte: bytes | None = None
    interlaced = False
    seen_end = False
    while pos < len(png):
        if pos + 8 > len(png):
            raise ValueError("truncated PNG chunk header")
        (length,) = struct.unpack(">I", png[pos : pos + 4])
        tag = png[pos + 4 : pos + 8]
        body = png[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"truncated PNG chunk {tag!r}")
        (crc,) = struct.unpack(">I", png[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG CRC mismatch in chunk {tag!r}")
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            # Adam7 (interlace=1) is accepted on the GRAYSCALE path
            # (r10): the seven passes unfilter independently at bpp=1
            # and reconstruct to the identical pixel stream. Truecolor/
            # paletted interlace stays a classified rejection.
            ok_interlace = (0, 1) if expect_ctype == 0 else (0,)
            if (depth, ctype, comp, filt) != (
                8,
                expect_ctype,
                0,
                0,
            ) or interlace not in ok_interlace:
                raise ValueError(
                    f"unsupported PNG variant (need 8-bit color type "
                    f"{expect_ctype}, got depth={depth} color={ctype} "
                    f"interlace={interlace})"
                )
            interlaced = interlace == 1
        elif tag == b"PLTE":
            # spec ordering (PNG 1.2 §4.1.2): at most one PLTE, and it
            # must precede the first IDAT — a malformed paletted PNG
            # violating either is a classified quarantine, not a
            # silent decode.
            if idat:
                raise ValueError("PNG PLTE after IDAT")
            if plte is not None:
                raise ValueError("PNG duplicate PLTE chunk")
            if length == 0 or length % 3 or length > 768:
                raise ValueError(f"PNG PLTE length {length} invalid")
            plte = body
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            seen_end = True
            break
    if width < 0:
        raise ValueError("PNG missing IHDR")
    if not seen_end:
        raise ValueError("PNG missing IEND")
    if expect_ctype == 3 and plte is None:
        raise ValueError("PNG color type 3 missing PLTE")
    try:
        inflated = zlib.decompress(bytes(idat))
    except zlib.error as exc:  # normalize to the module's ValueError contract
        raise ValueError(f"PNG IDAT inflate failed: {exc}") from exc
    return width, height, interlaced, plte, inflated


def _palette_map(pixels, plte: bytes) -> bytes:
    """PLTE lookup for a decoded index stream (numpy uint8 array in,
    interleaved RGB bytes out) — shared by the single and batch paths."""
    import numpy as np

    pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
    idx = pixels.reshape(-1)
    if idx.size and int(idx.max()) >= pal.shape[0]:
        raise ValueError(
            f"PNG palette index {int(idx.max())} out of range "
            f"(palette has {pal.shape[0]} entries)"
        )
    return pal[idx].tobytes()


def png_encode_palette_batch(
    datas,
    width: int = PNG_WIDTH,
    filter_cycle: tuple[int, ...] = DEFAULT_FILTER_CYCLE,
) -> list[bytes]:
    """Batch twin of :func:`png_encode_palette` (one stacked filter
    pass at bpp=1; the fixed fixture PLTE rides in every chunk set)."""
    return _png_encode_batch(
        datas, width, 1, 3, filter_cycle, plte=_fixture_palette()
    )


def _png_decode(png: bytes, expect_ctype: int, bpp: int) -> bytes:
    """Shared PNG decode engine: :func:`_png_parse` validation + the
    vectorized :func:`_png_unfilter` + (for color type 3) the PLTE map.
    Raises ``ValueError`` on any corruption — the behavior a
    corrupt-object quarantine path needs."""
    import numpy as np

    width, height, interlaced, plte, inflated = _png_parse(png, expect_ctype)
    wb = width * bpp
    if interlaced:
        return _adam7_unfilter(inflated, width, height).tobytes()
    raw = np.frombuffer(inflated, dtype=np.uint8)
    if raw.size != height * (wb + 1):
        raise ValueError(
            f"PNG pixel payload {raw.size} != {height}x({wb}+1)"
        )
    rows = raw.reshape(height, wb + 1)
    pixels = _png_unfilter(
        rows[:, 0].astype(np.int16), rows[:, 1:], bpp
    ).astype(np.uint8)
    if expect_ctype == 3:
        return _palette_map(pixels, plte)
    return pixels.tobytes()


def _png_decode_batch(
    pngs, expect_ctype: int, bpp: int, errors: str = "raise"
) -> tuple[list, list]:
    """Decode MANY PNGs with the per-payload work limited to what is
    inherently per-payload (chunk walk + CRC + inflate, all C-speed):
    every non-interlaced payload's scanlines are stacked into one
    matrix per width and unfiltered in a single vectorized pass
    (guide §4.2 — vectorize across the Arrow batch, not within one
    tiny image). Byte-identical per element to :func:`_png_decode`
    (pinned in tests/test_round12_opts.py), including error
    classification: with ``errors="capture"`` each failing payload
    yields ``None`` plus its ``ValueError`` in the second list (the
    permissive-mode contract); with ``errors="raise"`` the first
    failure propagates exactly like the scalar path would at that
    element (earlier elements' work is discarded).

    Returns ``(decoded, errs)`` — lists aligned with ``pngs``."""
    import numpy as np

    n = len(pngs)
    decoded: list = [None] * n
    errs: list = [None] * n
    # (wb, rows_matrix, out_index, plte) per straight payload, grouped by wb
    groups: dict[int, list] = {}
    il_groups: dict[int, list] = {}  # interlaced, grouped by width
    for i, png in enumerate(pngs):
        try:
            width, height, interlaced, plte, inflated = _png_parse(
                bytes(png), expect_ctype
            )
            wb = width * bpp
            if interlaced:
                dims = _adam7_pass_dims(width, height)
                expect = sum(ph * (pw + 1) for pw, ph in dims if pw and ph)
                if len(inflated) != expect:
                    raise ValueError(
                        f"PNG Adam7 pixel payload {len(inflated)} != "
                        f"expected {expect}"
                    )
                if height < 1 or width < 1:  # degenerate: scalar engine
                    decoded[i] = _adam7_unfilter(
                        inflated, width, height
                    ).tobytes()
                    continue
                il_groups.setdefault(width, []).append((i, height, inflated))
                continue
            raw = np.frombuffer(inflated, dtype=np.uint8)
            if raw.size != height * (wb + 1):
                raise ValueError(
                    f"PNG pixel payload {raw.size} != {height}x({wb}+1)"
                )
            rows = raw.reshape(height, wb + 1)
            ftypes = rows[:, 0]
            if (ftypes > 4).any():
                bad = ftypes[ftypes > 4]
                raise ValueError(f"invalid PNG filter type {int(bad[0])}")
            if (ftypes >= 3).any():
                # Average/Paeth: per-byte recurrence — scalar engine
                pix = _png_unfilter(
                    ftypes.astype(np.int16), rows[:, 1:], bpp
                ).astype(np.uint8)
                decoded[i] = (
                    _palette_map(pix, plte) if expect_ctype == 3 else pix.tobytes()
                )
                continue
            groups.setdefault(wb, []).append((i, rows, plte))
        except ValueError as exc:
            if errors == "raise":
                raise
            errs[i] = exc
    for wb, members in groups.items():
        heights = np.fromiter(
            (m[1].shape[0] for m in members), dtype=np.int64, count=len(members)
        )
        stacked = np.concatenate([m[1] for m in members], axis=0)
        starts = np.concatenate(([0], np.cumsum(heights)[:-1]))
        first = np.zeros(stacked.shape[0], dtype=bool)
        first[starts] = True
        pix = _png_unfilter(
            stacked[:, 0].astype(np.int16), stacked[:, 1:], bpp, first=first
        ).astype(np.uint8)
        flat = np.ascontiguousarray(pix).reshape(-1)
        bounds = np.concatenate(([0], np.cumsum(heights * wb)))
        for k, (i, _rows, plte) in enumerate(members):
            seg = flat[bounds[k] : bounds[k + 1]]
            try:
                decoded[i] = (
                    _palette_map(seg, plte) if expect_ctype == 3 else seg.tobytes()
                )
            except ValueError as exc:
                if errors == "raise":
                    raise
                errs[i] = exc
    # Adam7 payloads: per width, every pass unfilters as ONE stacked
    # matrix across all images (the encode-side batch pattern run
    # backwards), then one global fancy scatter per pass places the
    # pass pixels at their interlace positions. All per-image geometry
    # (pass row offsets, filter-byte gathers, Average/Paeth detection)
    # is computed with whole-group numpy arithmetic over the images'
    # concatenated inflate streams — no per-image numpy calls.
    for width, members in il_groups.items():
        nimg = len(members)
        heights = np.fromiter(
            (m[1] for m in members), dtype=np.int64, count=nimg
        )
        buf = np.frombuffer(b"".join(m[2] for m in members), dtype=np.uint8)
        stream_off = np.concatenate(
            (
                [0],
                np.cumsum(
                    np.fromiter(
                        (len(m[2]) for m in members), dtype=np.int64, count=nimg
                    )
                ),
            )
        )
        # (pass, image) geometry: pw per pass, ph per (image, pass)
        pws = np.array(
            [max(0, (width - x0 + dx - 1) // dx) for x0, y0, dx, dy in _ADAM7],
            dtype=np.int64,
        )
        y0s = np.array([p[1] for p in _ADAM7], dtype=np.int64)
        dys = np.array([p[3] for p in _ADAM7], dtype=np.int64)
        ph_kp = np.maximum(0, (heights[:, None] - y0s + dys - 1) // dys)
        ph_kp[:, pws == 0] = 0
        rowlen = pws + 1
        span_kp = ph_kp * rowlen  # bytes per (image, pass)
        # base offset of each (image, pass) block inside the big buffer
        base_kp = stream_off[:-1, None] + np.concatenate(
            (np.zeros((nimg, 1), dtype=np.int64), np.cumsum(span_kp, axis=1)[:, :-1]),
            axis=1,
        )
        # every scanline's start offset, grouped by (image, pass) in
        # C order (image-major) — one flat arange trick
        counts = ph_kp.reshape(-1)
        pair_base = base_kp.reshape(-1)
        pair_rowlen = np.tile(rowlen, nimg)
        total_rows = int(counts.sum())
        pair_of_row = np.repeat(np.arange(nimg * 7), counts)
        row_starts_flat = np.concatenate(([0], np.cumsum(counts)[:-1]))
        j_of_row = np.arange(total_rows) - row_starts_flat[pair_of_row]
        row_off = pair_base[pair_of_row] + j_of_row * pair_rowlen[pair_of_row]
        ft_all = buf[row_off]
        img_of_row = pair_of_row // 7
        # per-image max filter byte via segment reduce (every image has
        # >= 1 scanline: pass 1 starts at y=0, so ph >= 1 when H >= 1)
        img_row_starts = np.concatenate(
            ([0], np.cumsum(ph_kp.sum(axis=1))[:-1])
        )
        ftmax = np.maximum.reduceat(ft_all, img_row_starts)
        special = np.nonzero(ftmax >= 3)[0]
        skip = np.zeros(nimg, dtype=bool)
        for k in special:
            i, h, inflated = members[k]
            skip[k] = True
            try:
                # scalar engine: raises the classified error for >4,
                # runs the per-byte recurrence for Average/Paeth
                decoded[i] = _adam7_unfilter(inflated, width, h).tobytes()
            except ValueError as exc:
                if errors == "raise":
                    raise
                errs[i] = exc
        out_offsets = np.concatenate(([0], np.cumsum(heights * width)))
        flat = np.empty(int(out_offsets[-1]), dtype=np.uint8)
        keep_row = ~skip[img_of_row]
        for p, (x0, y0, dx, dy) in enumerate(_ADAM7):
            pw = int(pws[p])
            if pw == 0:
                continue
            sel = keep_row & (pair_of_row % 7 == p)
            if not sel.any():
                continue
            offs = row_off[sel]
            stacked = buf[offs[:, None] + np.arange(pw + 1)]
            first = np.empty(offs.size, dtype=bool)
            first[0] = True
            first[1:] = j_of_row[sel][1:] == 0
            pix = _png_unfilter(
                stacked[:, 0].astype(np.int16), stacked[:, 1:], 1, first=first
            ).astype(np.uint8)
            jj = j_of_row[sel]
            idx = (
                out_offsets[img_of_row[sel]][:, None]
                + ((y0 + jj * dy) * width)[:, None]
                + x0
                + np.arange(pw)[None, :] * dx
            )
            flat[idx.reshape(-1)] = pix.reshape(-1)
        for k, (i, h, _infl) in enumerate(members):
            if not skip[k]:
                decoded[i] = flat[out_offsets[k] : out_offsets[k + 1]].tobytes()
    return decoded, errs


def png_decode_gray(png: bytes) -> bytes:
    """Decode an 8-bit grayscale PNG to its raw pixel stream (row-major
    bytes). A REAL decoder, not a fixture-shaped one — see
    :func:`_png_decode` for the validation contract."""
    return _png_decode(png, 0, 1)


def png_decode_rgb(png: bytes) -> bytes:
    """Decode an 8-bit truecolor PNG (color type 2) to its interleaved
    RGB byte stream (row-major, 3 bytes per pixel), through the same
    validation + all-five-filters engine as the grayscale path (the
    filter predictors step by bpp=3 per the spec)."""
    return _png_decode(png, 2, PNG_RGB_BPP)


def png_decode_palette(png: bytes) -> bytes:
    """Decode an 8-bit PALETTED PNG (color type 3) to its interleaved
    RGB byte stream: same validation + all-five-filters engine at bpp=1
    (indexes predict from their left NEIGHBOR INDEX per the spec — the
    filter step is always one byte for color type 3), then a PLTE
    lookup per pixel. Raises ``ValueError`` on missing/ill-sized PLTE
    or out-of-range indexes (classified quarantine kinds)."""
    return _png_decode(png, 3, 1)


def png_decode_gray_batch(pngs, errors: str = "raise") -> tuple[list, list]:
    """Batch twin of :func:`png_decode_gray` — see
    :func:`_png_decode_batch` for the stacking/error contract."""
    return _png_decode_batch(pngs, 0, 1, errors)


def png_decode_rgb_batch(pngs, errors: str = "raise") -> tuple[list, list]:
    """Batch twin of :func:`png_decode_rgb`."""
    return _png_decode_batch(pngs, 2, PNG_RGB_BPP, errors)


def png_decode_palette_batch(pngs, errors: str = "raise") -> tuple[list, list]:
    """Batch twin of :func:`png_decode_palette`."""
    return _png_decode_batch(pngs, 3, 1, errors)


def png_decode_auto_batch(pngs, errors: str = "raise") -> tuple[list, list]:
    """Batch twin of :func:`png_decode_auto`: dispatch each payload by
    its IHDR color type (same validation order as the scalar function),
    then decode each color-type group through the batch engine."""
    n = len(pngs)
    decoded: list = [None] * n
    errs: list = [None] * n
    by_ctype: dict[int, list[int]] = {}
    for i, png in enumerate(pngs):
        png = bytes(png)
        try:
            if png[: len(_PNG_MAGIC)] != _PNG_MAGIC:
                raise ValueError("not a PNG: bad magic")
            if len(png) < 26:
                raise ValueError("truncated PNG chunk header")
            if png[12:16] != b"IHDR":
                raise ValueError("PNG first chunk is not a 13-byte IHDR")
            ctype = png[25]
            if ctype not in (0, 2, 3):
                raise ValueError(
                    f"unsupported PNG variant (color type {ctype} has no decoder)"
                )
            by_ctype.setdefault(ctype, []).append(i)
        except ValueError as exc:
            if errors == "raise":
                raise
            errs[i] = exc
    for ctype, idxs in by_ctype.items():
        bpp = PNG_RGB_BPP if ctype == 2 else 1
        dec, er = _png_decode_batch(
            [pngs[i] for i in idxs], ctype, bpp, errors
        )
        for k, i in enumerate(idxs):
            decoded[i] = dec[k]
            errs[i] = er[k]
    return decoded, errs


def png_decode_auto(png: bytes) -> bytes:
    """Decode ANY supported 8-bit PNG by dispatching on the IHDR color
    type — grayscale (0) to its gray plane, truecolor (2) to the
    interleaved RGB stream, paletted (3) to the PLTE-expanded RGB
    stream. This is the decode a permissive ingestion gate needs: a
    crawl's PNGs arrive in every color type, and a gate that only
    accepts grayscale silently quarantines the most common classes as
    'corrupt' (ADVICE r10). Color types 4/6 (alpha) raise the module's
    classified 'unsupported' ValueError — quarantine rows, never job
    kills. Magic and IHDR framing are validated before the dispatch so
    a truncated header classifies as truncated/bad_magic, not as an
    index error."""
    if png[: len(_PNG_MAGIC)] != _PNG_MAGIC:
        raise ValueError("not a PNG: bad magic")
    if len(png) < 26:
        raise ValueError("truncated PNG chunk header")
    if png[12:16] != b"IHDR":
        raise ValueError("PNG first chunk is not a 13-byte IHDR")
    ctype = png[25]
    if ctype == 0:
        return _png_decode(png, 0, 1)
    if ctype == 2:
        return _png_decode(png, 2, PNG_RGB_BPP)
    if ctype == 3:
        return _png_decode(png, 3, 1)
    raise ValueError(
        f"unsupported PNG variant (color type {ctype} has no decoder)"
    )


def png_palette_luma_sql(idx: str) -> str:
    """DuckDB expression: the BT.601 integer luma of fixture-palette
    entry ``idx`` — ``(77*R + 150*G + 29*B) >> 8`` with the palette's
    channel formulas inlined (R=i, G=255-i, B=(7i+13)%256). The SQL
    twin of ``rgb_to_luma(png_decode_palette(...))`` per byte."""
    return (
        f"(({LUMA_R} * ({idx}) + {LUMA_G} * (255 - ({idx})) "
        f"+ {LUMA_B} * ((7 * ({idx}) + 13) % 256)) // 256)"
    )


#: BT.601-ish integer luma weights, fixed-point /256: 77 + 150 + 29 =
#: 256 exactly, so luma of a constant-gray pixel is the gray value and
#: the conversion is exact integer arithmetic both engines reproduce.
LUMA_R, LUMA_G, LUMA_B = 77, 150, 29


def rgb_to_luma(rgb: bytes) -> bytes:
    """Integer luma plane of an interleaved RGB byte stream:
    ``y = (77*r + 150*g + 29*b) >> 8`` per pixel — the grayscale plane a
    perceptual hash consumes for color input. Exact integer arithmetic
    (weights sum to 256), reproduced bit-for-bit by the SQL twin."""
    import numpy as np

    if len(rgb) % PNG_RGB_BPP:
        raise ValueError(f"RGB stream length {len(rgb)} not a multiple of 3")
    a = np.frombuffer(rgb, dtype=np.uint8).astype(np.int64).reshape(-1, 3)
    y = (LUMA_R * a[:, 0] + LUMA_G * a[:, 1] + LUMA_B * a[:, 2]) >> 8
    return y.astype(np.uint8).tobytes()


def png_padded_len_sql(text: str) -> str:
    """DuckDB expression: length of the decoded pixel stream for a PNG
    encoded from ``text`` (space-padded to a PNG_WIDTH multiple; empty
    text still encodes one blank scanline — PNG geometry is >= 1x1)."""
    n = f"octet_length(CAST({text} AS BLOB))"
    return (
        f"(CAST(greatest(({n} + {PNG_WIDTH} - 1) // {PNG_WIDTH}, 1) AS BIGINT)"
        f" * {PNG_WIDTH})"
    )


def png_pixels_sql(text: str) -> str:
    """DuckDB expression producing EXACTLY the pixel stream
    :func:`png_decode_gray` returns for ``png_encode_gray(text bytes)``:
    the text space-padded to the scanline width (ASCII corpus => code
    points are bytes, the shared multimodal convention)."""
    return f"rpad({text}, CAST({png_padded_len_sql(text)} AS INT), ' ')"


# --------------------------------------------------------------------------
# WAV: 8-bit mono PCM via the std `wave` module
# --------------------------------------------------------------------------

WAV_RATE = 16_000


def wav_encode_pcm8(data: bytes, rate: int = WAV_RATE) -> bytes:
    """Encode ``data`` as a real RIFF/WAVE file: mono, 8-bit unsigned
    PCM (the one sample width whose samples ARE raw bytes), via the std
    ``wave`` writer. ``wav_decode_pcm8(encode(data)) == data``."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(rate)
        w.writeframes(data)
    return buf.getvalue()


def wav_decode_pcm8(payload: bytes) -> bytes:
    """Decode a RIFF/WAVE payload to its raw 8-bit sample stream through
    the std ``wave`` parser (real RIFF chunk walking, not a fixed-offset
    slice). Raises ``ValueError`` on non-WAV bytes or unsupported
    geometry (the quarantine contract, same as :func:`png_decode_gray`)."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            if w.getnchannels() != 1 or w.getsampwidth() != 1:
                raise ValueError(
                    f"unsupported WAV geometry: channels={w.getnchannels()} "
                    f"sampwidth={w.getsampwidth()} (need mono 8-bit PCM)"
                )
            return w.readframes(w.getnframes())
    except wave.Error as exc:
        raise ValueError(f"not a decodable WAV: {exc}") from exc


def wav_encode_pcm16(
    data: bytes, rate: int = WAV_RATE, channels: int = 2
) -> bytes:
    """Encode ``data`` as a real RIFF/WAVE file with 16-bit signed
    little-endian PCM samples and 1 or 2 channels — the profile real
    speech/music corpora actually ship (VERDICT r8 #2; 8-bit mono is a
    fixture convenience, not a wire format). Each input byte ``b``
    becomes one 16-bit sample ``(b << 8) - 32768`` (full-scale signed);
    bytes alternate channels in order, and the payload is space-padded
    to a multiple of ``channels`` so every frame is complete.

    Exact inverse through :func:`wav_decode_pcm`'s documented
    downmix + requantization: mono round-trips the bytes exactly;
    stereo decodes to the PAIRWISE BYTE AVERAGE
    ``(b[2j] + b[2j+1]) >> 1`` of the padded payload — integer
    arithmetic end to end, reproduced by the DuckDB oracle with
    substring arithmetic."""
    import io
    import wave

    import numpy as np

    if channels not in (1, 2):
        raise ValueError(f"channels must be 1 or 2, got {channels}")
    padded = data + PNG_PAD * (-len(data) % channels)
    a = np.frombuffer(padded, dtype=np.uint8).astype(np.int64)
    samples = ((a << 8) - 32768).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def wav_encode_pcm24(
    data: bytes, rate: int = WAV_RATE, channels: int = 2
) -> bytes:
    """Encode ``data`` as a real RIFF/WAVE file with 24-bit signed
    little-endian PCM samples (r11 codec tail — the studio/master
    profile real audio corpora also ship). Each input byte ``b``
    becomes one 24-bit sample ``(b << 16) - 2^23`` (full-scale signed);
    bytes alternate channels, payload space-padded to a channel
    multiple. Exact inverse through :func:`wav_decode_pcm`'s 24-bit
    branch: mono round-trips the bytes exactly; stereo decodes to the
    SAME pairwise byte average as the 16-bit profile — which is what
    lets a mixed 16/24-bit corpus share one oracle expression."""
    import io
    import wave

    import numpy as np

    if channels not in (1, 2):
        raise ValueError(f"channels must be 1 or 2, got {channels}")
    padded = data + PNG_PAD * (-len(data) % channels)
    a = np.frombuffer(padded, dtype=np.uint8).astype(np.int64)
    samples = (a << 16) - (1 << 23)  # signed 24-bit, full scale
    # pack each sample as 3 little-endian bytes (two's complement)
    u = (samples & 0xFFFFFF).astype("<u4").view(np.uint8).reshape(-1, 4)
    frames = u[:, :3].tobytes()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(3)
        w.setframerate(rate)
        w.writeframes(frames)
    return buf.getvalue()


def wav_decode_pcm(payload: bytes) -> bytes:
    """General WAV decode to an 8-bit unsigned sample stream through
    the std ``wave`` RIFF parser — accepts 8-bit mono (samples ARE the
    bytes, byte-identical to :func:`wav_decode_pcm8`) plus 16-bit and
    24-bit (r11) mono/stereo with the DOCUMENTED integer reduction
    every downstream fingerprint consumes:

    1. **downmix** stereo to mono FIRST, in native sample space:
       ``m = (L + R) >> 1`` (arithmetic shift — exact integer mean,
       floor);
    2. **requantize** to 8-bit: keep the high byte —
       ``q = (m + 32768) >> 8`` for 16-bit, ``q = (m + 2^23) >> 16``
       for 24-bit.

    Both steps are exact int64 arithmetic, so fingerprints over the
    decoded stream stay integer-exact and cross-engine reproducible
    (for :func:`wav_encode_pcm16` / :func:`wav_encode_pcm24` fixtures
    the result is the pairwise byte average of the padded input — the
    two wire profiles share one oracle expression). Raises
    ``ValueError`` on non-WAV bytes or any other geometry (32-bit,
    >2 channels) — the quarantine contract."""
    import io
    import wave

    import numpy as np

    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            ch, sw = w.getnchannels(), w.getsampwidth()
            raw = w.readframes(w.getnframes())
    except wave.Error as exc:
        raise ValueError(f"not a decodable WAV: {exc}") from exc
    if sw == 1 and ch == 1:
        return raw
    if sw == 2 and ch in (1, 2):
        a = np.frombuffer(raw, dtype="<i2").astype(np.int64)
        if ch == 2:
            a = a.reshape(-1, 2)
            a = (a[:, 0] + a[:, 1]) >> 1
        return (((a + 32768) >> 8).astype(np.uint8)).tobytes()
    if sw == 3 and ch in (1, 2):
        if len(raw) % 3:
            raise ValueError("truncated 24-bit WAV sample stream")
        b = np.frombuffer(raw, dtype=np.uint8).astype(np.int64).reshape(-1, 3)
        a = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        a = a - ((a & (1 << 23)) << 1)  # sign-extend 24-bit two's complement
        if ch == 2:
            a = a.reshape(-1, 2)
            a = (a[:, 0] + a[:, 1]) >> 1
        return (((a + (1 << 23)) >> 16).astype(np.uint8)).tobytes()
    raise ValueError(
        f"unsupported WAV geometry: channels={ch} sampwidth={sw} "
        "(need 8/16/24-bit mono/stereo PCM)"
    )


# --------------------------------------------------------------------------
# PGM (P5) frame container for the video modality
# --------------------------------------------------------------------------

#: pixels per video frame in the fixture container (1 x PGM_FRAME_LEN
#: scanline frames: exact round-trip, no padding anywhere).
PGM_FRAME_LEN = 64


def pgm_encode_video(data: bytes, frame_len: int = PGM_FRAME_LEN) -> bytes:
    """Pack ``data`` into a concatenation of binary P5 (netpbm) frames —
    each chunk of ``frame_len`` bytes becomes one 1-row grayscale frame
    with a REAL ASCII header (``P5 <w> 1 255\\n``); the final frame is
    simply narrower (no padding), so the concatenated frame pixels ARE
    the payload bytes. Zero-byte payloads encode to zero frames."""
    out = bytearray()
    for off in range(0, len(data), frame_len):
        chunk = data[off : off + frame_len]
        out += b"P5 %d 1 255\n" % len(chunk) + chunk
    return bytes(out)


def pgm_decode_frames(payload: bytes) -> list[bytes]:
    """Demux a concatenated-P5 container: parse each frame's ASCII
    header (magic, width, height, maxval), validate it, slice exactly
    width*height pixel bytes, repeat until the payload is exhausted.
    Raises ``ValueError`` on bad magic / truncated frames."""
    frames: list[bytes] = []
    pos = 0
    n = len(payload)
    while pos < n:
        if payload[pos : pos + 2] != b"P5":
            raise ValueError(f"bad PGM magic at offset {pos}")
        hdr_end = payload.find(b"\n", pos)
        if hdr_end < 0:
            raise ValueError(f"unterminated PGM header at offset {pos}")
        fields = payload[pos:hdr_end].split()
        if len(fields) != 4:
            raise ValueError(f"malformed PGM header {payload[pos:hdr_end]!r}")
        w, h, maxval = int(fields[1]), int(fields[2]), int(fields[3])
        if maxval != 255 or w < 1 or h < 1:
            raise ValueError(f"unsupported PGM geometry w={w} h={h} maxval={maxval}")
        start = hdr_end + 1
        end = start + w * h
        if end > n:
            raise ValueError(f"truncated PGM frame at offset {pos}")
        frames.append(payload[start:end])
        pos = end
    return frames


# --------------------------------------------------------------------------
# Y4M (YUV4MPEG2) video container — a REAL public format (mjpegtools),
# plain ASCII stream/frame headers + raw planes, stdlib-parseable.
# Replaces the bespoke concatenated-PGM container as the video fixture
# (VERDICT r8 #3); the PGM demuxer stays for mixed-container corpora.
# --------------------------------------------------------------------------

Y4M_MAGIC = b"YUV4MPEG2"

#: frame geometry of the fixture container: W=64, H=1, Cmono (one Y
#: plane, so frame payload = W*H bytes). Unlike PGM, Y4M fixes the
#: geometry in the STREAM header — every frame is the same size, so the
#: encoder space-pads the last chunk (the PNG convention; the oracle
#: reproduces it with rpad).
Y4M_FRAME_LEN = 64


#: C420-family colorspace tags (4:2:0 chroma subsampling; the suffixes
#: encode chroma SITING — jpeg/mpeg2/paldv place the subsampled chroma
#: samples differently — which is irrelevant to a luma-only consumer,
#: so all four share one frame layout: Y plane W*H, then Cb and Cr
#: planes of (W/2)*(H/2) each => frame size W*H*3/2).
_Y4M_C420_TAGS = (b"420", b"420jpeg", b"420mpeg2", b"420paldv")

#: neutral chroma byte (Cb=Cr=128 = no color) — what the C420 fixture
#: encoder writes, and what a grayscale source legitimately carries.
Y4M_NEUTRAL_CHROMA = b"\x80"


def y4m_encode_video(
    data: bytes, frame_len: int = Y4M_FRAME_LEN, cspace: str = "mono"
) -> bytes:
    """Mux ``data`` into a YUV4MPEG2 stream. ``cspace="mono"`` (default,
    byte-identical to the r9 encoder): one ASCII stream header
    (``YUV4MPEG2 W<frame_len> H1 F25:1 Ip A1:1 Cmono``), then a
    ``FRAME`` header + ``frame_len`` raw luma bytes per chunk.
    ``cspace="420"``: a REAL 4:2:0 stream — geometry W=frame_len/2,
    H=2 (so the LUMA plane still carries exactly ``frame_len`` payload
    bytes per frame, keeping every luma-level oracle identical across
    colorspaces), followed by neutral Cb/Cr planes
    (:data:`Y4M_NEUTRAL_CHROMA`, (W/2)*(H/2) bytes each — the honest
    encoding of a grayscale source). ``frame_len`` must be a multiple
    of 4 for 420 (even W and H after the split). In both modes frames
    are fixed-size, so the payload is space-padded to a ``frame_len``
    multiple (``decode(encode(data))`` concatenates to ``data + b' ' *
    pad``); zero-byte payloads encode to a header-only stream with
    zero frames."""
    padded = data + PNG_PAD * (-len(data) % frame_len)
    if cspace == "mono":
        out = bytearray(b"YUV4MPEG2 W%d H1 F25:1 Ip A1:1 Cmono\n" % frame_len)
        chroma = b""
    elif cspace == "420":
        if frame_len % 4:
            raise ValueError("420 fixture needs frame_len % 4 == 0")
        w, h = frame_len // 2, 2
        out = bytearray(b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C420\n" % (w, h))
        chroma = Y4M_NEUTRAL_CHROMA * ((w // 2) * (h // 2) * 2)
    elif cspace == "422":
        # 4:2:2 — chroma halved horizontally only: two (W/2)*H planes.
        # Same W=frame_len/2, H=2 split as the 420 fixture, so the luma
        # plane still carries exactly frame_len payload bytes per frame.
        if frame_len % 4:
            raise ValueError("422 fixture needs frame_len % 4 == 0")
        w, h = frame_len // 2, 2
        out = bytearray(b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C422\n" % (w, h))
        chroma = Y4M_NEUTRAL_CHROMA * ((w // 2) * h * 2)
    elif cspace == "444":
        # 4:4:4 — full-resolution chroma: two W*H planes.
        w, h = frame_len, 1
        out = bytearray(b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C444\n" % (w, h))
        chroma = Y4M_NEUTRAL_CHROMA * (w * h * 2)
    else:
        raise ValueError(f"unsupported fixture colorspace {cspace!r}")
    for off in range(0, len(padded), frame_len):
        out += b"FRAME\n" + padded[off : off + frame_len] + chroma
    return bytes(out)


def _y4m_parse_stream_header(payload: bytes) -> tuple[int, int, int, int]:
    """(width, height, data_start, frame_size) from a Y4M stream header
    — magic, tagged W/H parameters, and the colorspace validated.
    Supported: ``Cmono`` (frame = one W*H luma plane), the C420 family
    (``C420``/``C420jpeg``/``C420mpeg2``/``C420paldv`` — frame = W*H
    luma + two (W/2)*(H/2) chroma planes = W*H*3/2; the siting suffixes
    differ only in chroma sample placement, which a luma-only consumer
    never reads), ``C422`` (r11 — two (W/2)*H chroma planes, frame =
    W*H*2, even W required) and ``C444`` (full-resolution chroma,
    frame = W*H*3). Other layouts (C411, alpha/16-bit extensions) stay
    loud rejections (the quarantine contract)."""
    if not payload.startswith(Y4M_MAGIC):
        raise ValueError("not a YUV4MPEG2 stream: bad magic")
    hdr_end = payload.find(b"\n")
    if hdr_end < 0:
        raise ValueError("unterminated Y4M stream header")
    width = height = -1
    cspace = None
    for tok in payload[len(Y4M_MAGIC) : hdr_end].split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            width = int(val)
        elif tag == b"H":
            height = int(val)
        elif tag == b"C":
            cspace = val
        # F (rate), I (interlace), A (aspect), X (extension) tolerated
    if width < 1 or height < 1:
        raise ValueError("Y4M stream header missing/invalid W or H")
    if cspace == b"mono":
        fsize = width * height
    elif cspace in _Y4M_C420_TAGS:
        if width % 2 or height % 2:
            raise ValueError(
                "unsupported Y4M C420 geometry (even W and H required), "
                f"got {width}x{height}"
            )
        fsize = width * height * 3 // 2
    elif cspace == b"422":
        if width % 2:
            raise ValueError(
                f"unsupported Y4M C422 geometry (even W required), got W={width}"
            )
        fsize = width * height * 2
    elif cspace == b"444":
        fsize = width * height * 3
    else:
        raise ValueError(
            f"unsupported Y4M colorspace {cspace!r} "
            "(need Cmono, C420*, C422 or C444)"
        )
    return width, height, hdr_end + 1, fsize


def y4m_decode_frames(payload: bytes) -> list[bytes]:
    """Demux a YUV4MPEG2 stream: parse + validate the stream header,
    then per frame parse the ``FRAME`` marker line (parameters
    tolerated), slice exactly the header-fixed frame size, and return
    the LUMA PLANE (first width*height bytes). For Cmono that is the
    whole frame (r9-identical); for the C420 family the two chroma
    planes are skipped — the documented chroma-ignore: luma is what
    pHash and every downstream signature consume, so mixed
    Cmono/C420 corpora produce one comparable signature space. Raises
    ``ValueError`` on bad magic / unsupported colorspace / truncated
    frames (a frame missing its chroma tail IS truncated — the slice
    is validated against the full frame size)."""
    width, height, pos, fsize = _y4m_parse_stream_header(payload)
    luma = width * height
    frames: list[bytes] = []
    n = len(payload)
    while pos < n:
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"bad Y4M FRAME marker at offset {pos}")
        fh_end = payload.find(b"\n", pos)
        if fh_end < 0:
            raise ValueError(f"unterminated Y4M frame header at offset {pos}")
        start = fh_end + 1
        end = start + fsize
        if end > n:
            raise ValueError(f"truncated Y4M frame at offset {pos}")
        frames.append(payload[start : start + luma])
        pos = end
    return frames


def y4m_parse_meta(payload: bytes) -> tuple[int, int, int]:
    """(width, height, n_frames) of a Y4M stream — header walking only
    (the stream header fixes the frame size, so counting skips pixel
    bytes exactly like :func:`pgm_parse_n_frames`); C420-family frames
    skip their chroma planes too."""
    width, height, pos, fsize = _y4m_parse_stream_header(payload)
    n_frames = 0
    n = len(payload)
    while pos < n:
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"bad Y4M FRAME marker at offset {pos}")
        fh_end = payload.find(b"\n", pos)
        if fh_end < 0:
            raise ValueError(f"unterminated Y4M frame header at offset {pos}")
        pos = fh_end + 1 + fsize
        if pos > n:
            raise ValueError("truncated Y4M frame")
        n_frames += 1
    return width, height, n_frames


# --------------------------------------------------------------------------
# Header-only metadata parsers (the decode_assets "stdlib" decoder)
# --------------------------------------------------------------------------

def png_parse_ihdr(payload: bytes) -> tuple[int, int]:
    """(width, height) from a PNG's IHDR — header-only parse with magic
    + IHDR CRC validation, no inflate (the metadata-extraction fast
    path: geometry without paying decompression)."""
    if payload[: len(_PNG_MAGIC)] != _PNG_MAGIC:
        raise ValueError("not a PNG: bad magic")
    (length,) = struct.unpack(">I", payload[8:12])
    tag = payload[12:16]
    if tag != b"IHDR" or length != 13:
        raise ValueError("PNG first chunk is not a 13-byte IHDR")
    body = payload[16:29]
    (crc,) = struct.unpack(">I", payload[29:33])
    if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
        raise ValueError("PNG IHDR CRC mismatch")
    width, height = struct.unpack(">II", body[:8])
    return width, height


def wav_parse_meta(payload: bytes) -> tuple[int, int]:
    """(n_samples, sample_rate) from a WAV via the std ``wave`` parser
    (real RIFF chunk walking)."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            return w.getnframes(), w.getframerate()
    except wave.Error as exc:
        raise ValueError(f"not a parseable WAV: {exc}") from exc


def pgm_parse_n_frames(payload: bytes) -> int:
    """Frame count of a concatenated-P5 container — header walking only
    (each header gives the exact pixel span to skip, so counting never
    touches pixel bytes)."""
    n_frames = 0
    pos = 0
    n = len(payload)
    while pos < n:
        if payload[pos : pos + 2] != b"P5":
            raise ValueError(f"bad PGM magic at offset {pos}")
        hdr_end = payload.find(b"\n", pos)
        if hdr_end < 0:
            raise ValueError(f"unterminated PGM header at offset {pos}")
        fields = payload[pos:hdr_end].split()
        w, h = int(fields[1]), int(fields[2])
        pos = hdr_end + 1 + w * h
        if pos > n:
            raise ValueError("truncated PGM frame")
        n_frames += 1
    return n_frames
