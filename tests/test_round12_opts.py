"""Round-12 optimization pins: the batch codec kernels must be
BYTE-IDENTICAL per element to the scalar codec functions they replace —
the multimodal tier's plan shape is unchanged (one mapInPandas pass per
query), so element-level equality of the kernels is exactly the
operator-equivalence contract.

Covers every (codec, filter-cycle) combination the fixture encoders
emit plus the general-decoder cycles the round-trip tests exercise
(Average/Paeth — the per-byte recurrence fallback), the id%4 seeded
corruption classes (error capture parity, classified kinds), and mixed
color types / mixed widths in one batch."""

from __future__ import annotations

import pytest

from kafka_streams_the_clojure_way_spark.functions import codecs as CC
from kafka_streams_the_clojure_way_spark.operators.multimodal import (
    PNG_IDAT_BODY_OFFSET,
    PNG_IEND_LEN,
    _corrupt_payload,
)

PAYLOADS = [
    b"",
    b"a",
    b"ab",
    b"x" * 63,
    b"y" * 64,
    b"z" * 65,
    bytes(range(256)),
    b"the quick brown fox jumps over the lazy dog " * 9,
    bytes((7 * i + 3) % 256 for i in range(577)),
]

CYCLES = [(0, 1, 2), (0,), (1,), (2,), (3,), (4,), (0, 1, 2, 3, 4), (2, 2, 1)]

PAIRS = [
    (CC.png_encode_gray, CC.png_encode_gray_batch,
     CC.png_decode_gray, CC.png_decode_gray_batch),
    (CC.png_encode_rgb, CC.png_encode_rgb_batch,
     CC.png_decode_rgb, CC.png_decode_rgb_batch),
    (CC.png_encode_palette, CC.png_encode_palette_batch,
     CC.png_decode_palette, CC.png_decode_palette_batch),
    (CC.png_encode_gray_interlaced, CC.png_encode_gray_interlaced_batch,
     CC.png_decode_auto, CC.png_decode_auto_batch),
]


@pytest.mark.parametrize("cycle", CYCLES)
@pytest.mark.parametrize("pair", PAIRS, ids=["gray", "rgb", "palette", "adam7"])
def test_batch_encode_decode_matches_scalar(pair, cycle):
    enc_s, enc_b, dec_s, dec_b = pair
    ref_enc = [enc_s(p, filter_cycle=cycle) for p in PAYLOADS]
    got_enc = enc_b(PAYLOADS, filter_cycle=cycle)
    assert got_enc == ref_enc
    ref_dec = [dec_s(p) for p in ref_enc]
    got_dec, errs = dec_b(ref_enc)
    assert got_dec == ref_dec
    assert errs == [None] * len(PAYLOADS)


@pytest.mark.parametrize("width", [1, 2, 16, 64, 100])
def test_batch_encode_width_sweep(width):
    assert CC.png_encode_gray_batch(PAYLOADS, width=width) == [
        CC.png_encode_gray(p, width=width) for p in PAYLOADS
    ]
    il_ref = [CC.png_encode_gray_interlaced(p, width=width) for p in PAYLOADS]
    assert CC.png_encode_gray_interlaced_batch(PAYLOADS, width=width) == il_ref
    got, errs = CC.png_decode_auto_batch(il_ref)
    assert got == [CC.png_decode_auto(p) for p in il_ref]
    assert errs == [None] * len(il_ref)


def test_batch_decode_corrupt_capture_matches_scalar():
    pngs = [CC.png_encode_gray(p) for p in PAYLOADS * 3]
    corr = [
        _corrupt_payload(i, p, PNG_IDAT_BODY_OFFSET, PNG_IEND_LEN)
        for i, p in enumerate(pngs)
    ]
    ref = []
    for p in corr:
        try:
            ref.append(("ok", CC.png_decode_gray(p)))
        except ValueError as exc:
            ref.append(("err", CC.classify_codec_error(str(exc))))
    dec, errs = CC.png_decode_gray_batch(corr, errors="capture")
    got = [
        ("ok", d) if e is None else ("err", CC.classify_codec_error(str(e)))
        for d, e in zip(dec, errs)
    ]
    assert got == ref


def test_batch_decode_auto_mixed_types_and_junk():
    mix = (
        [CC.png_encode_gray(p) for p in PAYLOADS]
        + [CC.png_encode_rgb(p) for p in PAYLOADS]
        + [CC.png_encode_palette(p) for p in PAYLOADS]
        + [CC.png_encode_gray_interlaced(p) for p in PAYLOADS]
        + [b"junk", b"", b"\x89PNG\r\n\x1a\njunkjunkjunkjunkjunk"]
    )
    ref = []
    for p in mix:
        try:
            ref.append(("ok", CC.png_decode_auto(p)))
        except ValueError as exc:
            ref.append(("err", CC.classify_codec_error(str(exc))))
    dec, errs = CC.png_decode_auto_batch(mix, errors="capture")
    got = [
        ("ok", d) if e is None else ("err", CC.classify_codec_error(str(e)))
        for d, e in zip(dec, errs)
    ]
    assert got == ref


def test_batch_decode_raise_mode_propagates():
    bad = [CC.png_encode_gray(b"fine"), b"junk"]
    with pytest.raises(ValueError, match="bad magic"):
        CC.png_decode_gray_batch(bad, errors="raise")


def test_mixed_widths_one_batch():
    pngs = [
        CC.png_encode_gray(p, width=w) for p in PAYLOADS for w in (5, 64, 97)
    ]
    got, errs = CC.png_decode_gray_batch(pngs)
    assert got == [CC.png_decode_gray(p) for p in pngs]
    assert errs == [None] * len(pngs)


def test_triangle_counts_pre_normalized_parity(spark):
    """pre_normalized=True must be a pure shuffle-skip: on input that is
    already one-row-per-undirected-edge with u < v (the materialized
    co-purchase table's construction invariant) it returns exactly what
    the normalizing path returns."""
    from kafka_streams_the_clojure_way_spark.operators.graph import triangle_counts

    edges = spark.createDataFrame(
        # two triangles sharing edge (2,3) + a pendant edge, distinct, u < v
        [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 9)],
        "u long, v long",
    )
    base = sorted(tuple(r) for r in triangle_counts(edges).collect())
    fast = sorted(
        tuple(r) for r in triangle_counts(edges, pre_normalized=True).collect()
    )
    assert base == fast
    assert base  # non-trivial fixture


def test_connected_components_local_pull_parity(spark, monkeypatch):
    """The arrow-pull local union-find (r12) must match the distributed
    hash-min loop on the same graph."""
    from kafka_streams_the_clojure_way_spark.operators import graph as G

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (12, 12), (5, 4)], "src long, dst long"
    )
    local = sorted(tuple(r) for r in G.connected_components(edges).collect())
    dist = sorted(
        tuple(r)
        for r in G.connected_components(edges, local_max_edges=0).collect()
    )
    assert local == dist


def test_shared_tokens_artifact_matches_inline(spark, sf_dir):
    """The materialized tokenized corpus must be EXACTLY the inline
    expressions it replaces: toks == tokens_col(text), n_toks ==
    array_size(toks), one row per document, scalar columns unchanged."""
    from pyspark.sql import functions as F

    from kafka_streams_the_clojure_way_spark.operators import text as T
    from kafka_streams_the_clojure_way_spark.queries import llm_pipeline as L
    from kafka_streams_the_clojure_way_spark.sources.files import load_table

    art = L._shared_tokens(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    ref = docs.select(
        "doc_id",
        "lang",
        "source",
        T.tokens_col(F.col("text")).alias("toks"),
        F.array_size(T.tokens_col(F.col("text"))).cast("long").alias("n_toks"),
    )
    got = {r["doc_id"]: r for r in art.collect()}
    want = {r["doc_id"]: r for r in ref.collect()}
    assert len(got) == len(want)
    for k, w in want.items():
        g = got[k]
        assert (g["lang"], g["source"], g["toks"], g["n_toks"]) == (
            w["lang"], w["source"], w["toks"], w["n_toks"]
        )


def test_bigrams_from_toks_matches_text_form(spark, sf_dir):
    from pyspark.sql import functions as F

    from kafka_streams_the_clojure_way_spark.queries import llm_pipeline as L
    from kafka_streams_the_clojure_way_spark.sources.files import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = docs.select("doc_id", L._bigrams_col(F.col("text")).alias("bg"))
    b = L._shared_tokens(spark, sf_dir).select(
        "doc_id", L._bigrams_from_toks(F.col("toks")).alias("bg")
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
