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


# --------------------------------------------------------------------------
# Continuation session: packed-code ADC, parsed literals, batched MG
# --------------------------------------------------------------------------

def test_packed_codes_match_subspace_argmin(spark, sf_dir):
    """pq_model's packed code arrays (r12 `_encode_packed`) must agree
    element-for-element with the trainer's per-(id, subspace) argmin —
    the former codes layout — over the real corpus."""
    from pyspark.sql import functions as F

    from kafka_streams_the_clojure_way_spark.operators import pq as PQ
    from kafka_streams_the_clojure_way_spark.sources.files import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    codebook, codes = PQ.pq_model(emb)
    packed = {r["vec_id"]: list(r["codes"]) for r in codes.collect()}

    subdim = len(codebook[0][2])
    m = 1 + max(s for s, _, _ in codebook)
    subs = PQ._subvector_frame(emb, "vec_id", "embedding", m, subdim)
    by_s: dict[int, list] = {}
    for s, c, v in sorted(codebook):
        by_s.setdefault(s, []).append((c, [float(x) for x in v]))
    cand = F.transform(
        F.element_at(F.col("__cb"), F.col("s") + 1),
        lambda e: F.struct(
            PQ._sq_dist(F.col("sub"), e["v"]).alias("d"),
            e["code"].alias("code"),
        ),
    )
    from kafka_streams_the_clojure_way_spark.operators.clustering import attach_model

    ref_rows = (
        attach_model(
            subs, "__cb",
            [by_s[s] for s in sorted(by_s)],
            "array<array<struct<code:int,v:array<double>>>>",
        )
        .select("vec_id", "s", F.array_min(cand)["code"].alias("code"))
        .collect()
    )
    ref: dict[int, list] = {}
    for r in ref_rows:
        ref.setdefault(r["vec_id"], [None] * m)[r["s"]] = r["code"]
    assert packed == ref


def test_adc_fold_matches_groupby_sum(spark):
    """The row-local M-term ADC fold must equal the former
    groupBy(query, vector) SUM over per-subspace LUT rows on a frame
    small enough to enumerate by hand."""
    from pyspark.sql import functions as F

    from kafka_streams_the_clojure_way_spark.operators import pq as PQ

    # 2 subspaces x 2 codes, 3 vectors, 2 queries — exact integer units
    dim, m = 4, 2
    vecs = [(i, [float(i + d) for d in range(dim)]) for i in range(3)]
    queries = [(10, [0.5, 1.5, 2.5, 3.5]), (11, [3.0, 1.0, 0.0, 2.0])]
    corpus = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    qdf = spark.createDataFrame(queries, "vec_id long, embedding array<double>")
    codebook, codes = PQ.pq_model(corpus, m=m, k=2, n_iter=1)
    out = {
        (r["query_id"], r["neighbor_id"]): r["adc_units"]
        for r in PQ.adc_topk(codes, codebook, qdf).collect()
    }

    # reference: explicit per-subspace du rows summed per (query, vec)
    import math

    subdim = dim // m
    packed = {r["vec_id"]: list(r["codes"]) for r in codes.collect()}
    lut = {}
    for qid, qv in queries:
        for s, c, cent in codebook:
            sub = qv[s * subdim:(s + 1) * subdim]
            d = 0.0
            for x, y in zip(sub, cent):
                d = d + (x - y) * (x - y)
            lut[(qid, s, c)] = int(math.floor(d * PQ.ADC_UNITS + 0.5))
    for qid, _ in queries:
        for vid, cs in packed.items():
            if vid == qid:
                continue
            want = sum(lut[(qid, s, cs[s])] for s in range(m))
            assert out[(qid, vid)] == want


def test_lsh_bucket_matches_per_plane_chain(spark, sf_dir):
    """The parsed-literal lsh_bucket (r12) must equal the former
    per-plane chained-sum form on every corpus vector."""
    from pyspark.sql import functions as F

    from kafka_streams_the_clojure_way_spark.operators import similarity as S
    from kafka_streams_the_clojure_way_spark.sources.files import load_table

    def old_form(vec):
        bucket = F.lit(0)
        vec_d = vec.cast("array<double>")
        for p in range(S.N_PLANES):
            proj = F.aggregate(
                F.zip_with(
                    vec_d,
                    F.array(*[F.lit(S._plane_weight(p, d)) for d in range(S.EMBED_DIM)]),
                    lambda x, w: x * w,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            bucket = bucket + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        return bucket.cast("long")

    emb = load_table(spark, sf_dir, "embeddings")
    got = emb.select("vec_id", S.lsh_bucket(F.col("embedding")).alias("b")).collect()
    want = emb.select("vec_id", old_form(F.col("embedding")).alias("b")).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_long_array_literal_values_and_type(spark):
    from kafka_streams_the_clojure_way_spark.operators.dedup import _long_array

    df = spark.range(1).select(_long_array([3, 1 << 40, 0]).alias("a"))
    assert df.schema["a"].dataType.simpleString() == "array<bigint>"
    assert df.collect()[0]["a"] == [3, 1 << 40, 0]


def test_mg_partition_survival_guarantee_and_total():
    """The batched Misra-Gries merge must keep every token whose
    partition count exceeds n/(k+1) (the sequential sketch's bound) and
    report the exact token total — on a skewed stream crafted so the
    reduction step actually fires."""
    import pandas as pd

    from kafka_streams_the_clojure_way_spark.operators.sketches import _mg_partition

    k = 4
    toks = []
    # heavy tokens: far above n/(k+1); chaff: thousands of singletons
    for i in range(400):
        toks.append(["hot_a", "hot_b"])
    for i in range(2000):
        toks.append([f"chaff_{i}"])
    toks.append(None)  # null doc must be skipped, not crash
    pdf = pd.DataFrame({"toks": toks})
    batches = [pdf.iloc[i:i + 97] for i in range(0, len(pdf), 97)]
    out = list(_mg_partition(k)(iter(batches)))[0]
    total = int(out[out["token"].isnull()]["cnt"].iloc[0])
    assert total == 400 * 2 + 2000
    survivors = set(out[out["token"].notnull()]["token"])
    assert len(survivors) <= k
    # n/(k+1) = 2800/5 = 560 < 800 = count(hot_*): both must survive
    assert {"hot_a", "hot_b"} <= survivors
