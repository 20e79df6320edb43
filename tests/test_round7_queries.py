"""Round-7 operators: greedy-subword (BPE-style) token accounting and
C4-style line-level dedup — semantics pinned against pure-Python
references, not just the DuckDB oracle (two engines sharing one wrong
constant would still hash-match; this file is the third opinion)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from kafka_streams_the_clojure_way_spark.operators.dedup import (
    LINE_WIDTH,
    line_dedup_stats,
)
from kafka_streams_the_clojure_way_spark.operators.text import (
    BPE_VOCAB,
    bpe_token_count_col,
)
from kafka_streams_the_clojure_way_spark.sources.files import load_table

SF = "/root/testdata/sf0.001"

SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)


def _py_bpe_word(word: str) -> int:
    """Reference greedy longest-match segmentation."""
    pos, cnt = 0, 0
    while pos < len(word):
        m = 1
        for v in BPE_VOCAB:
            if word.startswith(v, pos) and len(v) > m:
                m = len(v)
        pos += m
        cnt += 1
    return cnt


def _py_bpe_text(text: str) -> int:
    return sum(_py_bpe_word(w) for w in text.strip().lower().split())


def test_bpe_count_matches_python_reference(spark):
    rows = [
        (1, "the nation of spark"),
        (2, "internationalization"),
        (3, "a"),
        (4, "ingestion pipelines ing ing able"),
        (5, "xyzzy qqq"),  # nothing in vocab: pure char fallback
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        r.doc_id: r.n
        for r in df.select(
            "doc_id", bpe_token_count_col(F.col("text")).alias("n")
        ).collect()
    }
    want = {i: _py_bpe_text(t) for i, t in rows}
    assert got == want, (got, want)


def test_bpe_count_invariants_on_corpus(spark):
    """words <= bpe tokens <= alpha chars, for every real doc."""
    docs = load_table(spark, SF, "documents").limit(100)
    rows = docs.select(
        F.array_size(F.split(F.lower(F.trim("text")), r"\s+")).alias("nw"),
        bpe_token_count_col(F.col("text")).alias("nb"),
        F.length(F.regexp_replace("text", r"\s+", "")).alias("nc"),
    ).collect()
    for r in rows:
        assert r.nw <= r.nb <= r.nc, r


def test_line_dedup_canonical_keep_one(spark):
    """Constructed corpus: a line shared by three docs keeps exactly its
    first (doc, position) occurrence; unique lines are never flagged."""
    shared = "alpha beta gamma delta epsilon"  # one LINE_WIDTH line
    assert len(shared.split()) == LINE_WIDTH
    rows = [
        (1, shared + " one two three four five"),
        (2, shared),                       # dup of doc 1's line 0
        (3, "solo words here only once " + shared),  # dup at line 1
        (4, "tail words"),                 # ragged short line, unique
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        r.doc_id: (r.n_lines, r.n_dup_lines, r.n_tokens_removed)
        for r in line_dedup_stats(df).collect()
    }
    assert got == {
        1: (2, 0, 0),   # owns the canonical copy
        2: (1, 1, 5),   # whole doc is a repeat
        3: (2, 1, 5),   # second line is a repeat
        4: (1, 0, 0),
    }, got


def test_line_dedup_totals_consistent_on_corpus(spark):
    """Corpus-wide: total flagged lines == total occurrences minus
    distinct lines (keep-one-per-group, regardless of which doc owns)."""
    docs = load_table(spark, SF, "documents")
    stats = line_dedup_stats(docs)
    agg = stats.agg(
        F.sum("n_lines").alias("occ"), F.sum("n_dup_lines").alias("dups")
    ).collect()[0]
    from kafka_streams_the_clojure_way_spark.operators.dedup import (
        line_occurrences,
    )

    distinct = line_occurrences(docs).select("line").distinct().count()
    assert agg.occ - distinct == agg.dups and agg.dups > 0


def test_audio_fingerprints_match_python_reference(spark):
    """Third opinion for the audio kernel: pure-Python frame/band/
    double-diff reference vs the mapInPandas kernel on real docs."""
    from kafka_streams_the_clojure_way_spark.operators.audiofp import (
        BAND_W,
        FP_BITS,
        FRAME_W,
        N_BANDS,
        audio_fingerprints,
    )
    from kafka_streams_the_clojure_way_spark.operators.multimodal import (
        wrap_binary_assets,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text").limit(40)
    assets = wrap_binary_assets(
        docs.withColumn("payload", F.encode(F.col("text"), "UTF-8")),
        "payload",
        "audio/wav",
    )
    got = {
        (r.doc_id, r.frame_idx): r.fp
        for r in audio_fingerprints(assets).collect()
    }

    want = {}
    for row in docs.collect():
        raw = row.text.encode()
        nf = len(raw) // FRAME_W
        if nf < 2:
            continue
        e = [
            [
                sum(raw[f * FRAME_W + b * BAND_W + j] for j in range(BAND_W))
                for b in range(N_BANDS)
            ]
            for f in range(nf)
        ]
        for f in range(nf - 1):
            fp = 0
            for b in range(FP_BITS):
                if (e[f][b] - e[f + 1][b]) > (e[f][b + 1] - e[f + 1][b + 1]):
                    fp |= 1 << b
            want[(row.doc_id, f)] = fp
    assert got == want and got


def test_bpe_distinct_word_form_matches_occurrence_fold(spark):
    """bpe_token_counts (the batch distinct-word form: fold each DISTINCT
    word once, re-join, per-doc sum) must equal the per-occurrence fold
    bpe_token_count_col on every doc — the Zipf restructuring may change
    the plan, never a count."""
    from kafka_streams_the_clojure_way_spark.operators.text import bpe_token_counts

    docs = load_table(spark, SF, "documents").limit(200)
    occ = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", bpe_token_count_col(F.col("text")).alias("n")
        ).collect()
    }
    dis = {r.doc_id: r.n_tokens_bpe for r in bpe_token_counts(docs).collect()}
    assert occ == dis
