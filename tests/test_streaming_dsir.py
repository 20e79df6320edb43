"""Streaming DSIR quality gate: ratios train batch-side on a reference
corpus (bounded 256-row collect), then arriving micro-batches score
STATELESSLY — a row-local fold against the literal ratio array, no
shuffle, no aggregation state, append mode. Parity gates: streaming
equals batch on the same rows, and the stateless scorer tracks the
registered shuffle-based query within float tolerance."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from kafka_streams_the_clojure_way_spark.operators.text import (
    dsir_bucket_ratios,
    dsir_score_stateless,
)
from kafka_streams_the_clojure_way_spark.sources.files import load_table
from kafka_streams_the_clojure_way_spark.sources.memory import drain, start_memory_sink

SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)

ARRIVING = [
    (900, "key agg row scan fast table value part hash merge"),
    (901, "zz1 zz2 zz3 zz4 zz5 unseen vocabulary entirely"),
    (902, ""),
]


def test_stateless_matches_registered_query(spark):
    """Same corpus, same target: the stateless row-local fold must match
    the registered shuffle-based DSIR query to float tolerance (the two
    sum identical bucket terms in different orders)."""
    from kafka_streams_the_clojure_way_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    ratios = dsir_bucket_ratios(docs, F.col("lang") == "en")
    got = {
        r.doc_id: (r.n_tokens, r.dsir_logweight_r)
        for r in dsir_score_stateless(docs, ratios).collect()
    }
    want = {
        r.doc_id: (r.n_tokens, r.dsir_logweight_r)
        for r in QUERIES["sample_dsir_logweights"](spark, sf).collect()
    }
    assert set(want) <= set(got)  # registered query drops token-less docs
    for doc_id, (n, w) in want.items():
        gn, gw = got[doc_id]
        assert gn == n
        assert abs(gw - w) <= 2e-6, (doc_id, gw, w)


def test_streaming_gate_matches_batch(spark, tmp_path):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    ratios = dsir_bucket_ratios(docs, F.col("lang") == "en")

    batch_probe = spark.createDataFrame(ARRIVING, SCHEMA)
    expected = sorted(
        tuple(r) for r in dsir_score_stateless(batch_probe, ratios).collect()
    )
    assert len(expected) == 3
    # the shared tokenizer yields one "" token for an empty doc — the
    # scorer follows it (consistency with token_stats et al. beats
    # special-casing)
    assert expected[2][1] == 1

    in_dir = tmp_path / "arriving"
    for i, row in enumerate(ARRIVING):
        spark.createDataFrame([row], SCHEMA).write.parquet(str(in_dir / f"b{i}"))
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(str(in_dir))
    )
    gated = dsir_score_stateless(stream, ratios)
    assert gated.isStreaming
    q = start_memory_sink(gated, "dsir_gate")
    drain(q)
    got = sorted(tuple(r) for r in spark.table("dsir_gate").collect())
    assert got == expected
