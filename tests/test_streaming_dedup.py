"""Streaming incremental dedup gate: arriving document micro-batches
probe a static corpus for near-dups via the SAME minhash band join the
batch operator uses (operators/dedup.minhash_lsh_pairs_between) — a
stream-static equi-join, stateless per batch. Parity gate: streaming
(availableNow over file micro-batches) must equal the batch run on the
same rows."""

from __future__ import annotations

from pyspark.sql.types import LongType, StringType, StructField, StructType

from kafka_streams_the_clojure_way_spark.operators.dedup import (
    minhash_lsh_pairs_between,
)
from kafka_streams_the_clojure_way_spark.sources.memory import drain, start_memory_sink

SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)

# near-dup pairs by construction: texts 1/101 and 2/102 share almost all
# shingles; 3 and 103 are unrelated
CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog again and again today"),
    (2, "pack my box with five dozen liquor jugs before noon delivery runs"),
    (3, "completely unrelated corpus document about spark physical planning"),
]
ARRIVING = [
    (101, "the quick brown fox jumps over the lazy dog again and again tonight"),
    (102, "pack my box with five dozen liquor jugs before noon delivery ends"),
    (103, "totally different arriving text concerning duckdb oracle checks"),
]


def _pairs(df):
    return sorted((r.probe_id, r.corpus_id) for r in df.collect())


def test_streaming_gate_matches_batch(spark, tmp_path):
    corpus = spark.createDataFrame(CORPUS, SCHEMA)

    batch_probe = spark.createDataFrame(ARRIVING, SCHEMA)
    batch = minhash_lsh_pairs_between(batch_probe, corpus, threshold=0.5)
    expected = _pairs(batch)
    assert expected, "fixture must produce at least one near-dup pair"
    assert all(p > 100 > c for p, c in expected)

    # one parquet file per "micro-batch"
    in_dir = tmp_path / "arriving"
    for i, row in enumerate(ARRIVING):
        spark.createDataFrame([row], SCHEMA).write.parquet(
            str(in_dir / f"b{i}")
        )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(str(in_dir))
    )
    gated = minhash_lsh_pairs_between(stream, corpus, threshold=0.5)
    assert gated.isStreaming
    q = start_memory_sink(gated, "dedup_gate")
    drain(q)
    got = _pairs(spark.table("dedup_gate"))
    assert got == expected
