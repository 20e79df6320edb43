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


def test_containment_gate_streaming_matches_batch(spark, tmp_path):
    """Incremental containment gate: a fragment probe and a concatenation
    probe must both match their corpus counterpart (the two prefix legs),
    batch == streaming."""
    from kafka_streams_the_clojure_way_spark.operators.dedup import (
        containment_pairs_between,
    )

    corpus_texts = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "one two three four five six seven eight nine ten"),
        (3, "unrelated corpus text about physical query planning"),
    ]
    arriving = [
        # fragment of corpus doc 1 (probe smaller -> probe-prefix leg)
        (201, "alpha beta gamma delta epsilon zeta"),
        # concatenation containing corpus doc 2 (corpus smaller -> corpus-prefix leg)
        (202, "one two three four five six seven eight nine ten padA padB padC padD padE padF padG padH padI padJ padK padL padM padN padO padP padQ padR padS padT padU padV padW padX"),
        (203, "entirely different arriving content with no overlap"),
    ]
    corpus = spark.createDataFrame(corpus_texts, SCHEMA)
    probe = spark.createDataFrame(arriving, SCHEMA)
    batch = containment_pairs_between(probe, corpus)
    expected = sorted((r.probe_id, r.corpus_id) for r in batch.collect())
    assert expected == [(201, 1), (202, 2)]

    in_dir = tmp_path / "carriving"
    for i, row in enumerate(arriving):
        spark.createDataFrame([row], SCHEMA).write.parquet(str(in_dir / f"b{i}"))
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(str(in_dir))
    )
    gated = containment_pairs_between(stream, corpus)
    assert gated.isStreaming
    q = start_memory_sink(gated, "containment_gate")
    drain(q)
    got = sorted(
        (r.probe_id, r.corpus_id) for r in spark.table("containment_gate").collect()
    )
    assert got == expected
