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


def _ts_schema():
    from pyspark.sql.types import TimestampType

    return StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("ts", TimestampType()),
        ]
    )


def _hourly_batches():
    """3 probe micro-batches, event times 1 hour apart: with a seconds-
    scale watermark delay, batch N's arrival must evict batch N-1's
    dedup state."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    return [
        [(101, ARRIVING[0][1], t0)],
        [(102, ARRIVING[1][1], t0 + dt.timedelta(hours=1))],
        [(103, ARRIVING[2][1], t0 + dt.timedelta(hours=2))],
    ]


def _run_watermarked(spark, tmp_path, gate_builder, name):
    """Write one parquet file per micro-batch, run the watermarked gate
    with maxFilesPerTrigger=1 (>2 real micro-batches), return (rows,
    max state rows removed in any batch, final state rows)."""
    schema = _ts_schema()
    in_dir = tmp_path / "arriving"
    for i, batch_rows in enumerate(_hourly_batches()):
        spark.createDataFrame(batch_rows, schema).write.parquet(
            str(in_dir / f"b{i}")
        )
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
    )
    gated = gate_builder(stream)
    assert gated.isStreaming
    q = start_memory_sink(gated, name)
    drain(q)
    progresses = [p for p in q.recentProgress if p["stateOperators"]]
    assert len([p for p in q.recentProgress if p["numInputRows"] > 0]) >= 3, (
        "maxFilesPerTrigger must yield one micro-batch per file"
    )
    removed = max(
        (p["stateOperators"][0]["numRowsRemoved"] for p in progresses), default=0
    )
    final_state = progresses[-1]["stateOperators"][0]["numRowsTotal"]
    return sorted(tuple(r) for r in spark.table(name).collect()), removed, final_state


def test_minhash_watermarked_gate_bounds_state(spark, tmp_path):
    """The unbounded-run variant: dropDuplicatesWithinWatermark must
    EVICT candidate-pair state as the watermark passes (state tracks the
    delay window, not total ingested docs), and the emitted pairs must
    equal the batch run on the same rows."""
    corpus = spark.createDataFrame(CORPUS, SCHEMA)
    batch_rows = [r for b in _hourly_batches() for r in b]
    batch_probe = spark.createDataFrame(batch_rows, _ts_schema())
    expected = _pairs(minhash_lsh_pairs_between(batch_probe, corpus, threshold=0.5))
    assert expected

    got, removed, final_state = _run_watermarked(
        spark,
        tmp_path,
        lambda s: minhash_lsh_pairs_between(
            s, corpus, threshold=0.5, watermark=("ts", "5 seconds")
        ),
        "wm_minhash_gate",
    )
    assert [(p, c) for p, c, *_ in got] == [(p, c) for p, c in expected] or sorted(
        (p, c) for p, c, *_ in got
    ) == expected
    assert removed > 0, "watermark never evicted any dedup state"
    assert final_state < len(expected) + 1, (
        f"state should shrink to the last window, got {final_state}"
    )


def test_containment_watermarked_gate_bounds_state(spark, tmp_path):
    from kafka_streams_the_clojure_way_spark.operators.dedup import (
        containment_pairs_between,
    )

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "one two three four five six seven eight nine ten"),
            (3, "unrelated corpus text about physical query planning"),
        ],
        SCHEMA,
    )
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (201, "alpha beta gamma delta epsilon zeta", t0),
        (202, "one two three four five six seven eight nine", t0 + dt.timedelta(hours=1)),
        (203, "entirely different arriving content with no overlap", t0 + dt.timedelta(hours=2)),
    ]
    batch = spark.createDataFrame(rows, _ts_schema())
    expected = sorted(
        (r.probe_id, r.corpus_id, r.n_shared, r.containment_r)
        for r in containment_pairs_between(batch, corpus).collect()
    )
    assert expected

    in_dir = tmp_path / "arr2"
    for i, row in enumerate(rows):
        spark.createDataFrame([row], _ts_schema()).write.parquet(str(in_dir / f"b{i}"))
    stream = (
        spark.readStream.schema(_ts_schema())
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
    )
    gated = containment_pairs_between(stream, corpus, watermark=("ts", "5 seconds"))
    q = start_memory_sink(gated, "wm_containment_gate")
    drain(q)
    got = sorted(
        (r.probe_id, r.corpus_id, r.n_shared, r.containment_r)
        for r in spark.table("wm_containment_gate").collect()
    )
    assert got == expected
    removed = max(
        (
            p["stateOperators"][0]["numRowsRemoved"]
            for p in q.recentProgress
            if p["stateOperators"]
        ),
        default=0,
    )
    assert removed > 0


def test_indexed_probe_watermarked_gate(spark, tmp_path):
    from kafka_streams_the_clojure_way_spark.operators.dedup import (
        build_minhash_index,
        minhash_index_probe,
    )

    corpus = spark.createDataFrame(CORPUS, SCHEMA)
    path = str(tmp_path / "idx")
    build_minhash_index(corpus, path)
    batch_rows = [r for b in _hourly_batches() for r in b]
    batch = spark.createDataFrame(batch_rows, _ts_schema())
    expected = _pairs(minhash_index_probe(spark, path, batch, threshold=0.5))
    assert expected

    got, removed, final_state = _run_watermarked(
        spark,
        tmp_path,
        lambda s: minhash_index_probe(
            spark, path, s, threshold=0.5, watermark=("ts", "5 seconds")
        ),
        "wm_indexed_gate",
    )
    assert sorted((p, c) for p, c, *_ in got) == expected
    assert removed > 0
