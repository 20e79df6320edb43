"""PSI drift monitor (operators/text.psi_against_reference +
streaming/drift.run_psi_monitor_stream): the batch operator must agree
bit-for-bit with the registered dq_source_drift_psi query on the same
split (one formula, two entry points), detect a constructed drift and
stay quiet on a re-draw, and the foreachBatch monitor must score each
micro-batch exactly as the batch operator does.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from kafka_streams_the_clojure_way_spark.operators.text import (
    psi_against_reference,
    psi_reference_counts,
)
from kafka_streams_the_clojure_way_spark.sources.files import load_table
from kafka_streams_the_clojure_way_spark.sources.memory import drain
from kafka_streams_the_clojure_way_spark.streaming.drift import (
    run_psi_monitor_stream,
)

import pytest

# slow tier (r12): multi-minute suite, deselected by default (pytest.ini)
pytestmark = pytest.mark.slow

SF = "/root/testdata/sf0.001"

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("source", StringType()),
    ]
)


def _short(i):
    return " ".join(["tok"] * (12 + i % 3))          # bin 0


def _long(i):
    return " ".join(["tok"] * (90 + i % 3))          # bin 4/5


def test_matches_registered_query_split(spark):
    """One formula, two entry points: scoring revision A (doc_id block
    split, see the registered query's docstring) against revision B's
    counts must reproduce dq_source_drift_psi bit-for-bit."""
    from kafka_streams_the_clojure_way_spark.queries.llm_pipeline import (
        dq_source_drift_psi,
    )

    docs = load_table(spark, SF, "documents")
    ref = psi_reference_counts(docs.filter(~(F.col("doc_id") % 40 < 20)))
    got = psi_against_reference(
        spark, docs.filter(F.col("doc_id") % 40 < 20), ref
    )
    want = dq_source_drift_psi(spark, SF).select(
        "source",
        F.col("n_a").alias("n_batch"),
        F.col("n_b").alias("n_ref"),
        "psi_r",
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_detects_constructed_drift_and_passes_redraw(spark):
    """A length-shifted batch must cross the standard PSI=0.25 alarm;
    a fresh draw from the reference's own bins must stay under 0.1."""
    ref_docs = spark.createDataFrame(
        [(i, _short(i), "srcA") for i in range(60)], SCHEMA
    )
    ref = psi_reference_counts(ref_docs)
    drifted = spark.createDataFrame(
        [(1000 + i, _long(i), "srcA") for i in range(60)], SCHEMA
    )
    same = spark.createDataFrame(
        [(2000 + i, _short(i + 1), "srcA") for i in range(60)], SCHEMA
    )
    psi_drift = psi_against_reference(spark, drifted, ref).collect()[0]
    psi_same = psi_against_reference(spark, same, ref).collect()[0]
    assert psi_drift.psi_r > 0.25, psi_drift
    assert psi_same.psi_r < 0.1, psi_same
    # a source absent from the reference is a topology event, not drift
    stranger = spark.createDataFrame([(3000, _short(0), "srcNEW")], SCHEMA)
    assert psi_against_reference(spark, stranger, ref).count() == 1  # srcA only


def test_stream_monitor_scores_each_trigger_like_batch(spark, tmp_path):
    """foreachBatch parity: each micro-batch's monitor row must equal
    the batch operator applied to that batch alone, and a batch that
    never hits a reference source still reports that source (its
    absence IS the drift)."""
    ref_docs = spark.createDataFrame(
        [(i, _short(i), "srcA") for i in range(30)]
        + [(100 + i, _long(i), "srcB") for i in range(30)],
        SCHEMA,
    )
    ref = psi_reference_counts(ref_docs)
    batches = [
        [(1000 + i, _short(i), "srcA") for i in range(20)],
        [(2000 + i, _long(i), "srcA") for i in range(20)],  # srcA drifted
    ]
    in_dir = tmp_path / "arriving"
    for i, rows in enumerate(batches):
        # one file per logical batch so maxFilesPerTrigger=1 maps one
        # batch to one trigger
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            str(in_dir / f"b{i}")
        )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
    )
    reports: dict[int, list] = {}

    def sink(report, batch_id):
        reports[batch_id] = sorted(
            (r.source, r.n_batch, r.n_ref, r.psi_r) for r in report.collect()
        )

    q = run_psi_monitor_stream(
        spark, stream, ref, sink, checkpoint=str(tmp_path / "ckpt")
    )
    drain(q)
    assert len(reports) == 2
    # per-trigger parity with the batch operator (triggers may arrive in
    # either order; match on content)
    want = [
        sorted(
            tuple(r)
            for r in psi_against_reference(
                spark, spark.createDataFrame(rows, SCHEMA), ref
            ).collect()
        )
        for rows in batches
    ]
    assert sorted(reports.values()) == sorted(want)
    # every report covers BOTH reference sources even though no batch
    # contains srcB — and the drifted srcA trigger alarms while the
    # in-distribution one stays quiet
    for rep in reports.values():
        assert {s for s, _, _, _ in rep} == {"srcA", "srcB"}
    flat = {tuple(r) for rep in reports.values() for r in rep}
    a_scores = sorted(p for s, _, _, p in flat if s == "srcA")
    assert a_scores[0] < 0.1 and a_scores[-1] > 0.25


def test_psi_tap_in_ingestion_stream_observes_raw_batches(spark, tmp_path):
    """The drift tap in run_ingestion_stream scores every RAW
    micro-batch (pre-gates) and cannot change the curated output:
    curated ids with the tap on equal the tap-off run, and the drifted
    second wave alarms while the in-distribution first wave stays
    quiet."""
    from pyspark.sql import functions as F

    from kafka_streams_the_clojure_way_spark.operators.dedup import (
        build_minhash_index,
    )
    from kafka_streams_the_clojure_way_spark.operators.text import (
        dsir_bucket_ratios,
    )
    from kafka_streams_the_clojure_way_spark.plans.ingestion import (
        ingestion_topology,
        run_ingestion_stream,
    )

    # lexically DISTINCT docs (every token unique per doc) so the
    # near-dup/containment gates stay out of the way; only LENGTH
    # varies, which is what the PSI bins measure.
    def short_doc(i):
        return " ".join(f"w{i}x{k}" for k in range(12 + i % 3))

    def long_doc(i):
        return " ".join(f"v{i}y{k}" for k in range(90 + i % 3))

    corpus = spark.createDataFrame(
        [(i, short_doc(i), "en") for i in range(30)], SCHEMA
    ).select(F.col("doc_id"), F.col("text"), F.col("source").alias("lang"))
    mh_path = str(tmp_path / "mh")
    build_minhash_index(corpus, mh_path)
    ref = psi_reference_counts(
        spark.createDataFrame(
            [(i, short_doc(i), "srcA") for i in range(30)], SCHEMA
        )
    )
    # batch size matches the reference size: add-1 smoothing over 6 bins
    # puts a floor of ~0.18 on PSI when a 10-doc batch meets a 30-doc
    # reference (the (c+1)/(n+6) terms differ in every EMPTY bin), which
    # would drown the in-distribution signal at toy scale.
    batches = [
        [(1000 + i, short_doc(100 + i), "srcA") for i in range(30)],  # in-dist
        [(2000 + i, long_doc(i), "srcA") for i in range(30)],         # drifted
    ]
    in_dir = tmp_path / "arriving"
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            str(in_dir / f"b{i}")
        )
    # the topology consumes (doc_id, text, lang); the PSI tap groups by
    # 'source' — reuse the source column as both by renaming on read
    stream_schema = SCHEMA
    stream = (
        spark.readStream.schema(stream_schema)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
    )

    def run(psi_on: bool, ckpt: str):
        caches: list = []
        topo = ingestion_topology(
            spark,
            index_path=mh_path,
            corpus=corpus,
            ratios=dsir_bucket_ratios(corpus, F.lit(True)),
            dsir_cutoff=-100.0,
            jaccard_threshold=0.99,
            cache_registry=caches,
        )
        admitted, reports = [], []

        def sink(curated, batch_id):
            admitted.extend(r.doc_id for r in curated.collect())

        def psink(report, batch_id):
            reports.extend(
                (r.source, r.n_batch, r.psi_r) for r in report.collect()
            )

        q = run_ingestion_stream(
            spark,
            topo,
            stream,
            sink,
            cache_registry=caches,
            psi_ref_counts=ref if psi_on else None,
            psi_sink=psink if psi_on else None,
            checkpoint=str(tmp_path / ckpt),
        )
        drain(q)
        return sorted(admitted), reports

    with_tap, reports = run(True, "ck1")
    without_tap, _ = run(False, "ck2")
    assert with_tap == without_tap and len(with_tap) == 60
    scores = sorted(p for _, _, p in reports)
    assert len(reports) == 2
    assert scores[0] < 0.1 and scores[-1] > 0.25
