"""Sampling gates: the hash sample's rate concentrates near the target
and is repartition-stable; stratified sampleBy hits each stratum's rate
and is seed-deterministic."""

from __future__ import annotations

from kafka_streams_the_clojure_way_spark.queries import QUERIES
from kafka_streams_the_clojure_way_spark.queries.llm_pipeline import (
    _SAMPLE_PCT,
    _STRATA_FRACTIONS,
)
from kafka_streams_the_clojure_way_spark.sources.files import load_table

SF = "/root/testdata/sf0.01"


def test_hash_sample_rate_and_stability(spark):
    total = load_table(spark, SF, "documents").count()
    sample = QUERIES["sample_hash_documents"](spark, SF)
    n = sample.count()
    rate = n / total
    assert abs(rate - _SAMPLE_PCT / 100) < 0.05
    # repartition-stable: same ROWS, not just same count
    ids = {r.doc_id for r in sample.collect()}
    shuffled = QUERIES["sample_hash_documents"](spark, SF).repartition(13)
    assert {r.doc_id for r in shuffled.collect()} == ids


def test_stratified_rates_and_determinism(spark):
    docs = load_table(spark, SF, "documents")
    strata = dict(docs.groupBy("lang").count().collect())
    sample = QUERIES["sample_stratified_documents"](spark, SF)
    got = dict(sample.groupBy("lang").count().collect())
    for lang, frac in _STRATA_FRACTIONS.items():
        n, k = strata[lang], got.get(lang, 0)
        # 4-sigma Bernoulli bound — deterministic given the fixed seed
        sigma = (n * frac * (1 - frac)) ** 0.5
        assert abs(k - n * frac) <= 4 * sigma + 1, (lang, k, n)
    a = sorted(r.doc_id for r in sample.collect())
    b = sorted(
        r.doc_id for r in QUERIES["sample_stratified_documents"](spark, SF).collect()
    )
    assert a == b
