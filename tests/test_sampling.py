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
    """The registered query's per-stratum verdicts must all be true, the
    underlying sampler's rates must meet the same 4-sigma Bernoulli
    bound recomputed here, and the seeded sampler must be
    row-deterministic across invocations."""
    docs = load_table(spark, SF, "documents")
    strata = dict(docs.groupBy("lang").count().collect())
    for r in QUERIES["sample_stratified_documents"](spark, SF).collect():
        assert r.in_rate_bound, r
        assert r.n_docs == strata[r.lang]
    sample = docs.sampleBy("lang", _STRATA_FRACTIONS, seed=42)
    got = dict(sample.groupBy("lang").count().collect())
    for lang, frac in _STRATA_FRACTIONS.items():
        n, k = strata[lang], got.get(lang, 0)
        # 4-sigma Bernoulli bound — deterministic given the fixed seed
        sigma = (n * frac * (1 - frac)) ** 0.5
        assert abs(k - n * frac) <= 4 * sigma + 1, (lang, k, n)
    a = sorted(r.doc_id for r in sample.collect())
    b = sorted(
        r.doc_id
        for r in docs.sampleBy("lang", _STRATA_FRACTIONS, seed=42).collect()
    )
    assert a == b


def test_shard_assignments_deterministic_and_manifest_consistent(spark):
    """The export map must be a pure function of the corpus (per-source
    windows ordered by doc_id — partitioning-invariant), shard ids must
    be contiguous from 0, and the manifest must be exactly the groupBy
    of the assignments."""
    from pyspark.sql import functions as F

    assign = QUERIES["meta_shard_assignments"](spark, SF)
    rows = sorted(tuple(r) for r in assign.collect())
    docs_n = load_table(spark, SF, "documents").count()
    assert len(rows) == docs_n  # every doc gets exactly one shard

    shards = sorted({r[3] for r in rows})
    assert shards == list(range(len(shards)))  # contiguous from 0

    # repartition invariance (the window-order stability the oracle
    # parity rests on)
    re_rows = sorted(
        tuple(r)
        for r in QUERIES["meta_shard_assignments"](spark, SF)
        .repartition(7)
        .collect()
    )
    assert re_rows == rows

    manifest = {
        r.shard: (r.n_docs, r.shard_tokens)
        for r in QUERIES["meta_shard_manifest"](spark, SF).collect()
    }
    from collections import defaultdict

    want = defaultdict(lambda: [0, 0])
    for _, _, n_tokens, shard in rows:
        want[shard][0] += 1
        want[shard][1] += n_tokens
    assert manifest == {s: tuple(v) for s, v in want.items()}


def test_dsir_resample_is_deterministic_and_weight_biased(spark):
    """Gumbel-top-k resampling must be reproducible under repartitioning
    (the noise is hash-derived, not drawn) and actually biased toward
    high-weight docs: the selected set's mean logweight must exceed the
    corpus mean."""
    from kafka_streams_the_clojure_way_spark.queries.llm_pipeline import (
        sample_dsir_resample_topk,
        sample_dsir_logweights,
    )

    sf = "/root/testdata/sf0.001"
    a = sorted(map(tuple, sample_dsir_resample_topk(spark, sf).collect()))
    b = sorted(map(tuple, sample_dsir_resample_topk(spark, sf).collect()))
    assert a == b and len(a) == 50
    weights = {r.doc_id: r.dsir_logweight_r for r in sample_dsir_logweights(spark, sf).collect()}
    picked = [weights[d] for d, *_ in a]
    corpus_mean = sum(weights.values()) / len(weights)
    assert sum(picked) / len(picked) > corpus_mean
    plan = sample_dsir_resample_topk(spark, sf)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_training_order_is_a_round_robin_permutation(spark):
    """train_pos must be a permutation of 1..N in which every
    consecutive |sources| block contains each source at most once
    (no source monopolizes any stretch), and within a source the
    order is quality-descending."""
    from kafka_streams_the_clojure_way_spark.queries.llm_pipeline import (
        meta_training_order,
    )

    rows = meta_training_order(spark, "/root/testdata/sf0.001").collect()
    n = len(rows)
    positions = sorted(r.train_pos for r in rows)
    assert positions == list(range(1, n + 1))
    srcs = {r.source for r in rows}
    by_pos = {r.train_pos: r for r in rows}
    for block_start in range(1, n + 1 - len(srcs), len(srcs)):
        block = [by_pos[p].source for p in range(block_start, block_start + len(srcs))]
        assert len(set(block)) == len(block), f"block at {block_start}: {block}"
    for s in srcs:
        mine = sorted(
            (r for r in rows if r.source == s), key=lambda r: r.rank_in_source
        )
        logits = [r.logit_micro for r in mine]
        assert logits == sorted(logits, reverse=True)
