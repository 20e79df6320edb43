"""Round-10 regression pins.

1. Fused per-batch routing (VERDICT r9 #1): the six-gate ingestion
   compile derives EVERY probe's partition-routing keys from ONE
   driver job (plans.ingestion.compute_batch_routing) instead of one
   eager collect per gate — curated output identical to the per-probe
   collected path (superset-routing contract), and the compile's eager
   job count collapses.
2. The probe-level precomputed-routing parameters the router rides on:
   supersets are output-identical, empty lists short-circuit, streaming
   frames reject precomputed inputs loudly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from kafka_streams_the_clojure_way_spark.operators import dedup as D
from kafka_streams_the_clojure_way_spark.plans.ingestion import (
    compile_ingestion,
    compute_batch_routing,
    ingestion_topology,
    run_ingestion_batch,
)

# slow tier (r12): multi-minute suite, deselected by default (pytest.ini)
pytestmark = pytest.mark.slow

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog again and again today", "en"),
    (2, "spark compiles the data pipeline into stages and tasks for executors", "en"),
    (3, "der schnelle braune fuchs springt heute wieder ueber den faulen hund", "de"),
]
ARRIVING = [
    (101, "the quick brown fox jumps over the lazy dog again and again tonight", "en"),
    (102, "the data pipeline stages run tasks over executors again", "en"),
    (103, "der schnelle fuchs springt wieder ueber den faulen hund", "de"),
    (104, "spark compiles the data pipeline into", "en"),
]

EMB_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(DoubleType())),
    ]
)


def _basis(i: int, d: int = 8) -> list[float]:
    v = [0.0] * d
    v[i] = 1.0
    return v


EMB_ROWS = [
    (1, _basis(3)),
    (2, _basis(0)),
    (3, _basis(4)),
    (101, _basis(5)),
    (102, _basis(1)),
    (103, _basis(6)),
    (104, _basis(7)),
    (105, _basis(0)),  # semantic twin of corpus doc 2
]
SEM_TWIN = (105, "the executors run data stages and schedule pipeline tasks tonight", "en")


def _six_gate_topology(spark, tmp_path, cache_registry=None):
    from kafka_streams_the_clojure_way_spark.operators.similarity import (
        build_ivf_index,
    )
    from kafka_streams_the_clojure_way_spark.operators.text import (
        dsir_bucket_ratios,
        shingles_col,
    )

    corpus = spark.createDataFrame(CORPUS, SCHEMA)
    mh_path = str(tmp_path / "mh")
    D.build_minhash_index(corpus, mh_path)
    hx_path = str(tmp_path / "hx")
    D.build_hash_index(corpus, hx_path)
    bf_path = str(tmp_path / "bf")
    D.build_bloom_index(corpus, bf_path)
    bench = spark.createDataFrame(
        [(900, "the benchmark evaluation suite holds this exact protected sentence", "en")],
        SCHEMA,
    )
    ks_path = str(tmp_path / "ks")
    D.build_keyset_index(
        bench.select(F.explode(shingles_col(F.col("text"))).alias("key")), ks_path
    )
    emb = spark.createDataFrame(EMB_ROWS, EMB_SCHEMA)
    ivf_path = str(tmp_path / "ivf")
    build_ivf_index(emb.filter(F.col("vec_id") <= 3), ivf_path)
    return ingestion_topology(
        spark,
        index_path=mh_path,
        corpus=corpus,
        ratios=dsir_bucket_ratios(corpus, F.col("lang") == "en"),
        dsir_cutoff=0.0,
        jaccard_threshold=0.5,
        hash_index_path=hx_path,
        bloom_index_path=bf_path,
        keyset_index_path=ks_path,
        ivf_index_path=ivf_path,
        embeddings=emb,
        cache_registry=cache_registry,
    )


def _six_gate_batch(spark):
    leak = (
        106,
        "the data pipeline runs and suite holds this exact protected sentence too",
        "en",
    )
    recrawl = (201, CORPUS[1][1], "en")
    return spark.createDataFrame(ARRIVING + [SEM_TWIN, leak, recrawl], SCHEMA)


def _jobs_in_group(spark, group: str, fn):
    """Run fn under a job group and return how many Spark jobs it
    submitted — the eager-compile-cost meter."""
    sc = spark.sparkContext
    sc.setJobGroup(group, group)
    try:
        result = fn()
    finally:
        sc.setJobGroup("", "")
    return result, len(sc.statusTracker().getJobIdsForGroup(group))


def test_fused_routing_matches_per_probe_collects(spark, tmp_path):
    """fuse_routing=True (one routing job, superset keys) and
    fuse_routing=False (one eager collect per probe) must produce the
    SAME gate-by-gate survivor sets over the six-gate topology."""
    topo = _six_gate_topology(spark, tmp_path)
    batch = _six_gate_batch(spark)
    gates = [
        "stream/exact-gate",
        "stream/neardup-gate",
        "stream/dsir-gate",
        "stream/containment-gate",
        "stream/contamination-gate",
        "stream/semantic-gate",
        "topic/curated-docs",
    ]
    fused = compile_ingestion(spark, topo, batch, fuse_routing=True)
    fused_sets = {
        g: {r.doc_id for r in fused[g].select("doc_id").collect()} for g in gates
    }
    plain = compile_ingestion(spark, topo, batch, fuse_routing=False)
    plain_sets = {
        g: {r.doc_id for r in plain[g].select("doc_id").collect()} for g in gates
    }
    assert fused_sets == plain_sets
    assert fused_sets["topic/curated-docs"] == {102}


def test_fused_routing_is_one_job_and_probes_stay_routed(spark, tmp_path):
    """The routing fusion contract: compute_batch_routing derives EVERY
    gate's partition-routing keys in at most two eager jobs (one
    union-distinct collect — AQE may split its final stage), replacing
    the one-collect-per-probe pattern; and the fused compile still
    bakes literal PartitionFilters into the probes' scans (the packed
    IN-list — pruning is not lost by precomputing)."""
    import re

    topo = _six_gate_topology(spark, tmp_path)
    batch = _six_gate_batch(spark)
    # warm index meta + schema caches + optional-dataset existence
    # checks so the measured routing job prices the steady-state loop
    run_ingestion_batch(spark, topo, batch).count()

    routing, n_jobs = _jobs_in_group(
        spark, "r10-routing", lambda: compute_batch_routing(spark, topo, batch)
    )
    assert 1 <= n_jobs <= 2, f"fused routing ran {n_jobs} eager jobs"
    assert set(routing) >= {
        "hash_buckets",
        "bloom_segments",
        "minhash_routing",
        "keyset_segments",
        "minhash_sigs",
    }

    compiled = compile_ingestion(spark, topo, batch)
    plan = compiled["stream/neardup-gate"]._jdf.queryExecution().executedPlan().toString()
    pfs = re.findall(r"PartitionFilters: \[([^\]]*)", plan)
    assert any("IN (" in p or "isin" in p.lower() for p in pfs if p.strip()), (
        "fused neardup probe lost its literal partition routing:\n"
        + "\n".join(pfs)
    )


def test_fused_spool_dirs_drain_with_registry(spark, tmp_path):
    """The contamination gate's per-trigger spool rides the cache
    registry: draining the registry deletes the spool directory."""
    import os

    caches: list = []
    topo = _six_gate_topology(spark, tmp_path, cache_registry=caches)
    batch = _six_gate_batch(spark)
    curated = run_ingestion_batch(spark, topo, batch)
    assert {r.doc_id for r in curated.collect()} == {102}
    from kafka_streams_the_clojure_way_spark.plans.ingestion import _SpoolDir

    spools = [c for c in caches if isinstance(c, _SpoolDir)]
    assert spools, "fused six-gate run must register its spool dir"
    assert all(os.path.isdir(sp.path) for sp in spools)
    for fr in caches:
        fr.unpersist()
    caches.clear()
    assert not any(os.path.isdir(sp.path) for sp in spools)


def test_compute_batch_routing_keys_are_supersets(spark, tmp_path):
    """Router keys must cover every key the probes would collect
    themselves: re-derive each family's keys per-probe and check
    set-containment."""
    topo = _six_gate_topology(spark, tmp_path)
    batch = _six_gate_batch(spark)
    routing = compute_batch_routing(spark, topo, batch)
    spec = topo["routing"]
    h = D.content_hash(F.col("text"))

    meta = D._index_meta(spark, spec["hash_index_path"])
    want = {
        r[0]
        for r in batch.select(
            F.pmod(h, F.lit(meta["n_buckets"]))
        ).distinct().collect()
    }
    assert want <= set(routing["hash_buckets"])

    meta = D._index_meta(spark, spec["index_path"])
    sigs = routing["minhash_sigs"]
    assert {r[0] for r in sigs.select("doc_id").collect()} == {
        r[0] for r in batch.select("doc_id").collect()
    }
    n_buckets, rows = meta["n_buckets"], meta["n_hashes"] // meta["bands"]
    probe_keys = {
        r[0]
        for r in sigs.select(
            F.explode(
                F.array(
                    *[
                        F.lit(b) * n_buckets
                        + F.pmod(D._band_key(F.col("sig"), b, rows), F.lit(n_buckets))
                        for b in range(meta["bands"])
                    ]
                )
            ).alias("k")
        ).distinct().collect()
    }
    assert probe_keys == set(routing["minhash_routing"])


def test_keyset_probe_precomputed_segments(spark, tmp_path):
    """Superset segments are output-identical; the same superset routes
    the confirm scan (one segment per key); an empty list asserts
    no-keys and returns empty."""
    keys = spark.createDataFrame([(f"k{i}",) for i in range(40)], "key string")
    path = str(tmp_path / "ks")
    D.build_keyset_index(keys, path)
    probe = spark.createDataFrame([("k3",), ("k17",), ("nope",)], "key string")
    meta = D._index_meta(spark, path)
    from kafka_streams_the_clojure_way_spark.functions.portable import hash60

    segs = [
        r[0]
        for r in probe.select(
            F.pmod(hash60(F.col("key")), F.lit(meta["n_segments"]))
        ).distinct().collect()
    ]
    base = sorted(r[0] for r in D.keyset_index_probe(spark, path, probe).collect())
    routed = sorted(
        r[0]
        for r in D.keyset_index_probe(
            spark, path, probe, segments=segs, confirm_segments=segs
        ).collect()
    )
    superset = sorted(
        r[0]
        for r in D.keyset_index_probe(
            spark,
            path,
            probe,
            segments=list(range(meta["n_segments"])),
            confirm_segments=list(range(meta["n_segments"])),
        ).collect()
    )
    assert base == routed == superset == ["k17", "k3"]
    assert (
        D.keyset_index_probe(
            spark, path, probe, segments=[], confirm_segments=[]
        ).count()
        == 0
    )


def test_minhash_probe_precomputed_sigs_and_routing(spark, tmp_path):
    """A shared signature frame covering MORE ids than the batch must be
    narrowed to the batch (no pairs for non-batch ids), and superset
    routing keys prune without changing output."""
    corpus = spark.createDataFrame(CORPUS, SCHEMA)
    path = str(tmp_path / "mh")
    D.build_minhash_index(corpus, path)
    batch = spark.createDataFrame(ARRIVING, SCHEMA)
    extra = spark.createDataFrame([(999, CORPUS[0][1], "en")], SCHEMA)
    meta = D._index_meta(spark, path)
    shared = (
        batch.unionByName(extra)
        .select(F.col("doc_id"), D.shingle_hashes(F.col("text")).alias("sh"))
        .withColumn(
            "sig",
            D.minhash_from_hashes(F.col("sh"), D.minhash_seeds(meta["n_hashes"])),
        )
    )
    base = sorted(
        (r.probe_id, r.corpus_id)
        for r in D.minhash_index_probe(
            spark, path, batch, threshold=0.5
        ).collect()
    )
    full_routing = list(range(meta["bands"] * meta["n_buckets"]))
    routed = sorted(
        (r.probe_id, r.corpus_id)
        for r in D.minhash_index_probe(
            spark, path, batch, threshold=0.5, sigs=shared, routing=full_routing
        ).collect()
    )
    assert base == routed
    assert all(p != 999 for p, _ in routed), "sigs superset must narrow to batch"


def test_precomputed_routing_rejects_streaming_frames(spark, tmp_path):
    corpus = spark.createDataFrame(CORPUS, SCHEMA)
    path = str(tmp_path / "mh")
    D.build_minhash_index(corpus, path)
    src = tmp_path / "stream_in"
    spark.createDataFrame(ARRIVING, SCHEMA).write.parquet(str(src))
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    with pytest.raises(ValueError, match="batch-only"):
        D.minhash_index_probe(spark, path, stream, routing=[0, 1])
