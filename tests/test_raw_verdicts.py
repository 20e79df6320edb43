"""Raw-verdict mode (r11 serve-latency optimization): every gate's flag
set is computed from the RAW trigger batch instead of the previous
gate's survivors, making the six flag subtrees independent concurrent
plans and removing the contamination spool. The contract under test:
OUTPUT IDENTITY — per gate, per mode (fused/unfused), and through the
streaming serve loop — plus the mechanism (no spool dir in the cache
registry)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_the_clojure_way_spark.operators.dedup import (
    build_bloom_index,
    build_hash_index,
    build_keyset_index,
    build_minhash_index,
)
from kafka_streams_the_clojure_way_spark.operators.similarity import build_ivf_index
from kafka_streams_the_clojure_way_spark.operators.text import (
    dsir_bucket_ratios,
    shingles_col,
)
from kafka_streams_the_clojure_way_spark.plans.ingestion import (
    _SpoolDir,
    compile_ingestion,
    ingestion_topology,
    run_ingestion_batch,
    run_ingestion_stream,
)
from kafka_streams_the_clojure_way_spark.sources.memory import drain
from tests.test_ingestion_topology import (
    ARRIVING,
    CORPUS,
    EMB_ROWS,
    EMB_SCHEMA,
    SCHEMA,
    SEM_TWIN,
)

import pytest

# slow tier (r12): multi-minute suite, deselected by default (pytest.ini)
pytestmark = pytest.mark.slow


def _six_gate_kwargs(spark, tmp_path):
    corpus = spark.createDataFrame(CORPUS, SCHEMA)
    mh = str(tmp_path / "mh")
    hx = str(tmp_path / "hx")
    bf = str(tmp_path / "bf")
    ks = str(tmp_path / "ks")
    ivf = str(tmp_path / "ivf")
    build_minhash_index(corpus, mh)
    build_hash_index(corpus, hx)
    build_bloom_index(corpus, bf)
    bench = spark.createDataFrame(
        [(900, "the benchmark evaluation suite holds this exact protected sentence", "en")],
        SCHEMA,
    )
    build_keyset_index(
        bench.select(F.explode(shingles_col(F.col("text"))).alias("key")), ks
    )
    emb = spark.createDataFrame(EMB_ROWS, EMB_SCHEMA)
    build_ivf_index(emb.filter(F.col("vec_id") <= 3), ivf)
    return dict(
        index_path=mh,
        corpus=corpus,
        ratios=dsir_bucket_ratios(corpus, F.col("lang") == "en"),
        dsir_cutoff=0.0,
        jaccard_threshold=0.5,
        hash_index_path=hx,
        bloom_index_path=bf,
        keyset_index_path=ks,
        ivf_index_path=ivf,
        embeddings=emb,
    )


def _arriving_rows():
    leak = (
        106,
        "the data pipeline runs and suite holds this exact protected sentence too",
        "en",
    )
    recrawl = (201, CORPUS[1][1], "en")
    return ARRIVING + [SEM_TWIN, leak, recrawl]


def test_raw_verdicts_every_gate_output_matches_chained(spark, tmp_path):
    """Flags-from-raw is output-identical to flags-from-survivors at
    EVERY entity, fused and unfused: a later gate's extra raw flags are
    exactly rows an earlier gate already dropped, so the anti-join
    cascade erases the difference."""
    kw = _six_gate_kwargs(spark, tmp_path)
    batch = spark.createDataFrame(_arriving_rows(), SCHEMA)
    outs = {}
    for raw in (False, True):
        for fuse in (True, False):
            caches: list = []
            topo = ingestion_topology(
                spark, cache_registry=caches, raw_verdicts=raw, **kw
            )
            compiled = compile_ingestion(spark, topo, batch, fuse_routing=fuse)
            outs[(raw, fuse)] = {
                name: sorted(tuple(r) for r in df.collect())
                for name, df in compiled.items()
                if name != "topic/raw-docs"
            }
            for fr in caches:
                fr.unpersist()
    base = outs[(False, True)]
    assert base["topic/curated-docs"], "fixture must curate at least one doc"
    for key, res in outs.items():
        for name in base:
            assert res[name] == base[name], (key, name)


def test_raw_verdicts_compile_registers_no_spool(spark, tmp_path):
    """The mechanism: with depth-1 flag lineage the contamination gate
    needs no parquet spool — the chained compile registers one, the
    raw-verdict compile must not."""
    kw = _six_gate_kwargs(spark, tmp_path)
    batch = spark.createDataFrame(_arriving_rows(), SCHEMA)
    spools = {}
    for raw in (False, True):
        caches: list = []
        topo = ingestion_topology(
            spark, cache_registry=caches, raw_verdicts=raw, **kw
        )
        run_ingestion_batch(spark, topo, batch).collect()
        spools[raw] = sum(isinstance(c, _SpoolDir) for c in caches)
        for fr in caches:
            fr.unpersist()
    assert spools[False] == 1, spools
    assert spools[True] == 0, spools


def test_raw_verdicts_stream_matches_chained_batch(spark, tmp_path):
    """The serve loop on a raw-verdict topology produces the chained
    batch compile's curated set, micro-batch by micro-batch."""
    kw = _six_gate_kwargs(spark, tmp_path)
    rows = _arriving_rows()
    batch = spark.createDataFrame(rows, SCHEMA)
    chained = ingestion_topology(spark, **kw)
    expected = sorted(
        (r.doc_id, r.n_tokens, r.dsir_logweight_r)
        for r in run_ingestion_batch(spark, chained, batch).collect()
    )
    assert [d for d, _, _ in expected] == [102], expected

    in_dir = tmp_path / "arriving"
    for i, row in enumerate(rows):
        spark.createDataFrame([row], SCHEMA).write.parquet(str(in_dir / f"b{i}"))
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
    )
    got = []

    def sink(curated, batch_id):
        got.extend(
            (r.doc_id, r.n_tokens, r.dsir_logweight_r) for r in curated.collect()
        )

    caches: list = []
    topo = ingestion_topology(spark, cache_registry=caches, raw_verdicts=True, **kw)
    q = run_ingestion_stream(
        spark, topo, stream, sink,
        cache_registry=caches,
        checkpoint=str(tmp_path / "ckpt"),
    )
    drain(q)
    assert sorted(got) == expected
    assert caches == []
