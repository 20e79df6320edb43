"""Scale probe: replicate the sf0.1 tables Nx (default 10x, key-shifted so
join/group cardinalities scale realistically) into a MULTI-FILE layout
under /tmp, then time headline queries at both scales and report the
wall-clock scaling factor per query.

Purpose: the driver's test parquet is one row group per table, so every
scan stage is structurally single-task — this probe is the evidence that
the same plans parallelize when the file layout allows it (the 100 TB
situation), and that runtime grows sub-linearly in data size on local[32].

Usage: python scripts/scale_probe.py [replication] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kafka_streams_the_clojure_way_spark import get_spark  # noqa: E402
from kafka_streams_the_clojure_way_spark.queries import QUERIES  # noqa: E402
from kafka_streams_the_clojure_way_spark.sources.files import load_table  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"

#: (table, key columns to shift per replica so ids stay unique and joins
#: scale in rows, not in duplicate-key fanout)
SHIFTS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    # dimensions stay fixed — exactly the 100 TB shape (facts grow, dims don't)
    "customer": [],
    "supplier": [],
    "part": [],
    "nation": [],
    "region": [],
}

PROBE_QUERIES = [
    "agg_pricing_summary",          # scan-bound global agg (TPC-H Q1)
    "tpch_q05_local_supplier_revenue",  # 6-table join
    "window_top3_orders_per_customer",  # window + partial top-k
    "join_revenue_by_nation",       # broadcast dim join + agg
    "dedup_minhash_lsh_pairs",      # LSH banding + exact-Jaccard verify over the
                                    # SHARED materialized signature table (r9:
                                    # signing runs once in the warm pass — the
                                    # production signature-table shape; the slope
                                    # reads banding/verify, not re-signing)
    "text_ngram_contamination",     # explode + broadcast probe + re-agg
    "text_unigram_logprob",         # Zipf-split token join (head broadcast)
    "meta_corpus_fingerprint",      # one-pass partial-agg checksum
    "graph_triangle_parts",         # two wedge equi-joins (edge set grows ~Nx)
    "dedup_ngram_span_documents",   # n-gram postings: map-side combine + equi-join
    "agg_heavy_hitter_tokens",      # MG sketch pass + broadcast recount
    "graph_pagerank_parts",         # 6 iterative rounds, state shuffled on node
    "sim_ivfpq_topk",               # IVF routing + residual PQ + broadcast LUT
    "text_bm25_topk",               # query-vocab filter + broadcast idf + TakeOrdered
    "sample_dsir_logweights",       # hashed-bucket models, broadcast ratio join
    "text_bigram_logprob",          # vocab-sized probs, Zipf-head broadcast split
    "sim_mmr_diversified_topk",     # bounded shortlist; k joins over constant frames
    "dedup_containment_pairs",      # lossless prefix-posting join (true pairs grow
                                    # quadratically under exact-copy replication —
                                    # read its ratio like MinHash-LSH's)
                                    # [factor-capped, see PROBE_FACTOR_CAP]
    "text_entropy_stats",           # doc-term matrix + fused per-doc agg
    "sample_token_budget_per_source",  # integer running-sum window per source
    "eval_ann_quantized_quality",   # two bounded-probe tiers + (query,neighbor) join
    "agg_source_overlap_matrix",    # posting distinct + bounded combination explode
    "pipeline_ingestion_curated",   # composed topology: index probe + DSIR + containment
                                    # [factor-capped: replica copies are mutual
                                    # near-dups/containments, candidates ~factor^2]
    "agg_source_curation_report",   # one corpus pass + |sources|-group shuffle
    "dedup_incremental_exact_indexed",  # persisted hash-index probe (batch ~factor,
                                    # matches per probe ~factor under exact-copy
                                    # replication -> output ~factor^2)
                                    # [factor-capped, see PROBE_FACTOR_CAP]
    "dedup_incremental_bloom_gated",  # bloom pre-test + hash confirm (same
                                    # output-quadratic replication artifact)
                                    # [factor-capped, see PROBE_FACTOR_CAP]
    "dq_source_drift_psi",          # one corpus scan -> |sources|x6 grid arithmetic
    "text_quality_logit",           # scan-bound WholeStageCodegen projection
    "text_bpe_token_stats",         # scan-bound per-word aggregate-fold HOFs
    "dedup_line_level_stats",       # line hash-groupBy (group state = one min;
                                    # replication grows group SIZES, output ~factor)
    "dedup_image_phash_indexed",    # pHash band-index probe (probe signs itself;
                                    # replica originals are byte-identical, so each
                                    # probe twin matches every replica -> output
                                    # ~factor^2 — read the 30x ratio with that
                                    # artifact in mind, VERDICT r7 #5)
    "dedup_winnow_pairs",           # winnowing fingerprint postings join (df-capped;
                                    # the uncovered heavy operator from r7's top-5)
    "dedup_audio_fp_pairs",         # frame-aligned fp postings + df cap. Under
                                    # exact-copy replication every copy shares ALL
                                    # postings: at 10x keys stay under the cap and
                                    # output grows ~factor^2; at 30x the same keys
                                    # CROSS the cap and drop — both regimes are
                                    # replication artifacts, the interesting read
                                    # is the fingerprint-scan slope
    "text_contamination_bloom_gated",  # corpus shingle explode -> segment Bloom
                                    # probe + raw-string confirm (r7 #2 heavy op)
    "dedup_audio_fp_indexed",       # persisted audio fp index probe (probe
                                    # fingerprints only itself; output ~factor^2
                                    # on copies) [factor-capped, see PROBE_FACTOR_CAP]
    "dedup_video_phash_pairs",      # per-frame banded join over demuxed PGM frames
                                    # (copies pair all-with-all -> output ~factor^2)
                                    # [factor-capped, see PROBE_FACTOR_CAP]
    "dedup_video_phash_indexed",    # persisted video frame-index probe (batch
                                    # demuxes only itself; output ~factor^2 on
                                    # copies) [factor-capped, see PROBE_FACTOR_CAP]
    "multimodal_image_rgb_luma",    # truecolor encode -> decode -> luma checksum:
                                    # per-doc codec work, embarrassingly parallel
    "source_warc_records",          # WARC assemble+demux per (source, shard)
                                    # group: blob size ~factor within fixed group
                                    # count — the splittability-unit slope
    "multimodal_decode_quarantine", # permissive decode funnel over seeded
                                    # corruptions (r9): per-doc codec work +
                                    # per-row verdict, embarrassingly parallel —
                                    # the quarantine path must scale like the
                                    # strict decode it replaces
    "multimodal_audio_fingerprint_pcm16",  # 16-bit stereo decode + downmix +
                                    # requantize + fingerprint (r9): the widened
                                    # wire-profile funnel, per-doc work only
    "pipeline_ingestion_multimodal",  # composed decode->phash/audiofp/video
                                    # funnel (r12, VERDICT r11 #6: previously
                                    # unprobed): per-asset batch-codec kernels +
                                    # three persisted index probes; probe batch
                                    # matches every replica copy -> output
                                    # ~factor^2 [factor-capped, see
                                    # PROBE_FACTOR_CAP]
]


#: Columns drawn from one shared key domain must shift by ONE shared
#: offset, or cross-table joins (orders ⋈ lineitem) only match inside
#: replica 0 and the probe measures a structurally different join.
KEY_DOMAINS = {
    ("orders", "o_orderkey"): "orderkey",
    ("lineitem", "l_orderkey"): "orderkey",
}


def _domain_offsets(spark, factor: int) -> dict[str, int]:
    """One offset per shared key domain: max over every participating
    column, so referential integrity holds across replicas."""
    if factor <= 1:
        return {}
    maxes: dict[str, int] = {}
    for (table, col), domain in KEY_DOMAINS.items():
        m = load_table(spark, BASE_SF, table).agg(F.max(col)).collect()[0][0]
        maxes[domain] = max(maxes.get(domain, 0), m)
    return {d: m + 1 for d, m in maxes.items()}


def build_replica(spark, out_dir: str, factor: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    shared = _domain_offsets(spark, factor)
    for table, keys in SHIFTS.items():
        src = load_table(spark, BASE_SF, table)
        if keys and factor > 1:
            offsets = {
                k: (
                    shared[KEY_DOMAINS[(table, k)]]
                    if (table, k) in KEY_DOMAINS
                    else src.agg(F.max(k)).collect()[0][0] + 1
                )
                for k in keys
            }
            parts = []
            for i in range(factor):
                rep = src
                for k, off in offsets.items():
                    rep = rep.withColumn(k, F.col(k) + F.lit(i * off))
                parts.append(rep)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            # multi-file layout: the parallel unit the driver testdata lacks
            out.repartition(32).write.mode("overwrite").parquet(
                f"{out_dir}/{table}.parquet"
            )
        else:
            src.write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")


#: Queries whose TRUE OUTPUT grows quadratically under exact-copy
#: replication (every doc gains factor-1 full-containment partners /
#: every probe's ground-truth neighbors are its copies): past this
#: replication factor the probe measures the replica construction, not
#: the operator — candidates on copies grow ~factor^2 (x900 at 30x) and
#: the run melts down on artifact pairs a real corpus doesn't have.
#: They stay in the 10x probe (committed rows: containment 4.84x,
#: ANN eval 6.95x, both explained in BASELINE.md); skips are LOGGED.
PROBE_FACTOR_CAP = {
    "dedup_containment_pairs": 10,
    "eval_ann_quantized_quality": 10,
    "pipeline_ingestion_curated": 10,
    "dedup_incremental_exact_indexed": 10,
    "dedup_incremental_bloom_gated": 10,
    # dedup_image_phash_indexed runs at 30x since r8 (VERDICT r7 #5) —
    # its ~factor^2 output artifact is documented at the PROBE_QUERIES
    # entry; the probe path itself is corpus-size-independent, which is
    # exactly what the 30x row demonstrates.
    "dedup_audio_fp_indexed": 10,
    "dedup_video_phash_pairs": 10,
    "dedup_video_phash_indexed": 10,
    "pipeline_ingestion_multimodal": 10,
}


def time_queries(spark, sf_dir: str, factor: int = 1) -> dict[str, float]:
    out = {}
    for name in PROBE_QUERIES:
        cap = PROBE_FACTOR_CAP.get(name)
        if cap is not None and factor > cap:
            print(
                f"SKIP {name} at {factor}x (output quadratic under "
                f"exact-copy replication beyond {cap}x; see PROBE_FACTOR_CAP)",
                flush=True,
            )
            continue
        print(f"timing {name} @ {sf_dir}", flush=True)
        fn = QUERIES[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
    return out


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_json = sys.argv[2] if len(sys.argv) > 2 else ""
    # local-mode driver == the executors: give it a production-shaped heap
    # (the default 1g cannot hold 10x broadcast builds; any real cluster
    # sizes driver/executor memory far above that)
    # local-mode: driver heap IS the executor heap shared by 32 task
    # threads. 16g survives the 10x replica; the 30x replica's widest
    # probe queries (ANN eval ground truth, containment posting join on
    # exact-copy replicas) need more execution-pool headroom — the host
    # has 128 GiB, a real cluster would give each executor this much.
    spark = get_spark(
        "kstcw-scale-probe", extra_conf={"spark.driver.memory": "48g"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    replica = f"/tmp/kstcw_scale_{factor}x"
    build_replica(spark, replica, factor)

    base = time_queries(spark, BASE_SF, factor)
    big = time_queries(spark, replica, factor)
    report = {
        "replication": factor,
        "base_sec": base,
        "replicated_sec": big,
        "scaling_factor": {
            k: round(big[k] / base[k], 2) if base[k] > 0 else None for k in base
        },
    }
    line = json.dumps(report)
    print(line)
    if out_json:
        with open(out_json, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
