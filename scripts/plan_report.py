"""Regenerate PLANS.md: the formatted physical plans of the headline
queries, with the scale property each plan is supposed to exhibit. The
plan-audit suite asserts these properties mechanically; this artifact
makes them REVIEWABLE — `.explain("formatted")` output is the ground
truth for "is this the plan you'd want at 100 TB".

Usage: python scripts/plan_report.py [sf_dir] (default sf0.001; writes
PLANS.md at the repo root).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINERS = [
    (
        "ref_topology_large_transactions",
        "Reference flagship (filter→project→union): ZERO exchanges — the whole "
        "topology is one narrow whole-stage-codegen'd pass, matching the "
        "reference's no-shuffle execution.",
    ),
    (
        "tpch_q06_forecast_revenue",
        "Pure scan→aggregate: every predicate pushed to the parquet reader, "
        "partial+final agg, no shuffle of fact rows.",
    ),
    (
        "tpch_q05_local_supplier_revenue",
        "6-table join: dimensions broadcast; only the fact-fact orderkey join "
        "shuffles; region filter prunes before any fact I/O.",
    ),
    (
        "window_top3_orders_per_customer",
        "Per-key top-k: WindowGroupLimit BELOW the shuffle discards non-top-k "
        "rows map-side.",
    ),
    (
        "tpch_q16_part_supplier_counts",
        "NOT IN subquery: broadcast null-aware anti join (LeftAnti, BuildRight, "
        "true) — not a cartesian null check.",
    ),
    (
        "dedup_minhash_lsh_pairs",
        "MinHash-LSH: banding + exact-Jaccard verify over the SHARED "
        "materialized signature table (parquet scans, signed once per "
        "process — r9); candidates from a band equi-join — no all-pairs "
        "comparison anywhere.",
    ),
    (
        "text_ngram_contamination",
        "Contamination: benchmark shingle set broadcast; corpus explode feeds "
        "the probe directly (no shuffle on the shingle string); heavy shingle "
        "transform stays post-exchange.",
    ),
    (
        "text_tfidf_top_terms",
        "TF-IDF: vocabulary (df) table broadcast back into the scored join; "
        "per-doc ranking via WindowGroupLimit partial top-k.",
    ),
    (
        "dedup_incremental_bloom_gated",
        "Exact gate with a Bloom negative fast path: the batch's distinct "
        "segments become a literal PartitionFilter on the bits scan, only "
        "maybe-duplicates reach the (also bucket-pruned) hash-index confirm "
        "join — a mostly-new batch never touches the corpus hash table.",
    ),
    (
        "sample_dsir_resample_topk",
        "Gumbel-top-k importance resampling: hash-derived noise is a "
        "row-local expression over the broadcast-ratio DSIR score; selection "
        "is TakeOrderedAndProject (per-partition top-k, k-row driver merge), "
        "never a global sort.",
    ),
    (
        "text_unigram_logprob",
        "Unigram LM scoring: Zipf-head vocabulary broadcast (head tokens "
        "never shuffle) + low-skew tail shuffle join — the frequency-"
        "partitioned join that survives 'the' being 5% of all tokens.",
    ),
    (
        "meta_corpus_fingerprint",
        "Dataset checksum: scan → map-side partial agg → ONE exchange on the "
        "group key → final agg. Fingerprinting 100 TB is exactly one pass.",
    ),
    (
        "graph_triangle_parts",
        "Triangle counting: degree-ordered edge orientation bounds wedge "
        "work at O(m^1.5); every join is a shuffled equi-join on (node) or "
        "(node, node) keys.",
    ),
    (
        "dedup_ngram_span_documents",
        "Substring-span dedup: ONE posting explode, one gram_hash shuffle "
        "with the duplicate-count riding a window over it (no join-back "
        "recompute), then one doc-keyed sort shared by the lag and "
        "running-sum island windows.",
    ),
    (
        "graph_pagerank_parts",
        "Fixed-point PageRank: per-round state is one (node, rank) frame; "
        "each of the 6 rounds is one equi-join + one partial-aggregating "
        "groupBy, lineage truncated per round — plan size stays O(1) in "
        "iterations.",
    ),
    (
        "sim_ivfpq_topk",
        "IVF-PQ probe path: corpus side is 4-byte codes only; the "
        "(query, cell, subspace, code) lookup table broadcasts, candidates "
        "come from the cell+code equi-join, distances sum as BIGINTs in a "
        "partial-aggregating groupBy.",
    ),
    (
        "agg_heavy_hitter_tokens",
        "Misra-Gries two-pass: the sketch pass emits O(k) rows/partition "
        "(no full-vocabulary shuffle); the recount explode is pruned by a "
        "broadcast semi-join against the candidate set BEFORE any shuffle.",
    ),
    (
        "dq_lineitem_audit",
        "DQ audit: five rule counters are measures of ONE lineitem scan "
        "(count_if columns of a single aggregate); the referential rule is "
        "a broadcast anti-join — never one scan per rule.",
    ),
    (
        "text_bm25_topk",
        "BM25: the explode filters to the query vocabulary immediately (tf "
        "table is O(matching postings), not O(corpus tokens)); df/avgdl/N "
        "broadcast; the global top-k is TakeOrderedAndProject, not a "
        "one-task ranking window.",
    ),
    (
        "sample_dsir_logweights",
        "DSIR: both hashed-bucket unigram models come from ONE "
        "conditional-agg token pass; the 256-row ratio table broadcasts "
        "into the per-doc scoring join — nothing grows with vocabulary.",
    ),
    (
        "dedup_semantic_cluster_flags",
        "SemDeDup: the near-dup pair comparison is a cluster-keyed "
        "equi-join (sum n_c^2, never N^2); the only nested-loop node is "
        "the k-row broadcast centroid cross of the kmeans assignment.",
    ),
    (
        "dedup_incremental_indexed",
        "Persisted-index dedup serve path: the postings scan carries a "
        "STATIC PartitionFilter built from the batch's distinct "
        "(band, bucket) keys — only probed directories are read; the "
        "band join broadcasts the batch side; the corpus is never "
        "re-signed (its signatures come from the index's shingle table).",
    ),
    (
        "meta_shard_assignments",
        "Token-budgeted shard export map: the corpus-sized running sum "
        "is per-source windows; the cross-source offsets come from a "
        "|sources|-row aggregate broadcast back — no corpus rows ever "
        "pass through a single-partition window.",
    ),
    (
        "text_bpe_token_stats",
        "Greedy-subword token accounting, distinct-word form: the fold "
        "runs once per DISTINCT word (Zipf), counts re-join the "
        "occurrence stream (AQE broadcasts the vocab side at this "
        "scale; degrades to a key-hash join when a vocabulary outgrows "
        "broadcast), one per-doc sum — no Python anywhere.",
    ),
    (
        "dedup_line_level_stats",
        "C4-style line dedup: ONE corpus scan; canonical ownership is a "
        "min window over the line partition (no self-join, no second "
        "scan), then one per-doc re-aggregate — two shuffles total.",
    ),
    (
        "dedup_image_phash_indexed",
        "pHash band-index probe: the batch signs ONLY itself "
        "(mapInPandas), its distinct routing keys become literal "
        "band/bucket partition filters on the postings scan (bkey "
        "resolves exactly in the candidate equi-join), and the probe "
        "side broadcasts — per-batch cost independent of corpus size.",
    ),
    (
        "dedup_audio_fp_pairs",
        "Frame-fingerprint audio pairs over the shared materialized "
        "fingerprint table (r9): df-capped (frame_idx, fp) "
        "posting equi-join — the left-semi cap filter runs BEFORE the "
        "pair join, so no boilerplate fingerprint can fan out "
        "quadratically; verify is a grouped count, never waveforms.",
    ),
    (
        "dedup_audio_fp_indexed",
        "Audio fp-index probe: probe fingerprints come from the shared "
        "signature table (one filter — r9); <=128 distinct fps become a "
        "literal fp PartitionFilter on the postings scan, the persisted "
        "drop list anti-joins (cap semantics == fresh rebuild), and the "
        "probe side broadcasts into the (frame_idx, fp) equi-join.",
    ),
    (
        "dedup_video_phash_indexed",
        "Video frame-index probe: probe frame hashes come from the "
        "shared signature table (r9); distinct (band, bucket) keys become a literal "
        "PartitionFilter (21-bit band keys hash into 64 buckets per "
        "band), candidates must match (band, bkey, frame_idx) exactly, "
        "and the per-pair close-frame count is a grouped aggregate.",
    ),
    (
        "multimodal_decode_quarantine",
        "Permissive decode over seeded corruptions (r9): ONE mapInPandas "
        "funnel — per-asset errors become quarantine rows inside the "
        "kernel, no shuffle, no driver round-trip; plan identical to the "
        "strict decode it replaces.",
    ),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from kafka_streams_the_clojure_way_spark import get_spark
    from kafka_streams_the_clojure_way_spark.queries import QUERIES

    spark = get_spark("kstcw-plan-report")
    spark.sparkContext.setLogLevel("ERROR")

    out = [
        "# PLANS — headline physical plans (generated by scripts/plan_report.py)",
        "",
        f"Source scale: `{sf_dir}`. Regenerate after plan-affecting changes;",
        "tests/test_plan_audit.py asserts the properties below mechanically.",
        "",
    ]
    for name, claim in HEADLINERS:
        df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        out += [f"## {name}", "", claim, "", "```", plan.strip(), "```", ""]
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PLANS.md"), "w") as fh:
        fh.write("\n".join(out))
    print(f"wrote PLANS.md ({len(HEADLINERS)} plans)")


if __name__ == "__main__":
    main()
