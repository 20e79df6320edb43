"""Physical-plan audit: the scale properties the engine PROMISES —
pushdown, pruning, broadcastability, partial top-k, shuffle discipline —
asserted on the actual Catalyst plans of registered queries, so a
regression in plan shape fails CI even while results stay correct.

(Results-level correctness lives in the oracle gate; this file is the
"would it still be fast at 1000x" gate.)
"""

from __future__ import annotations

import re

from kafka_streams_the_clojure_way_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_small_dim_joins_broadcast(spark):
    """nation/region/customer-geo joins must be broadcast, never
    sort-merge: the dims are tiny at ANY scale factor."""
    for q in ["join_broadcast_customer_geo", "join_revenue_by_nation"]:
        p = _plan(spark, q)
        assert "BroadcastHashJoin" in p, q
        assert "SortMergeJoin" not in p, q


def test_filter_reaches_parquet_scan(spark):
    """The reference pipeline's predicate must appear as a pushed parquet
    filter — not a post-scan Filter only."""
    p = _plan(spark, "ref_filter_large_purchases")
    m = re.search(r"PushedFilters: \[([^\]]*)\]", p)
    assert m and "event_type" in m.group(1), p[:2000]


def test_column_pruning_reaches_scan(spark):
    """agg_pricing_summary touches 7 of lineitem's 16 columns; the scan's
    ReadSchema must not include untouched wide columns."""
    p = _plan(spark, "agg_pricing_summary")
    m = re.search(r"FileScan parquet \[([^\]]*)\]", p)
    assert m is not None, p[:2000]
    read_cols = m.group(1)
    assert "l_comment" not in read_cols and "l_shipinstruct" not in read_cols
    assert "l_quantity" in read_cols


def test_topk_uses_partial_window_limit(spark):
    """Per-key top-k must run the partial WindowGroupLimit below the
    shuffle (rank filter pushed into map side), not rank-everything."""
    p = _plan(spark, "window_top3_orders_per_customer")
    assert "WindowGroupLimit" in p


def test_semi_anti_join_strategies(spark):
    assert "LeftSemi" in _plan(spark, "join_semi_customers_with_orders")
    assert "LeftAnti" in _plan(spark, "join_anti_customers_without_orders")


def test_reference_pipeline_has_no_shuffle(spark):
    """The whole reference surface is stateless map/filter/union — its
    plans must contain NO exchange at all (SURVEY §2.3: 'no shuffle in
    the whole reference')."""
    for q in [
        "ref_filter_large_purchases",
        "ref_map_donations_cents_to_dollars",
        "ref_merge_large_transactions",
        "ref_topology_large_transactions",
    ]:
        assert "Exchange" not in _plan(spark, q), q


def test_aggregates_are_partial_then_final(spark):
    """groupBy must show two HashAggregate levels (map-side partial +
    final) so the shuffle carries aggregated rows, not the fact table."""
    p = _plan(spark, "agg_pricing_summary")
    assert len(re.findall(r"HashAggregate", p)) >= 2


def test_exists_rewrites_to_semi_anti_joins(spark):
    """Correlated EXISTS / NOT EXISTS must lower to LeftSemi/LeftAnti
    joins (RewritePredicateSubquery), never per-row subquery execution."""
    p = _plan(spark, "subq_exists_interrupted_customers")
    assert "LeftSemi" in p and "LeftAnti" in p
    assert "Subquery" not in p


def test_global_topk_is_takeordered(spark):
    """ORDER BY + LIMIT must plan as TakeOrderedAndProject (per-partition
    heap + merge), never a global sort."""
    p = _plan(spark, "order_top100_orders")
    assert "TakeOrderedAndProject" in p
    assert "Exchange rangepartitioning" not in p


def test_tpch_pack_plan_shapes(spark):
    """The TPC-H-flavored pack's scale claims (queries/tpch.py):
    dimension sides broadcast, disjunctive part-predicates pushed into
    the broadcast side's scan, the q21 EXISTS/NOT-EXISTS legs planned as
    semi/anti joins, and q14's single-scan conditional aggregation."""
    # q19: broadcast join; the p_brand disjunction reaches the part scan
    p19 = _plan(spark, "tpch_q19_disjunctive_revenue")
    assert "BroadcastHashJoin" in p19 and "SortMergeJoin" not in p19
    assert "p_brand" in p19 and re.search(r"PushedFilters: \[[^\]]*Or", p19)

    # q21: one semi + one anti self-join, no per-row subquery
    p21 = _plan(spark, "tpch_q21_sole_return_suppliers")
    assert "LeftSemi" in p21 and "LeftAnti" in p21
    assert "Subquery" not in p21

    # q14: part broadcast; exactly one shuffle (the month agg) feeding
    # partial+final HashAggregate
    p14 = _plan(spark, "tpch_q14_promo_revenue")
    assert "BroadcastHashJoin" in p14
    assert len(re.findall(r"HashAggregate", p14)) >= 2

    # q13: COUNT(col) outer-join aggregate keeps zero-order customers;
    # plan must be a single join (no subquery) with two agg levels
    p13 = _plan(spark, "tpch_q13_customer_distribution")
    assert "Join LeftOuter" in p13 or "LeftOuter" in p13
    assert len(re.findall(r"HashAggregate", p13)) >= 4


def test_tpch_pack2_plan_shapes(spark):
    """Scale claims of the second TPC-H pack (queries/tpch.py): Q6's
    predicates all reach the parquet scan with zero exchanges, the
    multi-join shapes broadcast every dimension, and Q18 broadcasts the
    aggregated (tiny) side of its join-back."""
    # q6: pure scan→agg — every predicate pushed, no shuffle exchange
    p6 = _plan(spark, "tpch_q06_forecast_revenue")
    # (toString truncates the PushedFilters list, so check the prefix and
    # the full predicate's presence in the Filter node)
    m = re.search(r"PushedFilters: \[([^\]]*)", p6)
    assert m and "l_shipda" in m.group(1)
    assert "l_discount" in p6 and "l_quantity" in p6
    assert "Exchange hashpartitioning" not in p6
    assert "Join" not in p6

    # q5/q7/q8/q9: dims broadcast; exactly the fact-fact joins sort-merge
    for q in [
        "tpch_q05_local_supplier_revenue",
        "tpch_q07_nation_volume",
        "tpch_q08_market_share",
        "tpch_q09_product_profit",
    ]:
        p = _plan(spark, q)
        assert "BroadcastHashJoin" in p, q

    # q18: the HAVING-aggregate side is broadcast into the join-back
    p18 = _plan(spark, "tpch_q18_large_orders")
    assert "BroadcastHashJoin" in p18
    # q15: the per-supplier revenue agg feeds both the max subquery and
    # the probe side — AQE must compute it ONCE (ReusedExchange), not
    # scan lineitem twice. Needs the executed (final) adaptive plan.
    df15 = QUERIES["tpch_q15_top_supplier"](spark, SF)
    df15.collect()
    p15 = df15._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in p15

    # q4: EXISTS planned as a semi join
    p4 = _plan(spark, "tpch_q04_priority_slow_ships")
    assert "LeftSemi" in p4


def test_window_value_pack_single_window_node(spark):
    """lag/lead/first/last/nth share partition keys + ordering, so they
    must collapse into ONE Window node — one shuffle, one sort."""
    p = _plan(spark, "window_value_pack")
    assert len(re.findall(r"\bWindow \[", p)) == 1
    assert len(re.findall(r"Exchange hashpartitioning", p)) == 1


def test_not_in_plans_null_aware_anti_join(spark):
    """NOT IN (subquery) must plan as a broadcast NULL-aware anti join
    (the trailing `true` flag on the LeftAnti BHJ) — not a cartesian
    null-check. Distinct from NOT EXISTS' plain LeftAnti."""
    p = _plan(spark, "tpch_q16_part_supplier_counts")
    assert re.search(r"LeftAnti, BuildRight, true", p), p[:2000]


def test_tpch_pack3_plan_shapes(spark):
    """Scale claims of the Q2/Q11/Q12/Q20 pack (queries/tpch.py): the
    correlated-MIN and correlated-total shapes must use a single Window
    over the correlation key (no decorrelation self-join of the grouped
    frame), dimension sides broadcast, and Q12's lineitem predicates
    reach the scan before the orderkey shuffle."""
    import re

    # q2: window-min decorrelation — exactly one Window node, dims broadcast
    p2 = _plan(spark, "tpch_q02_min_cost_supplier")
    assert len(re.findall(r"\bWindow \[", p2)) == 1
    assert "BroadcastHashJoin" in p2 and "SortMergeJoin" not in p2

    # q11: grouped frame reused for total + filter (scalar side broadcast)
    p11 = _plan(spark, "tpch_q11_important_part_values")
    assert "BroadcastNestedLoopJoin" in p11 or "BroadcastHashJoin" in p11

    # q12: returnflag + shipdate predicates pushed to the lineitem scan
    # (several scans in the plan — check every PushedFilters list)
    p12 = _plan(spark, "tpch_q12_priority_by_returnflag")
    pushed = " ".join(re.findall(r"PushedFilters: \[([^\]]*)", p12))
    assert "l_returnflag" in pushed or "l_shipda" in pushed, p12[:2000]

    # q20: window-sum share filter then semi join; no self-join of pq
    p20 = _plan(spark, "tpch_q20_dominant_promo_suppliers")
    assert len(re.findall(r"\bWindow \[", p20)) == 1
    assert "LeftSemi" in p20


def test_contamination_benchmark_side_broadcast(spark):
    """text_ngram_contamination promises the benchmark shingle set is
    broadcast — the corpus side must never shuffle on the shingle string
    (only the final per-doc aggregate shuffles, on doc_id)."""
    p = _plan(spark, "text_ngram_contamination")
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p
    # at most ONE exchange on the shingle string — the distinct() inside
    # the tiny benchmark build side; the exploded corpus must go straight
    # from Generate into the broadcast probe.
    assert len(re.findall(r"Exchange hashpartitioning\(s#", p)) <= 1, p[:2000]


def test_runtime_bloom_filter_prunes_fact_side(spark):
    """Runtime row-level filtering: a selective dimension filter on one
    side of a shuffle join must inject a bloom-filter probe into the
    fact-side scan (Spark's runtime filtering, the row-group-skipping
    complement to dynamic partition pruning). Thresholds are lowered to
    make the kB-scale test tables eligible — at 100 TB the defaults
    (10 MB creation side) trigger on real dimension filters."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        # the probe side must look "big enough to be worth filtering" —
        # the default is 10GB, far above the kB-scale test scan
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtimeFilter.number.threshold": "10",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force shuffle join
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        o = spark.read.parquet(f"{SF}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderpriority"
        ).count()
        p = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom" in p.lower() or "might_contain" in p.lower(), p[:3000]
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)


def test_tfidf_and_funnel_plan_shapes(spark):
    """TF-IDF must rank via WindowGroupLimit (only <=k rows per doc cross
    the final exchange) with the vocabulary side broadcast; the funnel's
    three user_id stages must not multiply shuffles (every exchange is on
    user_id, and there are at most 3)."""
    p = _plan(spark, "text_tfidf_top_terms")
    assert "WindowGroupLimit" in p
    assert "BroadcastHashJoin" in p

    pf = _plan(spark, "funnel_view_to_purchase")
    ex = re.findall(r"Exchange hashpartitioning\((\w+)#", pf)
    assert ex and all(c == "user_id" for c in ex), ex
    assert len(ex) <= 4, pf[:2000]


def test_no_accidental_cartesian_products(spark):
    """Sweep EVERY registered query's physical plan: no cartesian /
    unconditioned nested-loop join may appear unless the query is
    explicitly about one. A dropped join condition silently becomes an
    O(n*m) plan — this catches it at CI time across the whole registry."""
    allowed = {
        "join_cross_region_pairs",  # deliberately a cross join
        # IVF coarse quantization IS an all-pairs scoring of every vector
        # against the (tiny, broadcast) centroid table — BNLJ by design
        "sim_ivf_ann_topk",
        # the persisted-index serve path and the IVF quality eval route
        # their PROBE sets against the same tiny broadcast centroid
        # table (the corpus side is the pruned postings scan / the
        # bounded brute-force truth) — same by-design shape
        "sim_ivf_index_topk",
        # the tombstone serve path is the same probe-vs-broadcast-
        # centroid routing; deletes are a broadcast ANTI join on top
        "sim_ivf_index_tombstone_topk",
        "eval_ann_ivf_quality",
        # Lloyd assignment scores every vector against the k-row broadcast
        # centroid table each round — same tiny-broadcast BNLJ shape
        "cluster_kmeans_embeddings",
        "sample_cluster_balanced_embeddings",
        # IVF-PQ routes every vector against the same tiny broadcast
        # centroid table (the sim_ivf_ann_topk shape) before residual
        # encoding — BNLJ by design
        "sim_ivfpq_topk",
        # SemDeDup composes the same Lloyd assignment (k-row broadcast
        # centroid cross); its PAIR join is separately pinned as
        # cluster-keyed by test_semdedup_pair_join_is_cluster_keyed
        "dedup_semantic_cluster_flags",
        # the five-gate pipeline's semantic gate routes its (batch-
        # bounded) probe vectors against the same tiny broadcast
        # centroid table — the sim_ivf_index_topk shape; the candidate
        # join itself is an equi-join on the cell partition column
        "pipeline_ingestion_semantic",
        # the six-gate topology ends in the same semantic gate, so it
        # inherits the probe-vs-broadcast-centroid routing too
        "pipeline_ingestion_decontaminated",
        # the drop-attribution audit compiles the same five-gate
        # topology (semantic gate included), so it inherits the same
        # probe-vs-broadcast-centroid routing
        "pipeline_ingestion_audit",
        # the funnel rollup is the audit plus one groupBy — same
        # inherited probe-vs-broadcast-centroid routing
        "pipeline_ingestion_funnel",
        # the clustering eval composes the Lloyd assignment (k-row
        # broadcast centroid cross, the cluster_kmeans_embeddings
        # shape); its own arithmetic is 1-row broadcast crosses over
        # the contingency marginals
        "eval_cluster_label_agreement",
        # nearest-class-mean assignment scores every vector against the
        # |labels|-row broadcast centroid table — the Lloyd-assignment
        # tiny-broadcast BNLJ shape
        "sim_centroid_classify",
    }
    offenders = {}
    for name in sorted(QUERIES):
        if name in allowed:
            continue
        try:
            p = _plan(spark, name)
        except Exception:
            continue  # non-plannable here (e.g. needs extra env) — other tests cover
        if "CartesianProduct" in p:
            offenders[name] = "CartesianProduct"
        # BroadcastNestedLoopJoin is fine only for 1-row scalar sides
        # (threshold joins); flag the unconditioned inner form
        if re.search(r"BroadcastNestedLoopJoin BuildRight, Inner\s*$", p, re.M):
            offenders.setdefault(name, "unconditioned BNLJ")
    assert not offenders, offenders


def test_runtime_bloom_filter_prunes_fact_fact_join(spark):
    """Runtime bloom-filter injection (SPARK-32268): when a selective
    filter sits on one side of a shuffle join, Spark builds a bloom
    filter of the filtered side's join keys and applies it as a
    might_contain predicate on the OTHER side's scan — at 100 TB this
    prunes most of the probe-side shuffle for selective fact-fact joins,
    the case broadcast can't cover. Thresholds here are forced low only
    because the test tables are tiny; the assertion is that the feature
    engages on our plans at all (a Spark-version or conf regression
    would silently drop it)."""
    from pyspark.sql import functions as F

    from kafka_streams_the_clojure_way_spark.sources.files import load_table

    tuned = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in tuned}
    try:
        for k, v in tuned.items():
            spark.conf.set(k, v)
        li = load_table(spark, SF, "lineitem")
        o = load_table(spark, SF, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan[:3000]
        assert "bloom_filter_agg" in plan, plan[:3000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_metadata_stats_aggregate_pushed_to_footer(spark):
    """metadata_stats must answer count/min/max from parquet footer
    statistics: the v2 scan node carries PushedAggregation — if a Spark
    upgrade or conf change silently degrades this to a full scan, the
    answer stays right but the 100 TB cost story breaks; pin the plan."""
    from kafka_streams_the_clojure_way_spark.sources.files import metadata_stats

    df = metadata_stats(
        spark, f"{SF}/orders.parquet", min_cols=("o_custkey",), max_cols=("o_custkey",)
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PushedAggregation: \[([^\]]*)\]", plan)
    assert m and "COUNT" in m.group(1).upper() and "MIN" in m.group(1).upper(), (
        plan[:2000]
    )


def test_join_strategy_hints_obeyed(spark):
    """Join-strategy knobs the engine relies on at scale: SHUFFLE_HASH
    skips both sort passes when one side comfortably fits a hash table
    per partition (sort-merge's sorts dominate for medium x large);
    MERGE forces sort-merge where hash tables would spill. A Spark
    regression in hint handling would silently flip these strategies."""
    from pyspark.sql import functions as F

    from kafka_streams_the_clojure_way_spark.sources.files import load_table

    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = load_table(spark, SF, "lineitem")
        o = load_table(spark, SF, "orders")
        hashed = li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
        assert "ShuffledHashJoin" in hashed._jdf.queryExecution().executedPlan().toString()
        merged = li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
        assert "SortMergeJoin" in merged._jdf.queryExecution().executedPlan().toString()
    finally:
        if saved is None:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        else:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_unigram_head_join_broadcasts(spark):
    """text_unigram_logprob's Zipf-head fix: the head-vocabulary join and
    the head-exclusion anti-join must both be broadcast (map-side) — only
    the low-skew tail may shuffle on token."""
    p = _plan(spark, "text_unigram_logprob")
    assert p.count("BroadcastHashJoin") >= 2, p[:3000]
    assert "BroadcastHashJoin LeftAnti" in p or "LeftAnti, BuildRight" in p, p[:3000]


def test_fingerprint_is_partial_agg_only(spark):
    """meta_corpus_fingerprint must be scan -> partial agg -> one
    exchange on the group key -> final agg: no join, no extra shuffle —
    the checksum of 100 TB is exactly one pass."""
    p = _plan(spark, "meta_corpus_fingerprint")
    assert p.count("Exchange") == 1, p[:3000]
    assert "Join" not in p, p[:3000]
    assert p.count("HashAggregate") == 2, p[:3000]  # partial + final


def test_triangle_joins_are_equi(spark):
    """Every join in the triangle pipeline must be an equi-join (hash or
    sort-merge) — a dropped wedge key would cartesian a 100 TB edge set."""
    p = _plan(spark, "graph_triangle_parts")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_ngram_span_plan_shape(spark):
    """Span dedup over the SHARED materialized posting table (r10):
    ZERO explodes in the query plan — gram hashing ran once at table
    build, so the plan is a 3-column parquet scan of the postings
    feeding one gram_hash window shuffle (the count rides a window
    over that partitioning — a groupBy + join-back would scan twice),
    no join at all, and the lag + running-sum island merge sharing one
    sort + one shuffle by doc."""
    p = _plan(spark, "dedup_ngram_span_documents")
    assert "CartesianProduct" not in p and "Join" not in p
    assert "Generate explode" not in p, p[:3000]  # shared-table upstream
    assert re.search(r"FileScan parquet \[doc_id[^\]]*gram_hash", p), p[:3000]
    assert p.count("Window") == 3, p[:3000]  # gram count + lag + running sum
    assert len(re.findall(r"Sort \[doc_id", p)) == 1, p[:3000]


def test_heavy_hitter_recount_broadcasts(spark):
    """The Misra-Gries recount pass must broadcast the tiny candidate
    set against the exploded token stream — a shuffled join here would
    re-create the full-vocabulary shuffle the sketch exists to avoid."""
    p = _plan(spark, "agg_heavy_hitter_tokens")
    assert "BroadcastHashJoin" in p, p[:3000]
    assert "SortMergeJoin" not in p, p[:3000]


def test_pagerank_joins_are_equi(spark):
    """Every per-iteration join in the PageRank loop must be an
    equi-join — the contribution join keys on src, the rank update on
    node; a dropped key would cartesian the edge set each round."""
    p = _plan(spark, "graph_pagerank_parts")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_pq_adc_lut_broadcasts(spark):
    """PQ's ADC attach must broadcast the per-query LUT-array side
    against the packed corpus codes (r12: a broadcast cross + row-local
    M-term fold) — the corpus side must never shuffle for a
    probe-set-sized LUT, and the fold must stay row-local (no
    groupBy(query, vector) Exchange of the corpus x queries candidates:
    the only shuffle below the ranking window is the top-k's own)."""
    p = _plan(spark, "sim_pq_adc_topk")
    assert "BroadcastNestedLoopJoin" in p, p[:3000]
    assert "SortMergeJoin" not in p, p[:3000]
    assert "ShuffledHashJoin" not in p, p[:3000]
    # the IVF-PQ twin routes per cell: its LUT attach is a broadcast
    # equi-join on cell over the packed codes — same no-corpus-shuffle
    # contract
    p2 = _plan(spark, "sim_ivfpq_topk")
    assert "BroadcastHashJoin" in p2, p2[:3000]
    assert "SortMergeJoin" not in p2, p2[:3000]


def test_dq_audit_rules_are_one_scan(spark):
    """The five row-level DQ rules must be measures of a single
    aggregate (count_if columns of one scan) and the referential rule a
    broadcast anti-join — never one scan per rule."""
    p = _plan(spark, "dq_lineitem_audit")
    assert len(re.findall(r"FileScan parquet .*lineitem", p)) <= 3, p[:3000]
    assert "LeftAnti" in p, p[:3000]


def test_bm25_topk_is_take_ordered(spark):
    """text_bm25_topk's global top-k must compile to
    TakeOrderedAndProject (per-partition partial top-k merged on the
    driver) — a global ranking window would drag every scored doc to one
    task; the idf/stats sides must broadcast."""
    p = _plan(spark, "text_bm25_topk")
    assert "TakeOrderedAndProject" in p, p[:3000]
    assert "BroadcastHashJoin" in p, p[:3000]


def test_dsir_ratio_joins_broadcast(spark):
    """sample_dsir_logweights' 256-row bucket-ratio table must broadcast
    into the per-doc scoring join — it is model-sized by construction
    (hashed features), never corpus-sized."""
    p = _plan(spark, "sample_dsir_logweights")
    assert "BroadcastHashJoin" in p, p[:3000]
    assert "SortMergeJoin" not in p, p[:3000]


def test_bigram_lm_head_join_broadcasts(spark):
    """text_bigram_logprob's Zipf-head policy (same as the unigram LM):
    the hot-bigram join and the head-exclusion anti-join must both be
    map-side broadcasts — only the near-uniform tail may shuffle."""
    p = _plan(spark, "text_bigram_logprob")
    assert p.count("BroadcastHashJoin") >= 2, p[:3000]
    assert "BroadcastHashJoin LeftAnti" in p or "LeftAnti, BuildRight" in p, p[:3000]


def test_semdedup_pair_join_is_cluster_keyed(spark):
    """dedup_semantic_cluster_flags' pair comparison must be an
    equi-join ON CLUSTER — a cartesian pair join would be N^2 at any
    corpus size, defeating SemDeDup's entire point. (The kmeans
    assignment's k-row broadcast centroid cross legitimately appears as
    a BroadcastNestedLoopJoin — bounded by k, documented in
    operators/clustering.py — so the pin targets the PAIR join's keys,
    not the mere presence of a nested-loop node.)"""
    p = _plan(spark, "dedup_semantic_cluster_flags")
    assert "CartesianProduct" not in p, p[:3000]
    assert re.search(
        r"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)[^\n]*\[cluster", p
    ), p[:3000]


def test_hof_lambdas_bind_token_split_once(spark):
    """The let_col discipline (functions/portable.py): per-element HOF
    lambdas must slice a BOUND token array, never close over the split
    expression — Catalyst re-evaluates closed-over subtrees per element,
    turning shingling into O(len^2) per document (measured 8x wall at
    sf0.1 before the fix). Mechanical pin: the tokenizing split must
    appear exactly ONCE in each shingle/gram/chunk plan's Generate
    stage-expression, not once per lambda reference."""
    for q in [
        "text_ngram_contamination",   # shingles_col
        "dedup_ngram_span_documents", # _gram_postings
        "text_chunk_windows",         # chunk windows
        "dedup_line_level_stats",     # line_occurrences
    ]:
        p = _plan(spark, q)
        for gen in re.findall(r"Generate explode[^\n]*", p):
            n_splits = gen.count("split(lower(trim(")
            assert n_splits <= 1, (q, n_splits, gen[:500])


def test_bloom_positions_hash_once_per_key(spark):
    """_bloom_bit_rows must evaluate its md5-based hash ONCE per key:
    the k member positions + the segment all derive from one let-bound
    hash. Inline, each of the k+1 expressions re-ran the md5 (k+1
    md5s/key over every distinct probe gram)."""
    p = _plan(spark, "meta_keyset_index_layout")
    for gen in re.findall(r"Generate explode[^\n]*", p):
        assert gen.count("md5(") <= 1, (gen.count("md5("), gen[:500])
