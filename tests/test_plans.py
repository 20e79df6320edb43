"""Physical-plan regression tests: the 100 TB properties we rely on must
survive refactors. These assert plan *shape* (what executes), not timing —
the properties that decide whether a query survives a 1000x scale-up.
"""

from __future__ import annotations

import re

from kafka_streams_the_clojure_way_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    return QUERIES[name](spark, SF)._jdf.queryExecution().executedPlan().toString()


def test_filter_and_pruning_reach_the_scan(spark):
    plan = _plan(spark, "ref_filter_large_purchases")
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    # column pruning: only the 3 needed columns are read
    assert "user_id" in scan and "event_type" in scan and "value" in scan
    assert "props" not in scan and "event_id" not in scan
    # predicate pushdown: the event_type filter reaches the data source
    assert "purchase" in plan.split("PushedFilters")[-1] or "purchase" in scan


def test_star_join_broadcasts_dims_no_fact_shuffle(spark):
    plan = _plan(spark, "join_revenue_by_nation")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan
    # exactly one exchange: the final small aggregation; the fact table
    # itself is never hash-partitioned for a join at this size.
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "partial_sum" in plan  # map-side combine before the shuffle


def test_window_topk_has_partial_group_limit(spark):
    plan = _plan(spark, "window_top3_orders_per_customer")
    # partial WindowGroupLimit below the exchange: mappers emit <=k rows/key
    partial_pos = plan.find("WindowGroupLimit")
    assert partial_pos != -1 and "Partial" in plan
    assert plan.count("WindowGroupLimit") == 2  # Partial + Final


def test_global_topk_is_take_ordered_not_full_sort(spark):
    plan = _plan(spark, "order_top100_orders")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan  # no global sort


def test_semi_join_stays_semi(spark):
    plan = _plan(spark, "join_semi_customers_with_orders")
    assert "LeftSemi" in plan


def test_pricing_summary_partial_aggregation(spark):
    """Q1 runs the fixed-point two-phase shape: phase 1 partial-sums LONG
    units map-side (so the first exchange carries one row per (group,
    partition), never raw rows), phase 2 merges partials as decimal.
    Two exchanges total, both partial-aggregated; long sums stay inside
    whole-stage codegen (no per-row BigDecimal)."""
    plan = _plan(spark, "agg_pricing_summary")
    assert "partial_sum" in plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2
    # the pre-shuffle partial agg sums longs, not decimals
    first_partial = plan.index("partial_sum")
    assert "HashAggregate" in plan[:first_partial + 200]


def test_whole_stage_codegen_covers_scalar_pack(spark):
    plan = _plan(spark, "scalar_string_pack")
    # '*(n)' prefixes mark whole-stage-codegen'd operators in the tree.
    assert "*(1)" in plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python anywhere


def test_no_python_udfs_in_jvm_operators(spark):
    for name in [
        "text_token_stats",
        "text_fingerprint",
        "dedup_simhash_pairs",
        "sim_cosine_topk_bruteforce",
    ]:
        plan = _plan(spark, name)
        assert "BatchEvalPython" not in plan, name
        assert "PythonUDF" not in plan, name
