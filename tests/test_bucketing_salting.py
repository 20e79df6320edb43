"""Bucketed co-located joins (no Exchange) and salted skew joins
(equivalence) — the two manual shuffle-discipline tools the engine
provides beyond AQE."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_the_clojure_way_spark.operators.relational import salted_join
from kafka_streams_the_clojure_way_spark.sources.bucketed import (
    drop_table,
    read_table,
    write_bucketed,
)
from kafka_streams_the_clojure_way_spark.sources.files import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def bucketed_tables(spark):
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_bucketed(li, "li_b", "l_orderkey", 8, sort_by="l_orderkey")
    write_bucketed(o, "o_b", "o_orderkey", 8, sort_by="o_orderkey")
    yield
    drop_table(spark, "li_b")
    drop_table(spark, "o_b")


def test_bucketed_join_skips_the_shuffle(spark, bucketed_tables):
    li, o = read_table(spark, "li_b"), read_table(spark, "o_b")
    joined = li.join(o, li.l_orderkey == o.o_orderkey)
    # disable auto-broadcast so the tiny test tables take the big-big
    # (sort-merge) path — the case bucketing exists for; at real scale
    # neither side would broadcast anyway.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # co-bucketed + co-sorted: no Exchange anywhere in the join plan
    assert "SortMergeJoin" in plan, plan[:1500]
    assert "Exchange" not in plan, plan[:1500]

    # and it computes the same thing as the shuffled path-read join
    expected = (
        load_table(spark, SF, "lineitem")
        .join(
            load_table(spark, SF, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert joined.count() == expected


def test_bucketed_agg_skips_the_shuffle(spark, bucketed_tables):
    li = read_table(spark, "li_b")
    agg = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:1500]


def test_salted_join_equivalence(spark):
    # one hot key (90% of left rows) + a tail
    left = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.createDataFrame(
        [(7, "hot"), (0, "a"), (10, "b"), (20, "c")], "k long, tag string"
    )
    plain = left.join(right, "k")
    salted = salted_join(left, right, "k", n_salt=8)
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
    # outer joins keep unmatched left rows exactly once
    plain_l = left.join(right, "k", "left")
    salted_l = salted_join(left, right, "k", n_salt=8, how="left")
    assert sorted(map(tuple, salted_l.collect())) == sorted(
        map(tuple, plain_l.collect())
    )
