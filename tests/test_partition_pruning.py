"""Partition-layout scale features: hive-style partitioned writes, static
partition pruning (filters prune directories before I/O), and dynamic
partition pruning (a filtered dimension prunes fact partitions at
runtime). The testdata parquet is unpartitioned, so these tests lay out a
partitioned copy in tmp and audit the scan nodes — the same
"would it still be fast at 1000x" contract as tests/test_plan_audit.py."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from kafka_streams_the_clojure_way_spark.sources.files import (
    load_table,
    read_partitioned,
    write_partitioned,
)

SF = "/root/testdata/sf0.001"


def _partitioned_orders(spark, tmp_path) -> str:
    path = str(tmp_path / "orders_by_year")
    o = load_table(spark, SF, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    write_partitioned(o, path, "o_year")
    return path


def test_static_partition_pruning(spark, tmp_path):
    path = _partitioned_orders(spark, tmp_path)
    df = read_partitioned(spark, path).filter(F.col("o_year") == 1997)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the year filter must land in PartitionFilters (directory pruning),
    # NOT in PushedFilters/post-scan Filter (row pruning after I/O)
    m = re.search(r"PartitionFilters: \[([^\]]*)", plan)
    assert m and "o_year" in m.group(1), plan[:2000]
    # and the pruned read returns exactly the batch-filtered rows
    expected = (
        load_table(spark, SF, "orders")
        .filter(F.year("o_orderdate") == 1997)
        .count()
    )
    assert df.count() == expected > 0


def test_partition_values_roundtrip(spark, tmp_path):
    """Partition columns come back as real columns with correct values
    (they live in directory names, not data files)."""
    path = _partitioned_orders(spark, tmp_path)
    got = dict(
        read_partitioned(spark, path)
        .groupBy("o_year")
        .count()
        .collect()
    )
    want = dict(
        load_table(spark, SF, "orders")
        .groupBy(F.year("o_orderdate").alias("y"))
        .count()
        .collect()
    )
    assert got == want


def test_dynamic_partition_pruning(spark, tmp_path):
    """Joining the partitioned fact to a *filtered* dimension must inject
    a runtime subquery filter on the partition column (DPP) — at 100 TB
    this is the difference between scanning 7 years and 1."""
    path = _partitioned_orders(spark, tmp_path)
    fact = read_partitioned(spark, path)
    # the dim filter is on an attribute (NOT the join key), so Catalyst
    # cannot constant-fold it into a static partition filter — only DPP
    # can prune the fact side, from the dim's surviving join keys.
    dim = spark.createDataFrame(
        [(y, "pick" if y == 1997 else "skip") for y in range(1995, 2002)],
        "o_year int, tag string",
    ).filter(F.col("tag") == "pick")
    joined = fact.join(F.broadcast(dim), "o_year")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:3000]
    assert joined.count() > 0
