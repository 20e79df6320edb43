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


def test_dynamic_partition_overwrite_touches_only_written_slices(spark, tmp_path):
    """overwrite_partitions must replace only the partitions present in
    the incoming frame — the incremental-backfill contract (static
    overwrite would empty the rest of the table)."""
    from pyspark.sql import functions as F

    from kafka_streams_the_clojure_way_spark.sources.files import (
        load_table,
        overwrite_partitions,
        write_partitioned,
    )

    path = str(tmp_path / "orders_by_status")
    orders = load_table(spark, SF, "orders")
    write_partitioned(orders, path, "o_orderstatus")
    before = spark.read.parquet(path)
    other_before = before.filter(F.col("o_orderstatus") != "F").count()
    assert other_before > 0

    # "reprocess" one slice: keep only half the F rows
    fixed = (
        spark.read.parquet(path)
        .filter((F.col("o_orderstatus") == "F") & (F.col("o_orderkey") % 2 == 0))
    )
    fixed_n = fixed.count()
    overwrite_partitions(fixed, path, "o_orderstatus")

    after = spark.read.parquet(path)
    assert after.filter(F.col("o_orderstatus") == "F").count() == fixed_n
    # untouched partitions intact
    assert after.filter(F.col("o_orderstatus") != "F").count() == other_before
