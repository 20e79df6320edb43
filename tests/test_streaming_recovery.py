"""Checkpoint recovery: a restarted streaming query must resume from its
checkpoint — reprocessing nothing, with keyed state carried over. This is
the property that makes long-running production streams survivable
(driver crash, deploy, rescale), and it's the reason every write path in
the engine demands a checkpointLocation."""

from __future__ import annotations

import datetime as dt

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from kafka_streams_the_clojure_way_spark.sources.memory import drain
from kafka_streams_the_clojure_way_spark.streaming.state import running_totals

import pytest

# slow tier (r12): multi-minute suite, deselected by default (pytest.ini)
pytestmark = pytest.mark.slow

SCHEMA = StructType(
    [
        StructField("ts", TimestampType()),
        StructField("user", StringType()),
        StructField("value", DoubleType()),
        StructField("seq", LongType()),
    ]
)

BASE = dt.datetime(2024, 1, 1)


def _run_once(spark, in_dir, ckpt, out_dir):
    """availableNow run writing update-mode emissions via foreachBatch —
    the sink that DOES support checkpoint recovery (memory does not) and
    the idiomatic escape hatch for arbitrary batch writes per trigger."""
    stream = running_totals(
        spark.readStream.schema(SCHEMA).parquet(f"{in_dir}/*"), "user", "value"
    )

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        stream.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    drain(q)
    spark.read.parquet(out_dir).createOrReplaceTempView("__rec_out")
    rows = spark.sql(
        """SELECT key, total, n FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY key ORDER BY n DESC) rn
             FROM __rec_out) WHERE rn = 1"""
    ).collect()
    return {r.key: (r.total, r.n) for r in rows}


def test_restart_resumes_state_without_reprocessing(spark, tmp_path):
    in_dir = tmp_path / "rec_in"
    in_dir.mkdir()
    ckpt = str(tmp_path / "rec_ckpt")

    spark.createDataFrame(
        [(BASE, "a", 10.0, 1), (BASE, "b", 5.0, 2)], SCHEMA
    ).write.parquet(str(in_dir / "f1.parquet"))
    first = _run_once(spark, in_dir, ckpt, str(tmp_path / "out1"))
    assert first == {"a": (10.0, 1), "b": (5.0, 1)}

    # new data lands while the query is DOWN; restart from the checkpoint
    spark.createDataFrame(
        [(BASE, "a", 7.0, 3), (BASE, "c", 1.0, 4)], SCHEMA
    ).write.parquet(str(in_dir / "f2.parquet"))
    second = _run_once(spark, in_dir, ckpt, str(tmp_path / "out2"))

    # run 2's update-mode output contains ONLY keys touched by f2 — proof
    # f1 was not reprocessed — and 'a' continues from its prior state.
    assert set(second) == {"a", "c"}
    assert second["a"] == (17.0, 2)  # 10.0 (from state) + 7.0
    assert second["c"] == (1.0, 1)


def test_rocksdb_state_store_provider(spark, tmp_path):
    """Keyed state on the RocksDB provider — the production choice once
    state outgrows the JVM heap (the default HDFS-backed provider keeps
    every key in executor memory; RocksDB spills to local disk with
    changelog checkpointing). Same operator, same results."""
    provider = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
    try:
        in_dir = tmp_path / "rocks_in"
        in_dir.mkdir()
        spark.createDataFrame(
            [(BASE, "a", 10.0, 1), (BASE, "b", 5.0, 2)], SCHEMA
        ).write.parquet(str(in_dir / "f1.parquet"))
        first = _run_once(
            spark, in_dir, str(tmp_path / "rocks_ckpt"), str(tmp_path / "out1")
        )
        assert first == {"a": (10.0, 1), "b": (5.0, 1)}

        spark.createDataFrame(
            [(BASE, "a", 7.0, 3)], SCHEMA
        ).write.parquet(str(in_dir / "f2.parquet"))
        second = _run_once(
            spark, in_dir, str(tmp_path / "rocks_ckpt"), str(tmp_path / "out2")
        )
        assert second["a"] == (17.0, 2)  # state carried in RocksDB
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
