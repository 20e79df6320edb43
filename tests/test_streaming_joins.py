"""Batch/stream parity for streaming joins: the same helper on the same
rows must agree between a batch run and an availableNow streaming run."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from kafka_streams_the_clojure_way_spark.sources.memory import drain, start_memory_sink
from kafka_streams_the_clojure_way_spark.streaming.joins import (
    stream_static_join,
    stream_stream_join,
)

SCHEMA = StructType(
    [
        StructField("ts", TimestampType()),
        StructField("user", StringType()),
        StructField("value", DoubleType()),
        StructField("seq", LongType()),
    ]
)

BASE = dt.datetime(2024, 1, 1)


def _clicks():
    return [
        (BASE + dt.timedelta(minutes=m), f"u{m % 3}", float(m), m) for m in range(30)
    ]


def _purchases():
    # one purchase per user, 10 minutes in: matches clicks within the
    # [ts, ts+15m] bound only for clicks in minutes 0..10 per user lane
    return [
        (BASE + dt.timedelta(minutes=10 + u), f"u{u}", 100.0 * u, 1000 + u)
        for u in range(3)
    ]


def _write(spark, tmp_path, name, rows):
    path = str(tmp_path / name)
    spark.createDataFrame(rows, SCHEMA).write.parquet(path)
    return path


def _key_set(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_stream_stream_join_batch_parity(spark, tmp_path):
    lp = _write(spark, tmp_path, "clicks", _clicks())
    rp = _write(spark, tmp_path, "purch", _purchases())

    batch = stream_stream_join(
        spark.read.parquet(lp), spark.read.parquet(rp), "user", within="15 minutes"
    )
    expected = _key_set(batch, ["seq", "r_seq"])
    assert len(expected) > 0

    stream = stream_stream_join(
        spark.readStream.schema(SCHEMA).parquet(lp),
        spark.readStream.schema(SCHEMA).parquet(rp),
        "user",
        within="15 minutes",
    )
    q = start_memory_sink(stream, "ss_join")
    drain(q)
    got = _key_set(spark.sql("SELECT seq, r_seq FROM ss_join"), ["seq", "r_seq"])
    assert got == expected

    # the time bound actually bounds: every joined pair is within 15 minutes
    for r in spark.sql("SELECT ts, r_ts FROM ss_join").collect():
        delta = (r.r_ts - r.ts).total_seconds()
        assert 0 <= delta <= 15 * 60


def test_stream_static_join_broadcasts(spark, tmp_path):
    lp = _write(spark, tmp_path, "facts", _clicks())
    dim = spark.createDataFrame(
        [("u0", "gold"), ("u1", "silver")], "user string, tier string"
    )

    batch = stream_static_join(spark.read.parquet(lp), dim, "user")
    # broadcast hint visible in the batch physical plan
    assert "Broadcast" in batch._jdf.queryExecution().executedPlan().toString()
    expected = _key_set(batch, ["seq", "tier"])

    stream = stream_static_join(
        spark.readStream.schema(SCHEMA).parquet(lp), dim, "user"
    )
    q = start_memory_sink(stream, "sstatic_join")
    drain(q)
    got = _key_set(spark.sql("SELECT seq, tier FROM sstatic_join"), ["seq", "tier"])
    assert got == expected and len(got) == 20  # u2 rows drop (inner join)
