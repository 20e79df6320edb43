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


def test_stream_stream_left_outer_emits_nulls_after_watermark(spark, tmp_path):
    """LEFT OUTER stream-stream join: unmatched left rows must be HELD
    while they could still match, then emitted with nulls once the
    watermark passes the join window — the semantics that make outer
    streaming joins safe (no premature nulls, no unbounded state)."""
    left_dir = tmp_path / "l"
    right_dir = tmp_path / "r"
    left_dir.mkdir(); right_dir.mkdir()
    ckpt = str(tmp_path / "louter_ckpt")
    out_dir = str(tmp_path / "louter_out")

    def run_once():
        left = spark.readStream.schema(SCHEMA).parquet(f"{left_dir}/*")
        right = spark.readStream.schema(SCHEMA).parquet(f"{right_dir}/*")
        joined = stream_stream_join(
            left,
            right,
            "user",
            left_ts="ts",
            right_ts="ts",
            watermark="5 minutes",
            within="10 minutes",
            how="left_outer",
        )

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out_dir)

        q = (
            joined.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        drain(q)

    # batch 1: one matchable and one never-matched left row
    spark.createDataFrame(
        [(BASE, "match", 1.0, 1), (BASE, "lonely", 2.0, 2)], SCHEMA
    ).write.parquet(str(left_dir / "f1.parquet"))
    spark.createDataFrame(
        [(BASE + dt.timedelta(minutes=5), "match", 9.0, 3)], SCHEMA
    ).write.parquet(str(right_dir / "f1.parquet"))
    run_once()

    # batch 2: only a late-epoch heartbeat that pushes the watermark far
    # past BASE+10m, forcing the lonely row's null emission
    far = BASE + dt.timedelta(hours=2)
    spark.createDataFrame([(far, "wm", 0.0, 9)], SCHEMA).write.parquet(
        str(left_dir / "f2.parquet")
    )
    spark.createDataFrame([(far, "wm2", 0.0, 10)], SCHEMA).write.parquet(
        str(right_dir / "f2.parquet")
    )
    run_once()

    rows = spark.read.parquet(out_dir).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user, []).append(r)
    assert len(by_user["match"]) == 1 and by_user["match"][0].r_value == 9.0
    lonely = by_user["lonely"]
    assert len(lonely) == 1 and lonely[0].r_value is None
