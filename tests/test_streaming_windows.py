"""Batch/stream equivalence tests for windowed + stateful streaming ops
(M4): the same helper on the same rows must agree between a batch frame
and an availableNow streaming run."""

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
from kafka_streams_the_clojure_way_spark.streaming import windows as W
from kafka_streams_the_clojure_way_spark.streaming.state import first_seen, running_totals

SCHEMA = StructType(
    [
        StructField("ts", TimestampType()),
        StructField("user", StringType()),
        StructField("value", DoubleType()),
        StructField("seq", LongType()),
    ]
)


def _rows():
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    out = []
    for i in range(120):
        out.append(
            (base + dt.timedelta(minutes=i * 7 % 180), f"u{i % 3}", float(i), i)
        )
    return out


def _write_input(spark, tmp_path):
    path = str(tmp_path / "stream_in")
    spark.createDataFrame(_rows(), SCHEMA).write.parquet(path)
    return path


def _collect_set(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tumbling_batch_stream_parity(spark, tmp_path):
    path = _write_input(spark, tmp_path)
    batch = W.tumbling(
        spark.read.parquet(path), "ts", "1 hour", "user",
        aggs={"n": F.count(F.lit(1)), "total": F.sum("value")},
    )
    expected = _collect_set(batch, ["window_start", "user", "n", "total"])

    stream = W.tumbling(
        spark.readStream.schema(SCHEMA).parquet(path), "ts", "1 hour", "user",
        watermark="10 minutes",
        aggs={"n": F.count(F.lit(1)), "total": F.sum("value")},
    )
    # complete mode: emit every window, open or closed -> equals batch.
    q = start_memory_sink(stream, "tumbling_parity", complete=True)
    drain(q)
    got = _collect_set(
        spark.sql("SELECT * FROM tumbling_parity"),
        ["window_start", "user", "n", "total"],
    )
    assert got == expected and len(got) > 0

    # append mode: only watermark-finalized windows -> strict subset that
    # excludes the still-open tail (documented late-data semantics).
    stream2 = W.tumbling(
        spark.readStream.schema(SCHEMA).parquet(path), "ts", "1 hour", "user",
        watermark="10 minutes",
        aggs={"n": F.count(F.lit(1)), "total": F.sum("value")},
    )
    q2 = start_memory_sink(stream2, "tumbling_append", complete=False)
    drain(q2)
    closed = _collect_set(
        spark.sql("SELECT * FROM tumbling_append"),
        ["window_start", "user", "n", "total"],
    )
    assert set(closed) < set(got)


def test_sliding_window_amplification(spark, tmp_path):
    path = _write_input(spark, tmp_path)
    df = spark.read.parquet(path)
    tumb = W.tumbling(df, "ts", "1 hour")
    slid = W.sliding(df, "ts", "1 hour", "30 minutes")
    # every event lands in exactly 2 sliding windows -> sum of counts doubles
    assert (
        slid.agg(F.sum("n_events")).collect()[0][0]
        == 2 * tumb.agg(F.sum("n_events")).collect()[0][0]
    )


def test_session_window_merges_within_gap(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (base, "u", 1.0, 0),
        (base + dt.timedelta(minutes=4), "u", 1.0, 1),   # same session (gap 5m)
        (base + dt.timedelta(minutes=30), "u", 1.0, 2),  # new session
    ]
    out = W.session(spark.createDataFrame(rows, SCHEMA), "ts", "5 minutes", "user").collect()
    assert sorted(r.n_events for r in out) == [1, 2]


def test_streaming_dedup_within_watermark(spark, tmp_path):
    path = str(tmp_path / "dedup_in")
    base = dt.datetime(2024, 1, 1)
    rows = [
        (base, "a", 1.0, 0),
        (base + dt.timedelta(seconds=30), "a", 2.0, 1),   # dup key within horizon
        (base + dt.timedelta(seconds=60), "b", 3.0, 2),
    ]
    spark.createDataFrame(rows, SCHEMA).write.parquet(path)
    stream = W.streaming_dedup(
        spark.readStream.schema(SCHEMA).parquet(path),
        keys=["user"], ts_col="ts", watermark="10 minutes",
    )
    q = start_memory_sink(stream, "dedup_stream")
    drain(q)
    got = sorted(r.user for r in spark.sql("SELECT user FROM dedup_stream").collect())
    assert got == ["a", "b"]


def test_first_seen_dedups_across_micro_batches(spark, tmp_path):
    """State must survive micro-batch boundaries: file 2 repeats file 1's
    keys and maxFilesPerTrigger=1 forces one micro-batch per file — the
    repeats must be suppressed by the seen-marker, not batch-local dedup."""
    base = dt.datetime(2024, 1, 1)
    d = tmp_path / "fs_in"
    d.mkdir()
    spark.createDataFrame(
        [(base, "a", 10.0, 1), (base, "b", 20.0, 2)], SCHEMA
    ).write.parquet(str(d / "f1.parquet"))
    spark.createDataFrame(
        [(base, "a", 99.0, 3), (base, "c", 30.0, 4)], SCHEMA
    ).write.parquet(str(d / "f2.parquet"))

    stream = first_seen(
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "*")),
        "user",
        "value",
        "seq",
    )
    q = start_memory_sink(stream, "first_seen_stream")
    drain(q)
    got = {
        r.key: (r.first_value, r.first_seq)
        for r in spark.sql("SELECT * FROM first_seen_stream").collect()
    }
    # NOTE: file pickup order across micro-batches is not guaranteed, but
    # each key must appear exactly once with one of ITS OWN records.
    assert set(got) == {"a", "b", "c"}
    assert got["b"] == (20.0, 2) and got["c"] == (30.0, 4)
    assert got["a"] in {(10.0, 1), (99.0, 3)}

    # batch parity: min-by-seq per key
    batch = first_seen(
        spark.read.parquet(str(d / "*")), "user", "value", "seq"
    )
    bgot = {r.key: (r.first_value, r.first_seq) for r in batch.collect()}
    assert bgot == {"a": (10.0, 1), "b": (20.0, 2), "c": (30.0, 4)}


def test_watermark_drops_late_events(spark, tmp_path):
    """Documented late-data semantics, demonstrated: once a window has
    been finalized (watermark passed its end and append mode emitted it),
    a record for that window arriving in a LATER micro-batch is dropped.
    Note Spark's guarantee is one-directional — a late record arriving in
    the same batch that evicts its window may still be merged — so the
    late row here lands in its own batch strictly after the eviction.
    The batch run of the same rows keeps it — exactly the delta a user
    must understand before turning on watermarks."""
    base = dt.datetime(2024, 1, 1)
    d = tmp_path / "late_in"
    d.mkdir()
    # batch 0: events at 00:00 and 02:00 -> watermark will advance to 01:50
    spark.createDataFrame(
        [
            (base, "u", 1.0, 0),                               # window 00:00
            (base + dt.timedelta(hours=2), "u", 1.0, 1),       # window 02:00
        ],
        SCHEMA,
    ).coalesce(1).write.parquet(str(d / "f1.parquet"))
    # batch 1: on-time event; watermark 01:50 closes + emits window 00:00
    spark.createDataFrame(
        [(base + dt.timedelta(hours=2, minutes=5), "u", 1.0, 2)],
        SCHEMA,
    ).coalesce(1).write.parquet(str(d / "f2.parquet"))
    # batch 2: an event 85 min past the watermark, for the CLOSED window
    spark.createDataFrame(
        [(base + dt.timedelta(minutes=30), "u", 1.0, 3)],      # LATE
        SCHEMA,
    ).coalesce(1).write.parquet(str(d / "f3.parquet"))
    # FileStreamSource orders files by modification time; equal mtimes would
    # let f3's late row slip in before f1/f2 advanced the watermark (flaky).
    # Pin strictly increasing mtimes so maxFilesPerTrigger=1 replays in order.
    import os

    for i, sub in enumerate(["f1.parquet", "f2.parquet", "f3.parquet"]):
        for part in (d / sub).glob("*.parquet"):
            os.utime(part, (1_700_000_000 + i * 600, 1_700_000_000 + i * 600))

    stream = W.tumbling(
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "*")),
        "ts",
        "1 hour",
        "user",
        watermark="10 minutes",
    )
    q = start_memory_sink(stream, "late_stream", complete=False)
    drain(q)
    got = {
        r.window_start: r.n_events
        for r in spark.sql("SELECT * FROM late_stream").collect()
    }
    # the 00:00 window closed with ONE event — the late seq=3 was dropped
    assert got.get(base) == 1
    # and the state operator counted exactly that one drop
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in p.get("stateOperators", [])
    )
    assert dropped == 1

    batch = W.tumbling(spark.read.parquet(str(d / "*")), "ts", "1 hour", "user")
    bgot = {r.window_start: r.n_events for r in batch.collect()}
    # batch (no lateness concept) counts both events in the 00:00 window
    assert bgot[base] == 2


def test_running_totals_batch_stream_parity(spark, tmp_path):
    path = _write_input(spark, tmp_path)
    batch = running_totals(spark.read.parquet(path), "user", "value")
    expected = _collect_set(batch, ["key", "total", "n"])

    stream = running_totals(
        spark.readStream.schema(SCHEMA).parquet(path), "user", "value"
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("running_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    drain(q)
    # update mode may emit intermediate states across batches; the final
    # state per key must equal the batch aggregate.
    final = spark.sql(
        """
        SELECT key, total, n FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY key ORDER BY n DESC) rn
          FROM running_state) WHERE rn = 1
        """
    )
    got = _collect_set(final, ["key", "total", "n"])
    assert got == expected and len(got) == 3
