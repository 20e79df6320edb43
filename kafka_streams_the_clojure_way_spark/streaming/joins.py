"""Streaming joins (SURVEY.md §2.2 "Joins ... stream-stream; stream-table
— Absent" — superset surface).

Two shapes, matching Structured Streaming's documented semantics:

- **stream-stream**: both sides buffer rows in the state store until the
  watermark says the match window has passed. The time-range condition is
  NOT optional at scale — it is what lets Spark evict state; an
  unbounded stream-stream join grows state forever. The equi-key makes
  the physical join a state-store keyed lookup (shuffled by key), exactly
  the partitioning a batch shuffle join would pick.
- **stream-static**: the static side is just a DataFrame; Spark replans
  per micro-batch and will BROADCAST it when small — the streaming analog
  of the broadcast dimension join (same `F.broadcast` hint applies).

Both helpers run unchanged on batch frames (conditions are plain column
expressions), which is what the batch/stream parity tests exercise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "10 minutes",
    within: str = "15 minutes",
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``key`` where the right event happens in
    ``[left_ts, left_ts + within]``. Watermarks bound buffered state on
    both sides; ``within`` bounds it in event time.

    Output columns: left columns unprefixed, right columns ``r_``-prefixed
    (minus the join key) — deterministic schema for both modes.
    """
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if right.isStreaming:
        right = right.withWatermark(right_ts, watermark)
    lcols = left.columns
    rcols = right.columns
    r = right.select(
        F.col(key).alias("__rkey"),
        *[F.col(c).alias(f"r_{c}") for c in rcols if c != key],
    )
    cond = (
        (F.col(key) == F.col("__rkey"))
        & (F.col(f"r_{right_ts}") >= F.col(left_ts))
        & (F.col(f"r_{right_ts}") <= F.col(left_ts) + F.expr(f"INTERVAL {within}"))
    )
    joined = left.join(r, cond, how)
    return joined.select(
        *lcols, *[f"r_{c}" for c in rcols if c != key]
    )


def stream_static_join(
    stream: DataFrame,
    static: DataFrame,
    key: str,
    *,
    how: str = "inner",
    broadcast_static: bool = True,
) -> DataFrame:
    """Join a (streaming) fact frame to a static dimension table. With
    ``broadcast_static`` the dim ships to every task per micro-batch — no
    shuffle of the stream; leave it False for large dims (shuffled
    stream-static join)."""
    dim = F.broadcast(static) if broadcast_static else static
    return stream.join(dim, key, how)
