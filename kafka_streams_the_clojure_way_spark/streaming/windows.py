"""Streaming window helpers (beyond the stateless reference — SURVEY.md
§2.2 "Streaming windows ... Absent"): tumbling / sliding / session windows
with watermarks, defined against Structured Streaming's documented
semantics.

Correctness strategy (SURVEY §5 / M4): these have no DuckDB oracle —
late-data semantics aren't SQL — so each helper is verified by
**batch-window equivalence**: the same helper applied to the same data in
batch mode must equal the streaming availableNow run (tests/test_streaming_windows.py),
and the *bucketing arithmetic* is oracle-checked via the batch twin
``time_bucket_hourly_events``.

Scale notes: windowed aggregation state lives in the state store keyed by
(window, keys); the watermark bounds state size — ALWAYS set one on
unbounded streams or state grows forever. Partitioning is by group key,
same shuffle as a batch groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling(
    df: DataFrame,
    ts_col: str,
    duration: str,
    *keys: str,
    watermark: str | None = None,
    aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """Tumbling-window aggregation. ``watermark`` (e.g. "10 minutes")
    bounds late data and state; None is allowed for batch frames."""
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    aggs = aggs or {"n_events": F.count(F.lit(1))}
    return (
        df.groupBy(F.window(F.col(ts_col), duration), *keys)
        .agg(*[c.alias(name) for name, c in aggs.items()])
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *keys,
            *aggs.keys(),
        )
    )


def sliding(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    *keys: str,
    watermark: str | None = None,
    aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """Sliding-window aggregation (each event lands in duration/slide
    windows — input amplification is the scale cost to watch)."""
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    aggs = aggs or {"n_events": F.count(F.lit(1))}
    return (
        df.groupBy(F.window(F.col(ts_col), duration, slide), *keys)
        .agg(*[c.alias(name) for name, c in aggs.items()])
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *keys,
            *aggs.keys(),
        )
    )


def session(
    df: DataFrame,
    ts_col: str,
    gap: str,
    *keys: str,
    watermark: str | None = None,
    aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """Session windows: events within ``gap`` of each other merge into one
    session per key. State per open session; watermark closes sessions."""
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    aggs = aggs or {"n_events": F.count(F.lit(1))}
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap), *keys)
        .agg(*[c.alias(name) for name, c in aggs.items()])
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            *keys,
            *aggs.keys(),
        )
    )


def streaming_dedup(
    df: DataFrame, keys: list[str], ts_col: str, watermark: str
) -> DataFrame:
    """Streaming exact dedup: drop repeats of ``keys`` within the watermark
    horizon — state is bounded by the watermark instead of growing with
    the stream (``dropDuplicatesWithinWatermark``). The streaming twin of
    dedup_exact_documents."""
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)
