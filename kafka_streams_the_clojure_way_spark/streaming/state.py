"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.2 "Stateful ops ... Absent" — superset surface).

``running_totals`` is the canonical example: per-key running aggregates
that survive across micro-batches, with timeout-based state expiry. The
same function works in batch mode (a groupBy) so batch/stream parity is
testable.
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_SCHEMA = "key string, total double, n long"
STATE_SCHEMA = "total double, n long"


def _update_running(
    key: tuple[Any, ...],
    pdfs: Iterator["pd.DataFrame"],  # noqa: F821
    state: GroupState,
) -> Iterator["pd.DataFrame"]:  # noqa: F821
    import pandas as pd

    total, n = state.get if state.exists else (0.0, 0)
    for pdf in pdfs:
        total += float(pdf["value"].sum())
        n += int(len(pdf))
    state.update((total, n))
    yield pd.DataFrame({"key": [key[0]], "total": [total], "n": [n]})


FIRST_SEEN_SCHEMA = "key string, first_value double, first_seq long"


def _update_first_seen(
    key: tuple[Any, ...],
    pdfs: Iterator["pd.DataFrame"],  # noqa: F821
    state: GroupState,
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    if state.exists:
        # key already emitted in an earlier micro-batch: suppress.
        for _ in pdfs:
            pass
        return
    first_value, first_seq = None, None
    for pdf in pdfs:
        row = pdf.sort_values("seq").iloc[0]
        if first_seq is None or row["seq"] < first_seq:
            first_value, first_seq = float(row["value"]), int(row["seq"])
    state.update((1,))
    yield pd.DataFrame(
        {"key": [key[0]], "first_value": [first_value], "first_seq": [first_seq]}
    )


def first_seen(df: DataFrame, key_col: str, value_col: str, seq_col: str) -> DataFrame:
    """Emit each key's FIRST record (by ``seq_col``) exactly once across
    ALL micro-batches — custom keyed state (a seen-marker per key), i.e.
    ``dropDuplicates`` rebuilt on applyInPandasWithState to exercise the
    state.exists/update surface. Unlike dropDuplicatesWithinWatermark the
    marker never expires: unbounded state, the documented trade-off (add
    a timeout for bounded retention). Batch mode degrades to a
    min_by-style groupBy — the parity test."""
    src = df.select(
        F.col(key_col).alias("key"),
        F.col(value_col).alias("value"),
        F.col(seq_col).alias("seq"),
    )
    if not df.isStreaming:
        return src.groupBy("key").agg(
            F.min_by("value", "seq").cast("double").alias("first_value"),
            F.min("seq").alias("first_seq"),
        )
    return src.groupBy("key").applyInPandasWithState(
        _update_first_seen,
        outputStructType=FIRST_SEEN_SCHEMA,
        stateStructType="seen int",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_totals(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Per-key running (total, count) across micro-batches. In batch mode
    this degrades to a plain groupBy — which is exactly the parity test."""
    src = df.select(F.col(key_col).alias("key"), F.col(value_col).alias("value"))
    if not df.isStreaming:
        return src.groupBy("key").agg(
            F.sum("value").alias("total"), F.count(F.lit(1)).alias("n")
        )
    return src.groupBy("key").applyInPandasWithState(
        _update_running,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# transformWithState (Spark 4): composite keyed state beyond the single
# tuple applyInPandasWithState allows — here a MapState used as a per-key
# SET, the state shape a running-distinct operator actually needs.
# --------------------------------------------------------------------------

DISTINCT_TYPES_SCHEMA = "key string, n_types long"


class _DistinctTypesProcessor:
    """StatefulProcessor: per key, remember every event type ever seen
    (MapState as a set) and emit the updated distinct count per batch."""

    def init(self, handle) -> None:
        self._types = handle.getMapState("types", "t string", "seen int")

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        for pdf in rows:
            for t in pdf["t"].dropna().unique():
                if not self._types.containsKey((str(t),)):
                    self._types.updateValue((str(t),), (1,))
        n = sum(1 for _ in self._types.keys())
        yield pd.DataFrame({"key": [key[0]], "n_types": [n]})

    def handleInitialState(self, key, initialState, timerValues) -> None:
        pass

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        return iter(())

    def close(self) -> None:
        pass


def distinct_types_seen(df: DataFrame, key_col: str, type_col: str) -> DataFrame:
    """How many distinct ``type_col`` values each key has EVER produced,
    updated every micro-batch — running cardinality per key. State is a
    MapState set (one entry per distinct type), so memory is O(distinct
    types per key), not O(events); at genuinely high-cardinality domains
    swap the exact set for an HLL sketch in a ValueState (operators/
    sketches pattern). Batch mode degrades to count_distinct — the
    parity test."""
    src = df.select(F.col(key_col).alias("key"), F.col(type_col).alias("t"))
    if not df.isStreaming:
        return src.groupBy("key").agg(F.count_distinct("t").alias("n_types"))
    # import-gate (the Pillow / kafka-lib convention): Spark's
    # transformWithStateInPandas state server speaks protobuf from the
    # Python worker, so without python-protobuf the query dies executor-
    # side with an opaque py4j traceback. Fail loud and early instead.
    # Vendoring protobuf was evaluated and rejected: it is generated
    # C++/upb-backed code, not a single-file shim, and this container
    # forbids installs — the batch twin above plus the MapState-fake
    # logic test (tests/test_streaming.py) cover the semantics.
    try:  # pragma: no cover - exercised only where protobuf exists
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as exc:  # pragma: no cover
        raise ImportError(
            "distinct_types_seen on a STREAMING frame requires python-"
            "protobuf (the transformWithState state-server wire format); "
            "it is absent in this environment. Batch mode works without "
            "it, and the processor logic is unit-tested against a "
            "MapState fake."
        ) from exc
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    proc = type(
        "DistinctTypesProcessor",
        (_DistinctTypesProcessor, StatefulProcessor),
        {},
    )()
    return src.groupBy("key").transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=DISTINCT_TYPES_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
