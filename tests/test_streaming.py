"""Streaming tests ≙ the reference's end-to-end Kafka verification
(core.clj:163-187), using file sources + memory sinks (no broker in CI,
same plan shape): publish known inputs, run the topology, assert exactly
the expected survivors — and stream/batch parity on the same topology.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

from kafka_streams_the_clojure_way_spark import pipelines as P
from kafka_streams_the_clojure_way_spark.plans import compile_topology
from kafka_streams_the_clojure_way_spark.plans.compiler import sink_entities
from kafka_streams_the_clojure_way_spark.sources.memory import drain, start_memory_sink

PURCHASE_SCHEMA = StructType(
    [
        StructField("purchase_id", LongType()),
        StructField("user_id", LongType()),
        StructField("amount", LongType()),
        StructField("quantity", LongType()),
    ]
)


def _topology():
    return {
        "entities": {
            "topic/purchase-made": {"type": "topic"},
            "stream/large": {"type": "stream", "xform": P.large_purchases},
            "topic/large-transaction-made": {"type": "topic"},
        },
        "workflow": [
            ["topic/purchase-made", "stream/large"],
            ["stream/large", "topic/large-transaction-made"],
        ],
    }


def test_streaming_topology_memory_sink(spark, tmp_path):
    # ≙ core.clj:171-184: amounts 10/500/50/1000 -> exactly 2 survivors.
    rows = [(i, i, amount, 1) for i, amount in enumerate([10, 500, 50, 1000])]
    spark.createDataFrame(rows, PURCHASE_SCHEMA).write.parquet(str(tmp_path / "in"))

    stream_in = spark.readStream.schema(PURCHASE_SCHEMA).parquet(str(tmp_path / "in"))
    topo = _topology()
    compiled = compile_topology(spark, topo, {"topic/purchase-made": stream_in})
    assert sink_entities(topo) == ["topic/large-transaction-made"]

    query = start_memory_sink(
        compiled["topic/large-transaction-made"], "large_tx_test"
    )
    drain(query)
    out = spark.sql("SELECT * FROM large_tx_test ORDER BY amount").collect()
    assert [(r.user_id, r.amount) for r in out] == [(1, 500), (3, 1000)]


def test_stream_batch_parity(spark, tmp_path):
    """The same topology compiled from a streaming source and from a batch
    source must produce identical output sets (SURVEY §5.3)."""
    rows = [(i, i % 3, 90 + i * 7, 1) for i in range(40)]
    spark.createDataFrame(rows, PURCHASE_SCHEMA).write.parquet(str(tmp_path / "in"))
    topo = _topology()

    batch_in = spark.read.parquet(str(tmp_path / "in"))
    batch_out = compile_topology(spark, topo, {"topic/purchase-made": batch_in})[
        "topic/large-transaction-made"
    ]
    expected = sorted((r.user_id, r.amount) for r in batch_out.collect())

    stream_in = spark.readStream.schema(PURCHASE_SCHEMA).parquet(str(tmp_path / "in"))
    stream_out = compile_topology(spark, topo, {"topic/purchase-made": stream_in})[
        "topic/large-transaction-made"
    ]
    query = start_memory_sink(stream_out, "parity_test")
    drain(query)
    got = sorted(
        (r.user_id, r.amount)
        for r in spark.sql("SELECT * FROM parity_test").collect()
    )
    assert got == expected and len(got) > 0


def test_streaming_merge_fan_in(spark, tmp_path):
    """Streaming union through the topology compiler (two source streams
    fan into one sink — core.clj:152-153 shape)."""
    a_rows = [(1, 1, 500, 1)]
    b_rows = [(2, 2, 700, 1), (3, 3, 10, 1)]
    spark.createDataFrame(a_rows, PURCHASE_SCHEMA).write.parquet(str(tmp_path / "a"))
    spark.createDataFrame(b_rows, PURCHASE_SCHEMA).write.parquet(str(tmp_path / "b"))
    topo = {
        "entities": {
            "topic/a": {"type": "topic"},
            "topic/b": {"type": "topic"},
            "stream/large": {"type": "stream", "xform": P.large_purchases},
            "topic/out": {"type": "topic"},
        },
        "workflow": [
            ["topic/a", "stream/large"],
            ["topic/b", "stream/large"],
            ["stream/large", "topic/out"],
        ],
    }
    compiled = compile_topology(
        spark,
        topo,
        {
            "topic/a": spark.readStream.schema(PURCHASE_SCHEMA).parquet(str(tmp_path / "a")),
            "topic/b": spark.readStream.schema(PURCHASE_SCHEMA).parquet(str(tmp_path / "b")),
        },
    )
    query = start_memory_sink(compiled["topic/out"], "fanin_test")
    drain(query)
    got = sorted(r.amount for r in spark.sql("SELECT * FROM fanin_test").collect())
    assert got == [500, 700]


def test_transform_with_state_distinct_types(spark, tmp_path):
    """transformWithState (Spark 4) with MapState-as-set: per-key distinct
    event types accumulate ACROSS restarts (state checkpointed), and the
    streaming totals equal the batch count_distinct twin.

    The streaming leg needs python protobuf (the transformWithState state
    protocol); where it's absent only the batch twin is exercised."""
    import pytest
    from pyspark.sql.types import StringType

    from kafka_streams_the_clojure_way_spark.streaming.state import (
        distinct_types_seen,
    )

    schema = StructType(
        [
            StructField("user", StringType()),
            StructField("etype", StringType()),
        ]
    )
    in_dir = tmp_path / "tws_in"
    in_dir.mkdir()
    ckpt = str(tmp_path / "tws_ckpt")
    out_dir = str(tmp_path / "tws_out")

    def run_once(tag):
        stream = distinct_types_seen(
            spark.readStream.schema(schema).parquet(f"{in_dir}/*"), "user", "etype"
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

    spark.createDataFrame(
        [("a", "click"), ("a", "view"), ("b", "click"), ("a", "click")], schema
    ).write.parquet(str(in_dir / "f1.parquet"))

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        # the skip is legitimate ONLY for protobuf being absent — any
        # other import failure (broken install, transitive breakage)
        # must fail LOUD, not hide behind the skip (VERDICT r7 #8)
        assert "google" in str(e) or "protobuf" in str(e), (
            f"unexpected import error gating transformWithState: {e!r}"
        )
        batch = distinct_types_seen(
            spark.read.parquet(f"{in_dir}/*"), "user", "etype"
        ).collect()
        assert {r.key: r.n_types for r in batch} == {"a": 2, "b": 1}
        pytest.skip(
            f"python protobuf unavailable ({e}): transformWithState "
            "streaming leg skipped"
        )

    run_once("r1")

    # second file while the query is down; restart must REMEMBER a's
    # {click,view} so a third distinct type yields 3, and b's repeat
    # type must NOT bump its count
    spark.createDataFrame(
        [("a", "purchase"), ("b", "click")], schema
    ).write.parquet(str(in_dir / "f2.parquet"))
    run_once("r2")

    latest = {}
    for r in spark.read.parquet(out_dir).collect():
        latest[r.key] = max(latest.get(r.key, 0), r.n_types)
    assert latest == {"a": 3, "b": 1}

    # batch twin parity
    batch = distinct_types_seen(
        spark.read.parquet(f"{in_dir}/*"), "user", "etype"
    ).collect()
    assert {r.key: r.n_types for r in batch} == latest


def test_streaming_sql_entity(spark, tmp_path):
    """SQL-string entities compile on STREAMING inputs too (temp views
    are mode-agnostic) — same survivors as core.clj:171-184."""
    rows = [(i, i, amount, 1) for i, amount in enumerate([10, 500, 50, 1000])]
    spark.createDataFrame(rows, PURCHASE_SCHEMA).write.parquet(str(tmp_path / "in"))
    topo = {
        "entities": {
            "topic/in": {"type": "topic"},
            "stream/large": {
                "type": "stream",
                "sql": "SELECT user_id, amount FROM __input__ WHERE amount >= 100",
            },
            "topic/out": {"type": "topic"},
        },
        "workflow": [["topic/in", "stream/large"], ["stream/large", "topic/out"]],
    }
    stream_in = spark.readStream.schema(PURCHASE_SCHEMA).parquet(str(tmp_path / "in"))
    compiled = compile_topology(spark, topo, {"topic/in": stream_in})
    query = start_memory_sink(compiled["topic/out"], "sql_entity_test")
    drain(query)
    got = sorted(
        (r.user_id, r.amount)
        for r in spark.sql("SELECT * FROM sql_entity_test").collect()
    )
    assert got == [(1, 500), (3, 1000)]


def test_observe_metrics_surface_in_progress(spark, tmp_path):
    """with_observability: per-micro-batch counts + invariant metrics ride
    the streaming job (no second pass) and surface via lastProgress."""
    from pyspark.sql import functions as F

    from kafka_streams_the_clojure_way_spark.streaming.runner import (
        last_observed,
        with_observability,
    )

    rows = [(i, i, amount, 1) for i, amount in enumerate([10, 500, 50, 1000])]
    spark.createDataFrame(rows, PURCHASE_SCHEMA).write.parquet(str(tmp_path / "in"))
    stream_in = spark.readStream.schema(PURCHASE_SCHEMA).parquet(str(tmp_path / "in"))
    observed = with_observability(
        stream_in.transform(P.large_purchases),
        "large_tx",
        {"max_amount": F.max("amount"), "n_null_user": F.count_if(F.col("user_id").isNull())},
    )
    query = start_memory_sink(observed, "observe_test")
    drain(query)
    got = last_observed(query, "large_tx")
    assert got == {"n_rows": 2, "max_amount": 1000, "n_null_user": 0}


def test_streaming_table_entity_update_mode(spark, tmp_path):
    """The SAME table entity compiles on a streaming input: update-mode
    stateful aggregate whose state is the compacted table; a second
    micro-batch with a newer record for an existing key replaces it."""
    schema = "user_id long, ts long, val string"
    in_dir = tmp_path / "tbl_in"
    in_dir.mkdir()
    ckpt = str(tmp_path / "tbl_ckpt")
    out: dict[int, tuple] = {}

    topo = {
        "entities": {
            "topic/in": {"type": "topic"},
            "table/users": {"type": "table", "key": "user_id", "seq": "ts"},
        },
        "workflow": [["topic/in", "table/users"]],
    }

    def run_once():
        stream_in = spark.readStream.schema(schema).parquet(f"{in_dir}/*")
        tbl = compile_topology(spark, topo, {"topic/in": stream_in})["table/users"]

        def sink(batch_df, batch_id):
            for r in batch_df.collect():
                out[r.user_id] = (r.ts, r.val)

        q = (
            tbl.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        drain(q)

    spark.createDataFrame(
        [(1, 10, "a1"), (2, 11, "b1")], schema
    ).write.parquet(str(in_dir / "f1.parquet"))
    run_once()
    spark.createDataFrame([(1, 20, "a2")], schema).write.parquet(
        str(in_dir / "f2.parquet")
    )
    run_once()
    assert out == {1: (20, "a2"), 2: (11, "b1")}


def test_distinct_types_processor_mapstate_logic():
    """The transformWithState streaming leg needs python protobuf (absent
    in this container — documented can't-fix, the skip above). This test
    exercises the SAME _DistinctTypesProcessor.handleInputRows logic
    against a faithful MapState fake: accumulation across micro-batches,
    repeat types not double-counted, per-key isolation via separate
    handles — so the processor semantics are verified even where the
    wire protocol can't run."""
    import pandas as pd

    from kafka_streams_the_clojure_way_spark.streaming.state import (
        _DistinctTypesProcessor,
    )

    class FakeMapState:
        def __init__(self):
            self._m = {}

        def containsKey(self, k):
            return k in self._m

        def updateValue(self, k, v):
            self._m[k] = v

        def keys(self):
            return iter(self._m)

    class FakeHandle:
        def __init__(self):
            self.state = FakeMapState()

        def getMapState(self, name, key_schema, value_schema):
            return self.state

    proc = _DistinctTypesProcessor()
    proc.init(FakeHandle())

    def emit(types):
        out = list(
            proc.handleInputRows(("a",), iter([pd.DataFrame({"t": types})]), None)
        )
        assert len(out) == 1
        return int(out[0]["n_types"].iloc[0])

    assert emit(["click", "view", "click"]) == 2   # batch 1: dedup within batch
    assert emit(["click"]) == 2                    # batch 2: repeat, no bump
    assert emit(["purchase", None]) == 3           # batch 3: new type; nulls dropped

    # a fresh key's processor starts empty (per-key state isolation)
    proc2 = _DistinctTypesProcessor()
    proc2.init(FakeHandle())
    out = list(
        proc2.handleInputRows(("b",), iter([pd.DataFrame({"t": ["x"]})]), None)
    )
    assert int(out[0]["n_types"].iloc[0]) == 1


def test_materialize_table_compacts_across_restarts(spark, tmp_path):
    """The durable KTable leg: a changelog stream materializes to a
    latest-per-key parquet table; a restart resumes from the checkpoint
    and later-seq updates (including across the restart) win; tombstones
    drop keys."""
    from pyspark.sql.types import IntegerType, StringType

    from kafka_streams_the_clojure_way_spark.streaming.runner import (
        materialize_table,
    )

    schema = StructType(
        [
            StructField("k", IntegerType()),
            StructField("v", StringType()),
            StructField("seq", IntegerType()),
        ]
    )
    in_dir = tmp_path / "chg_in"
    in_dir.mkdir()
    table = str(tmp_path / "ktable")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = spark.readStream.schema(schema).parquet(f"{in_dir}/*")
        q = materialize_table(
            stream, table, ["k"], "seq", checkpoint=ckpt, available_now=True
        )
        drain(q)

    spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10)], schema
    ).write.parquet(str(in_dir / "f1.parquet"))
    run_once()
    got = {r.k: r.v for r in spark.read.parquet(table).collect()}
    assert got == {1: "a", 2: "b"}

    # new file while the query is down: restart must apply only the delta
    spark.createDataFrame(
        [(2, "b2", 20), (3, "c", 20), (1, "stale", 5)], schema
    ).write.parquet(str(in_dir / "f2.parquet"))
    run_once()
    got = {r.k: (r.v, r.seq) for r in spark.read.parquet(table).collect()}
    assert got == {1: ("a", 10), 2: ("b2", 20), 3: ("c", 20)}


def test_edn_stream_through_topology_to_materialized_table(spark, tmp_path):
    """Capstone wiring of the full reference story, brokerless: EDN-lines
    'topics' (the reference's serde) stream through a declarative
    topology (filter xform ≙ core.clj:79-80) into a DURABLY materialized
    latest-per-user table (the KTable the reference stack keeps in
    RocksDB). A second file arriving after a restart updates the table
    through the same checkpoint."""
    from kafka_streams_the_clojure_way_spark.plans.compiler import compile_topology
    from kafka_streams_the_clojure_way_spark.sources.edn import register
    from kafka_streams_the_clojure_way_spark.streaming.runner import (
        materialize_table,
    )

    register(spark)
    in_dir = tmp_path / "topic_purchase"
    in_dir.mkdir()
    (in_dir / "a.edn").write_text(
        "{:purchase-id 1 :user-id 7 :amount 50 :quantity 1}\n"
        "{:purchase-id 2 :user-id 7 :amount 200 :quantity 1}\n"
        "{:purchase-id 3 :user-id 8 :amount 150 :quantity 2}\n"
    )
    schema = (
        "purchase_id long, user_id long, amount long, quantity long"
    )
    table = str(tmp_path / "large_by_user")
    ckpt = str(tmp_path / "ckpt")
    topo = {
        "entities": {
            "topic/purchase-made": {"type": "topic"},
            "stream/large": {
                "type": "stream",
                "sql": "SELECT * FROM __input__ WHERE amount >= 100",
            },
        },
        "workflow": [["topic/purchase-made", "stream/large"]],
    }

    def run_once():
        stream_in = (
            spark.readStream.format("edn").schema(schema).load(str(in_dir))
        )
        compiled = compile_topology(spark, topo, {"topic/purchase-made": stream_in})
        q = materialize_table(
            compiled["stream/large"], table, ["user_id"], "purchase_id",
            checkpoint=ckpt, available_now=True,
        )
        drain(q)

    run_once()
    got = {r.user_id: r.amount for r in spark.read.parquet(table).collect()}
    assert got == {7: 200, 8: 150}

    (in_dir / "b.edn").write_text(
        "{:purchase-id 4 :user-id 8 :amount 500 :quantity 1}\n"
        "{:purchase-id 5 :user-id 9 :amount 20 :quantity 1}\n"  # filtered
    )
    run_once()
    got = {r.user_id: r.amount for r in spark.read.parquet(table).collect()}
    assert got == {7: 200, 8: 500}
