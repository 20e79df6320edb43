"""Kafka topic source/sink (reference: topic configs core.clj:29-48,
producer core.clj:56-65, consumer replay core.clj:67-74, admin
core.clj:51).

The reference serializes records as EDN (schemaless, self-describing;
core.clj:24-26). Spark is schema-first, so the engine's serde convention is
JSON + a per-topic StructType (SURVEY.md §1.2 "hard parts"): a ``Topic``
carries its value schema, ``read_stream``/``read_batch`` decode
``value`` with ``from_json``, and ``write_stream``/``write_batch`` encode
with ``to_json(struct(*))``.

No Kafka broker exists in the test container, so everything here builds
*configured plans* (lazy DataFrames / writers); integration is exercised
against file/memory sources which share the serde path. Topic admin (DDL)
needs a Kafka client library (kafka-python / confluent-kafka), which is
also absent — ``ensure_topics`` degrades to a clear error, mirroring that
Spark itself has no topic DDL (SURVEY.md §2 row 11).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType


@dataclass(frozen=True)
class Topic:
    """≙ the reference's topic config maps (core.clj:29-34):
    name, partition count, replication factor, serdes."""

    name: str
    partitions: int = 1
    replication_factor: int = 1
    #: JSON value schema (None = keep raw value string; caller decodes).
    value_schema: StructType | None = None
    #: key is decoded as a string cast by default, like the reference's
    #: integer EDN keys round-tripping through a serde.
    key_type: str = "string"
    options: dict[str, str] = field(default_factory=dict)


def _decoded(df: DataFrame, topic: Topic) -> DataFrame:
    """Kafka wire frame -> keyed record frame: key + value struct columns
    flattened, keeping Kafka metadata for provenance."""
    out = df.withColumn("key", F.col("key").cast(topic.key_type))
    value = F.col("value").cast("string")
    if topic.value_schema is not None:
        out = out.withColumn("_v", F.from_json(value, topic.value_schema))
        for fname in topic.value_schema.fieldNames():
            out = out.withColumn(fname, F.col("_v").getField(fname))
        out = out.drop("_v", "value")
    else:
        out = out.withColumn("value", value)
    return out.drop("topic", "headers")


def read_stream(spark: SparkSession, topic: Topic, bootstrap: str) -> DataFrame:
    """Streaming scan of a topic (≙ ``js/kstream``, core.clj:78). Kafka
    partitions map 1:1 to Spark input partitions — parallelism scales with
    the topic, exactly as Kafka Streams' does."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic.name)
        .option("startingOffsets", "earliest")
        .options(**topic.options)
        .load()
    )
    return _decoded(raw, topic)


def read_batch(spark: SparkSession, topic: Topic, bootstrap: str) -> DataFrame:
    """Bounded replay of a whole topic (≙ ``view-messages``'s
    seek-to-beginning + poll-to-quiescence, core.clj:67-74)."""
    raw = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic.name)
        .option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
        .options(**topic.options)
        .load()
    )
    return _decoded(raw, topic)


def _encoded(df: DataFrame, topic: Topic) -> DataFrame:
    """Keyed record frame -> Kafka wire frame (key/value strings)."""
    value_cols = [c for c in df.columns if c not in ("key", "partition", "offset", "timestamp", "timestampType")]
    return df.select(
        F.col("key").cast("string").alias("key"),
        F.to_json(F.struct(*[F.col(c) for c in value_cols])).alias("value"),
    )


def write_stream(
    df: DataFrame, topic: Topic, bootstrap: str, checkpoint_dir: str
) -> StreamingQuery:
    """Streaming sink to a topic (≙ ``js/to``, core.clj:83,110)."""
    return (
        _encoded(df, topic)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic.name)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def write_batch(df: DataFrame, topic: Topic, bootstrap: str) -> None:
    """Point/batch produce (≙ ``jc/produce!``, core.clj:56-65)."""
    (
        _encoded(df, topic)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic.name)
        .save()
    )


def ensure_topics(topics: list[Topic], bootstrap: str) -> None:
    """Topic DDL (≙ ``ja/create-topics!``, core.clj:51). Spark has no topic
    admin; this needs a Kafka client lib, absent in this container."""
    try:
        from confluent_kafka.admin import AdminClient, NewTopic  # type: ignore
    except ImportError:
        try:
            from kafka.admin import KafkaAdminClient, NewTopic  # type: ignore
        except ImportError as exc:
            raise NotImplementedError(
                "topic admin requires confluent-kafka or kafka-python; "
                "neither is installed in this environment"
            ) from exc
        admin = KafkaAdminClient(bootstrap_servers=bootstrap)
        admin.create_topics(
            [NewTopic(t.name, t.partitions, t.replication_factor) for t in topics]
        )
        return
    client = AdminClient({"bootstrap.servers": bootstrap})
    client.create_topics(
        [NewTopic(t.name, t.partitions, t.replication_factor) for t in topics]
    )
