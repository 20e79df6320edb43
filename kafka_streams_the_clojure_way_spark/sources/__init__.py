"""Sources & sinks: files (parquet/csv/json), in-memory frames, and Kafka
topics (reference: topic configs at core.clj:29-48, producer/consumer
helpers at core.clj:56-74)."""

from kafka_streams_the_clojure_way_spark.sources.files import TABLES, load_table, load_tables
from kafka_streams_the_clojure_way_spark.sources.kafka import Topic

__all__ = ["TABLES", "load_table", "load_tables", "Topic"]
