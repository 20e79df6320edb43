"""Structured Streaming surface: topology runner (start/stop lifecycle ≙
core.clj:86-95), window helpers, and stateful operators (beyond the
stateless reference, SURVEY.md §2.2)."""

from kafka_streams_the_clojure_way_spark.streaming.runner import TopologyRunner

__all__ = ["TopologyRunner"]
