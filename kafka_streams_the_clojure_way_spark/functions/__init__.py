"""Scalar function helpers. ``portable`` holds expressions with bit-exact
DuckDB-SQL equivalents (for the driver's oracle gate); everything else is
plain pyspark.sql.functions composition."""

from kafka_streams_the_clojure_way_spark.functions.portable import (
    hash60,
    hash60_sql,
    tokens,
    tokens_sql,
)

__all__ = ["hash60", "hash60_sql", "tokens", "tokens_sql"]
