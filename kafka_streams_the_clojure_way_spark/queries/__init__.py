"""Judge-facing query registry.

Every implemented operator from SURVEY.md §2 (and the LLM-pipeline
extensions) registers here as a named query: a ``(spark, sf_dir) ->
DataFrame`` callable, plus — whenever SQL-expressible — a DuckDB oracle
SQL string computing the same result with the same column names
(the driver's correctness gate compares row count + schema +
order-insensitive value hash).

Cross-engine determinism conventions (enforced in every query/oracle pair):

- money/double aggregates go through DECIMAL(18,2)/(18,4) so SUM is exact
  and order-independent, then CAST back to DOUBLE so both engines report
  the same result type;
- averages are ``round(cast(exact_sum as double) / count, 6)``;
- never ``CAST(double AS INT)`` (Spark truncates, DuckDB rounds) — always
  ``floor``/``ceil`` explicitly;
- timestamps leave result sets as epoch seconds or ISO strings, never raw
  timestamp columns;
- every computed column is aliased identically in Spark and SQL.
"""

from kafka_streams_the_clojure_way_spark.queries.registry import (
    ORACLES,
    QUERIES,
    query,
)

# Import for registration side effects — each module fills the registry.
from kafka_streams_the_clojure_way_spark.queries import (  # noqa: E402,F401
    advanced,
    analytics,
    extended,
    ingestion,
    llm_pipeline,
    reference_queries,
    relational,
    stats,
    tpch,
    widening,
)

__all__ = ["QUERIES", "ORACLES", "query"]
