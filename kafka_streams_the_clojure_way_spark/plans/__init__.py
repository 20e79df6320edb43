"""Topology-as-data: declarative dataflow DAGs (reference: core.clj:137-157).

The reference's Part 3 describes the whole dataflow as data — an
``entities`` map + a ``workflow`` edge list — which can be validated,
visualised, simulated offline, and run on Kafka. This subpackage is the
Spark-native equivalent: a plain-Python dict spec compiled (topological
sort) into one DataFrame per entity; batch and streaming share the compiler
because the DataFrame API is mode-agnostic.
"""

from kafka_streams_the_clojure_way_spark.plans.compiler import compile_topology
from kafka_streams_the_clojure_way_spark.plans.experiment import run_experiment
from kafka_streams_the_clojure_way_spark.plans.spec import (
    TopologyError,
    validate_topology,
)
from kafka_streams_the_clojure_way_spark.plans.viz import to_dot

__all__ = [
    "TopologyError",
    "validate_topology",
    "compile_topology",
    "run_experiment",
    "to_dot",
]
