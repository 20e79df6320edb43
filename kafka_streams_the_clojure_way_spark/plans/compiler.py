"""Topology compiler: dict spec -> one DataFrame per entity
(reference: willa's ``w/build-topology!`` at core.clj:207-209).

The compiler walks the validated DAG in topological order:

- **source topics** (no in-edges) bind to a caller-supplied DataFrame
  (batch ``createDataFrame``/parquet, or a streaming reader — the DataFrame
  API is mode-agnostic, so the same compiler serves ``run-experiment``-style
  offline simulation and live streaming),
- **streams** apply their ``xform`` pipeline to the merged parent frames,
- **fan-in** (≥2 in-edges, core.clj:152-153) merges parents with
  ``unionByName`` after checking union compatibility — the schema-drift
  check the reference leaves to convention (SURVEY.md §2.3),
- **sink topics** carry the merged parent frame; actually writing it is the
  runner's job (``streaming.runner`` / ``df.write``).

Scale note: nothing here adds a shuffle — merges are unions and xforms are
whatever the pipeline does; Catalyst sees one logical plan per entity and
optimizes across the whole chain (fusion, pushdown, pruning).
"""

from __future__ import annotations

import itertools
import re
from functools import reduce

from pyspark.sql import DataFrame, SparkSession

from kafka_streams_the_clojure_way_spark.plans.spec import (
    Topology,
    TopologyError,
    parents_of,
    topo_order,
    validate_topology,
)


def _merge_parents(name: str, frames: list[DataFrame]) -> DataFrame:
    if len(frames) == 1:
        return frames[0]
    # Union compatibility check — fail fast with entity context instead of
    # a deep AnalysisException at action time.
    first_cols = set(frames[0].columns)
    for frame in frames[1:]:
        if set(frame.columns) != first_cols:
            raise TopologyError(
                f"merge into {name!r} has incompatible schemas: "
                f"{sorted(first_cols)} vs {sorted(frame.columns)}"
            )
    return reduce(DataFrame.unionByName, frames)


def compile_topology(
    spark: SparkSession,
    topology: Topology,
    inputs: dict[str, DataFrame],
) -> dict[str, DataFrame]:
    """Compile a validated topology into a DataFrame per entity.

    ``inputs`` maps each *source* entity name (no in-edges) to its
    DataFrame. Returns ``{entity_name: DataFrame}`` for every entity, so
    callers can run/inspect any node — the property ``run-experiment``
    relies on (core.clj:224-234, outputs read per entity at 240-244).
    """
    validate_topology(topology)
    entities = topology["entities"]
    parents = parents_of(topology)
    compiled: dict[str, DataFrame] = {}

    for name in topo_order(topology):
        ent = entities[name]
        ups = parents[name]
        if not ups:
            if name not in inputs:
                raise TopologyError(
                    f"source entity {name!r} has no in-edges and no bound input DataFrame"
                )
            frame = inputs[name]
        elif ent["type"] == "join":
            if len(ups) != 2:
                raise TopologyError(
                    f"join entity {name!r} needs exactly 2 parents, has {len(ups)}"
                )
            left, right = (compiled[p] for p in ups)
            frame = left.join(right, on=list(ent["on"]), how=ent.get("how", "inner"))
        else:
            frame = _merge_parents(name, [compiled[p] for p in ups])
        if ent["type"] == "stream" and ent.get("xform") is not None:
            frame = frame.transform(ent["xform"])
        elif ent["type"] == "stream" and ent.get("sql") is not None:
            frame = _apply_sql(spark, frame, ent["sql"])
        elif ent["type"] == "table":
            frame = _compact_table(frame, ent["key"], ent["seq"])
        compiled[name] = frame

    return compiled


def _compact_table(frame: DataFrame, key: str, seq: str) -> DataFrame:
    """KTable semantics: latest record per ``key`` by ``seq``. One
    max_by aggregate — a single shuffle on the key in batch; in
    streaming the SAME expression is an update-mode stateful aggregate
    (state = one packed row per key, the changelog-compaction memory
    model). Ties on ``seq`` resolve to an arbitrary contender, exactly
    like log compaction with duplicate offsets — give seq a unique
    tiebreaker if that matters."""
    from pyspark.sql import functions as F

    packed = F.max_by(F.struct(*frame.columns), F.col(seq))
    return frame.groupBy(key).agg(packed.alias("__latest")).select("__latest.*")


_view_counter = itertools.count()

# ``__input__`` as an identifier token: not preceded/followed by a word
# character or quote, so occurrences inside quoted SQL string literals
# ('...__input__...') are left alone.
_INPUT_TOKEN = re.compile(r"(?<![\w'\"])__input__(?![\w'\"])")


def _apply_sql(spark: SparkSession, frame: DataFrame, sql: str) -> DataFrame:
    """Run a SQL transform against the entity's merged input, exposed as
    ``__input__``. A unique temp view per application keeps concurrent
    compiles (and re-compiles of the same topology) from colliding; works
    identically on streaming frames (temp views are mode-agnostic). The
    view is dropped immediately after planning — DataFrames are analyzed
    eagerly, so the view's plan is already inlined and nothing leaks into
    the session catalog."""
    vname = f"__topology_input_{next(_view_counter)}"
    frame.createOrReplaceTempView(vname)
    try:
        return spark.sql(_INPUT_TOKEN.sub(vname, sql))
    finally:
        spark.catalog.dropTempView(vname)


def sink_entities(topology: Topology) -> list[str]:
    """Entities with in-edges but no out-edges — the topology's outputs."""
    has_out = {src for src, _ in topology["workflow"]}
    has_in = {dst for _, dst in topology["workflow"]}
    return sorted(has_in - has_out)
