"""Topology spec + static validation (reference: core.clj:139-157, 246-252).

A topology is a plain dict::

    {
        "entities": {
            "topic/purchase-made": {"type": "topic", "name": "purchase-made",
                                     "schema": <StructType | None>},
            "stream/large-purchases": {"type": "stream",
                                        "xform": <Pipeline | None>},
            "topic/large-transaction-made": {"type": "topic",
                                              "name": "large-transaction-made"},
        },
        "workflow": [
            ["topic/purchase-made", "stream/large-purchases"],
            ["stream/large-purchases", "topic/large-transaction-made"],
        ],
    }

Entity types:
- ``topic``  — a named source/sink (Kafka topic, parquet path, or in-memory
  input); ≙ willa ``:topic`` entities (core.clj:140-142).
- ``stream`` — a transform node carrying an optional ``xform`` pipeline
  (``DataFrame -> DataFrame``); ≙ willa ``:kstream`` + ``::w/xform``
  (core.clj:144-147). Missing xform = identity. Alternatively a
  ``sql`` string transform (``SELECT ... FROM __input__``) — the SQL
  frontend woven into the topology DSL; ``__input__`` names the merged
  parent frame. ``xform`` and ``sql`` are mutually exclusive.
- ``join``   — a two-parent equi-join entity: ``on`` (list of column
  names) and optional ``how`` (default ``inner``). Parent ORDER in the
  workflow decides left/right. The KStream⋈KTable enrichment pattern
  the engine stack offers (jackdaw exposes js/join) but the reference
  never exercises (SURVEY §2.2 "Joins: absent").
- ``table``  — a changelog/KTable-like entity: the latest record per
  ``key`` (ordered by ``seq``) of its merged input — Kafka Streams'
  KTable compaction semantics, not exercised by the reference but part
  of the engine stack it sits on. Requires ``key`` and ``seq`` column
  names; works in batch (max_by aggregate) and streaming (update-mode
  aggregate) identically.

Multiple in-edges to one entity mean merge-at-that-node (unionByName), the
reference's implicit fan-in (core.clj:152-153).

Validation mirrors the reference's clojure.spec check (core.clj:246-252):
shape conformance and **cycle rejection**, plus checks the reference only
trusts by convention (SURVEY.md §2.3): every edge endpoint resolves, and
(at compile time, when schemas are known) merge branches are
union-compatible.
"""

from __future__ import annotations

from collections import deque
from typing import Any

VALID_TYPES = frozenset({"topic", "stream", "table", "join"})

Topology = dict[str, Any]


class TopologyError(ValueError):
    """Raised when a topology fails static validation — before any Spark
    job is planned (≙ spec explain at core.clj:247)."""


def validate_topology(topology: Topology) -> Topology:
    """Validate shape, entity refs, and acyclicity. Returns the topology
    unchanged so it can be used inline; raises TopologyError otherwise."""
    if not isinstance(topology, dict):
        raise TopologyError("topology must be a dict with 'entities' and 'workflow'")
    entities = topology.get("entities")
    workflow = topology.get("workflow")
    if not isinstance(entities, dict) or not entities:
        raise TopologyError("topology['entities'] must be a non-empty dict")
    if not isinstance(workflow, (list, tuple)):
        raise TopologyError("topology['workflow'] must be a list of [from, to] edges")

    for name, ent in entities.items():
        if not isinstance(ent, dict):
            raise TopologyError(f"entity {name!r} must be a dict")
        etype = ent.get("type")
        if etype not in VALID_TYPES:
            raise TopologyError(
                f"entity {name!r} has invalid type {etype!r}; expected one of {sorted(VALID_TYPES)}"
            )
        if etype == "join":
            on = ent.get("on")
            if not isinstance(on, (list, tuple)) or not on or not all(
                isinstance(c, str) and c for c in on
            ):
                raise TopologyError(
                    f"join entity {name!r} requires on=[column, ...]"
                )
            how = ent.get("how", "inner")
            if how not in {"inner", "left", "right", "full", "left_semi", "left_anti"}:
                raise TopologyError(f"join entity {name!r} has invalid how={how!r}")
        if etype == "table":
            for req in ("key", "seq"):
                if not isinstance(ent.get(req), str) or not ent[req]:
                    raise TopologyError(
                        f"table entity {name!r} requires a {req!r} column name"
                    )
        if etype == "topic" and (
            ent.get("xform") is not None or ent.get("sql") is not None
        ):
            raise TopologyError(f"topic entity {name!r} must not carry an xform/sql")
        if etype in {"join", "table"} and (
            ent.get("xform") is not None or ent.get("sql") is not None
        ):
            # The compiler applies xform/sql only on stream entities; a
            # join/table carrying one would be silently ignored — reject
            # instead (chain a stream entity after the join/table).
            raise TopologyError(
                f"{etype} entity {name!r} must not carry an xform/sql; "
                "chain a stream entity after it"
            )
        xform = ent.get("xform")
        if xform is not None and not callable(xform):
            raise TopologyError(f"entity {name!r} xform must be callable (DataFrame -> DataFrame)")
        sql = ent.get("sql")
        if sql is not None:
            if not isinstance(sql, str) or "__input__" not in sql:
                raise TopologyError(
                    f"entity {name!r} sql must be a string referencing __input__"
                )
            if xform is not None:
                raise TopologyError(f"entity {name!r} has both xform and sql")

    adjacency: dict[str, list[str]] = {name: [] for name in entities}
    indegree: dict[str, int] = {name: 0 for name in entities}
    seen_edges: set[tuple[str, str]] = set()
    for edge in workflow:
        if not (isinstance(edge, (list, tuple)) and len(edge) == 2):
            raise TopologyError(f"workflow edge {edge!r} must be a [from, to] pair")
        src, dst = edge
        for endpoint in (src, dst):
            if endpoint not in entities:
                raise TopologyError(f"workflow references undefined entity {endpoint!r}")
        if src == dst:
            raise TopologyError(f"self-loop on entity {src!r}")
        if (src, dst) in seen_edges:
            raise TopologyError(f"duplicate workflow edge {edge!r}")
        seen_edges.add((src, dst))
        adjacency[src].append(dst)
        indegree[dst] += 1

    # Kahn's algorithm — cycle rejection ≙ core.clj:250-252.
    queue = deque(sorted(n for n, d in indegree.items() if d == 0))
    visited = 0
    while queue:
        node = queue.popleft()
        visited += 1
        for nxt in adjacency[node]:
            indegree[nxt] -= 1
            if indegree[nxt] == 0:
                queue.append(nxt)
    if visited != len(entities):
        cyclic = sorted(n for n, d in indegree.items() if d > 0)
        raise TopologyError(f"workflow contains a cycle involving {cyclic}")

    return topology


def topo_order(topology: Topology) -> list[str]:
    """Deterministic topological order of entity names (validated first)."""
    validate_topology(topology)
    entities = topology["entities"]
    adjacency: dict[str, list[str]] = {name: [] for name in entities}
    indegree: dict[str, int] = {name: 0 for name in entities}
    for src, dst in topology["workflow"]:
        adjacency[src].append(dst)
        indegree[dst] += 1
    queue = deque(sorted(n for n, d in indegree.items() if d == 0))
    order: list[str] = []
    while queue:
        node = queue.popleft()
        order.append(node)
        ready = sorted(n for n in adjacency[node] if indegree[n] == 1)
        for nxt in adjacency[node]:
            indegree[nxt] -= 1
        queue.extend(ready)
    return order


def parents_of(topology: Topology) -> dict[str, list[str]]:
    """Entity -> ordered list of upstream entities (workflow order)."""
    parents: dict[str, list[str]] = {name: [] for name in topology["entities"]}
    for src, dst in topology["workflow"]:
        parents[dst].append(src)
    return parents
