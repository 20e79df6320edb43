"""Topology visualization (reference: ``wv/view-topology``, core.clj:204,237).

Renders the topology DAG as Graphviz dot text. No graphviz binary is
required — the dot source is the artifact; render it anywhere. For the
physical-plan view below the topology, use ``df.explain("formatted")`` on
any compiled entity.
"""

from __future__ import annotations

from kafka_streams_the_clojure_way_spark.plans.spec import Topology, validate_topology

_SHAPES = {"topic": "cylinder", "stream": "box", "table": "component", "join": "diamond"}


def to_dot(topology: Topology, *, name: str = "topology") -> str:
    """Graphviz dot source for the topology DAG."""
    validate_topology(topology)
    lines = [f"digraph {name} {{", "  rankdir=LR;"]
    for ent_name, ent in sorted(topology["entities"].items()):
        shape = _SHAPES.get(ent["type"], "box")
        label = ent_name.replace('"', r"\"")
        extra = ""
        if ent["type"] == "join":
            extra = f' xlabel="{ent.get("how", "inner")} on {",".join(ent["on"])}"'
        elif ent["type"] == "table":
            extra = f' xlabel="latest by {ent["seq"]} per {ent["key"]}"'
        elif ent.get("sql") is not None:
            extra = ' xlabel="sql"'
        lines.append(f'  "{label}" [shape={shape}{extra}];')
    for src, dst in topology["workflow"]:
        lines.append(f'  "{src}" -> "{dst}";')
    lines.append("}")
    return "\n".join(lines)
