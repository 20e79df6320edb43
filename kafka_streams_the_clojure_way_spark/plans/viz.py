"""Topology visualization (reference: ``wv/view-topology``, core.clj:204,237).

Renders the topology DAG as Graphviz dot text — bare, or annotated with
each entity's experiment outputs (the reference's killer demo: run the
topology on literal records, then *look* at every intermediate stream).
No graphviz binary is required — the dot source is the artifact; render
it anywhere. For the physical-plan view below the topology, use
``df.explain("formatted")`` on any compiled entity.
"""

from __future__ import annotations

from typing import Any

from kafka_streams_the_clojure_way_spark.plans.spec import Topology, validate_topology

_SHAPES = {"topic": "cylinder", "stream": "box", "table": "component", "join": "diamond"}


def _esc(s: str) -> str:
    """Escape for a double-quoted dot label."""
    return s.replace("\\", "\\\\").replace('"', '\\"')


def _rows_label(rows: list[dict[str, Any]], max_rows: int) -> str:
    """Render output rows as left-justified label lines (dot ``\\l``)."""
    shown = rows[:max_rows]
    lines = []
    for row in shown:
        body = " ".join(f"{k}={row[k]!r}" for k in row)
        lines.append(_esc(body[:120]))
    if len(rows) > max_rows:
        lines.append(f"... {len(rows) - max_rows} more row(s)")
    if not rows:
        lines.append("(no output)")
    return "".join(line + "\\l" for line in lines)


def to_dot(
    topology: Topology,
    *,
    name: str = "topology",
    outputs: dict[str, list[dict[str, Any]]] | None = None,
    max_rows: int = 3,
) -> str:
    """Graphviz dot source for the topology DAG.

    With ``outputs`` (the dict returned by ``run_experiment``), every
    entity node is annotated with its experiment output rows — the
    reference's ``(wv/view-topology (we/run-experiment ...))`` flow at
    core.clj:237-244, where the rendered topology shows each entity's
    ``::we/output``. ``max_rows`` bounds rows per node so a large
    experiment stays renderable; a trailing "... N more" line records the
    truncation.
    """
    validate_topology(topology)
    lines = [f"digraph {name} {{", "  rankdir=LR;"]
    if outputs is not None:
        lines.append("  node [fontsize=10];")
    for ent_name, ent in sorted(topology["entities"].items()):
        shape = _SHAPES.get(ent["type"], "box")
        label = _esc(ent_name)
        extra = ""
        if ent["type"] == "join":
            extra = f' xlabel="{ent.get("how", "inner")} on {",".join(ent["on"])}"'
        elif ent["type"] == "table":
            extra = f' xlabel="latest by {ent["seq"]} per {ent["key"]}"'
        elif ent.get("sql") is not None:
            extra = ' xlabel="sql"'
        if outputs is not None and ent_name in outputs:
            rows_part = _rows_label(outputs[ent_name], max_rows)
            extra += f' label="{label}\\n{rows_part}"'
        lines.append(f'  "{label}" [shape={shape}{extra}];')
    for src, dst in topology["workflow"]:
        lines.append(f'  "{_esc(src)}" -> "{_esc(dst)}";')
    lines.append("}")
    return "\n".join(lines)
