"""Iterative graph operators — the one algorithm class the DataFrame DSL
cannot express in a single plan (SURVEY.md §7 M5: near-dup *clustering*,
not just pair-finding, is what an LLM-data dedup pipeline actually ships:
each cluster keeps one canonical document).

The reference has no graph surface (core.clj is a stateless pipeline);
this extends the §2.2 superset the same way GraphX/GraphFrames extend
Spark: the ITERATION is driver-side control flow, the DATA never leaves
the cluster.

Scale design (hash-min label propagation, a.k.a. "small-star" lite):
- state per iteration = one (node, label) frame, shuffled on node — the
  same partitioning every round, so AQE/exchange reuse keeps the join
  co-partitioned;
- convergence check is a 1-row aggregate (labels are monotonically
  non-increasing, so `sum(label)` is a fixpoint detector) — never a
  driver-side diff of full frames;
- lineage is truncated every round with localCheckpoint, otherwise the
  plan doubles per iteration and Catalyst analysis time explodes by
  round 10 (use `spark.sparkContext.setCheckpointDir` + `.checkpoint()`
  for multi-executor fault tolerance on a real cluster);
- rounds needed = graph diameter in the worst case; near-dup clusters
  are dense and shallow (diameter ~2-3), so `max_iter` is a guard rail,
  not the expected cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iter: int = 20,
) -> DataFrame:
    """Assign each node of the undirected graph ``edges`` the minimum
    node id reachable from it (its component id).

    Returns a frame ``(node, component)`` covering every node that
    appears in at least one edge. Raises if ``max_iter`` rounds don't
    reach the fixpoint (diameter > max_iter — pick a bigger guard).
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    # init = one propagation round fused in: label(u) = min(u, direct
    # neighbors) — distinct nodes fall out of the same groupBy for free,
    # and dense (clique-ish) near-dup graphs hit the fixpoint immediately
    labels = (
        sym.groupBy(F.col("u").alias("node"))
        .agg(F.least(F.col("node"), F.min("v")).alias("component"))
        .localCheckpoint()
    )
    prev_sum = None
    for _ in range(max_iter):
        # each node offers its label to every neighbor; keep the min of
        # (own label, best neighbor offer)
        offers = (
            sym.join(labels, sym.v == labels.node)
            .select(F.col("u").alias("node"), "component")
        )
        labels = (
            labels.select("node", "component")
            .union(offers)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        cur = labels.agg(
            F.sum("component").alias("s"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        cur_sum = (cur["s"], cur["n"])
        if cur_sum == prev_sum:
            return labels
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations"
    )


def cluster_assignments(
    all_ids: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_a: str = "id_a",
    pair_b: str = "id_b",
) -> DataFrame:
    """Every id from ``all_ids`` with its near-dup ``cluster_id`` (= min
    id of its connected component over ``pairs``); ids in no pair are
    their own singleton cluster. The downstream dedup policy is then a
    trivial ``filter(doc_id == cluster_id)`` to keep canonicals."""
    comp = connected_components(pairs, pair_a, pair_b)
    return (
        all_ids.select(id_col)
        .join(comp, all_ids[id_col] == comp.node, "left")
        .select(
            id_col,
            F.coalesce(F.col("component"), F.col(id_col)).alias("cluster_id"),
        )
    )
