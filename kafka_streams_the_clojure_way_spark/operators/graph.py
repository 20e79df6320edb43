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


#: Below this many (directed) edges the whole graph fits on the driver and
#: a union-find beats N distributed rounds of fixed job overhead. Sized
#: against PYTHON object overhead, not raw longs: the union-find is a dict
#: of boxed ints plus toLocalIterator Row objects — realistically
#: ~200-400 bytes per edge, so 300k edges ≈ 60-120 MB of driver heap, a
#: safe fraction of a default driver. The distributed min-label loop is
#: the path for anything larger.
LOCAL_CC_MAX_EDGES = 300_000


def _local_union_find(rows) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for u, v in rows:
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            # union by min id so roots ARE the component labels
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iter: int = 20,
    local_max_edges: int = LOCAL_CC_MAX_EDGES,
) -> DataFrame:
    """Assign each node of the undirected graph ``edges`` the minimum
    node id reachable from it (its component id).

    Returns a frame ``(node, component)`` covering every node that
    appears in at least one edge. Raises if ``max_iter`` rounds don't
    reach the fixpoint (diameter > max_iter — pick a bigger guard).

    Adaptive execution: after dedup-symmetrizing, the edge count is
    known; at or below ``local_max_edges`` the edge list is collected
    into a driver-side union-find — one job instead of ~4 jobs x rounds,
    the same small-graph escape hatch production CC implementations ship
    (near-dup pair graphs are usually tiny relative to the corpus even
    when the corpus is 100 TB). Larger graphs take the distributed
    hash-min loop below; pass ``local_max_edges=0`` to force it.
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    if sym.count() <= local_max_edges:
        import pandas as pd

        # Arrow pull + int-array iteration, not toLocalIterator: Row
        # objects cost ~10x per edge, and the union-by-min-id result is
        # independent of edge order, so any pull order is equivalent.
        pdf = sym.toPandas()
        comp = _local_union_find(
            zip(pdf["u"].to_numpy().tolist(), pdf["v"].to_numpy().tolist())
        )
        import numpy as np

        out = sym.sparkSession.createDataFrame(
            pd.DataFrame(
                {
                    "node": np.fromiter(
                        comp.keys(), dtype=np.int64, count=len(comp)
                    ),
                    "component": np.fromiter(
                        comp.values(), dtype=np.int64, count=len(comp)
                    ),
                }
            ),
            "node long, component long",
        )
        # createDataFrame(list) is RDD-backed — NO stats, so a consumer
        # join planner sees defaultSizeInBytes and falls back to
        # sort-merge (r11: the keep-best/cluster-assignment queries each
        # paid an extra full-docs shuffle). The marker lets consumers
        # broadcast-hint a frame that is PROVABLY driver-small (it was
        # just collected) without guessing about the distributed path.
        out._kstcw_driver_small = True
        return out
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
    # broadcast the component map when the union-find escape hatch just
    # built it on the driver (see the _kstcw_driver_small note there);
    # the distributed-path frame keeps planner/AQE strategy choice.
    hint = (
        F.broadcast if getattr(comp, "_kstcw_driver_small", False) else (lambda d: d)
    )
    return (
        all_ids.select(id_col)
        .join(hint(comp), all_ids[id_col] == comp.node, "left")
        .select(
            id_col,
            F.coalesce(F.col("component"), F.col(id_col)).alias("cluster_id"),
        )
    )


def triangle_counts(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    *,
    pre_normalized: bool = False,
) -> DataFrame:
    """Per-node triangle counts over an undirected simple graph, as two
    equi-joins (node-iterator / Cohen's MapReduce formulation, the
    GraphX built-in's shape).

    ``edges`` must hold each undirected edge once (any orientation, no
    self-loops required to be pre-filtered — they are dropped here).

    Scale design — DEGREE ordering, not id ordering: every edge is
    re-oriented from its lower-(degree, id) endpoint to the higher one,
    so wedges are enumerated at each edge's LOWER-degree endpoint. That
    bounds per-node wedge generation by (min-degree)^2 and turns the
    classic hub blowup (a celebrity node with degree d contributing d^2
    wedges on one reducer) into work spread across its low-degree
    neighbors — sum over edges of min-degree is O(m^1.5) total wedges on
    any graph, the best general bound. Both joins are plain shuffled
    equi-joins; nothing is ever collected.

    Returns (node, n_triangles) for nodes in >= 1 triangle.

    ``pre_normalized``: the caller guarantees ``edges`` is already one
    row per undirected edge with ``src < dst`` on every row (which also
    rules out self-loops) — the normalize projection, the self-loop
    filter, and the dedup SHUFFLE are all identities on such input and
    are skipped (r12; the co-purchase caller's materialized edge table
    is distinct-with-u<v by construction, parity pinned in
    tests/test_round12_opts.py). The localCheckpoint lineage cut is
    kept on BOTH branches: deg (x2 via the union) and ranked all read
    ``e``, and without the cut the caller's edge-construction subtree
    (often itself a join) re-expands per reference (the r11 plan of
    graph_triangle_parts carried 154 Exchange nodes)."""
    if pre_normalized:
        e = edges.select(
            F.col(src).alias("a"), F.col(dst).alias("b")
        ).localCheckpoint(eager=False)
    else:
        e = (
            edges.select(
                F.least(F.col(src), F.col(dst)).alias("a"),
                F.greatest(F.col(src), F.col(dst)).alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
            .dropDuplicates(["a", "b"])
            .localCheckpoint(eager=False)
        )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da, db = deg.alias("da"), deg.alias("db")
    ranked = (
        e.join(da, F.col("a") == F.col("da.node"))
        .join(db, F.col("b") == F.col("db.node"))
        .select(
            "a",
            "b",
            (
                (F.col("da.deg") < F.col("db.deg"))
                | ((F.col("da.deg") == F.col("db.deg")) & (F.col("a") < F.col("b")))
            ).alias("a_first"),
        )
    )
    oriented = ranked.select(
        F.when(F.col("a_first"), F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(F.col("a_first"), F.col("b")).otherwise(F.col("a")).alias("hi"),
        # materialized once: referenced THREE times below (both wedge
        # legs + the closing-edge side) — each reference would otherwise
        # re-run the degree joins above.
    ).localCheckpoint(eager=False)
    w1, w2 = oriented.alias("w1"), oriented.alias("w2")
    # both legs share lo, so distinct edges always differ in hi: strict <
    # enumerates each unordered wedge exactly once
    wedges = w1.join(
        w2,
        (F.col("w1.lo") == F.col("w2.lo")) & (F.col("w1.hi") < F.col("w2.hi")),
    )
    # close the wedge: the (hi1, hi2) edge may be oriented either way
    closer = oriented.select(
        F.least("lo", "hi").alias("ca"), F.greatest("lo", "hi").alias("cb")
    )
    tri = wedges.select(
        F.col("w1.lo").alias("x"),
        F.least(F.col("w1.hi"), F.col("w2.hi")).alias("y"),
        F.greatest(F.col("w1.hi"), F.col("w2.hi")).alias("z"),
    ).join(
        closer,
        (F.col("y") == F.col("ca")) & (F.col("z") == F.col("cb")),
    )
    return (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


# --------------------------------------------------------------------------
# PageRank (deterministic fixed-point)
# --------------------------------------------------------------------------

#: integer fixed-point scale for PageRank mass. Every node starts at
#: PR_UNIT rank units; contributions use integer division, so ranks are
#: BIGINTs and sums are exact and order-insensitive — no float-summation
#: drift between runs, partitionings, or engines. Choose unit so that
#: n_nodes * unit * PR_DAMP_NUM stays < 2^63 (10^12 is safe to ~10^5
#: nodes; drop to 10^9 for ~10^8-node graphs).
PR_UNIT = 10**12
PR_DAMP_NUM = 85   # damping 0.85 as an exact ratio
PR_DAMP_DEN = 100
PR_ITERS = 6

#: max node count for the per-iteration broadcast-join fast path: a
#: (node, rank) row is two longs (~16 B unserialized, ~32 B in a built
#: hash relation), so 2M nodes is a ~64 MB broadcast — inside the
#: engine's autoBroadcastJoinThreshold and far below the 8 GB hard cap.
#: Larger graphs keep the shuffled sort-merge rounds.
PR_BROADCAST_MAX_NODES = 2_000_000

#: max DEDUPED edge count for the driver-local fixed-point chain (r11,
#: the kcenter/connected_components escape-hatch precedent): below this,
#: 6 Spark rounds of join+groupBy are pure fixed overhead (~12 jobs +
#: 6 lineage checkpoints for integer arithmetic a driver does in
#: milliseconds), so the operator collects the checkpointed edge list
#: ONCE (bounded: 2M (long, long) rows ~ 32 MB) and iterates in numpy
#: int64 — bit-identical by construction, every operation is the same
#: exact integer div/sum. Production graphs above the gate keep the
#: distributed loop; the gate reads ONE count off the already-
#: materialized checkpoint, so the decision is scale-adaptive, not a
#: local[32] constant.
PR_LOCAL_MAX_EDGES = 2_000_000


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = PR_ITERS,
    unit: int = PR_UNIT,
    *,
    assume_distinct: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank over directed ``(src, dst)`` edges, in
    integer fixed-point so the result is bit-reproducible (Page et al.
    '99 semantics; GraphX's staticPageRank shape).

    rank_0(v) = unit;  contrib(u) = rank(u) div outdeg(u);
    rank_t+1(v) = ((1-d)*unit) + d * sum(incoming contribs), with d the
    exact ratio PR_DAMP_NUM/PR_DAMP_DEN and every division an integer
    floor — floats never appear, so per-node ranks are exact BIGINTs no
    matter how partial sums are ordered.

    Scale design mirrors connected_components: per-iteration state is
    one (node, rank) frame shuffled on node; the edge+outdeg frame is
    computed once and checkpointed; each round is one equi-join + one
    groupBy; lineage is truncated per round so Catalyst analysis stays
    O(1) per iteration. Iterations are FIXED (not convergence-tested):
    the driver loop runs exactly ``iters`` Spark rounds.

    Nodes with no in-edges keep the base mass; dangling nodes (no
    out-edges) leak their damped mass, as in the uniform-teleport
    formulation without dangling redistribution.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not assume_distinct:
        # ``assume_distinct``: the caller guarantees one row per directed
        # edge (r11: the symmetrized distinct co-purchase upstream is
        # distinct by construction) — skip the dedup shuffle.
        e = e.dropDuplicates(["src", "dst"])
    # materialized once: nodes AND eo both derive from e, and without
    # the cut each re-expands the full upstream subtree (the caller's
    # edge construction is often itself a join of duplicated frames —
    # 154 Exchange nodes in the pagerank query's r11 plan).
    e = e.localCheckpoint(eager=False)
    base = ((PR_DAMP_DEN - PR_DAMP_NUM) * unit) // PR_DAMP_DEN

    # Size-gated driver-local chain (see PR_LOCAL_MAX_EDGES). r12: the
    # edge-count gate runs FIRST, off the checkpoint this count
    # materializes — the former order built and counted a distinct
    # nodes frame (an extra O(E) shuffle + checkpoint) before the gate,
    # only for the local path to rederive the node ids in numpy anyway.
    # The node-count gate is evaluated on node_ids.size, which equals
    # the nodes frame's count by construction (unique(src) U unique(dst)),
    # so the gate decisions are IDENTICAL to the old order.
    if e.count() <= PR_LOCAL_MAX_EDGES:
        import numpy as np

        rows = e.toPandas()
        src_arr = rows["src"].to_numpy(dtype=np.int64)
        dst_arr = rows["dst"].to_numpy(dtype=np.int64)
        node_ids = np.unique(np.concatenate([src_arr, dst_arr]))
        if node_ids.size <= PR_BROADCAST_MAX_NODES:
            import pandas as pd

            si = np.searchsorted(node_ids, src_arr)
            di = np.searchsorted(node_ids, dst_arr)
            outdeg_arr = np.bincount(si, minlength=node_ids.size)
            r = np.full(node_ids.size, int(unit), dtype=np.int64)
            for _ in range(iters):
                c = r[si] // outdeg_arr[si]
                inc_arr = np.zeros(node_ids.size, dtype=np.int64)
                np.add.at(inc_arr, di, c)  # int64 accumulate — exact
                r = base + (PR_DAMP_NUM * inc_arr) // PR_DAMP_DEN
            spark = edges.sparkSession
            # pandas conversion, not a list of tuples: a node-sized
            # list pays one py4j pickle per row (measured 2.0 s vs
            # 0.39 s for 19.5k rows at sf0.1); int64 -> LongType is
            # exact either way.
            return spark.createDataFrame(
                pd.DataFrame({"node": node_ids, "rank_units": r}),
                "node long, rank_units long",
            )

    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # Join-strategy choice for the 2 joins inside every round (guide §3.1):
    # the rank/inc frames are NODE-sized two-long-column tables behind a
    # checkpoint, so Catalyst has no size estimate and falls back to
    # sort-merge — which re-shuffles the EDGE table every iteration (6
    # edge shuffles per query). When the node count is small enough to
    # broadcast safely, hint both sides broadcast: per round the edges
    # then never move — one shuffle total (the contrib groupBy), per
    # iteration. Scale-adaptive, not local-tuned: one count job on the
    # checkpointed nodes frame decides; a 1e8-node production graph
    # exceeds the cap and keeps the shuffled path.
    n_nodes = nodes.count()
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    eo = e.join(outdeg, "src").localCheckpoint(eager=False)
    small = n_nodes <= PR_BROADCAST_MAX_NODES
    hint = F.broadcast if small else (lambda df: df)
    rank = nodes.select("node", F.lit(int(unit)).cast("long").alias("r"))
    for _ in range(iters):
        contrib = eo.join(hint(rank), eo["src"] == rank["node"]).selectExpr(
            "dst AS node", "r div outdeg AS c"
        )
        inc = contrib.groupBy("node").agg(F.sum("c").alias("inc"))
        rank = (
            nodes.join(hint(inc), "node", "left")
            .selectExpr(
                "node",
                f"CAST({base} + ({PR_DAMP_NUM} * coalesce(inc, CAST(0 AS BIGINT)))"
                f" div {PR_DAMP_DEN} AS BIGINT) AS r",
            )
            .localCheckpoint(eager=False)
        )
    return rank.select("node", F.col("r").alias("rank_units"))


def pagerank_sql(
    edges_sql: str,
    iters: int = PR_ITERS,
    unit: int = PR_UNIT,
) -> str:
    """DuckDB twin of :func:`pagerank`: the iteration unrolled as a CTE
    chain (same constants, same integer arithmetic). ``edges_sql`` must
    select distinct directed (src, dst)."""
    base = ((PR_DAMP_DEN - PR_DAMP_NUM) * unit) // PR_DAMP_DEN
    ctes = [
        f"edges AS ({edges_sql})",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        "outdeg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS outdeg"
        " FROM edges GROUP BY src)",
        f"r0 AS (SELECT node, CAST({unit} AS BIGINT) AS r FROM nodes)",
    ]
    for t in range(iters):
        ctes.append(
            f"""r{t + 1} AS (
        SELECT n.node,
               CAST({base} + ({PR_DAMP_NUM} * COALESCE(s.inc, 0))
                    // {PR_DAMP_DEN} AS BIGINT) AS r
        FROM nodes n LEFT JOIN (
            SELECT e.dst AS node, CAST(SUM(r.r // d.outdeg) AS BIGINT) AS inc
            FROM edges e
            JOIN r{t} r ON r.node = e.src
            JOIN outdeg d ON d.node = e.src
            GROUP BY e.dst
        ) s ON s.node = n.node
    )"""
        )
    chain = ",\n    ".join(ctes)
    return f"""
    WITH {chain}
    SELECT node, r AS rank_units FROM r{iters}
    """
