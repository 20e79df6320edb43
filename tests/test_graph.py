"""connected_components correctness vs a plain union-find — chains
(diameter > hash-min's 1-hop), multiple components, singleton-free
node sets, and a seeded random graph."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from kafka_streams_the_clojure_way_spark.operators.graph import (
    cluster_assignments,
    connected_components,
)


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    return {n: find(n) for n in parent}


def _check(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.component for r in connected_components(df).collect()}
    want = _union_find(edges)
    assert got == want


def test_chain_and_islands(spark):
    # a 6-chain (diameter 5 — needs several propagation rounds), a
    # triangle, and a disjoint pair
    edges = [(10, 11), (11, 12), (12, 13), (13, 14), (14, 15),
             (1, 2), (2, 3), (3, 1),
             (100, 200)]
    _check(spark, edges)


def test_random_graph(spark):
    rng = random.Random(42)
    nodes = list(range(60))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(80)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    _check(spark, edges)


def test_cluster_assignments_includes_singletons(spark):
    all_ids = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    pairs = spark.createDataFrame([(1, 5), (5, 7)], "id_a long, id_b long")
    got = {r.doc_id: r.cluster_id for r in cluster_assignments(all_ids, pairs).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 5: 1, 6: 6, 7: 1}


def test_non_convergence_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(12)], "src long, dst long")
    with pytest.raises(RuntimeError, match="converge"):
        # local_max_edges=0 forces the distributed loop — the guard under test
        connected_components(df, max_iter=1, local_max_edges=0)


def test_local_and_distributed_paths_agree(spark):
    """The union-find fast path and the hash-min loop must label every
    node identically (same min-id-of-component contract)."""
    import random

    rng = random.Random(7)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    df = spark.createDataFrame(edges, "src long, dst long")
    local = {
        (r.node, r.component) for r in connected_components(df).collect()
    }
    dist = {
        (r.node, r.component)
        # sparse random graphs are path-y: allow diameter-many rounds
        for r in connected_components(df, local_max_edges=0, max_iter=60).collect()
    }
    assert local == dist and len(local) > 0


# --------------------------------------------------------------------------
# triangle_counts
# --------------------------------------------------------------------------

def _brute_triangles(edges):
    """Per-node triangle counts by brute force over the canonical edge set."""
    from itertools import combinations

    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in es for n in e})
    counts = {}
    for a, b, c in combinations(nodes, 3):
        if (a, b) in es and (b, c) in es and (a, c) in es:
            for n in (a, b, c):
                counts[n] = counts.get(n, 0) + 1
    return counts


def _tri_check(spark, edges):
    from kafka_streams_the_clojure_way_spark.operators.graph import triangle_counts

    df = spark.createDataFrame(edges, "u long, v long")
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == _brute_triangles(edges)


def test_triangles_k4(spark):
    """K4: 4 triangles, every node in exactly 3."""
    _tri_check(spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)])


def test_triangles_hub_star_has_none(spark):
    """A star (celebrity hub) has no triangles — and the degree
    orientation must not manufacture any."""
    _tri_check(spark, [(0, i) for i in range(1, 30)])


def test_triangles_hub_plus_rim(spark):
    """Wheel graph: hub + cycle rim. Each rim edge closes exactly one
    triangle with the hub; rim nodes sit in 2, the hub in all of them.
    Exercises the skewed-degree orientation path (hub degree >> rim)."""
    rim = [(i, i % 8 + 1) for i in range(1, 9)]
    spokes = [(0, i) for i in range(1, 9)]
    _tri_check(spark, rim + spokes)


def test_triangles_dedup_and_orientation_insensitive(spark):
    """Duplicate edges, reversed orientations, and self-loops must not
    change counts."""
    base = [(1, 2), (2, 3), (1, 3)]
    noisy = base + [(2, 1), (3, 2), (1, 1), (3, 1), (1, 2)]
    from kafka_streams_the_clojure_way_spark.operators.graph import triangle_counts

    df = spark.createDataFrame(noisy, "u long, v long")
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangles_random_graph(spark):
    rng = random.Random(13)
    edges = list({tuple(sorted((rng.randrange(30), rng.randrange(30)))) for _ in range(120)})
    _tri_check(spark, [e for e in edges if e[0] != e[1]])


# --------------------------------------------------------------------------
# PageRank (fixed-point)
# --------------------------------------------------------------------------

def _directed(spark, pairs):
    return spark.createDataFrame([{"src": u, "dst": v} for u, v in pairs])


def test_pagerank_star_center_dominates(spark):
    from kafka_streams_the_clojure_way_spark.operators.graph import PR_UNIT, pagerank

    leaves = list(range(1, 6))
    pairs = [(0, v) for v in leaves] + [(v, 0) for v in leaves]
    ranks = {r.node: r.rank_units for r in pagerank(_directed(spark, pairs)).collect()}
    assert ranks[0] > max(ranks[v] for v in leaves)
    # symmetric leaves get identical ranks (determinism within one run)
    assert len({ranks[v] for v in leaves}) == 1
    # total mass never exceeds the initial n*unit (floor division only leaks)
    assert sum(ranks.values()) <= 6 * PR_UNIT


def test_pagerank_partitioning_invariant(spark):
    from kafka_streams_the_clojure_way_spark.operators.graph import pagerank

    pairs = [(u, v) for u in range(12) for v in range(12) if (u + v) % 3 == 0 and u != v]
    df = _directed(spark, pairs)
    base = {(r.node, r.rank_units) for r in pagerank(df).collect()}
    repart = {(r.node, r.rank_units) for r in pagerank(df.repartition(7)).collect()}
    assert base == repart
