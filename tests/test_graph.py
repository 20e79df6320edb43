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
