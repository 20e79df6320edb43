"""Approximation QUALITY gates for the ANN variants: recall@10 of the
LSH-bucketed and IVF paths against the exact brute-force ranking. An ANN
operator that silently returns garbage candidates would still pass its
own value-oracle (the oracle mirrors the approximation); this test pins
the approximation itself to the exact answer."""

from __future__ import annotations

import pytest

from kafka_streams_the_clojure_way_spark.queries import QUERIES

SF = "/root/testdata/sf0.01"


def _topk_sets(df, k=10):
    out = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


@pytest.fixture(scope="module")
def exact_topk(spark):
    return _topk_sets(QUERIES["sim_cosine_topk_bruteforce"](spark, SF))


@pytest.mark.parametrize("variant,floor", [("sim_lsh_ann_topk", 0.25), ("sim_ivf_ann_topk", 0.25)])
def test_ann_recall_at_10(spark, exact_topk, variant, floor):
    approx = _topk_sets(QUERIES[variant](spark, SF))
    recalls = []
    for qid, exact in exact_topk.items():
        got = approx.get(qid, set())
        recalls.append(len(got & exact) / len(exact))
    mean_recall = sum(recalls) / len(recalls)
    # the synthetic embeddings are isotropic noise — the hardest possible
    # case for space partitioning (no cluster structure to exploit), so
    # the floor is modest; on real embedding corpora both variants sit
    # far higher. The assertion's job is catching a broken bucket/cell
    # join (recall ~n_probe/n_cells at random), not grading the dataset.
    assert mean_recall >= floor, f"{variant} mean recall@10 = {mean_recall:.3f}"
    assert len(recalls) == len(exact_topk)
