"""Unit tests for similarity-search operators on literal vectors."""

from __future__ import annotations

import math

from kafka_streams_the_clojure_way_spark.operators import similarity as S


def _emb(spark, vecs):
    dim = S.EMBED_DIM
    rows = [
        {"vec_id": i, "embedding": [float(x) for x in v] + [0.0] * (dim - len(v))}
        for i, v in enumerate(vecs)
    ]
    return spark.createDataFrame(rows)


def test_brute_force_topk_exact_neighbors(spark):
    # v1 ~ v0 (same direction), v2 orthogonal
    corpus = _emb(spark, [[1, 0], [2, 0.01], [0, 5]])
    queries = corpus.filter("vec_id = 0")
    out = S.brute_force_topk(corpus, queries, k=2).orderBy("rank").collect()
    assert [r.neighbor_id for r in out] == [1, 2]
    assert out[0].cosine_r > 0.99
    assert abs(out[1].cosine_r) < 1e-6


def test_brute_force_excludes_self(spark):
    corpus = _emb(spark, [[1, 0], [0, 1]])
    out = S.brute_force_topk(corpus, corpus, k=5).collect()
    assert all(r.query_id != r.neighbor_id for r in out)


def test_lsh_bucket_deterministic_and_groups_similar(spark):
    import pyspark.sql.functions as F

    corpus = _emb(spark, [[1, 2, 3], [1.01, 2.0, 3.0], [-1, -2, -3]])
    b = corpus.select(S.lsh_bucket(F.col("embedding")).alias("b")).collect()
    buckets = [r.b for r in b]
    assert buckets[0] == buckets[1]          # near-identical -> same bucket
    assert buckets[0] != buckets[2]          # opposite vector -> differs
    assert all(0 <= x < 2**S.N_PLANES for x in buckets)


def test_pandas_topk_matches_exact(spark):
    corpus = _emb(
        spark,
        [[math.cos(i / 7), math.sin(i / 7), i % 3] for i in range(30)],
    )
    queries = corpus.filter("vec_id IN (0, 5)")
    exact = {
        (r.query_id, r.rank): r.neighbor_id
        for r in S.brute_force_topk(corpus, queries, k=5).collect()
    }
    fast = {
        (r.query_id, r.rank): r.neighbor_id
        for r in S.cosine_topk_pandas(corpus, queries, k=5).collect()
    }
    assert exact == fast


def test_cosine_topk_pandas_rejects_oversized_query_set(spark, monkeypatch):
    """The pandas path driver-collects the query side; a corpus-sized
    query frame must fail fast, not OOM the driver."""
    import pytest

    import pyspark.sql.functions as F

    monkeypatch.setattr(S, "MAX_PANDAS_QUERY_ROWS", 5)
    df = spark.range(10).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(2.0)).alias("embedding"),
    )
    with pytest.raises(ValueError, match="query set exceeds"):
        S.cosine_topk_pandas(df, df, k=3)


def test_quantize_codes_in_int8_range_and_zero_safe(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [
            {"vec_id": 0, "embedding": [1.0, -0.5, 0.25, 0.0]},
            {"vec_id": 1, "embedding": [0.0, 0.0, 0.0, 0.0]},  # zero vector
            {"vec_id": 2, "embedding": [-2.0, 2.0, 1.0, -1.0]},
        ]
    )
    rows = {
        r.vec_id: r.q
        for r in df.select("vec_id", S.quantize(F.col("embedding")).alias("q")).collect()
    }
    # floor(x/scale + .5): negative exact halves round UP (-63.5 -> -63),
    # the same convention both engines compute
    assert rows[0] == [127, -63, 32, 0]
    assert rows[1] == [0, 0, 0, 0]            # no div-by-zero
    assert rows[2] == [-127, 127, 64, -63]
    assert all(-127 <= c <= 127 for codes in rows.values() for c in codes)


def test_quantized_topk_recall_against_exact(spark):
    """int8 quantization must preserve most of the exact top-k (the
    documented trade-off is rank jitter near ties, not lost neighbors)."""
    emb = _emb(
        spark,
        [[1.0, 0.1 * i] + [0.01 * ((i * 7) % 5)] for i in range(40)],
    )
    exact = S.brute_force_topk(emb, emb.filter("vec_id < 3"), k=5)
    quant = S.quantized_topk(emb, emb.filter("vec_id < 3"), k=5)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    q = {(r.query_id, r.neighbor_id) for r in quant.collect()}
    assert len(e & q) / len(e) >= 0.8


def test_quantized_rerank_recovers_exact_topk(spark):
    """Re-ranking 50 int8 candidates with float cosine should recover
    (essentially all of) the exact top-5: stage-1 quantization error only
    loses a true neighbor if it falls below the candidate pool."""
    emb = _emb(
        spark,
        [[1.0, 0.1 * i, 0.05 * ((i * 3) % 7)] for i in range(60)],
    )
    probes = emb.filter("vec_id < 3")
    exact = S.brute_force_topk(emb, probes, k=5)
    rerank = S.quantized_rerank_topk(emb, probes, k=5, n_candidates=20)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    q = {(r.query_id, r.neighbor_id) for r in rerank.collect()}
    assert len(e & q) / len(e) >= 0.95


def test_brute_force_rejects_oversized_query_set(spark, monkeypatch):
    """brute_force_topk is |queries| x |corpus|: a corpus-fraction probe
    set is quadratic at scale, so the probe side is bounded-absolute."""
    import pytest

    import pyspark.sql.functions as F

    monkeypatch.setattr(S, "MAX_BRUTE_FORCE_QUERIES", 5)
    df = spark.range(10).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(2.0)).alias("embedding"),
    )
    with pytest.raises(ValueError, match="query set exceeds"):
        S.brute_force_topk(df, df, k=3)


def test_mmr_topk_invariants(spark):
    import pyspark.sql.functions as F

    from kafka_streams_the_clojure_way_spark.sources.files import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    out = S.mmr_topk(emb, queries, k=5, n_cand=20).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, {})[r.pick] = r.neighbor_id
    shortlist = {
        (r.query_id, r.neighbor_id)
        for r in S.brute_force_topk(emb, queries, k=20).collect()
    }
    top1 = {
        r.query_id: r.neighbor_id
        for r in S.brute_force_topk(emb, queries, k=1).collect()
    }
    for qid, picks in by_q.items():
        # exactly picks 1..5, all distinct, all from the top-20 shortlist
        assert sorted(picks) == [1, 2, 3, 4, 5]
        assert len(set(picks.values())) == 5
        assert all((qid, nid) in shortlist for nid in picks.values())
        # pick 1 is pure relevance argmax (lambda only bites from pick 2)
        assert picks[1] == top1[qid]


def test_kcenter_coreset_farthest_point_property(spark):
    """pick 1 = lowest id; pick 2 = the global argmax of rounded cosine
    distance to pick 1 (recomputed directly); picks distinct."""
    import pyspark.sql.functions as F

    from kafka_streams_the_clojure_way_spark.sources.files import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    picks = {r.pick: r.vec_id for r in S.kcenter_coreset(emb, k=4).collect()}
    assert sorted(picks) == [1, 2, 3, 4]
    assert len(set(picks.values())) == 4
    lowest = emb.agg(F.min("vec_id")).collect()[0][0]
    assert picks[1] == lowest
    seed_vec = emb.filter(F.col("vec_id") == lowest).select(
        F.col("embedding").cast("array<double>").alias("sv")
    )
    far = (
        emb.filter(F.col("vec_id") != lowest)
        .crossJoin(F.broadcast(seed_vec))
        .select(
            "vec_id",
            F.round(
                1.0 - S.cosine(F.col("embedding").cast("array<double>"), F.col("sv")), 6
            ).alias("d"),
        )
        .orderBy(F.col("d").desc(), F.col("vec_id").asc())
        .limit(1)
        .collect()[0]
    )
    assert picks[2] == far.vec_id
