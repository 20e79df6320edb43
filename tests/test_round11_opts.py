"""Round-11 optimization equivalence pins: the rewritten assignment /
routing / cosine kernels must be BIT-EQUAL to the shapes they replaced
(the queries' oracles already pin end-to-end results; these pin the
operator-level contracts directly, on adversarial ties included)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kafka_streams_the_clojure_way_spark.operators import similarity as S
from kafka_streams_the_clojure_way_spark.operators.clustering import (
    _assign,
    attach_model,
    seq_dot,
)


@pytest.fixture(scope="module")
def vecs_df(spark):
    import random

    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(200)
    ]
    # adversarial: duplicate vectors => exact distance ties, resolved by
    # the (distance ASC, cluster ASC) contract
    rows += [(1000 + i, list(rows[i][1])) for i in range(5)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_cosine_prenorm_bit_equals_cosine(spark, vecs_df):
    a = vecs_df.select(
        F.col("vec_id").alias("ida"),
        F.col("embedding").alias("va"),
        S.norm_col(F.col("embedding")).alias("na"),
    )
    b = vecs_df.select(
        F.col("vec_id").alias("idb"),
        F.col("embedding").alias("vb"),
        S.norm_col(F.col("embedding")).alias("nb"),
    )
    pairs = a.join(b, F.col("ida") < F.col("idb")).limit(500).select(
        "ida",
        "idb",
        S.cosine(F.col("va"), F.col("vb")).alias("ref"),
        S.cosine_prenorm(
            S.dot(F.col("va"), F.col("vb")), F.col("na"), F.col("nb")
        ).alias("opt"),
    )
    bad = pairs.filter(~(F.col("ref") == F.col("opt"))).count()
    assert bad == 0  # bit-equal, not approximately equal


def test_seq_dot_matches_jvm_fold(spark):
    vals = [0.1, -0.7, 3.14159, 1e-9, -2.5, 0.333333]
    row = spark.range(1).select(
        S.dot(
            F.array(*[F.lit(x) for x in vals]), F.array(*[F.lit(x) for x in vals])
        ).alias("d")
    ).first()
    assert row["d"] == seq_dot(vals)


def test_row_local_assign_matches_window_argmin(spark, vecs_df):
    from kafka_streams_the_clojure_way_spark.operators.clustering import (
        _sq_dist,
        _vec_frame,
    )
    from kafka_streams_the_clojure_way_spark.operators.relational import (
        top_k_per_key,
    )

    cents = [r["embedding"] for r in vecs_df.orderBy("vec_id").limit(4).collect()]
    # make centroid 2 == centroid 3: a guaranteed per-row distance tie,
    # must resolve to the LOWER cluster id
    cents[3] = list(cents[2])
    vecs = _vec_frame(vecs_df, "vec_id", "embedding")
    got = {
        r["vec_id"]: r["cluster"]
        for r in _assign(vecs, cents, "vec_id").collect()
    }
    # reference: the pre-r11 broadcast-join + top-1 window shape
    cent_df = F.broadcast(
        spark.createDataFrame(
            [(i, c) for i, c in enumerate(cents)],
            "cl int, c array<double>",
        )
    )
    scored = vecs.join(cent_df).select(
        "vec_id", "cl", _sq_dist(F.col("__v"), F.col("c")).alias("d")
    )
    ref = {
        r["vec_id"]: r["cl"]
        for r in top_k_per_key(
            scored,
            keys=["vec_id"],
            order_by=[F.col("d").asc(), F.col("cl").asc()],
            k=1,
            rank_col="r",
        ).collect()
    }
    assert got == ref
    assert 3 not in set(got.values())  # ties resolved to the lower id


def test_ivf_routing_matches_window_topn(spark, vecs_df):
    from kafka_streams_the_clojure_way_spark.operators.relational import (
        top_k_per_key,
    )

    cent_rows = S.ivf_centroid_rows(
        vecs_df, centroid_mod=7, n_cells=12
    )
    routed = S.ivf_topk(
        vecs_df,
        vecs_df.filter(F.col("vec_id") % 50 == 0),
        k=5,
        centroid_mod=7,
        n_cells=12,
        cent_rows=cent_rows,
    ).collect()
    # reference: broadcast-join + window routing and rerank (pre-r11)
    cents = F.broadcast(
        spark.createDataFrame(cent_rows, "cid long, c array<double>")
    )

    def best_cells_ref(side, sid, svec, n):
        scored = side.join(cents).select(
            sid, svec, "cid", S.cosine(F.col(svec), F.col("c")).alias("cos")
        )
        return top_k_per_key(
            scored,
            keys=[sid],
            order_by=[F.col("cos").desc(), F.col("cid")],
            k=n,
            rank_col="cr",
        ).select(sid, svec, F.col("cid").alias("cell"))

    corpus_cells = best_cells_ref(
        vecs_df.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("cv"),
        ),
        "neighbor_id",
        "cv",
        1,
    )
    probe = best_cells_ref(
        vecs_df.filter(F.col("vec_id") % 50 == 0).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
        ),
        "query_id",
        "qv",
        3,
    )
    ref = top_k_per_key(
        corpus_cells.join(F.broadcast(probe), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            S.cosine(F.col("qv"), F.col("cv")).alias("cosine"),
        ),
        keys=["query_id"],
        order_by=[F.col("cosine").desc(), F.col("neighbor_id")],
        k=5,
        rank_col="rank",
    ).select(
        "query_id",
        "neighbor_id",
        F.col("rank").cast("long").alias("rank"),
        F.round("cosine", 6).alias("cosine_r"),
    ).collect()
    assert sorted(map(tuple, routed)) == sorted(map(tuple, ref))


def test_attach_model_round_trips_doubles(spark):
    vals = [(1, [0.1 + 1e-16, -3.0, math.pi]), (2, [1e-300, 2.5, -0.0])]
    out = attach_model(
        spark.range(1),
        "m",
        vals,
        "array<struct<i:int,v:array<double>>>",
    ).select("m").first()["m"]
    got = [(r["i"], list(r["v"])) for r in out]
    assert all(
        gi == vi and all(a == b for a, b in zip(gv, vv))
        for (gi, gv), (vi, vv) in zip(got, vals)
    )


def test_pagerank_assume_distinct_parity(spark):
    from kafka_streams_the_clojure_way_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1)], "src long, dst long"
    )
    base = sorted(map(tuple, pagerank(edges).collect()))
    fast = sorted(map(tuple, pagerank(edges, assume_distinct=True).collect()))
    assert base == fast
