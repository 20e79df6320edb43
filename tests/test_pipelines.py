"""Pipeline unit tests ≙ the reference's pure transducer tests
(core.clj:193-197): literal records through the composed pipelines, no
external infrastructure."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_the_clojure_way_spark import pipelines as P


def test_large_purchases_filters_and_projects(spark):
    # ≙ (into [] purchase-made-transducer [[1 {...10}] [3 {...500}]])
    rows = [
        {"purchase_id": 1, "user_id": 2, "amount": 10, "quantity": 1},
        {"purchase_id": 3, "user_id": 4, "amount": 500, "quantity": 23},
    ]
    out = spark.createDataFrame(rows).transform(P.large_purchases).collect()
    assert [r.asDict() for r in out] == [{"user_id": 4, "amount": 500}]


def test_large_donations_integer_division(spark):
    # ≙ core.clj:118: (int (/ 15000 100)) = 150; 9999 cents is NOT large.
    rows = [
        {"user_id": 1, "donation_amount_cents": 15000, "donation_date": "2019-01-02"},
        {"user_id": 2, "donation_amount_cents": 9999, "donation_date": "2019-01-03"},
        {"user_id": 3, "donation_amount_cents": 10000, "donation_date": "2019-01-04"},
    ]
    out = (
        spark.createDataFrame(rows)
        .transform(P.large_donations)
        .orderBy("user_id")
        .collect()
    )
    assert [r.asDict() for r in out] == [
        {"user_id": 1, "amount": 150},
        {"user_id": 3, "amount": 100},
    ]


def test_threshold_is_inclusive(spark):
    # ≙ (<= 100 amount) at core.clj:80 — exactly 100 is large.
    rows = [{"user_id": 1, "amount": 100}, {"user_id": 2, "amount": 99}]
    out = spark.createDataFrame(rows).transform(P.large_purchases).collect()
    assert [r.user_id for r in out] == [1]


def test_compose_order_and_fusion(spark):
    # filter-before-project where the filter reads a column the projection
    # drops (≙ donation pipeline, SURVEY §2.3) — must still work.
    pipeline = P.compose(
        P.keep(F.col("secret") > 0),
        P.select_keys("visible"),
    )
    rows = [{"visible": "a", "secret": 1}, {"visible": "b", "secret": -1}]
    out = spark.createDataFrame(rows).transform(pipeline).collect()
    assert [r.visible for r in out] == ["a"]


def test_merge_unions_by_name(spark):
    a = spark.createDataFrame([{"user_id": 1, "amount": 100}])
    # reversed column order on purpose — union is by NAME.
    b = spark.createDataFrame([{"amount": 200, "user_id": 2}]).select("amount", "user_id")
    out = a.transform(P.merge(b)).orderBy("user_id").collect()
    assert [(r.user_id, r.amount) for r in out] == [(1, 100), (2, 200)]
