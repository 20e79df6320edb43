"""Error-bound gates for the approximate aggregates (the operators whose
oracles are rows-only because DuckDB's sketches differ): the sketch
answer must sit within its documented error of the exact answer."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_the_clojure_way_spark.sources.files import load_table

SF = "/root/testdata/sf0.01"


def test_approx_count_distinct_within_rsd(spark):
    ev = load_table(spark, SF, "events")
    row = ev.agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
        F.countDistinct("user_id").alias("exact"),
    ).collect()[0]
    # HLL++ rsd is a standard deviation, not a hard bound — allow 5 sigma
    assert abs(row.approx - row.exact) <= max(5, 0.05 * row.exact), row


def test_approx_percentile_within_rank_error(spark):
    o = load_table(spark, SF, "orders")
    accuracy = 1000  # rank error <= n/accuracy
    n = o.count()
    eps = 1.0 / accuracy
    row = o.agg(
        F.percentile_approx("o_totalprice", 0.5, accuracy).alias("approx"),
        F.expr("percentile(o_totalprice, 0.5)").alias("exact_mid"),
        F.expr(f"percentile(o_totalprice, {0.5 - 2 * eps})").alias("lo"),
        F.expr(f"percentile(o_totalprice, {0.5 + 2 * eps})").alias("hi"),
    ).collect()[0]
    assert row.lo <= row.approx <= row.hi, (row, n)


def test_hll_sketch_union_error_bound(spark):
    """The unioned per-type sketches' global estimate must sit within the
    lgK=14 HLL error envelope (~0.8% rsd, gate at 4 sigma) of the exact
    distinct count — and the union must NOT double-count users appearing
    under several event types. The registered query now carries that
    bound as its hashable verdict column; assert both the verdict and
    the raw envelope against an independently computed estimate."""
    from kafka_streams_the_clojure_way_spark.queries import QUERIES
    from kafka_streams_the_clojure_way_spark.sources.files import load_table

    sf = "/root/testdata/sf0.01"
    row = QUERIES["agg_hll_sketch_union"](spark, sf).collect()[0]
    assert row.union_within_bound, row
    ev = load_table(spark, sf, "events")
    est = (
        ev.groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("s"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("s")).alias("est"))
        .collect()[0]
        .est
    )
    exact = ev.select("user_id").distinct().count()
    assert row.exact_users == exact
    assert abs(est - exact) <= max(4 * 0.008 * exact, 2.0), (est, exact)


def test_grouped_approx_percentile_within_rank_error(spark):
    """Every group's p50 sketch value must sit inside the +-2/accuracy
    rank window of the exact grouped percentile — computed here from the
    raw sketch, independent of the registered query's own verdict
    columns (which must all be true)."""
    from kafka_streams_the_clojure_way_spark.queries import QUERIES

    for r in QUERIES["agg_approx_percentile_totalprice"](spark, SF).collect():
        assert r.p25_ok and r.p50_ok and r.p95_ok, r
    got = {
        r.o_orderpriority: r.p50_approx
        for r in load_table(spark, SF, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.percentile_approx("o_totalprice", 0.5, 1000).alias("p50_approx")
        )
        .collect()
    }
    eps = 2.0 / 1000
    bounds = {
        r.o_orderpriority: (r.lo, r.hi)
        for r in load_table(spark, SF, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.expr(f"percentile(o_totalprice, {0.5 - eps})").alias("lo"),
            F.expr(f"percentile(o_totalprice, {0.5 + eps})").alias("hi"),
        )
        .collect()
    }
    assert set(got) == set(bounds)
    for k, v in got.items():
        lo, hi = bounds[k]
        assert lo <= v <= hi, (k, v, lo, hi)
