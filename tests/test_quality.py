"""One-pass data-quality validation: rule violations counted as observed
metrics inside a single scan (never one COUNT per rule)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_the_clojure_way_spark.quality import (
    QualityError,
    enforce,
    validate,
)
from kafka_streams_the_clojure_way_spark.sources.files import load_table

SF = "/root/testdata/sf0.001"


def test_validate_counts_violations_in_one_pass(spark):
    c = load_table(spark, SF, "customer")
    got = validate(
        c,
        {
            "custkey_nonneg": F.col("c_custkey") >= 0,
            "segment_known": F.col("c_mktsegment").isin(
                "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"
            ),
            "balance_below_abs_cap": F.abs(F.col("c_acctbal")) < 1.0,  # will fail
        },
    )
    assert got["__rows"] == c.count()
    assert got["custkey_nonneg"] == 0
    assert got["segment_known"] == 0
    assert got["balance_below_abs_cap"] > 0


def test_enforce_raises_listing_failed_rules(spark):
    c = load_table(spark, SF, "customer")
    with pytest.raises(QualityError, match="balance_below_abs_cap"):
        enforce(c, {"balance_below_abs_cap": F.abs(F.col("c_acctbal")) < 1.0})
    # all-passing rules return the counters
    ok = enforce(c, {"custkey_nonneg": F.col("c_custkey") >= 0})
    assert ok["custkey_nonneg"] == 0 and ok["__rows"] > 0


def test_constraint_audit_frame_matches_validate(spark):
    from kafka_streams_the_clojure_way_spark.quality import constraint_audit, validate

    df = spark.createDataFrame(
        [{"x": 1, "y": "a"}, {"x": -2, "y": "b"}, {"x": 3, "y": None}]
    )
    checks = {"x_positive": F.col("x") > 0, "y_not_null": F.col("y").isNotNull()}
    frame = {
        r.rule: (r.violations, r.rows_checked)
        for r in constraint_audit(df, checks).collect()
    }
    flat = validate(df, checks)
    assert frame == {
        "x_positive": (flat["x_positive"], flat["__rows"]),
        "y_not_null": (flat["y_not_null"], flat["__rows"]),
    }
    assert frame["x_positive"] == (1, 3) and frame["y_not_null"] == (1, 3)


def test_entropy_stats_bounds(spark):
    """Shannon entropy over d distinct tokens is bounded by log2(d);
    TTR in (0, 1]; single-type docs have exactly zero entropy."""
    import math

    from kafka_streams_the_clojure_way_spark.queries import QUERIES

    rows = QUERIES["text_entropy_stats"](spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert 0 < r.ttr_r <= 1.0
        assert -1e-6 <= r.entropy_r <= math.log2(max(r.n_types, 2)) + 1e-6
        if r.n_types == 1:
            assert r.entropy_r == 0.0
